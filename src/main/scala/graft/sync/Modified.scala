package graft.sync

import java.time.{LocalDate, LocalDateTime, ZoneId, ZonedDateTime}
import java.time.format.DateTimeFormatter
import scala.util.matching.Regex

/** Last-modified comment parsing + incremental-update gating.
  *
  * Re-expresses the reference's sync logic (db2pq/files/timestamps.py:11-42,
  * db2pq/sync/modified.py:15-57) as pure Scala: two comment formats —
  *   1. "Last modified: MM/DD/YYYY HH:MM:SS"  (America/New_York local time)
  *   2. "... (Updated YYYY-MM-DD)"            (assume 02:00 America/New_York)
  * — parsed into comparable instants, and a date-granularity update gate.
  */
object Modified {

  private val NY = ZoneId.of("America/New_York")
  private val UTC = ZoneId.of("UTC")
  private val updatedRe: Regex = raw"\(Updated\s+(\d{4}-\d{2}-\d{2})\)\s*$$".r.unanchored
  private val lastModifiedFmt = DateTimeFormatter.ofPattern("MM/dd/yyyy HH:mm:ss")
  private val fileSafeFmt =
    DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'")

  /** Parse a comment into a New_York-zoned instant; None if unrecognized. */
  def parseDttm(comment: String): Option[ZonedDateTime] = {
    val s = comment.trim
    if (s.startsWith("Last modified:")) {
      val ts = s.stripPrefix("Last modified:").trim
      try Some(LocalDateTime.parse(ts, lastModifiedFmt).atZone(NY))
      catch { case _: java.time.format.DateTimeParseException => None }
    } else
      updatedRe.findFirstMatchIn(s).map { m =>
        LocalDate.parse(m.group(1)).atTime(2, 0, 0).atZone(NY)
      }
  }

  /** Filename-safe UTC stamp (yyyyMMdd'T'HHmmss'Z'), e.g. for archive names
    * (reference parse_last_modified, timestamps.py:11). */
  def parseFileSafe(comment: String): Option[String] =
    parseDttm(comment).map(dt => fileSafeFmt.format(dt.withZoneSameInstant(UTC)))

  /** Parsed comment metadata for update comparison. */
  final case class Info(
      kind: String,
      raw: Option[String],
      dttm: Option[ZonedDateTime],
      date: Option[LocalDate]
  )

  def info(kind: String, comment: Option[String]): Info =
    comment.filter(_.nonEmpty) match {
      case None => Info(kind, comment, None, None)
      case Some(c) =>
        val dttm = parseDttm(c)
        Info(kind, Some(c), dttm, dttm.map(_.toLocalDate))
    }

  /** True when src is newer than dst, at date granularity
    * (reference update_available, sync/modified.py:34-47):
    *  - unknown src  -> false (cannot establish an update)
    *  - unknown dst  -> true  (assume destination old)
    *  - else         -> src.date > dst.date
    */
  def updateAvailable(src: Info, dst: Info): Boolean =
    (src.date, dst.date) match {
      case (None, _)          => false
      case (Some(_), None)    => true
      case (Some(s), Some(d)) => s.isAfter(d)
    }

  /** Both parseable and dst at least as new as src
    * (reference is_up_to_date, sync/modified.py:49-57). */
  def isUpToDate(src: Info, dst: Info): Boolean =
    (src.date, dst.date) match {
      case (Some(s), Some(d)) => !d.isBefore(s)
      case _                  => false
    }
}
