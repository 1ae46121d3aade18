package graft.sync

import scala.util.matching.Regex

/** Parser for SAS `PROC CONTENTS` output — the reference's alternative
  * source of table-modified metadata (db2pq/sas/stream.py:45
  * get_modified_str). The SSH transport is environment plumbing; the
  * capability re-expressed here is turning CONTENTS listing lines into the
  * same `"Last modified: ..."` comment string the sync gate consumes.
  */
object SasContents {

  private val lastModifiedLine: Regex = raw"^Last Modified\s+(.*?)\s{2,}.*$$".r
  private val protection: Regex = raw"Protection".r.unanchored

  /** Extract a `"Last modified: <ts>"` comment from CONTENTS lines, folding
    * in the continuation row unless it is the Protection column. Returns
    * None when no Last Modified row is present. */
  def parseModified(lines: Seq[String]): Option[String] = {
    var modified: Option[String] = None
    var nextRow = false
    lines.foreach { raw =>
      if (nextRow) {
        val line = raw.trim
        if (protection.findFirstIn(line).isEmpty && line.nonEmpty)
          modified = modified.map(m => s"$m $line")
        nextRow = false
      }
      raw match {
        case lastModifiedLine(ts) =>
          modified = Some(s"Last modified: $ts")
          nextRow = true
        case _ =>
      }
    }
    modified
  }
}
