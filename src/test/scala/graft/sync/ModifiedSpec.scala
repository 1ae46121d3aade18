package graft.sync

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite

class ModifiedSpec extends AnyFunSuite {

  test("'Last modified:' parses as New York local time") {
    val dt = Modified.parseDttm("Last modified: 11/26/2025 01:40:41").get
    assert(dt.getZone.getId == "America/New_York")
    assert(dt.toLocalDate == LocalDate.of(2025, 11, 26))
  }

  test("'(Updated yyyy-mm-dd)' assumes 02:00 New York") {
    val dt = Modified.parseDttm("CRSP Daily Stock (Updated 2026-01-07)").get
    assert(dt.getHour == 2 && dt.toLocalDate == LocalDate.of(2026, 1, 7))
  }

  test("file-safe stamp is UTC") {
    // 01:40:41 EST (UTC-5) → 06:40:41 UTC
    assert(Modified.parseFileSafe("Last modified: 11/26/2025 01:40:41")
      .contains("20251126T064041Z"))
  }

  test("unrecognized comments yield empty info") {
    assert(Modified.parseDttm("nonsense").isEmpty)
    val i = Modified.info("pg", Some("nonsense"))
    assert(i.date.isEmpty && i.raw.contains("nonsense"))
  }

  test("updateAvailable: unknown source never updates") {
    val src = Modified.info("pg", None)
    val dst = Modified.info("pq", Some("Last modified: 01/01/2020 00:00:00"))
    assert(!Modified.updateAvailable(src, dst))
  }

  test("updateAvailable: unknown destination updates") {
    val src = Modified.info("pg", Some("x (Updated 2024-05-01)"))
    assert(Modified.updateAvailable(src, Modified.info("pq", None)))
  }

  test("updateAvailable: strict date comparison") {
    val old = Modified.info("pg", Some("x (Updated 2024-05-01)"))
    val newer = Modified.info("pg", Some("x (Updated 2024-06-01)"))
    assert(Modified.updateAvailable(newer, old))
    assert(!Modified.updateAvailable(old, newer))
    assert(!Modified.updateAvailable(old, old))
  }

  test("isUpToDate requires both parseable") {
    val a = Modified.info("pg", Some("x (Updated 2024-05-01)"))
    val b = Modified.info("pq", Some("x (Updated 2024-05-01)"))
    assert(Modified.isUpToDate(a, b))
    assert(!Modified.isUpToDate(a, Modified.info("pq", None)))
  }
}
