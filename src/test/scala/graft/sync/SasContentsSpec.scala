package graft.sync

import org.scalatest.funsuite.AnyFunSuite

class SasContentsSpec extends AnyFunSuite {

  test("parses Last Modified row from PROC CONTENTS listing") {
    val lines = Seq(
      "Data Set Name        CRSP.DSI           Observations     25656",
      "Last Modified        11/26/2025 01:40:41          Protection",
      "              ",
      "Data Representation  SOLARIS_X86_64"
    )
    assert(SasContents.parseModified(lines)
      .contains("Last modified: 11/26/2025 01:40:41"))
  }

  test("folds continuation row unless it is the Protection column") {
    val lines = Seq(
      "Last Modified        11/26/2025           extra",
      "      01:40:41      ")
    assert(SasContents.parseModified(lines)
      .contains("Last modified: 11/26/2025 01:40:41"))
    val withProtection = Seq(
      "Last Modified        11/26/2025 01:40:41          x",
      "   Protection   ")
    assert(SasContents.parseModified(withProtection)
      .contains("Last modified: 11/26/2025 01:40:41"))
  }

  test("returns None when absent; output feeds the Modified parser") {
    assert(SasContents.parseModified(Seq("nothing here")).isEmpty)
    val parsed = SasContents.parseModified(
      Seq("Last Modified        11/26/2025 01:40:41          Protection"))
    assert(Modified.info("wrds_sas", parsed).date.isDefined)
  }
}
