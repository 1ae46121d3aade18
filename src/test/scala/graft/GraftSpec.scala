package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import graft.sources.PqRepo

class GraftSpec extends SparkSpec {

  lazy val nation = spark.read.parquet(s"$sfDir/nation.parquet")

  test("dbUpdatePq gates on source comment vs stored metadata") {
    val repo = PqRepo(spark, Files.createTempDirectory("graft_facade").toString)
    var reads = 0
    def source: DataFrame = { reads += 1; nation }

    assert(Graft.dbUpdatePq(repo, "tpch", "nation",
      Some("x (Updated 2024-05-01)"), source).isDefined)
    assert(reads == 1)
    // up to date → source never evaluated
    assert(Graft.dbUpdatePq(repo, "tpch", "nation",
      Some("x (Updated 2024-05-01)"), source).isEmpty)
    assert(reads == 1)
    assert(Graft.dbUpdatePq(repo, "tpch", "nation",
      Some("x (Updated 2024-06-01)"), source).isDefined)
    assert(reads == 2)
  }

  test("pqUpdateDb writes only when repo copy is newer than destination") {
    val repo = PqRepo(spark, Files.createTempDirectory("graft_facade2").toString)
    repo.write(nation, "tpch", "nation", modified = Some("x (Updated 2024-06-01)"))
    var written = 0
    def fakeWrite(df: DataFrame): Unit = { written += 1; assert(df.count() == 25) }

    // destination older → write
    assert(Graft.pqUpdateDb(repo, "jdbc:ignored", "tpch", "nation",
      Some("x (Updated 2024-05-01)"), write = fakeWrite))
    assert(written == 1)
    // destination same date → skip
    assert(!Graft.pqUpdateDb(repo, "jdbc:ignored", "tpch", "nation",
      Some("x (Updated 2024-06-01)"), write = fakeWrite))
    assert(written == 1)
    // force → write
    assert(Graft.pqUpdateDb(repo, "jdbc:ignored", "tpch", "nation",
      Some("x (Updated 2024-06-01)"), force = true, write = fakeWrite))
    assert(written == 2)
  }
}
