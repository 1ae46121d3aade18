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

  test("anyFormatToPq ingests any registered DataSource through the " +
    "TablePlan machinery into the repo") {
    val repo = PqRepo(spark, Files.createTempDirectory("graft_anyfmt").toString)
    val staging = Files.createTempDirectory("graft_anyfmt_src").toString
    nation.write.mode("overwrite").option("header", "true").csv(s"$staging/csv")
    nation.write.mode("overwrite").json(s"$staging/json")
    nation.write.mode("overwrite").orc(s"$staging/orc")

    val plan = graft.plans.TablePlan(
      keep = Seq("^(n_nationkey|n_name)$"), where = Some("n_nationkey < 10"))
    Graft.anyFormatToPq(spark, "csv",
      Map("header" -> "true"), repo, "fmt", "nation_csv",
      path = Some(s"$staging/csv"), sourceSchema = Some(nation.schema),
      plan = plan, modified = Some("csv (Updated 2024-06-01)"))
    Graft.anyFormatToPq(spark, "json", Map.empty, repo, "fmt", "nation_json",
      path = Some(s"$staging/json"), sourceSchema = Some(nation.schema),
      plan = plan)
    // columnar leg: ORC ships with Spark, same façade path
    Graft.anyFormatToPq(spark, "orc", Map.empty, repo, "fmt", "nation_orc",
      path = Some(s"$staging/orc"), sourceSchema = Some(nation.schema),
      plan = plan)

    val fromCsv = repo.table("fmt", "nation_csv")
    val fromJson = repo.table("fmt", "nation_json")
    val fromOrc = repo.table("fmt", "nation_orc")
    assert(fromCsv.columns.toSeq == Seq("n_nationkey", "n_name"))
    assert(fromCsv.count() == 10 && fromJson.count() == 10)
    assert(fromCsv.collect().map(_.toSeq).toSet ==
      fromJson.collect().map(_.toSeq).toSet)
    assert(fromOrc.collect().map(_.toSeq).toSet ==
      fromCsv.collect().map(_.toSeq).toSet)
    // the repo write stamped metadata like any other ingest
    assert(repo.lastModified("fmt", "nation_csv")
      .contains("csv (Updated 2024-06-01)"))
  }
}
