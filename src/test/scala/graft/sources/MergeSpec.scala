package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("merge replaces by key, appends new keys, carries the rest") {
    val repo = PqRepo(spark,
      java.nio.file.Files.createTempDirectory("mergespec").toString)
    repo.write(Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v"), "s", "t")
    repo.merge(Seq((2L, "b2", 99.0), (4L, "d", 40.0)).toDF("k", "name", "v"),
      "s", "t", Seq("k"))
    val out = repo.table("s", "t").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(out == Set((1L, "a", 10.0), (2L, "b2", 99.0),
      (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("composite keys and repeated merges stay consistent") {
    val repo = PqRepo(spark,
      java.nio.file.Files.createTempDirectory("mergespec2").toString)
    repo.write(Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("k1", "k2", "v"), "s", "t")
    repo.merge(Seq((1L, "y", 5.0)).toDF("k1", "k2", "v"), "s", "t", Seq("k1", "k2"))
    repo.merge(Seq((2L, "z", 9.0)).toDF("k1", "k2", "v"), "s", "t", Seq("k1", "k2"))
    val out = repo.table("s", "t").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(out == Set((1L, "x", 1.0), (1L, "y", 5.0), (2L, "z", 9.0)))
  }
}
