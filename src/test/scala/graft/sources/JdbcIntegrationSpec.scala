package graft.sources

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.functions._
import graft.{Graft, SparkSpec}
import graft.plans.TablePlan

/** End-to-end JDBC integration against embedded Derby (ships with Spark):
  * the database→parquet and parquet→database paths run for real, not just
  * at the plan-SQL level. The PostgreSQL-flavored pushdown rendering
  * (::casts, AT TIME ZONE) is exercised separately in TablePlanSparkSpec;
  * here plans stick to engine-neutral SQL (projection, rename, where). */
class JdbcIntegrationSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def withStatement[A](f: java.sql.Statement => A): A = {
    val conn = DriverManager.getConnection(url)
    try f(conn.createStatement()) finally conn.close()
  }

  private def setupTable(): Unit = {
    withStatement { st =>
      try st.execute("DROP TABLE GRAFT.DSI") catch { case _: Exception => }
      try st.execute("CREATE SCHEMA GRAFT") catch { case _: Exception => }
      st.execute(
        "CREATE TABLE GRAFT.DSI (ID BIGINT NOT NULL, NAME VARCHAR(40), VAL DOUBLE)")
      (1 to 100).foreach { i =>
        st.execute(s"INSERT INTO GRAFT.DSI VALUES ($i, 'row_$i', ${i * 1.5})")
      }
    }
  }

  test("dbToPq: database table lands in the repo with plan + metadata applied") {
    setupTable()
    val repo = PqRepo(spark, Files.createTempDirectory("graft_jdbc").toString)
    val sourceSchema = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "GRAFT.DSI").load().schema

    val plan = TablePlan(
      keep = Seq("^(ID|VAL)$"),
      rename = Map("VAL" -> "VALUE"),
      where = Some("ID > 90"))
    val path = Graft.dbToPq(spark, url, "GRAFT", "DSI", sourceSchema, repo,
      plan = plan, altTableName = Some("dsi"),
      modified = Some("x (Updated 2024-05-01)"))

    val back = repo.table("GRAFT", "dsi")
    assert(back.columns.toSeq == Seq("ID", "VALUE"))
    assert(back.count() == 10)
    assert(repo.lastModified("GRAFT", "dsi").contains("x (Updated 2024-05-01)"))
    assert(path.toString.endsWith("GRAFT/dsi.parquet"))
  }

  test("partitioned read fans out into stride queries and loses no rows") {
    setupTable()
    val sourceSchema = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "GRAFT.DSI").load().schema
    val df = Jdbc.readTable(spark, url, TablePlan(), "GRAFT", "DSI",
      sourceSchema, partitionColumn = Some("ID"),
      lowerBound = Some(1L), upperBound = Some(101L), numPartitions = 7)
    assert(df.rdd.getNumPartitions == 7)
    assert(df.count() == 100)
    assert(df.agg(sum("ID")).head().getLong(0) == 5050L)
  }

  test("pqToDb writes a repo table into the database and pqUpdateDb gates") {
    setupTable()
    val repo = PqRepo(spark, Files.createTempDirectory("graft_jdbc2").toString)
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
      .select(col("n_nationkey").as("NK"), col("n_name").as("NNAME"))
    repo.write(nation, "tpch", "nation", modified = Some("x (Updated 2024-06-01)"))

    Graft.pqToDb(repo, url, "tpch", "nation",
      dstSchema = Some("GRAFT"), dstTable = Some("NATION_OUT"))
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "GRAFT.NATION_OUT").load()
    assert(back.count() == nation.count())

    // destination newer → gate skips the JDBC write
    assert(!Graft.pqUpdateDb(repo, url, "tpch", "nation",
      destComment = Some("x (Updated 2024-07-01)")))
    // destination older → writes through the real JDBC path
    assert(Graft.pqUpdateDb(repo, url, "tpch", "nation",
      destComment = Some("x (Updated 2024-05-01)"),
      write = df => Jdbc.writeTable(df, url, "GRAFT", "NATION_OUT2")))
    val out2 = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "GRAFT.NATION_OUT2").load()
    assert(out2.count() == nation.count())
  }

  test("readSql runs arbitrary SQL inside the database") {
    setupTable()
    val df = Jdbc.readSql(spark, url,
      "SELECT NAME, VAL * 2 AS V2 FROM GRAFT.DSI WHERE ID <= 3")
    assert(df.count() == 3)
    assert(df.columns.toSeq == Seq("NAME", "V2"))
  }
}

class JdbcIntrospectionSpec extends SparkSpec {
  private val url = "jdbc:derby:memory:graftmeta;create=true"

  test("schemaTables / tableExists / tableColumns via catalog metadata") {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("CREATE SCHEMA META") catch { case _: Exception => }
      try st.execute("DROP TABLE META.T1") catch { case _: Exception => }
      try st.execute("DROP TABLE META.T2") catch { case _: Exception => }
      st.execute("CREATE TABLE META.T1 (A BIGINT, B VARCHAR(10))")
      st.execute("CREATE TABLE META.T2 (C DOUBLE)")
    } finally conn.close()

    assert(Jdbc.schemaTables(url, "META") == Seq("T1", "T2"))
    assert(Jdbc.tableExists(url, "META", "T1"))
    assert(!Jdbc.tableExists(url, "META", "NOPE"))
    assert(Jdbc.tableColumns(url, "META", "T1") ==
      Seq(("A", "BIGINT"), ("B", "VARCHAR")))
  }

  test("metadata lookups treat names literally, not as JDBC patterns") {
    // '_' is a single-char wildcard in getTables/getColumns patterns:
    // unescaped, A_B also matches AXB — tableExists answered true for
    // near-names and a columns lookup interleaved both tables' columns
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("CREATE SCHEMA META") catch { case _: Exception => }
      try st.execute("DROP TABLE META.A_B") catch { case _: Exception => }
      try st.execute("DROP TABLE META.AXB") catch { case _: Exception => }
      st.execute("CREATE TABLE META.A_B (X INT)")
      st.execute("CREATE TABLE META.AXB (Y INT, Z INT)")
    } finally conn.close()
    assert(Jdbc.tableExists(url, "META", "A_B"))
    assert(!Jdbc.tableExists(url, "META", "A_C"))
    assert(Jdbc.tableColumns(url, "META", "A_B") == Seq(("X", "INTEGER")))
    assert(Jdbc.tableColumns(url, "META", "AXB") ==
      Seq(("Y", "INTEGER"), ("Z", "INTEGER")))
  }

  test("createTableColumnTypes emits Spark-parseable DDL from PG-ish names") {
    // Spark parses this writer option with ITS OWN DDL parser; PostgreSQL
    // names ("text", "bytea", "double precision") threw ParseException
    // before a single row was written
    val ddl = Jdbc.createTableColumnTypes(Map(
      "a" -> "text", "b" -> "bytea", "c" -> "double precision",
      "d" -> "int4"))
    val parsed = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseTableSchema(ddl)
    assert(parsed.fieldNames.toSet == Set("a", "b", "c", "d"))
    assert(parsed("a").dataType == org.apache.spark.sql.types.StringType)
    assert(parsed("b").dataType == org.apache.spark.sql.types.BinaryType)
  }

  test("partial partitioning spec is rejected, not silently dropped") {
    import graft.plans.TablePlan
    val e = intercept[IllegalArgumentException] {
      Jdbc.readTable(spark, url, TablePlan(), "META", "T1",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("A",
            org.apache.spark.sql.types.LongType))),
        partitionColumn = Some("A"))
    }
    assert(e.getMessage.contains("lowerBound"))
  }

  test("dbSchemaToPq exports every discovered table; dbToDb mirrors") {
    val repo = PqRepo(spark,
      java.nio.file.Files.createTempDirectory("graft_schema_jdbc").toString)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("CREATE SCHEMA SRC") catch { case _: Exception => }
      try st.execute("DROP TABLE SRC.SMALL") catch { case _: Exception => }
      st.execute("CREATE TABLE SRC.SMALL (ID BIGINT)")
      (1 to 5).foreach(i => st.execute(s"INSERT INTO SRC.SMALL VALUES ($i)"))
    } finally conn.close()

    val exported = graft.Graft.dbSchemaToPq(spark, url, "SRC", repo)
    assert(exported.map(_._1) == Seq("SMALL"))
    assert(repo.table("SRC", "SMALL").count() == 5)

    val srcSchema = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "SRC.SMALL").load().schema
    graft.Graft.dbToDb(spark, url, url, "SRC", "SMALL", srcSchema,
      dstTable = Some("SMALL_COPY"))
    assert(spark.read.format("jdbc").option("url", url)
      .option("dbtable", "SRC.SMALL_COPY").load().count() == 5)
  }

  test("writeNonEmpty skips empty frames like the reference") {
    val repo = PqRepo(spark,
      java.nio.file.Files.createTempDirectory("graft_empty").toString)
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    assert(repo.writeNonEmpty(nation.filter("n_nationkey < 0"), "tpch", "none").isEmpty)
    assert(repo.list("tpch").isEmpty)
    assert(repo.writeNonEmpty(nation, "tpch", "nation").isDefined)
    assert(repo.list("tpch") == Seq("nation"))
  }
}

class PushdownEquivalenceSpec extends SparkSpec {
  private val url = "jdbc:derby:memory:graftequiv;create=true"

  test("in-database pushdown and in-Spark plan application agree") {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("CREATE SCHEMA EQ") catch { case _: Exception => }
      try st.execute("DROP TABLE EQ.T") catch { case _: Exception => }
      st.execute("CREATE TABLE EQ.T (ID BIGINT, GRP VARCHAR(8), VAL DOUBLE)")
      (1 to 200).foreach(i =>
        st.execute(s"INSERT INTO EQ.T VALUES ($i, 'g${i % 7}', ${i * 0.25})"))
    } finally conn.close()

    val full = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "EQ.T").load()
    val plan = graft.plans.TablePlan(
      keep = Seq("^(ID|VAL)$"),
      rename = Map("VAL" -> "V"),
      where = Some("MOD(ID, 3) = 0"))

    // path 1: plan applied by Spark on the full JDBC read
    val inSpark = plan(full).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    // path 2: plan rendered as SQL and executed inside the database
    val pushed = Jdbc.readTable(spark, url, plan, "EQ", "T", full.schema)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet

    assert(inSpark == pushed && inSpark.nonEmpty)
  }
}

/** The reference's headline feature end-to-end: the update gate reads the
  * source comment FROM THE DATABASE (wrds_update_pq, core.py:1028 via
  * get_table_comment, comments.py:21). Derby has no COMMENT ON, so the
  * dialect `commentSql` hook points at a comments table — exactly how the
  * postgres variant points at pg_description. */
class JdbcCommentGateSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftcomments;create=true"

  private def exec(sqls: String*): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      sqls.foreach(s => try st.execute(s) catch { case _: Exception => })
    } finally conn.close()
  }

  private val commentSql =
    "SELECT REMARK FROM CG.COMMENTS WHERE TBL = 'SRC'"

  test("comment read from the DB drives the update gate end-to-end") {
    exec(
      "CREATE SCHEMA CG",
      "DROP TABLE CG.SRC", "DROP TABLE CG.COMMENTS",
      "CREATE TABLE CG.SRC (ID BIGINT, V DOUBLE)",
      "CREATE TABLE CG.COMMENTS (TBL VARCHAR(32), REMARK VARCHAR(200))",
      "INSERT INTO CG.SRC VALUES (1, 1.5), (2, 2.5)",
      "INSERT INTO CG.COMMENTS VALUES ('SRC', 'Last modified: 05/01/2024 10:00:00')")

    assert(Jdbc.tableComment(url, "CG", "SRC", Some(commentSql))
      .contains("Last modified: 05/01/2024 10:00:00"))
    // Derby reports no REMARKS for tables — generic path returns None
    assert(Jdbc.tableComment(url, "CG", "SRC").isEmpty)

    val repo = PqRepo(spark, java.nio.file.Files
      .createTempDirectory("graft_cgate").toString)
    val sourceSchema = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "CG.SRC").load().schema

    // 1) repo empty → update taken, comment stamped into the metadata
    val first = Graft.dbUpdatePqFromDb(spark, url, "CG", "SRC", sourceSchema,
      repo, commentSql = Some(commentSql))
    assert(first.isDefined)
    assert(repo.lastModified("CG", "SRC")
      .contains("Last modified: 05/01/2024 10:00:00"))
    assert(repo.table("CG", "SRC").count() == 2)

    // 2) same DB comment → up to date → skipped
    assert(Graft.dbUpdatePqFromDb(spark, url, "CG", "SRC", sourceSchema,
      repo, commentSql = Some(commentSql)).isEmpty)

    // 3) newer DB comment → taken again
    exec("UPDATE CG.COMMENTS SET REMARK = 'Last modified: 06/01/2024 10:00:00'")
    assert(Graft.dbUpdatePqFromDb(spark, url, "CG", "SRC", sourceSchema,
      repo, commentSql = Some(commentSql)).isDefined)
    assert(repo.lastModified("CG", "SRC")
      .contains("Last modified: 06/01/2024 10:00:00"))

    // 4) no parseable comment → skipped unless forced
    exec("UPDATE CG.COMMENTS SET REMARK = 'no timestamp here'")
    assert(Graft.dbUpdatePqFromDb(spark, url, "CG", "SRC", sourceSchema,
      repo, commentSql = Some(commentSql)).isEmpty)
    assert(Graft.dbUpdatePqFromDb(spark, url, "CG", "SRC", sourceSchema,
      repo, commentSql = Some(commentSql), force = true).isDefined)
  }

  test("tableColumnsMeta surfaces numeric precision and scale") {
    exec(
      "CREATE SCHEMA CG",
      "DROP TABLE CG.NUMS",
      "CREATE TABLE CG.NUMS (A DECIMAL(12,2) NOT NULL, B INTEGER, C VARCHAR(7))")
    val meta = Jdbc.tableColumnsMeta(url, "CG", "NUMS")
    assert(meta.map(_.name) == Seq("A", "B", "C"))
    val a = meta.head
    assert(a.typeName.toUpperCase.contains("DECIMAL") &&
      a.precision.contains(12) && a.scale.contains(2) && !a.nullable)
    assert(meta(1).precision.contains(10) && meta(1).scale.contains(0))
    assert(meta(2).precision.contains(7) && meta(2).nullable)
  }
}

class AdaptiveFetchSpec extends org.scalatest.funsuite.AnyFunSuite {
  import org.apache.spark.sql.types._

  test("fetch size scales inversely with estimated row width, clamped") {
    val narrow = StructType(Seq(StructField("id", LongType)))
    val wide = StructType((1 to 400).map(i =>
      StructField(s"c$i", StringType)))
    val narrowFetch = Jdbc.adaptiveFetchSize(narrow)
    val wideFetch = Jdbc.adaptiveFetchSize(wide)
    assert(narrowFetch == 100000)          // clamped at max
    assert(wideFetch < narrowFetch)        // wide rows fetch fewer
    assert(wideFetch >= 100)               // never below min
    // a pathologically wide schema clamps at the floor
    val huge = StructType((1 to 100000).map(i => StructField(s"c$i", StringType)))
    assert(Jdbc.adaptiveFetchSize(huge) == 100)
  }
}

class JdbcPredicatesSpec extends SparkSpec {
  private val url = "jdbc:derby:memory:graftpreds;create=true"

  test("predicate-partitioned read fans out without a numeric stride column") {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("CREATE SCHEMA PR") catch { case _: Exception => }
      try st.execute("DROP TABLE PR.T") catch { case _: Exception => }
      st.execute("CREATE TABLE PR.T (NAME VARCHAR(20), VAL DOUBLE)")
      (1 to 90).foreach(i =>
        st.execute(s"INSERT INTO PR.T VALUES ('k${i % 9}_$i', ${i * 1.0})"))
    } finally conn.close()

    val sourceSchema = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "PR.T").load().schema
    // disjoint + covering predicates over a string key (no lower/upper bound)
    val preds = Seq(
      "NAME < 'k3'", "NAME >= 'k3' AND NAME < 'k6'", "NAME >= 'k6'")
    val df = graft.sources.Jdbc.readTablePredicates(spark, url,
      graft.plans.TablePlan(), "PR", "T", sourceSchema, preds)
    assert(df.rdd.getNumPartitions == 3)
    assert(df.count() == 90)
    assert(df.agg(org.apache.spark.sql.functions.sum("VAL")).head().getDouble(0)
      == (1 to 90).map(_.toDouble).sum)
  }
}

/** Skew-resistant partitioned ingest: quantile-probed predicates must
  * balance a mostly-deleted id range where the equal-width stride cannot. */
class JdbcSkewBalanceSpec extends SparkSpec {
  private val url = "jdbc:derby:memory:graftskew;create=true"

  test("quantile-cut predicates balance a skewed id distribution that the " +
    "equal-width stride piles onto one partition") {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("CREATE SCHEMA SK") catch { case _: Exception => }
      try st.execute("DROP TABLE SK.T") catch { case _: Exception => }
      st.execute("CREATE TABLE SK.T (ID BIGINT NOT NULL, V DOUBLE)")
      // the aged-table shape: a dense surviving block of low ids plus a
      // sparse tail of high ids (everything between was deleted)
      val ids = (1L to 900L) ++ (0L until 100L).map(i => 100000L + i * 1000L)
      ids.grouped(100).foreach { chunk =>
        st.execute("INSERT INTO SK.T VALUES " +
          chunk.map(i => s"($i, ${i * 0.5})").mkString(", "))
      }
    } finally conn.close()

    val sourceSchema = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "SK.T").load().schema

    def partCounts(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.rdd.mapPartitionsWithIndex { (i, it) =>
        Iterator((i, it.size.toLong))
      }.collect().sortBy(_._1).map(_._2).toSeq

    // equal-width stride over the id RANGE: the dense block lands in one
    // stripe — the straggler this operator exists to prevent
    val strided = Jdbc.readTable(spark, url, graft.plans.TablePlan(),
      "SK", "T", sourceSchema, partitionColumn = Some("ID"),
      lowerBound = Some(1L), upperBound = Some(199001L), numPartitions = 4)
    assert(partCounts(strided).max >= 900L)

    // quantile-cut predicates: every partition carries ~n/k
    val preds = Jdbc.skewBalancedPredicates(url, "SK", "T", "ID", 4)
    assert(preds.length == 4, preds.toString)
    val balanced = Jdbc.readTableSkewBalanced(spark, url,
      graft.plans.TablePlan(), "SK", "T", sourceSchema, "ID", 4)
    val counts = partCounts(balanced)
    assert(counts.length == 4)
    assert(counts.sum == 1000L)                   // disjoint + covering
    assert(counts.max <= 260L, counts.toString)   // ~250 each, no straggler
    assert(balanced.agg(org.apache.spark.sql.functions.sum("ID")).head().getLong(0)
      == ((1L to 900L) ++ (0L until 100L).map(i => 100000L + i * 1000L)).sum)
  }

  test("percentile_disc probe: PG-family dialects get the one-round-trip " +
    "SQL, Derby keeps the portable seek fallback") {
    assert(Jdbc.supportsPercentileDisc("jdbc:postgresql://h:5432/db"))
    assert(Jdbc.supportsPercentileDisc("jdbc:oracle:thin:@h:1521/db"))
    // T-SQL PERCENTILE_DISC is analytic-only (OVER required): the
    // aggregate-form probe would be a syntax error, so SQL Server must
    // take the portable seek path
    assert(!Jdbc.supportsPercentileDisc("jdbc:sqlserver://h;database=db"))
    assert(!Jdbc.supportsPercentileDisc("jdbc:derby:memory:x;create=true"))

    val sql = Jdbc.percentileProbeSql("SK", "T", "ID", 4)
    assert(sql ==
      "SELECT percentile_disc(0.25) WITHIN GROUP (ORDER BY \"ID\"), " +
        "percentile_disc(0.5) WITHIN GROUP (ORDER BY \"ID\"), " +
        "percentile_disc(0.75) WITHIN GROUP (ORDER BY \"ID\") " +
        "FROM \"SK\".\"T\" WHERE \"ID\" IS NOT NULL", sql)
    // one SELECT, k-1 aggregates, no OFFSET seeks anywhere
    assert(!sql.contains("OFFSET"))
  }

  test("degenerate cases: single partition and few distinct values") {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("CREATE SCHEMA SK") catch { case _: Exception => }
      try st.execute("DROP TABLE SK.U") catch { case _: Exception => }
      st.execute("CREATE TABLE SK.U (ID BIGINT)")
      st.execute("INSERT INTO SK.U VALUES " +
        (1 to 50).map(_ => "(7)").mkString(", "))
    } finally conn.close()
    assert(Jdbc.skewBalancedPredicates(url, "SK", "U", "ID", 1) == Seq("1=1"))
    // one distinct value: boundaries collapse, predicates stay disjoint
    val preds = Jdbc.skewBalancedPredicates(url, "SK", "U", "ID", 4)
    val sourceSchema = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "SK.U").load().schema
    val df = Jdbc.readTablePredicates(spark, url, graft.plans.TablePlan(),
      "SK", "U", sourceSchema, preds)
    assert(df.count() == 50L)
  }

  test("Graft.dbToPq(skewBalanced = true) lands the full table through " +
    "quantile-cut partitions") {
    // reuses SK.T from the balance test (ordered test execution within a
    // suite); re-create defensively in case it ran alone
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("CREATE SCHEMA SK") catch { case _: Exception => }
      try {
        st.execute("CREATE TABLE SK.T (ID BIGINT NOT NULL, V DOUBLE)")
        val ids = (1L to 900L) ++ (0L until 100L).map(i => 100000L + i * 1000L)
        ids.grouped(100).foreach { chunk =>
          st.execute("INSERT INTO SK.T VALUES " +
            chunk.map(i => s"($i, ${i * 0.5})").mkString(", "))
        }
      } catch { case _: Exception => () } // already there
    } finally conn.close()
    val sourceSchema = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "SK.T").load().schema
    val repoDir = java.nio.file.Files.createTempDirectory("skewrepo").toString
    val repo = PqRepo(spark, repoDir)
    graft.Graft.dbToPq(spark, url, "SK", "T", sourceSchema, repo,
      partitionColumn = Some("ID"), numPartitions = 4, skewBalanced = true)
    assert(repo.table("SK", "T").count() == 1000L)
  }
}

/** Comment WRITE parity (reference set_table_comment + the pq_to_pg stamp,
    update.py:220): stamped comment must feed the read gate end-to-end. */
class JdbcCommentWriteSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftcwrite;create=true"

  private def exec(sqls: String*): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      sqls.foreach(s => try st.execute(s) catch { case _: Exception => })
    } finally conn.close()
  }

  test("postgres COMMENT ON DDL renders with escaping; NULL clears") {
    assert(Jdbc.postgresSetCommentSql("s", "t", Some("it's new")) ==
      """COMMENT ON TABLE "s"."t" IS 'it''s new'""")
    assert(Jdbc.postgresSetCommentSql("s", "t", None) ==
      """COMMENT ON TABLE "s"."t" IS NULL""")
  }

  test("pqToDb stamps the repo comment on the destination; gate then skips") {
    exec(
      "CREATE SCHEMA CW",
      "DROP TABLE CW.COMMENTS",
      "CREATE TABLE CW.COMMENTS (TBL VARCHAR(32), REMARK VARCHAR(200))",
      "INSERT INTO CW.COMMENTS VALUES ('T', NULL)")

    val repo = PqRepo(spark, java.nio.file.Files
      .createTempDirectory("graft_cwrite").toString)
    import spark.implicits._
    repo.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "CW", "T",
      modified = Some("Last modified: 05/01/2024 10:00:00"))

    // dialect writeSql for Derby (no COMMENT ON): update the comments table
    def derbyWrite(c: Option[String]): Option[String] = Some(
      s"UPDATE CW.COMMENTS SET REMARK = ${c.map(v => s"'$v'").getOrElse("NULL")} WHERE TBL = 'T'")

    Graft.pqToDb(repo, url, "CW", "T", stampComment = true,
      commentWriteSql = derbyWrite)

    val readBack = Jdbc.tableComment(url, "CW", "T",
      Some("SELECT REMARK FROM CW.COMMENTS WHERE TBL = 'T'"))
    assert(readBack.contains("Last modified: 05/01/2024 10:00:00"))

    // destination got the rows AND the gate now sees itself as current
    val srcSchema = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "CW.T").load().schema
    assert(spark.read.format("jdbc").option("url", url)
      .option("dbtable", "CW.T").load().count() == 2)
    assert(Graft.dbUpdatePqFromDb(spark, url, "CW", "T", srcSchema, repo,
      commentSql = Some("SELECT REMARK FROM CW.COMMENTS WHERE TBL = 'T'")).isEmpty)
  }
}
