package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{ColumnFilter, Types}
import graft.sync.Modified

/** Property-based invariants for the pure planning/sync modules (raw
  * ScalaCheck generators; the scalatest bridge isn't on the classpath). */
class PropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    val params = org.scalacheck.Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(params, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(ga.flatMap(a => gb.map(b => (a, b))))(f.tupled)

  private def whenever(cond: Boolean)(f: => Unit): Unit = if (cond) f

  private val colName: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).map(_.take(12))
  private val colNames: Gen[List[String]] =
    Gen.nonEmptyListOf(colName).map(_.distinct)


  test("ColumnFilter.select preserves source order and is a sub-sequence") {
    forAll(colNames) { cols =>
      whenever(cols.nonEmpty) {
        val out = ColumnFilter.select(cols)
        assert(out == cols)
        // keeping a literal column keeps at least it (regex-quoted)
        val target = cols.head
        val kept = ColumnFilter.select(cols,
          keep = Seq(java.util.regex.Pattern.quote(target)))
        assert(kept.contains(target))
        assert(kept == cols.filter(kept.contains(_)), "order preserved")
      }
    }
  }

  test("ColumnFilter: drop is applied before keep") {
    forAll(colNames) { cols =>
      whenever(cols.length >= 2) {
        val (d, k) = (cols.head, cols.last)
        if (d != k) {
          val out = ColumnFilter.select(cols,
            keep = Seq(".*"),
            drop = Seq(java.util.regex.Pattern.quote(d)))
          assert(!out.contains(d) || cols.count(_.contains(d)) > 1)
        }
      }
    }
  }

  test("Types.normalize is idempotent") {
    val anyType = Gen.oneOf("int4", "bool", "varchar", "timestamp", "bytea",
      "double precision", "decimal(10,2)", "weird_type", "INT8", " text ")
    forAll(anyType) { t =>
      val once = Types.normalize(t)
      assert(Types.normalize(once) == once)
    }
  }

  test("csvField: PG COPY csv framing invariants hold for arbitrary strings") {
    val anyString = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(',', '"', '\n', '\t', ' ', '\\')))
      .map(_.mkString)
    forAll(anyString) { s =>
      val f = graft.sources.PgCopy.csvField(s)
      // strings are ALWAYS quoted (so empty string stays distinct from NULL)
      assert(f.startsWith("\"") && f.endsWith("\"") && f.length >= 2)
      // unescaping the body recovers the input exactly
      assert(f.substring(1, f.length - 1).replace("\"\"", "\"") == s)
      // every interior quote is doubled: stripping doubled pairs leaves none
      assert(!f.substring(1, f.length - 1).replace("\"\"", "").contains('"'))
    }
  }

  test("normalizeText: idempotent, and invariant under case/whitespace noise") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val ws = Gen.oneOf(" ", "  ", "\t", "\n")
    val word = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString.take(8))
    val messy = for {
      words <- Gen.nonEmptyListOf(word)
      sep <- ws
      pre <- ws; post <- ws
    } yield (words.mkString(" "), pre + words.mkString(sep).toUpperCase + post)

    val cases = {
      val params = org.scalacheck.Gen.Parameters.default
      var seed = org.scalacheck.rng.Seed(7L)
      (1 to 60).flatMap { _ =>
        val v = messy.apply(params, seed); seed = seed.next; v
      }
    }
    val df = cases.toDF("clean", "noisy")
      .select(
        graft.functions.TextFunctions.normalizeText(org.apache.spark.sql.functions.col("clean")).as("nc"),
        graft.functions.TextFunctions.normalizeText(org.apache.spark.sql.functions.col("noisy")).as("nn"))
      .withColumn("nn2",
        graft.functions.TextFunctions.normalizeText(org.apache.spark.sql.functions.col("nn")))
      .collect()
    df.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"'${r.getString(0)}' != '${r.getString(1)}'") // noise-invariant
      assert(r.getString(1) == r.getString(2))         // idempotent
    }
  }

  test("decodeWav: arbitrary byte garbage never throws, loops, or " +
    "reports impossible formats") {
    val bytes = Gen.choose(0, 300).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    // plain garbage
    forAll(bytes, n = 300) { payload =>
      graft.operators.Multimodal.decodeWav(payload).foreach {
        case (rate, ch, _, frames) =>
          assert(rate > 0 && ch > 0 && frames >= 0)
      }
    }
    // garbage wearing a RIFF/WAVE header — exercises the chunk walker
    forAll(bytes, n = 300) { tail =>
      val framed = "RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++
        "WAVE".getBytes ++ tail
      graft.operators.Multimodal.decodeWav(framed).foreach {
        case (rate, ch, _, frames) =>
          assert(rate > 0 && ch > 0 && frames >= 0)
      }
    }
  }

  test("Modified: formatted (Updated ...) dates always parse to that date") {
    val dates = for {
      y <- Gen.choose(1990, 2035)
      m <- Gen.choose(1, 12)
      d <- Gen.choose(1, 28)
    } yield java.time.LocalDate.of(y, m, d)
    forAll(dates) { d =>
      val info = Modified.info("pg", Some(s"table (Updated $d)"))
      assert(info.date.contains(d))
      // gate is a strict order on dates
      val next = Modified.info("pg", Some(s"table (Updated ${d.plusDays(1)})"))
      assert(Modified.updateAvailable(next, info))
      assert(!Modified.updateAvailable(info, next))
      assert(!Modified.updateAvailable(info, info))
    }
  }

  test("updateAvailable and isUpToDate are consistent") {
    val maybeComment = Gen.oneOf(
      Gen.const(None),
      Gen.const(Some("garbage")),
      Gen.choose(2000, 2030).map(y => Some(s"x (Updated $y-06-15)")))
    forAll(maybeComment, maybeComment) { (a, b) =>
      val src = Modified.info("src", a)
      val dst = Modified.info("dst", b)
      // can't be both up-to-date and update-available
      assert(!(Modified.updateAvailable(src, dst) && Modified.isUpToDate(src, dst)))
    }
  }
}
