package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench summary line contract: the round driver parses it from a
  * ~2000-char stdout tail that sbt's own success line (~65 chars) also
  * shares, so the WORST-case line over all 85 registered queries must stay
  * under 1925 chars (2000-char tail minus the ~72-char sbt success suffix) — the r4/r5 lines overflowed the tail and were never
  * parsed, which is why this is pinned by a spec and not a code comment.
  * Also pins the calibration plumbing: reference persistence and the
  * calib_bad marker. */
class BenchLineSpec extends AnyFunSuite {

  private def render(perQuery: Double, calib: (Double, Double)) =
    Bench.renderSummary(
      totalMedianSec = 999.9,
      setupSec = 999.9,
      minsByQuery = SparkEntry.queries.keys.toSeq.map(_ -> perQuery),
      vsDuckdb = 99.99,
      calib = calib,
      big = Some((9999.9, 99.99, 99.99)),
      big100Total = Some((99999.9, 99.99, 99.99)),
      sfName = "sf0.1",
      // worst case includes both per-query scale arrays at 99.99 s each
      // (4-digit centiseconds) over the full headline set
      bigPerQuery = Bench.headline.map(_ => 99.99),
      big100PerQuery = Bench.headline.map(_ => 99.99),
      // worst case: every headline row regressed in both sections — the
      // cap must hold the field to 4 names + the "+N" marker — with the
      // 20x post-section calib element present too
      regr = Right(Bench.headline.map(n => s"100x:$n" -> 99.9) ++
        Bench.headline.map(n => s"20x:$n" -> 99.9)),
      big20xCalib = Some(9.99),
      // r20: the per-section exogenous-load fractions ride the line too
      oload = Some((9.99, 9.99)))

  test("worst-case line fits the driver's stdout tail") {
    // every registered query at just under 10 s (integer centiseconds:
    // 3 chars) with every optional field present, including calib_bad.
    // The contract covers the per-query < 10 s regime — if EVERY query
    // regressed past 10 s (4-char values), the unparsed line would be
    // the least of the round's problems.
    val line = render(9.99, (9.99, 9.99))
    assert(line.length <= 1925, s"line is ${line.length} chars:\n$line")
    // typical steady state: sub-second values render in 1-2 chars
    val line2 = render(0.25, (1.0, 1.0))
    assert(line2.length <= 1860, s"line2 is ${line2.length} chars")
    assert(SparkEntry.queries.size >= 85, "worst case must cover the full registry")
  }

  test("line is valid JSON with the calib fields and aligned qn/qv arrays") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val parsed = JsonMethods.parse(render(0.25, (1.02, 1.07)))
    assert((parsed \ "calib") != JNothing)
    assert((parsed \ "calib_bad") == JNothing)
    assert((parsed \ "qunit") == JString("cs"))
    val bad = JsonMethods.parse(render(0.25, (1.0, 1.51)))
    assert((bad \ "calib_bad") == JBool(true))
    assert((parsed \ "qord") == JString("name"))
    // r20: per-section exogenous-load fractions render as a 2-array when
    // supplied, and the field is simply absent when no scale section ran
    (parsed \ "oload") match {
      case JArray(vs) => assert(vs.size == 2)
      case other      => fail(s"oload not a 2-array: $other")
    }
    assert((JsonMethods.parse(Bench.renderSummary(1.0, 1.0, Nil, -1.0,
      (1.0, 1.0), None, None, "sf0.1")) \ "oload") == JNothing)
    // scale sections carry a trailing nested per-query array (headline
    // order, centiseconds): big20x = [total, vs, [cs...]], b100 = [total,
    // vs, [cs...]] (calib slot absent when not supplied)
    (parsed \ "big20x") match {
      case JArray(elems) =>
        assert(elems.last match {
          case JArray(qs) =>
            qs.size == Bench.headline.size && qs.forall(_ == JInt(9999))
          case _ => false
        }, s"big20x per-query array malformed: $elems")
      case other => fail(s"big20x not an array: $other")
    }
    (parsed \ "b100") match {
      case JArray(elems) =>
        assert(elems.last match {
          case JArray(qs) => qs.size == Bench.headline.size
          case _          => false
        }, s"b100 per-query array malformed: $elems")
      case other => fail(s"b100 not an array: $other")
    }
    (parsed \ "qv") match {
      case JArray(values) =>
        assert(values.size == SparkEntry.queries.size)
        assert(values.forall(v => v == JInt(25)))
      case other => fail(s"qv not an array: $other")
    }
    // qv order is the sorted query names, independent of caller order:
    // distinct per-query values rendered from a REVERSED input must come
    // out name-sorted
    val names = SparkEntry.queries.keys.toSeq.sorted
    val byName = names.zipWithIndex.toMap
    val line = Bench.renderSummary(1.0, 1.0,
      names.reverse.map(n => n -> (byName(n) + 1) / 100.0),
      -1.0, (1.0, 1.0), None, None, "sf0.1")
    (JsonMethods.parse(line) \ "qv") match {
      case JArray(values) =>
        assert(values == names.indices.map(i => JInt(i + 1): JValue).toList)
      case other => fail(s"qv not an array: $other")
    }
  }

  test("scale regressions: thresholds, sentinels, cap, markers") {
    val ref = Map("a" -> 1.0, "b" -> 2.0, "c" -> 0.2, "d" -> 4.0)
    val cur = Seq(
      "a" -> (9.0, 2.0),   // 2.0x AND +1.0 s -> flagged
      "b" -> (9.0, 2.4),   // 1.2x -> quiet (ratio under threshold)
      "c" -> (9.0, 0.35),  // 1.75x but +0.15 s -> quiet (absolute floor)
      "d" -> (9.0, -1.0),  // failed sentinel -> flagged as fail (-1)
      "e" -> (9.0, 9.0))   // not in ref (new headline row) -> skipped
    val flagged = Bench.scaleRegressions(ref, cur, "20x")
    // regression-to-failure surfaces in the field itself (r17 advice),
    // sorted ahead of ratio movers
    assert(flagged == Seq("20x:d" -> -1.0, "20x:a" -> 2.0))
    // worst-first ordering across many movers
    val many = Seq("a" -> (9.0, 4.0), "b" -> (9.0, 16.0))
    assert(Bench.scaleRegressions(ref, many, "100x").map(_._1) ==
      Seq("100x:b", "100x:a"))
    // calib normalization (r18): the same raw 2x move reads quiet when
    // the reference was recorded on a 2x-faster machine window
    // (loadAdjust = refCalib/curCalib = 0.5), and a quiet raw ratio
    // flags when the reference window was 2x SLOWER
    assert(Bench.scaleRegressions(ref, Seq("a" -> (9.0, 2.0)), "20x",
      loadAdjust = 0.5).isEmpty)
    assert(Bench.scaleRegressions(ref, Seq("a" -> (9.0, 1.2)), "20x",
      loadAdjust = 2.0) == Seq("20x:a" -> 2.4))
    // the adjust factor is clamped to [0.5, 2] so a corrupt calib cannot
    // hide an arbitrary regression
    assert(Bench.scaleRegressions(ref, Seq("a" -> (9.0, 8.0)), "20x",
      loadAdjust = 0.01) == Seq("20x:a" -> 4.0))
    // summary-line rendering: quiet round -> empty array; movers -> capped
    // at 4 names with a "+N" marker; fails render ":fail"; distinct skip
    // markers pass through verbatim
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    def regrOf(r: Either[String, Seq[(String, Double)]]): JValue =
      JsonMethods.parse(Bench.renderSummary(1.0, 1.0, Nil, -1.0, (1.0, 1.0),
        None, None, "sf0.1", regr = r)) \ "regr"
    assert(regrOf(Right(Nil)) == JArray(Nil))
    assert(regrOf(Left("no-ref")) == JString("no-ref"))
    assert(regrOf(Left("bad-ref")) == JString("bad-ref"))
    assert(regrOf(Left("no-scale")) == JString("no-scale"))
    assert(regrOf(Right(Seq("20x:d" -> -1.0))) ==
      JArray(List(JString("20x:d:fail"))))
    val six = (1 to 6).map(i => s"20x:q$i" -> (10.0 - i))
    regrOf(Right(six)) match {
      case JArray(vs) =>
        assert(vs.size == 5 && vs.last == JString("+2"))
        assert(vs.head == JString("20x:q1:9.0"))
      case other => fail(s"regr not an array: $other")
    }
  }

  test("scale reference file round-trips, distinct absence/corrupt markers") {
    val dir = java.nio.file.Files.createTempDirectory("scaleref")
    val p = dir.resolve("SCALE_REF.json")
    java.nio.file.Files.write(p,
      ("""{"round":"r16","big20x":{"a":1.5,"b":2},"big100x":{"a":3.25},""" +
        """"calib":{"big20x":0.74,"big100x":1.13}}""").getBytes("UTF-8"))
    val ref = Bench.readScaleRef(p.toString)
    assert(ref.exists(_.sections.get("big20x")
      .contains(Map("a" -> 1.5, "b" -> 2.0))))
    assert(ref.exists(_.sections.get("big100x").contains(Map("a" -> 3.25))))
    assert(ref.exists(_.calib == Map("big20x" -> 0.74, "big100x" -> 1.13)))
    // pre-r20 reference without a cpu section parses with empty cpu
    assert(ref.exists(_.cpu.isEmpty))
    // r20 cpu floors parse per section — and "cpu" must NOT leak into
    // `sections` as a phantom scale section (the collect excludes it by
    // name, like "calib")
    java.nio.file.Files.write(p,
      ("""{"round":"r20","big20x":{"a":1.5},""" +
        """"cpu":{"big20x":{"a":8.25},"big100x":{"a":40}},""" +
        """"calib":{"big20x":1.0}}""").getBytes("UTF-8"))
    val withCpu = Bench.readScaleRef(p.toString)
    assert(withCpu.exists(_.cpu == Map(
      "big20x" -> Map("a" -> 8.25), "big100x" -> Map("a" -> 40.0))))
    assert(withCpu.exists(_.sections.keySet == Set("big20x")))
    // pre-r18 reference without a calib section parses with empty calib
    java.nio.file.Files.write(p,
      """{"round":"r16","big20x":{"a":1.5}}""".getBytes("UTF-8"))
    assert(Bench.readScaleRef(p.toString).exists(_.calib.isEmpty))
    // distinct markers: absent file vs present-but-corrupt (r17 advice —
    // a malformed regeneration must not read as "no reference committed")
    assert(Bench.readScaleRef(dir.resolve("missing.json").toString) ==
      Left("no-ref"))
    java.nio.file.Files.write(p, "{not json".getBytes("UTF-8"))
    assert(Bench.readScaleRef(p.toString) == Left("bad-ref"))
    // the committed repo reference parses and covers the full headline set
    // in both sections — a missing name would silently exempt that row
    // from the regression check
    val committed = Bench.readScaleRef("SCALE_REF.json")
    assert(committed.isRight, "SCALE_REF.json must parse")
    for (section <- Seq("big20x", "big100x"); ref2 <- committed.toSeq) {
      val missing = Bench.headline.filterNot(
        n => ref2.sections.getOrElse(section, Map.empty).contains(n))
      assert(missing.isEmpty,
        s"$section missing headline rows: ${missing.mkString(", ")}")
    }
  }

  test("calibration reference persists and is reused") {
    val tmp = java.nio.file.Files.createTempDirectory("calib").toString + "/CALIB.json"
    // first call: no file — measured value becomes the reference
    assert(Bench.calibReference(tmp, 32, 0.84) == 0.84)
    // second call: file exists — the committed reference wins
    assert(Bench.calibReference(tmp, 32, 1.91) == 0.84)
    // a new thread count seeds its own key WITHOUT destroying the
    // committed reference for other counts — a dev-box run at the default
    // thread count must never silently re-baseline the official 32-thread
    // gate
    assert(Bench.calibReference(tmp, 16, 1.5) == 1.5)
    assert(Bench.calibReference(tmp, 32, 2.7) == 0.84)
    assert(Bench.calibReference(tmp, 16, 2.7) == 1.5)
  }

  test("calibration kernel returns a positive wall time") {
    val s = Bench.calibrate(2)
    assert(s > 0.0 && s < 60.0, s.toString)
  }
}
