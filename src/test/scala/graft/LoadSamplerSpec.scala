package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's load-attribution channel (r19 verdict #1): /proc parsing
  * and window arithmetic are pure functions pinned here; the live
  * sampler is exercised end-to-end on the build machine (Linux), where
  * a real window must attribute this very test's CPU burn to SELF, not
  * to "other processes". */
class LoadSamplerSpec extends AnyFunSuite {
  import LoadSampler._

  test("parseProcStat: busy/total from the aggregate cpu line") {
    val text =
      """cpu  100 20 50 800 30 5 5 10 7 3
        |cpu0 50 10 25 400 15 2 2 5 3 1
        |intr 12345""".stripMargin
    // total = first 8 fields (guest time is inside user already):
    // 100+20+50+800+30+5+5+10 = 1020; busy = total - idle - iowait
    assert(parseProcStat(text).contains((1020L - 800L - 30L, 1020L)))
    assert(parseProcStat("intr 5\nctxt 9") == None)
    assert(parseProcStat("cpu  nonsense words") == None)
  }

  test("parseSelfStat: utime+stime counted from the LAST close-paren") {
    // comm with spaces and a paren inside — fields must come from the
    // final ')' (the kernel's own documented parsing hazard)
    val text = "4242 (java) S 1 4242 4242 0 -1 4194560 " +
      "1000 0 0 0 777 223 0 0 20 0 64 0 100 1 2 3"
    assert(parseSelfStat(text).contains(1000L)) // 777 + 223
    val nasty = "7 (a (weird) name) R 1 7 7 0 -1 0 " +
      "0 0 0 0 11 22 0 0 20 0 1 0 5 1 2 3"
    assert(parseSelfStat(nasty).contains(33L))
    assert(parseSelfStat("no parens here") == None)
  }

  test("window: other-process CPU = machine busy minus self, per window") {
    val hz = 100L
    val s0 = Sample(0L, busyJiffies = 1000, totalJiffies = 5000,
      selfJiffies = 400, load1 = 1.0)
    val s1 = Sample(5_000_000_000L, busyJiffies = 1400, totalJiffies = 6000,
      selfJiffies = 500, load1 = 9.0)
    val s2 = Sample(10_000_000_000L, busyJiffies = 1800, totalJiffies = 7000,
      selfJiffies = 800, load1 = 2.0)
    val w = window(Seq(s0, s1, s2), 0L, 10_000_000_000L, hz, machineCpus = 4)
    assert(w.wallSec == 10.0)
    assert(w.selfCpuSec == 4.0)    // (800-400)/100
    assert(w.machineCpuSec == 8.0) // (1800-1000)/100
    assert(w.otherCpuSec == 4.0)   // neighbors burned 4 CPU-sec
    assert(w.otherCpuFrac == 0.1)  // 4 / (4 cpus * 10 s)
    // the mid-window burst is visible in the loadavg stats even though
    // both endpoints look quiet — the endpoint-calib blindness this
    // sampler exists to fix
    assert(w.load1Max == 9.0)
    assert(w.nSamples == 3)
    // sub-window picks the nearest boundary samples
    val w2 = window(Seq(s0, s1, s2), 4_900_000_000L, 10_100_000_000L, hz, 4)
    assert(w2.selfCpuSec == 3.0 && w2.otherCpuSec == 1.0)
  }

  test("window: missing counters degrade to -1 sentinels, never throw") {
    val s0 = Sample(0L, -1, -1, -1, -1)
    val s1 = Sample(1_000_000_000L, -1, -1, -1, -1)
    val w = window(Seq(s0, s1), 0L, 1_000_000_000L, 100L, 4)
    assert(w.selfCpuSec == -1 && w.machineCpuSec == -1 &&
      w.otherCpuSec == -1 && w.otherCpuFrac == -1 && w.load1Mean == -1)
    assert(window(Nil, 0L, 1L, 100L, 4).nSamples == 0)
    // jiffy-granularity machine<self never reports negative other-CPU
    val a = Sample(0L, 100, 1000, 98, 0.5)
    val b = Sample(1_000_000_000L, 150, 1100, 155, 0.5)
    assert(window(Seq(a, b), 0L, 1_000_000_000L, 100L, 4).otherCpuSec == 0.0)
  }

  test("window json renders finite 3-decimal values and sentinels") {
    val w = WindowStats(1.23456, 0.5, 1.0, 0.5, 0.125, 1.5, 2.0, 3)
    val j = w.json
    assert(j.contains("\"wall_sec\":1.235") &&
      j.contains("\"other_cpu_frac\":0.125") && j.contains("\"n_samples\":3"))
    import org.json4s.jackson.JsonMethods
    assert(JsonMethods.parse(j) != org.json4s.JNothing)
    val bad = WindowStats(Double.NaN, -1, -1, -1, -1, -1, -1, 0).json
    assert(bad.contains("\"wall_sec\":-1"))
    assert(JsonMethods.parse(bad) != org.json4s.JNothing)
  }

  test("live sampler on this machine attributes a CPU burn to self") {
    assume(new java.io.File("/proc/stat").exists())
    val s = new LoadSampler(periodMs = 200)
    s.start()
    try {
      val t0 = s.mark()
      // burn ~0.5 s of CPU in this process
      val stop = System.nanoTime() + 500_000_000L
      var x = 1L
      while (System.nanoTime() < stop) { x = x * 6364136223846793005L + 1442695040888963407L }
      assert(x != 0) // keep the loop observable
      val t1 = s.mark()
      val w = s.windowStats(t0, t1)
      assert(w.wallSec > 0.3)
      // self CPU must register (jiffy granularity: allow a loose floor)
      assert(w.selfCpuSec >= 0.2, w.toString)
      assert(w.nSamples >= 2)
      assert(s.hz > 0 && s.machineCpus > 0)
    } finally s.stop()
  }
}
