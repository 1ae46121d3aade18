package graft

/** Continuous machine-load attribution for the bench (r19 verdict #1).
  *
  * The round's scale timings have twice been contradicted by quiet
  * endpoint calibration probes: a load excursion that arrives and leaves
  * INSIDE a timed section is invisible to a start/end pair, and wall
  * time alone cannot distinguish a 3× engine regression from a noisy
  * neighbor stealing the same 3× of CPU. This sampler makes the artifact
  * self-attributing: a daemon thread records, every `periodMs` and
  * additionally at every section/repetition boundary the bench marks,
  *
  *   - `/proc/stat` "cpu" line — whole-MACHINE busy and total jiffies,
  *   - `/proc/self/stat` utime+stime — THIS JVM's jiffies,
  *   - `/proc/loadavg` — the 1-minute run-queue average.
  *
  * For any window `[t0, t1]` the delta `machineBusy − self` is the CPU
  * time consumed by OTHER processes during that window — direct,
  * in-artifact proof (or refutation) of exogenous load, with none of the
  * endpoint-probe blindness: a mid-section burst lands in some 5 s
  * sample interval no matter where it falls. Everything here is
  * Linux-`/proc`-based and degrades to absent fields (−1 sentinels) on
  * platforms without it; the bench never fails because attribution is
  * unavailable.
  *
  * Pure parsing/attribution logic is factored out for the spec
  * ([[LoadSampler.parseProcStat]] etc.); only the thread and the file
  * reads live in the instance. */
object LoadSampler {

  /** One observation. `busyJiffies`/`totalJiffies` are whole-machine
    * (−1 when `/proc/stat` was unreadable); `selfJiffies` is this
    * process's utime+stime (−1 when unreadable); `load1` is the
    * 1-minute loadavg (−1 when unreadable). */
  final case class Sample(ns: Long, busyJiffies: Long, totalJiffies: Long,
      selfJiffies: Long, load1: Double)

  /** Attribution for a window: every `*CpuSec` is −1 when the boundary
    * samples lacked the corresponding counter. `otherCpuSec` is clamped
    * at 0 — jiffy granularity can make machine−self marginally negative
    * on an idle machine, and a negative "other processes used −0.02 s of
    * CPU" would only invite misreading. */
  final case class WindowStats(wallSec: Double, selfCpuSec: Double,
      machineCpuSec: Double, otherCpuSec: Double, otherCpuFrac: Double,
      load1Mean: Double, load1Max: Double, nSamples: Int) {
    def json: String =
      s"""{"wall_sec":${f(wallSec)},"self_cpu_sec":${f(selfCpuSec)},""" +
        s""""machine_cpu_sec":${f(machineCpuSec)},"other_cpu_sec":${f(otherCpuSec)},""" +
        s""""other_cpu_frac":${f(otherCpuFrac)},"load1_mean":${f(load1Mean)},""" +
        s""""load1_max":${f(load1Max)},"n_samples":$nSamples}"""
    private def f(v: Double): String =
      if (v.isNaN || v.isInfinite) "-1"
      else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
  }

  /** Parse the aggregate "cpu " line of `/proc/stat` →
    * (busy, total) jiffies. Total sums the first 8 fields
    * (user nice system idle iowait irq softirq steal) — guest time is
    * already included in user, so adding fields 9–10 would double-count;
    * busy = total − idle − iowait. */
  def parseProcStat(text: String): Option[(Long, Long)] =
    text.linesIterator.find(_.startsWith("cpu ")).flatMap { line =>
      val parts = line.trim.split("\\s+").drop(1)
      if (parts.length < 5) None
      else scala.util.Try {
        val v = parts.take(8).map(_.toLong)
        val total = v.sum
        val idle = v(3) + (if (v.length > 4) v(4) else 0L)
        (total - idle, total)
      }.toOption
    }

  /** Parse `/proc/self/stat` → utime+stime jiffies. The comm field
    * (field 2) may itself contain spaces and parens, so fields are
    * counted from the LAST ')': state is the next token, utime and
    * stime are tokens 11 and 12 after it (fields 14–15 of the file). */
  def parseSelfStat(text: String): Option[Long] = {
    val close = text.lastIndexOf(')')
    if (close < 0) None
    else {
      val rest = text.substring(close + 1).trim.split("\\s+")
      if (rest.length < 13) None
      else scala.util.Try(rest(11).toLong + rest(12).toLong).toOption
    }
  }

  /** Attribution over `[t0, t1]` from a time-ordered sample sequence.
    * Boundary counters come from the sample NEAREST each endpoint (the
    * bench marks every boundary with a synchronous sample, so in
    * practice these are exact); loadavg statistics cover every sample
    * inside the window plus those boundaries. */
  def window(samples: Seq[Sample], t0: Long, t1: Long, hz: Long,
      machineCpus: Int): WindowStats = {
    val wall = math.max(0L, t1 - t0) / 1e9
    if (samples.isEmpty || hz <= 0)
      return WindowStats(wall, -1, -1, -1, -1, -1, -1, 0)
    def nearest(t: Long): Sample = samples.minBy(s => math.abs(s.ns - t))
    val (a, b) = (nearest(t0), nearest(t1))
    val inWin = samples.filter(s => s.ns >= math.min(a.ns, t0) &&
      s.ns <= math.max(b.ns, t1))
    def delta(fa: Long, fb: Long): Double =
      if (fa < 0 || fb < 0 || b.ns <= a.ns) -1 else (fb - fa).toDouble / hz
    val self = delta(a.selfJiffies, b.selfJiffies)
    val machine = delta(a.busyJiffies, b.busyJiffies)
    val other =
      if (self < 0 || machine < 0) -1 else math.max(0.0, machine - self)
    val frac =
      if (other < 0 || wall <= 0 || machineCpus <= 0) -1
      else other / (machineCpus * wall)
    val loads = inWin.map(_.load1).filter(_ >= 0)
    WindowStats(wall, self, machine, other, frac,
      if (loads.isEmpty) -1 else loads.sum / loads.size,
      if (loads.isEmpty) -1 else loads.max,
      inWin.size)
  }
}

/** The live sampler: [[start]] launches a daemon thread sampling every
  * `periodMs`; [[mark]] takes an immediate boundary sample and returns
  * its timestamp; [[windowStats]] attributes any marked window. Jiffy
  * frequency comes from `getconf CLK_TCK` once (fallback 100 — the
  * universal Linux default). */
final class LoadSampler(periodMs: Long = 5000) {
  import LoadSampler._

  val hz: Long =
    try {
      val p = new ProcessBuilder("getconf", "CLK_TCK").start()
      val out = new String(p.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim
      p.waitFor()
      val v = out.toLong
      if (v > 0) v else 100L
    } catch { case _: Throwable => 100L }

  val machineCpus: Int = Runtime.getRuntime.availableProcessors

  private val samples =
    new java.util.concurrent.ConcurrentLinkedQueue[Sample]()

  private def readFile(p: String): Option[String] =
    try Some(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
      java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => None }

  /** Take one sample now (also called by the daemon loop). Returns the
    * sample's timestamp so callers can use it as a window boundary. */
  def mark(): Long = {
    val (busy, total) = readFile("/proc/stat")
      .flatMap(parseProcStat).getOrElse((-1L, -1L))
    val self = readFile("/proc/self/stat")
      .flatMap(parseSelfStat).getOrElse(-1L)
    val load1 = readFile("/proc/loadavg")
      .flatMap(t => scala.util.Try(
        t.trim.split("\\s+")(0).toDouble).toOption)
      .getOrElse(-1.0)
    val s = Sample(System.nanoTime(), busy, total, self, load1)
    samples.add(s)
    s.ns
  }

  @volatile private var running = false
  private val thread = new Thread(() => {
    while (running) {
      try Thread.sleep(periodMs) catch { case _: InterruptedException => () }
      if (running) mark()
    }
  }, "graft-load-sampler")
  thread.setDaemon(true)

  def start(): Unit = { running = true; mark(); thread.start() }
  def stop(): Unit = { running = false; thread.interrupt() }

  def windowStats(t0: Long, t1: Long): WindowStats = {
    import scala.jdk.CollectionConverters._
    window(samples.iterator().asScala.toSeq.sortBy(_.ns), t0, t1, hz,
      machineCpus)
  }
}
