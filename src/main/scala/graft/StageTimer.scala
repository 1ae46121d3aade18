package graft

/** Opt-in wall-clock instrumentation for an operator's INTERNAL actions —
  * the evidence tool behind scale-mover forensics (r19, verdict #1: the
  * dedup_minhash 100× record moved across rounds and nothing recorded
  * WHICH of its three actions moved). Disabled it is a no-op wrapper
  * (one atomic read — nothing in the hot path allocates or locks), so
  * operators can keep their stage marks permanently; the bench enables
  * it around a single diagnostic execution and folds the snapshot into
  * `bench_detail.json`.
  *
  * Times ACCUMULATE per stage name across calls between `enable()` and
  * `disable()` (an operator may checkpoint twice); `enable` clears the
  * previous snapshot. Not reentrant per stage name (a recursive timed
  * stage would double-count) — stage marks wrap leaf actions only. */
object StageTimer {

  private val enabled = new java.util.concurrent.atomic.AtomicBoolean(false)
  private val times =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  def enable(): Unit = { times.clear(); enabled.set(true) }

  /** Stop recording and return the accumulated (stage → seconds) map. */
  def disable(): Map[String, Double] = {
    enabled.set(false)
    val out = Map.newBuilder[String, Double]
    times.forEach((k, v) => out += (k -> v.doubleValue()))
    out.result()
  }

  /** Time `f` under `name` when enabled; pass-through otherwise. */
  def timed[T](name: String)(f: => T): T =
    if (!enabled.get()) f
    else {
      val t0 = System.nanoTime()
      try f
      finally times.merge(name, (System.nanoTime() - t0) / 1e9,
        (a, b) => java.lang.Double.valueOf(a + b))
    }
}
