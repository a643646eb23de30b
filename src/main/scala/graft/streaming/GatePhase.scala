package graft.streaming

/** Per-phase wall observer for the streaming gates' REAL batch bodies
  * — [[graft.tools.GateProbe]] installs a collector here so per-batch
  * cost is attributed on the actual execution path instead of a
  * mirrored copy that could drift (the round-14 device that found the
  * bucket-pruning-codegen pathology). Production cost is a few
  * nanoTime calls per batch.
  */
private[graft] object GatePhase {

  @volatile var hook: (String, Double) => Unit = (_, _) => ()

  def phased[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    hook(name, (System.nanoTime() - t0) / 1e9)
    r
  }
}
