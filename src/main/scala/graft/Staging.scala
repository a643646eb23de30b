package graft

import java.nio.file.{Files, Path}

/** Per-JVM staging directories for derived on-disk artifacts (the
  * date-partitioned events copy q99 prunes against, q113's base
  * pair-graph index) — the in-JVM stand-in for the staged tables a
  * production catalog would track.
  *
  * Keyed on a logical name + dataset fingerprint
  * ([[Tables.fingerprint]]): a re-request with the SAME fingerprint
  * returns the existing dir (build once per JVM), while a NEW
  * fingerprint for the same logical key rebuilds and deletes the
  * superseded dir immediately — staging never outlives the data it
  * was derived from. One shutdown hook sweeps whatever is still live
  * at JVM exit.
  */
object Staging {
  private final case class Entry(fingerprint: String, path: Path)
  private val entries =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  private val hook = new java.util.concurrent.atomic.AtomicBoolean(false)
  private def ensureHook(): Unit =
    if (hook.compareAndSet(false, true))
      sys.addShutdownHook(entries.values.forEach(e => delete(e.path)))

  private def delete(p: Path): Unit = if (Files.exists(p)) {
    val walk = Files.walk(p)
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    } finally walk.close()
  }

  /** Return the staged dir for (key, fingerprint), running `build`
    * into a fresh temp dir on first request or fingerprint change.
    * Atomic per key (ConcurrentHashMap.compute), so concurrent
    * requests build once.
    */
  def stage(key: String, fingerprint: String)(build: String => Unit): String = {
    ensureHook()
    entries.compute(key, (_, old) => {
      if (old != null && old.fingerprint == fingerprint) old
      else {
        if (old != null) delete(old.path)
        val d = Files.createTempDirectory(s"graft_stage_")
        build(d.toString)
        Entry(fingerprint, d)
      }
    }).path.toString
  }

  /** Test seam: number of live staged dirs. */
  private[graft] def liveCount: Int = entries.size()
}
