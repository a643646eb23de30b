package graft.tools

/** The two tiny local-FS helpers every measurement tool was inlining
  * (review finding, round 14: eight copies of `rm`, five of the
  * byte-walker). Local-filesystem only — the production store paths
  * go through Hadoop `FileSystem` in [[graft.streaming.SegStore]].
  */
object FsUtil {

  /** Recursively delete `path` (no-op when absent). */
  def rm(path: String): Unit = {
    def go(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(go))
      f.delete(); ()
    }
    go(new java.io.File(path))
  }

  /** Total bytes under `path` (0 when absent). */
  def dirBytes(path: String): Long = {
    def go(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(go).sum).getOrElse(0L)
      else f.length()
    go(new java.io.File(
      if (path.startsWith("file:")) new java.net.URI(path).getPath else path))
  }
}
