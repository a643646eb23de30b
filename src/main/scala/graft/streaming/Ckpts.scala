package graft.streaming

import org.apache.spark.sql.DataFrame

/** Batch-scoped registry of `localCheckpoint`ed frames — the gates'
  * leak-proof release discipline (round-15 ADVICE #1).
  *
  * The gates release their per-batch checkpoints on the success path,
  * but any frame whose release ran only AFTER later batch work leaked
  * its blocks on every failed/replayed batch attempt — the exact leak
  * class the round-15 probe-checkpoint fixes closed for the async
  * probes. Instead of chasing each frame's failure path individually,
  * a gate registers every batch-scoped checkpoint here as it creates
  * it and calls [[releaseAll]] in ONE `finally` around the batch body:
  * success and failure paths release the same set.
  *
  * [[graft.operators.Relational.releaseCkpt]] is an idempotent
  * RDD-level unpersist, so frames the gate also releases EARLY (to
  * bound peak memory inside the batch) are safely released again by
  * the final sweep. Thread-safe: async probe work may register from a
  * pool thread.
  */
private[streaming] final class Ckpts {
  private val dfs = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** `localCheckpoint` `df` (eager) and register the result. */
  def apply(df: DataFrame): DataFrame = add(df.localCheckpoint())

  /** Register an already-checkpointed frame; returns it unchanged. */
  def add(df: DataFrame): DataFrame = synchronized { dfs += df; df }

  /** Release every registered checkpoint's blocks. Never throws — the
    * sweep runs on failure paths where a release error must not mask
    * the batch's original exception.
    */
  def releaseAll(): Unit = synchronized {
    dfs.foreach { d =>
      try graft.operators.Relational.releaseCkpt(d)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    dfs.clear()
  }
}
