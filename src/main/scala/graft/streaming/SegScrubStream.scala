package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming boilerplate-segment scrub: q191's cross-grid segment
  * dedup AS A STREAM — what the fingerprint family got with
  * [[WinnowStream]], for the segment-scrub family. Each micro-batch
  * of arriving documents is cut into the two 10-word grids ONCE
  * ([[graft.operators.Dedup.crossSegOcc]], the exact lambda batch
  * q191 runs — one derivation site, no drifting copy) and the
  * per-(segment, doc) occurrence rows join the accumulated store;
  * the per-source retention readout
  * ([[graft.operators.Dedup.crossSegReadout]]) is refreshed over the
  * post-batch store and overwrites `outDir` — after the final batch it
  * is row-equal to batch q191 over everything shipped (StreamingSpec
  * pins this), because both fold the SAME occurrence rows under the
  * SAME df >= 3 rule.
  *
  * Store economics: occurrence rows are append-only facts (a doc's
  * segments never change), so the [[SegStore]] log appends ONLY the
  * batch's new-doc rows per trigger — never a rewrite of the
  * accumulated store — and folds into a base segment every
  * `compactEvery` batches. Re-delivered docs (at-least-once sources)
  * are absorbed by the doc_id anti-join, so a replayed doc changes
  * nothing; the readout + delta land before the segment's commit
  * marker, so a crash anywhere replays the batch against the
  * unchanged committed view and an existing marker makes the replay a
  * no-op.
  *
  * Unlike WinnowStream's corpus-only df cap (q173's rule: a delta
  * must not retroactively reclassify corpus fingerprints), the
  * boilerplate rule here is df >= 3 over EVERYTHING SEEN SO FAR
  * including the current batch — a batch that delivers the 3rd copy
  * of a segment makes all three docs' segments boilerplate, exactly
  * as batch q191 would; that is what keeps the snapshot equal to the
  * batch query at every prefix of the stream.
  */
object SegScrubStream {

  /** `docs`: a streaming DataFrame of (doc_id: Long, source: String,
    * text: String). Store: a [[SegStore]] log at `storeDir` with the
    * per-segment sub-table `occ` (seg, doc_id, source, occ0, occ1);
    * the q191-shaped readout overwrites `outDir` per batch.
    */
  def scrubStream(docs: DataFrame, storeDir: String, outDir: String,
      ckptDir: String, compactEvery: Int = 8): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ss = batch.sparkSession
        import ss.implicits._
        if (!SegStore.isApplied(ss, storeDir, batchId)) {
          val occ0 = readOcc(ss, storeDir)
          val newOcc = graft.operators.Dedup
            .crossSegOcc(batch.dropDuplicates("doc_id"))
            .join(occ0.select($"doc_id").distinct(), Seq("doc_id"), "left_anti")
            .select($"seg", $"doc_id", $"source", $"occ0", $"occ1")
            .localCheckpoint()
          val base = SegStore.active(ss, storeDir).size >= compactEvery
          val seg = SegStore.segPath(storeDir, batchId, base)
          (if (base) occ0.union(newOcc) else newOcc)
            .write.mode("overwrite").parquet(s"$seg/occ")
          // post-batch snapshot: the readout batch q191 would produce
          // over everything shipped so far
          val occAll = occ0.union(newOcc).localCheckpoint()
          graft.operators.Dedup.crossSegReadout(occAll)
            .write.mode("overwrite").parquet(outDir)
          SegStore.commit(ss, storeDir, batchId, base)
          graft.operators.Relational.releaseCkpt(newOcc, occAll)
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** The accumulated occurrence table (union of active segments; rows
    * are per-(seg, doc) distinct by the anti-join discipline). Empty
    * when no segment has committed yet.
    */
  def readOcc(ss: SparkSession, storeDir: String): DataFrame = {
    import ss.implicits._
    SegStore.read(ss, storeDir, "occ").getOrElse(
      Seq.empty[(String, Long, String, Long, Long)]
        .toDF("seg", "doc_id", "source", "occ0", "occ1"))
  }
}
