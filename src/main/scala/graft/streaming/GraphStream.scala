package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming graph maintenance: the q113 base/delta ingest split AS A
  * STREAM. Each micro-batch of arriving customer–supplier pairs is
  * merged into the on-disk pair/degree store DELTA-SIZED (anti-join
  * for genuinely-new pairs, degree table updated by adding the new
  * pairs' endpoint counts — never a re-derivation of the base), and
  * the local-PPR snapshot is refreshed by forward-push
  * ([[graft.operators.GraphOps.forwardPush]], the q163 core) over the
  * accumulated graph — query cost bounded by pushed mass (ACL'06),
  * the right refresh primitive when the graph is large and the answer
  * is a seed neighborhood.
  *
  * Exactness: the merged store after batch N is the distinct pair
  * union of batches 1..N (order-independent), and the push runs the
  * same integer arithmetic as batch q163, so the final snapshot
  * equals batch q163 over the full graph EXACTLY — pinned in
  * StreamingSpec against the staged-fixture run. The foreachBatch
  * store discipline (localCheckpoint before overwrite, read-or-empty
  * bootstrap) is the cdcMaterialize pattern.
  */
object GraphStream {

  /** `pairs`: a streaming DataFrame of (c: Long, s: Long) rows.
    * Store layout: `$storeDir/pairs`, `$storeDir/degree`; the PPR
    * snapshot (node, est, res) overwrites `outDir` per batch.
    */
  def pprPushStream(pairs: DataFrame, storeDir: String, outDir: String,
      ckptDir: String): StreamingQuery =
    pairs.writeStream
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val ss = batch.sparkSession
        import ss.implicits._
        val up = batch.select($"c", $"s").distinct().localCheckpoint()
        // Existence must resolve through the path's OWN filesystem —
        // java.io.File sees only the local FS, so an hdfs:// or s3://
        // storeDir would always look absent and every batch would
        // silently restart from an empty store (round-9 ADVICE #2).
        val pairsPath = new org.apache.hadoop.fs.Path(s"$storeDir/pairs")
        val degPath = new org.apache.hadoop.fs.Path(s"$storeDir/degree")
        val storeFs = pairsPath
          .getFileSystem(ss.sparkContext.hadoopConfiguration)
        // Crash safety: degree is written BEFORE pairs below, so a
        // pairs store implies its degree store exists — but a crash
        // inside either non-atomic overwrite can still leave a torn
        // store, so degree is REBUILT from pairs when absent (it is
        // derived state; pairs is the source of truth).
        val (store0, deg0) =
          if (storeFs.exists(pairsPath)) {
            val p = ss.read.parquet(s"$storeDir/pairs")
            val d =
              if (storeFs.exists(degPath)) ss.read.parquet(s"$storeDir/degree")
              else graft.operators.BipartiteGraph.degreesOf(p)
            (p, d)
          } else
            (Seq.empty[(Long, Long)].toDF("c", "s"),
              Seq.empty[(Long, Long)].toDF("src", "degree"))
        // delta-sized: only pairs the store has never seen change any
        // degree; a re-delivered pair is a no-op (exactly-once effect
        // on the store under at-least-once delivery)
        val newPairs = up.join(store0, Seq("c", "s"), "left_anti")
          .localCheckpoint()
        val store1 = store0.union(newPairs).localCheckpoint()
        val deg1 = deg0
          .union(graft.operators.BipartiteGraph.degreesOf(newPairs))
          .groupBy($"src").agg(sum($"degree").as("degree"))
          .localCheckpoint()
        // localCheckpoint above materialized both BEFORE the overwrite,
        // so neither write reads the directory it replaces. Degree
        // first: the bootstrap probes pairs, so writing pairs last
        // means a crash between the two writes can never leave a pairs
        // store whose degree is from the previous batch.
        deg1.write.mode("overwrite").parquet(s"$storeDir/degree")
        store1.write.mode("overwrite").parquet(s"$storeDir/pairs")
        val snap = graft.operators.GraphOps
          .forwardPush(ss, store1, deg1, earlyExit = true)
        snap.write.mode("overwrite").parquet(outDir)
        // drop-on-write: the four per-batch checkpoints and the push
        // snapshot are on disk now — without the RDD-level release
        // their blocks accumulate across micro-batches for the life
        // of the stream (Dataset.unpersist never sees a local
        // checkpoint)
        graft.operators.Relational.releaseCkpt(up, newPairs, store1, deg1, snap)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
