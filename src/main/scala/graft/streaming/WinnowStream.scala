package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ingest near-dup gate: q173's incremental winnowing AS A
  * STREAM — the screen a continuous crawl/ingest pipeline runs before
  * admitting documents to a training corpus. Each micro-batch of
  * arriving documents is fingerprinted ONCE
  * ([[graft.operators.Dedup.winnowFp]], the q164 winnowing kernel),
  * probed against the accumulated corpus fingerprint index
  * (boilerplate-capped exactly like q173: a corpus fingerprint held by
  * more than 16 docs is navigation chrome, not content), and every
  * (new_doc, old_doc) pair sharing >= 4 fingerprints is flagged to
  * `outDir`. The batch's fingerprints then join the index — the corpus
  * is NEVER re-fingerprinted, and the df table is maintained by adding
  * the batch's counts, so per-batch cost is delta-sized (the q85/q113
  * steady-state ingest economics).
  *
  * The gate FLAGS, it does not drop: admission policy belongs to the
  * caller (a flagged doc may still be wanted — e.g. a new revision).
  * That also makes the stream an exact twin of batch q173: after
  * shipping the corpus as batch 1 and the delta as batch 2, batch 2's
  * flags equal q173's output row-for-row (StreamingSpec pins this),
  * because both probe a corpus-only index under the corpus-only df
  * cap.
  *
  * Store discipline (the GraphStream/cdcMaterialize pattern): `fp` is
  * the source of truth, `df` is derived; both localCheckpoint before
  * the overwrite so neither write reads the directory it replaces;
  * `df` is written FIRST so a fp store always implies a df store no
  * older than it — and if a torn write loses `df`, it is rebuilt from
  * `fp`. Re-delivered docs (at-least-once sources) are absorbed by an
  * anti-join on doc_id against the index, so a replayed batch flags
  * nothing and changes nothing; per-batch output dirs (`batch_N`,
  * overwrite mode) make the flag write itself idempotent under
  * replay.
  */
object WinnowStream {

  /** `docs`: a streaming DataFrame of (doc_id: Long, text: String).
    * Flags land in `$outDir/batch_<id>` as (new_doc, old_doc, shared)
    * parquet; the fingerprint index lives at `$storeDir/{fp,df}`.
    */
  def nearDupGateStream(docs: DataFrame, storeDir: String, outDir: String,
      ckptDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ss = batch.sparkSession
        import ss.implicits._
        val bfp = graft.operators.Dedup
          .winnowFp(batch.dropDuplicates("doc_id"))
          .localCheckpoint()
        // existence through the path's own filesystem (an hdfs:// or
        // s3:// store would always look absent to java.io.File)
        val fpPath = new org.apache.hadoop.fs.Path(s"$storeDir/fp")
        val dfPath = new org.apache.hadoop.fs.Path(s"$storeDir/df")
        val storeFs = fpPath.getFileSystem(ss.sparkContext.hadoopConfiguration)
        val (fp0, df0) =
          if (storeFs.exists(fpPath)) {
            val f = ss.read.parquet(s"$storeDir/fp")
            val d =
              if (storeFs.exists(dfPath)) ss.read.parquet(s"$storeDir/df")
              else f.groupBy($"h").agg(count(lit(1)).as("df"))
            (f, d)
          } else
            (Seq.empty[(Long, Long)].toDF("doc_id", "h"),
              Seq.empty[(Long, Long)].toDF("h", "df"))
        // at-least-once absorption: a doc already in the index is a
        // replay — it must neither re-flag nor double-count df
        val newFp = bfp.join(fp0.select($"doc_id").distinct(),
            Seq("doc_id"), "left_anti")
          .localCheckpoint()
        // the df cap is CORPUS-only (df0, pre-batch) — a delta batch
        // must not retroactively reclassify corpus fingerprints as
        // boilerplate (the q173 rule, mirrored in its oracle)
        val flags = newFp
          .join(fp0.join(df0.where($"df" <= 16).select($"h"), "h")
            .select($"doc_id".as("old_doc"), $"h"), "h")
          .groupBy($"doc_id".as("new_doc"), $"old_doc")
          .agg(count(lit(1)).as("shared"))
          .where($"shared" >= 4)
          .localCheckpoint()
        flags.write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
        val fp1 = fp0.union(newFp).localCheckpoint()
        val df1 = df0
          .union(newFp.groupBy($"h").agg(count(lit(1)).as("df")))
          .groupBy($"h").agg(sum($"df").as("df"))
          .localCheckpoint()
        df1.write.mode("overwrite").parquet(s"$storeDir/df")
        fp1.write.mode("overwrite").parquet(s"$storeDir/fp")
        graft.operators.Relational.releaseCkpt(bfp, newFp, flags, fp1, df1)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
