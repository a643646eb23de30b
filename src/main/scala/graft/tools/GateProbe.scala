package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level attribution of the streaming gates' PER-BATCH CONSTANT
  * (round-13 verdict task #3 follow-up / stretch #9): the
  * delta-dimension row measured a ~5-10 s per-batch floor that
  * dominates every delta below ~20k docs — before attacking it
  * (plan caching, fewer jobs), MEASURE where it goes, on the REAL
  * execution path: [[graft.streaming.WinnowStream]] exposes a
  * phase hook that this tool installs, then drives actual streaming
  * batches (a 200-doc delta and an all-replay batch) against a
  * corpus-sized store. A Spark listener counts driver-coordinated
  * jobs per batch; the gap between the query wall and the sum of
  * body phases is the streaming machinery itself (query start/stop,
  * source listing, checkpoint/offset-log writes).
  *
  * Usage: runMain graft.tools.GateProbe [sfDir] [workDir]
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val work = if (args.length > 1) args(1) else "/tmp/graft_gate_probe"
    // optional args(2): comma-separated section names (winnow, xover,
    // scrub) — default all
    val sections =
      if (args.length > 2) args(2).split(",").filter(_.nonEmpty).toSet
      else Set("winnow", "xover", "scrub", "wscrub")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking.blocking.shuffle", "true")
      .config("spark.local.dir", graft.Bench.localDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    FsUtil.rm(work)

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    val phases = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    graft.streaming.GatePhase.hook = (n, t) => phases.synchronized {
      phases += ((n, t)); ()
    }

    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    def runGate(): Double = time {
      graft.streaming.WinnowStream.nearDupGateStream(
        spark.readStream.schema("doc_id LONG, text STRING").parquet(s"$work/in"),
        s"$work/store", s"$work/out", s"$work/ckpt", compactEvery = 100)
        .awaitTermination()
    }._1
    def report(label: String, wall: Double): Unit = {
      val ph = phases.synchronized { val v = phases.toVector; phases.clear(); v }
      val body = ph.map(_._2).sum
      val lines = ph.map { case (n, t) => f"$n=$t%.2f" }.mkString(" ")
      println(f"[gate-probe] $label: wall=$wall%.2f s body=$body%.2f s " +
        f"machinery=${wall - body}%.2f s jobs=${jobs.getAndSet(0)} | $lines")
    }

    // the 200-doc delta: fresh ids over base content — the
    // delta-dimension row's smallest point, phase-attributed
    val delta = graft.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").orderBy($"doc_id").limit(200)
      .select(($"doc_id" + lit(900000000L)).as("doc_id"), $"text")
      .localCheckpoint()

    if (sections("winnow")) {
      // batch 0: the corpus (store build — not the measurement target,
      // but printed: it is the fold-cost upper bound for this store)
      graft.Tables.load(spark, dir, "documents")
        .select($"doc_id", $"text")
        .write.mode("overwrite").parquet(s"$work/in")
      jobs.set(0)
      report("corpus_batch", runGate())

      delta.write.mode("append").parquet(s"$work/in")
      jobs.set(0)
      report("delta_200", runGate())

      // all-replay: the same 200 docs again — every doc absorbed by the
      // docs-probe anti-join, zero new fingerprints; what remains is the
      // floor a no-op trigger pays
      delta.write.mode("append").parquet(s"$work/in")
      jobs.set(0)
      report("replay_200", runGate())

      // empty trigger: the stream restarts, finds no new files — pure
      // query start/stop + source listing, no batch body at all
      jobs.set(0)
      report("no_data", runGate())
    }

    // ---- the scrub gate (4 sub-tables, per-batch snapshot): the same
    // corpus/delta/replay protocol — run with the 8x fixture dir as
    // args(0) to expose any corpus term (ScaleAudit scrub_gate found
    // the delta batch NOT corpus-flat before the lazy-snapshot fix)
    if (sections("scrub")) {
      def runScrub(): Double = time {
        graft.streaming.SegScrubStream.scrubStream(
          spark.readStream
            .schema("doc_id LONG, source STRING, text STRING")
            .parquet(s"$work/sin"),
          s"$work/sstore", s"$work/sout", s"$work/sckpt", compactEvery = 100)
          .awaitTermination()
      }._1
      graft.Tables.load(spark, dir, "documents")
        .select($"doc_id", $"source", $"text")
        .write.mode("overwrite").parquet(s"$work/sin")
      val sdelta = graft.Tables.load(spark, dir, "documents")
        .select($"doc_id", $"source", $"text").orderBy($"doc_id").limit(200)
        .select(($"doc_id" + lit(900000000L)).as("doc_id"), $"source", $"text")
        .localCheckpoint()
      jobs.set(0)
      report("scrub_corpus", runScrub())
      sdelta.write.mode("append").parquet(s"$work/sin")
      jobs.set(0)
      report("scrub_delta_200", runScrub())
      sdelta.write.mode("append").parquet(s"$work/sin")
      jobs.set(0)
      report("scrub_replay_200", runScrub())
    }

    // ---- the winnowing scrub gate: same protocol (it shares the
    // srcstat design with the segment scrub, one level simpler)
    if (sections("wscrub")) {
      def runWScrub(): Double = time {
        graft.streaming.WinnowScrubStream.winnowScrubStream(
          spark.readStream
            .schema("doc_id LONG, source STRING, text STRING")
            .parquet(s"$work/win"),
          s"$work/wstore", s"$work/wout", s"$work/wckpt", compactEvery = 100)
          .awaitTermination()
      }._1
      graft.Tables.load(spark, dir, "documents")
        .select($"doc_id", $"source", $"text")
        .write.mode("overwrite").parquet(s"$work/win")
      val wdelta = graft.Tables.load(spark, dir, "documents")
        .select($"doc_id", $"source", $"text").orderBy($"doc_id").limit(200)
        .select(($"doc_id" + lit(900000000L)).as("doc_id"), $"source", $"text")
        .localCheckpoint()
      jobs.set(0)
      report("wscrub_corpus", runWScrub())
      wdelta.write.mode("append").parquet(s"$work/win")
      jobs.set(0)
      report("wscrub_delta_200", runWScrub())
    }

    // ---- the IN-vs-broadcast crossover, isolated -----------------------
    // The delta batch's flags phase dominates its wall. probeFlags makes
    // two prunedScan accesses whose key sets are the batch's DISTINCT
    // fingerprints; if that count sits under maxPushKeys, pruneByKeys
    // builds an IN filter with that many LITERALS — whose analyzer/
    // optimizer cost is pure driver time. Measure the df-sub-table scan
    // count() under forced IN at several literal counts vs the forced
    // broadcast semi-join over the same key frame.
    if (sections("xover") && !sections("winnow"))
      println("[gate-probe] xover needs the winnow section's store " +
        "(the tool wipes workDir at startup) - skipping")
    if (sections("xover") && sections("winnow")) locally {
      import graft.streaming.SegStore
      val dfp = graft.operators.Dedup.winnowFp(
        delta.withColumn("doc_id", $"doc_id" + lit(50000000L)))
      val hs = dfp.select($"h").distinct().localCheckpoint()
      val nH = hs.count()
      println(s"[gate-probe] delta_200 fingerprints: rows=${dfp.count()} distinct_h=$nH")
      val tbl = SegStore.readBucketed(spark, s"$work/store", "df").get
      for (k <- Seq(1000L, 4000L, 8000L, 16000L, nH)) {
        val keys = hs.limit(k.toInt).collect().map(_.getLong(0)).toIndexedSeq
        val (tIn, nIn) = time(tbl.where($"h".isin(keys: _*)).count())
        println(f"[gate-probe] IN k=$k%6d scan_count wall=$tIn%.2f s rows=$nIn")
      }
      val (tB, nB) = time(
        tbl.join(broadcast(hs.select($"h")), Seq("h"), "left_semi").count())
      println(f"[gate-probe] BROADCAST k=$nH%6d scan_count wall=$tB%.2f s rows=$nB")
      // the production path (pruneByKeys = one InSet node, not |k|
      // literals) over the same key frame — and its pushdown, verified
      val pruned = graft.streaming.SegStore.prunedScan(
        spark, s"$work/store", "df", "h", hs)
      val (tS, nS) = time(pruned.count())
      val plan = pruned.queryExecution.executedPlan.toString
      val pushed = plan.linesIterator.find(_.contains("PushedFilters"))
        .map(_.trim.take(160)).getOrElse("<none>")
      println(f"[gate-probe] INSET k=$nH%6d scan_count wall=$tS%.2f s rows=$nS")
      println(s"[gate-probe] INSET pushdown: $pushed")
      // isolate WHERE the InSet scan's wall goes: (a) planning — build
      // the executedPlan without running; (b) first execution; (c)
      // repeat execution (same Dataset: codegen+plan cached); (d) same
      // filter with parquet pushdown disabled (post-scan InSet only)
      locally {
        val p2 = graft.streaming.SegStore.prunedScan(
          spark, s"$work/store", "df", "h", hs)
        val (tPlan, _) = time(p2.queryExecution.executedPlan)
        val (tRun1, _) = time(p2.count())
        val (tRun2, _) = time(p2.count())
        spark.conf.set("spark.sql.parquet.filterPushdown", "false")
        val p3 = graft.streaming.SegStore.prunedScan(
          spark, s"$work/store", "df", "h", hs)
        val (tNoPush, _) = time(p3.count())
        spark.conf.set("spark.sql.parquet.filterPushdown", "true")
        println(f"[gate-probe] INSET split: plan=$tPlan%.2f s run1=$tRun1%.2f s " +
          f"run2=$tRun2%.2f s nopush_run=$tNoPush%.2f s")
      }
      // size-dependence and catalog-vs-raw-path: the same InSet filter
      // at 1k vs 12k keys, over the catalog table vs a raw parquet read
      // of the same files — plan build and two executions each
      locally {
        import org.apache.spark.sql.GraftBridge
        import org.apache.spark.sql.catalyst.expressions.InSet
        val allKeys = hs.collect().map(_.getLong(0))
        val raw = spark.read.parquet(
          graft.streaming.SegStore.bucketedLoc(s"$work/store", "df"))
        for (k <- Seq(1000, allKeys.length)) {
          val set: Set[Any] = allKeys.take(k).map(x => x: Any).toSet
          def f(t: org.apache.spark.sql.DataFrame) = t.where(GraftBridge.column(
            InSet(GraftBridge.expression(col("h")), set)))
          for ((lbl, t) <- Seq(("catalog", tbl), ("raw", raw))) {
            val d = f(t)
            val (tp, _) = time(d.queryExecution.executedPlan)
            val (t1, _) = time(d.count())
            val (t2, _) = time(d.count())
            println(f"[gate-probe] cell k=$k%6d src=$lbl%-7s plan=$tp%.2f " +
              f"run1=$t1%.2f run2=$t2%.2f")
          }
        }
      }
    }

    graft.streaming.GatePhase.hook = (_, _) => ()
    spark.stop()
  }
}
