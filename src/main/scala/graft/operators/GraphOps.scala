package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables

/** Graph-traversal shapes over the derived customer–supplier graph
  * (the q104/q113 bipartite node encoding: customers at `2k`,
  * suppliers at `2k+1` — see `Analytics.q104_pagerank`): the curation
  * use-case is "distance to a trusted seed set" (seed-expansion /
  * trust-propagation over a citation or co-occurrence graph), the
  * graph twin of q66's held-out-overlap decontamination.
  *
  * Reference scope: the reference engine delegates all query work to
  * Postgres (reference `postgres_media.py:81`'s canned-query
  * pattern); graph reachability generalizes its relational surface
  * the same way q104 does, so the same oracle discipline applies —
  * integer-only arithmetic, a recursive-CTE DuckDB twin.
  */
/** THE single derivation site for the derived customer–supplier
  * bipartite graph (customers at `2k`, suppliers at `2k+1`): the pair
  * index is the distinct (c, s) projection of lineitem⋈orders, the
  * degree table its endpoint counts, the edge list its symmetric
  * union. Three consumers, one formula:
  *
  *  - `graph(fromScratch = true)` — q104's full recompute: derives
  *    inline, paying the lineitem×orders join + distinct every time.
  *    That cost IS the point: q104 is the baseline q113's
  *    incremental path is measured against, so the baseline/derived
  *    relationship is structural (same formula, different flag), not
  *    copy-discipline across three hand-maintained copies.
  *  - `graph(fromScratch = false)` — the fingerprint-staged parquet
  *    artifact ([[graft.Staging]], the q99/q113 economics) that every
  *    traversal query (q134 BFS, q145 PPR, q156 LP) starts from: a
  *    steady-state pipeline holds the pair index next to the data
  *    instead of re-paying the derivation per traversal.
  *  - `pairs(ordersFilter = ...)` — q113's base/delta split: the same
  *    formula over a filtered order set.
  */
object BipartiteGraph {
  import org.apache.spark.sql.{Column, DataFrame, SparkSession}

  /** Distinct (c, s) pair index, optionally over a filtered order set. */
  def pairs(spark: SparkSession, dir: String,
      ordersFilter: Option[Column] = None): DataFrame = {
    import spark.implicits._
    val ord0 = Tables.load(spark, dir, "orders")
      .select($"o_orderkey", $"o_custkey")
    val ord = ordersFilter.map(ord0.where).getOrElse(ord0)
    Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_suppkey")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .select(($"o_custkey" * 2).as("c"), ($"l_suppkey" * 2 + 1).as("s"))
      .distinct()
  }

  /** The PPR seed pattern (customers with custkey % 10 == 0) — ONE
    * site shared by the batch push (q163), the exact streaming gate,
    * and the approximate gate's new-seed detection (a node entering
    * the graph that matches this pattern changes the global seed mass
    * Total/nS, which no local residual correction can absorb).
    */
  def isPprSeed(node: Column): Column =
    // node even AND (node DIV 2) % 10 == 0 ⟺ node % 20 == 0 for the
    // non-negative node encoding (customers at 2k)
    node % 20 === 0

  /** Endpoint-count degree table of a pair index. */
  def degreesOf(cs: DataFrame): DataFrame =
    cs.select(col("c").as("src")).union(cs.select(col("s").as("src")))
      .groupBy(col("src")).agg(count(lit(1)).as("degree"))

  /** Symmetric (src, dst) edge list of a pair index. */
  def edgesOf(cs: DataFrame): DataFrame =
    cs.select(col("c").as("src"), col("s").as("dst"))
      .union(cs.select(col("s").as("src"), col("c").as("dst")))

  /** Fan a small-on-disk edge list back out to the session's shuffle
    * width before persisting it as a loop's big side. The staged pair
    * artifact is a few MB, so a parquet scan yields O(1) splits (and
    * AQE coalesces a distinct's output the same way) — every
    * traversal round's map-side work (join probe + partial aggregate
    * over the edge-sized contribution stream) would otherwise run on
    * 1–2 tasks regardless of cluster width. The width is passed
    * EXPLICITLY because AQE is free to coalesce a bare
    * `repartition(col)` right back down; hash-on-src keeps any
    * src-keyed shuffle reusable. Costs one edge-sized exchange at
    * build time, amortized over every round that reads the cache
    * (measured at sf0.1: q163 rounds 1.0 s → ~0.35 s each).
    */
  def fanOut(spark: SparkSession, edges: DataFrame,
      key: String = "src"): DataFrame =
    edges.repartition(spark.sessionState.conf.numShufflePartitions, col(key))

  /** (pairs, degree): derived inline (`fromScratch = true`, the q104
    * baseline; both persisted — the caches are the full-recompute
    * economics q104 documents) or read from the fingerprint-staged
    * artifact (`fromScratch = false`, every traversal query).
    */
  def graph(spark: SparkSession, dir: String,
      fromScratch: Boolean): (DataFrame, DataFrame) =
    if (fromScratch) {
      val cs = pairs(spark, dir).persist()
      (cs, degreesOf(cs).persist())
    } else {
      val fp = Tables.fingerprint(dir, "lineitem") + "|" +
        Tables.fingerprint(dir, "orders")
      val d = graft.Staging.stage(s"graph_full#$dir", fp) { d =>
        val cs = pairs(spark, dir).persist()
        cs.write.parquet(s"$d/pairs")
        degreesOf(cs).write.parquet(s"$d/degree")
        cs.unpersist(blocking = false)
      }
      (spark.read.parquet(s"$d/pairs"), spark.read.parquet(s"$d/degree"))
    }
}

object GraphOps {
  import Relational.Q

  /** Every traversal query (q134 BFS, q145 PPR, q156 LP) reads the
    * fingerprint-staged graph; q104 deliberately derives from scratch
    * — see [[BipartiteGraph.graph]], the single derivation site.
    */
  private def stagedGraph(spark: org.apache.spark.sql.SparkSession,
      dir: String): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) =
    BipartiteGraph.graph(spark, dir, fromScratch = false)

  /** q134: multi-source BFS hop histogram, 4 relaxation rounds.
    *
    * Seeds are the graph nodes with `node <= 20 AND node % 2 = 0`
    * (customers 1–10 that actually placed orders). Each round joins
    * the edge list with the current label frontier and keeps the
    * minimum hop per node; nodes never reached within 4 hops report
    * as `hops = -1`. Output is the hop histogram with a `sum_node`
    * checksum so the oracle pins membership, not just counts.
    *
    * Scale shape: label relaxation is the textbook distributed BFS —
    * per round ONE shuffle of the (edge ⋈ labels) contribution plus a
    * node-sized min-aggregate; no adjacency matrix, no driver-side
    * frontier. Labels are eagerly `localCheckpoint`ed per round so
    * the 4-round loop keeps a flat plan (the q77/q91 connected-
    * components discipline) instead of a 2^rounds self-referencing
    * DAG. At 100 TB the edge list is the big side and it shuffles
    * once per round on `src` — bucketing the edge table on `src`
    * makes every round's join zero-exchange, the q123 layout
    * economics applied to traversal.
    */
  val q134_bfs_hops: Q = (spark, dir) => bfsHops(spark, dir, earlyExit = true)

  /** `earlyExit = false` runs all 4 rounds unconditionally — the spec
    * pins it result-identical to the early-exit path (empty-frontier
    * rounds are provable no-ops).
    */
  private[graft] def bfsHops(spark: org.apache.spark.sql.SparkSession,
      dir: String, earlyExit: Boolean): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val (cs, deg) = stagedGraph(spark, dir)
    // no fanOut: BFS rounds are frontier-join + distinct over a
    // shrinking frontier — task-scheduling overhead outweighs map
    // parallelism at any scale where the frontier fits a broadcast
    val edges = BipartiteGraph.edgesOf(cs).persist()
    val nodes = deg.select($"src".as("node"))
    val seeds = nodes.where($"node" <= 20 && $"node" % 2 === 0)
    // ONE init job: the observe() metric rides the seed checkpoint's
    // own materialization, so the non-empty guard costs no job of its
    // own (the round-17 shape paid a limit(1) probe plus a separate
    // eager checkpoint job)
    val initObs = org.apache.spark.sql.Observation()
    val init = seeds.select($"node", lit(0).as("hop"))
      .observe(initObs, count(lit(1)).as("n")).localCheckpoint()
    require(initObs.get("n").asInstanceOf[Long] > 0,
      s"q134: no seed nodes under $dir")
    // frontier BFS: each round joins edges against only the nodes
    // REACHED LAST ROUND (not the full label set), and the anti-join
    // against settled labels keeps the frontier shrinking — on a
    // dense graph the later rounds are near-free because the
    // frontier empties once everything is reached. An EMPTY frontier
    // makes every remaining round a no-op (the edge join produces
    // nothing), so the loop exits there — identical labels to running
    // all 4 rounds, pinned in AnalyticsSpec. The frontier-empty probe
    // is FUSED into the round's one materializing action: an observe()
    // metric counts this round's rows (hop = h — exactly the new
    // frontier, since settled labels all carry smaller hops) DURING
    // the union's eager checkpoint job, where the round-17 shape paid
    // the checkpoint job plus a separate isEmpty probe per round.
    var labels = init
    var frontier = init
    var h = 0
    var frontierEmpty = false
    while (h < 4 && (!earlyExit || !frontierEmpty)) {
      h += 1
      val reached = edges
        .join(frontier.select($"node".as("src")), "src")
        .select($"dst".as("node")).distinct()
      // persist (lazy), not localCheckpoint: the labels checkpoint
      // below materializes it in the same job, and the next round's
      // edge join reads it from cache — no extra eager job per round
      val newFrontier = reached.join(labels, Seq("node"), "left_anti")
        .select($"node", lit(h).as("hop"))
        .persist()
      val obs = org.apache.spark.sql.Observation()
      val next = labels.union(newFrontier)
        .observe(obs, count(when($"hop" === h, lit(1))).as("nf"))
        .localCheckpoint()
      frontierEmpty = obs.get("nf").asInstanceOf[Long] == 0L
      // the eager checkpoint above just materialized newFrontier AND
      // re-stored the previous label set — the prior round's frontier
      // cache and labels checkpoint are both dead now (RDD-level
      // release for the checkpoint: Dataset.unpersist never sees it)
      Relational.releaseCkpt(labels)
      labels = next
      if (frontier ne init) frontier.unpersist(blocking = false)
      frontier = newFrontier
    }
    // everything downstream reads only the checkpointed labels (and a
    // fresh deg scan) — the edge cache and final frontier are dead
    if (frontier ne init) frontier.unpersist(blocking = false)
    edges.unpersist(blocking = false)
    val hist = labels.groupBy($"hop")
      .agg(count(lit(1)).as("n_nodes"), sum($"node").as("sum_node"))
    val unreached = nodes.join(labels, Seq("node"), "left_anti")
      .agg(count(lit(1)).as("n_nodes"), sum($"node").as("sum_node"))
      .select(lit(-1).as("hop"), $"n_nodes", $"sum_node")
      .where($"n_nodes" > 0)
    val out = hist.unionByName(unreached)
      .select($"hop".as("hops"), $"n_nodes", $"sum_node")
      .orderBy($"hops")
    // seal: the hop histogram is tiny; the node-sized labels
    // checkpoint must not be what the caller inherits
    Relational.dropAfter(out, labels)
  }

  /** q145: personalized PageRank (PPR) — the seeded variant of q104:
    * the 15% restart mass returns to a SEED SET (customers with
    * custkey % 10 = 0) instead of spreading uniformly, so rank
    * concentrates around the seeds and answers "how close is this
    * node to the trusted set" — the trust-propagation/seed-expansion
    * primitive of web-spam and data-curation pipelines (TrustRank,
    * Gyöngyi et al., VLDB'04). Same scaled-integer arithmetic as
    * q104 (Total = 1e12, contributions `rank DIV degree`, damping
    * `(85·cs) DIV 100`) so DuckDB reproduces every division exactly.
    *
    * Unlike q104, the rank vector is SPARSE: only nodes reachable
    * from the seeds appear (absent node = rank 0). Work per
    * iteration is proportional to the FRONTIER's out-edges, not the
    * graph — at 100 TB a 3-hop PPR from a small seed set touches a
    * tiny graph fraction, and the per-iteration shape (one keyed
    * join + one aggregation shuffle, seed base re-added by a
    * node-keyed union-aggregate) preserves that sparsity; no
    * full-node-set scan anywhere after seed selection.
    */
  val q145_ppr: Q = (spark, dir) => {
    import spark.implicits._
    val Total = 1000000000000L
    val (cs, deg) = stagedGraph(spark, dir)
    val edges = BipartiteGraph.fanOut(spark, BipartiteGraph.edgesOf(cs))
    val edgesDeg = edges.join(deg, "src").persist()
    val seeds = deg.select($"src".as("node"))
      .where($"node" % 2 === 0 && expr("(node DIV 2) % 10 = 0"))
      .persist()
    val nS = seeds.count()
    require(nS > 0, s"q145: no seed customers under $dir")
    val sbase = Total * 15 / 100 / nS
    val init = seeds.select($"node", lit(Total / nS).as("rank"))
    val ranked = (1 to 3).foldLeft(init) { (r, _) =>
      edgesDeg
        .join(r.withColumnRenamed("node", "src"), "src")
        .select($"dst", expr("rank DIV degree").as("contrib"))
        .groupBy($"dst").agg(sum($"contrib").as("cs2"))
        .select($"dst".as("node"), expr("(85 * cs2) DIV 100").as("v"))
        .unionByName(seeds.select($"node", lit(sbase).as("v")))
        .groupBy($"node").agg(sum($"v").as("rank"))
    }
    // materialize the final sparse rank vector (node-count rows, tiny
    // relative to the edge list) so the query-local caches can be
    // dropped before returning — otherwise every bench query after
    // this one competes with a dead edgesDeg block set for memory
    val out = ranked.localCheckpoint().orderBy($"node")
    edgesDeg.unpersist(blocking = false)
    seeds.unpersist(blocking = false)
    out
  }

  /** q163: LOCAL PPR by synchronous forward-push (Andersen, Chung &
    * Lang, FOCS'06) — the 100 TB twin q145's scaladoc calls for. q145
    * is 3 rounds of damped power iteration: every round touches every
    * edge incident to ANY ranked node, so its per-round cost grows
    * with the reached set whether or not the new mass there matters.
    * Forward-push instead keeps an (estimate, residual) pair per node
    * and each round pushes ONLY nodes whose residual exceeds
    * `degree x EPS`: alpha of the pushed residual settles into the
    * estimate, the rest spreads to neighbors, and the loop's total
    * work is bounded by 1/(alpha x eps) PUSHED MASS, independent of
    * graph size (ACL'06 Lemma 2) — the right primitive when the graph
    * is 100 TB and the answer is a local neighborhood of a small seed
    * set. The estimate is a pointwise UNDERestimate of the true PPR
    * (unpushed residual is exactly the mass not yet distributed), so
    * downstream trust-propagation thresholds are conservative —
    * pinned against a converged double-precision PPR in AnalyticsSpec.
    *
    * Same integer discipline as q145 (Total = 1e12, alpha = 15%,
    * per-edge spread `(85 x res) DIV (100 x degree)`, truncation only
    * ever loses mass), and the push/hold split is a deterministic
    * integer comparison — so the 6 synchronous rounds unroll into an
    * exact DuckDB oracle (the q156 device) and the gate is
    * hash-green, not rows-only. Output carries both `est` and the
    * undistributed `res` so the caller sees the approximation bound
    * it is accepting (est + res column sums bracket the seed mass).
    *
    * Scale shape: per round ONE edge⋈frontier join keyed on src plus
    * ONE node-sized residual aggregate; the frontier is the pushed
    * set only. The ESTIMATE table is write-only inside the loop (no
    * round reads it), so its per-round contributions are accumulated
    * as a lazy union of checkpoint-rooted frontier streams and folded
    * by ONE `groupBy(node).sum` after the loop — the round-8 version
    * paid 6 shuffles + 6 eager materializations of a monotonically
    * growing table for nothing. Rounds whose push set is EMPTY leave
    * both tables unchanged (the spread join and the estimate
    * contribution are both empty, and `hold` re-aggregates to the
    * same residual values), so the loop exits early at that fixed
    * point — identical output to running all 6 rounds, which is what
    * the unrolled 6-round oracle computes. ONE driver-synchronous
    * action per round: an `observe()` metric on the (residual ⋈
    * degree) table counts the pushing rows DURING the table's eager
    * checkpoint job, so the fixed-point probe costs no job of its own
    * (the round-17 shape paid a second job per round for a separate
    * isEmpty probe over the just-checkpointed frame), and the next
    * residual stays lazy on top of the checkpoint (the q77/q91
    * flat-plan discipline at half the job count); query-local caches
    * dropped before return.
    */
  /** The integer walk-mass scale and push threshold shared by the
    * batch push, both streaming gates, and the approximate gate's
    * published error contract (|est − π| <= [[PprEps]]·degree).
    */
  private[graft] val PprTotal = 1000000000000L
  private[graft] val PprEps = 1000000L

  val q163_ppr_forward_push: Q = (spark, dir) =>
    pprForwardPush(spark, dir, earlyExit = true)

  private[graft] def pprForwardPush(spark: org.apache.spark.sql.SparkSession,
      dir: String, earlyExit: Boolean): org.apache.spark.sql.DataFrame = {
    val (cs, deg) = stagedGraph(spark, dir)
    // strict: in the BATCH path an empty seed set can only mean the
    // staged graph is damaged — fail loudly rather than bench an
    // empty snapshot (round-11 ADVICE follow-through; the streaming
    // twin keeps the lenient path, where early batches legitimately
    // hold no seed-pattern nodes yet)
    forwardPush(spark, cs, deg, earlyExit, strictSeeds = true)
  }

  /** The forward-push core over an explicit (pair index, degree
    * table) — shared by q163 (staged graph) and the streaming twin
    * ([[graft.streaming.GraphStream]]), which maintains the pair and
    * degree stores incrementally and refreshes this snapshot per
    * micro-batch.
    */
  /** `nSOverride`: run the push over a SUBGRAPH (a union of connected
    * components) while keeping the GLOBAL seed count's initial mass
    * Total/nS — the component-exact refresh device
    * ([[graft.streaming.GraphStream]]): components exchange no mass and
    * the push/hold threshold is node-local, so the subgraph run's state
    * after round k equals the full run's restriction to it, and a
    * subgraph whose push set empties is frozen in the full run too
    * (the fixed-point note below) — bit-identical output, including
    * under earlyExit. An empty LOCAL seed set under an override is a
    * legitimate seedless component (empty output, no warning), not the
    * damaged-graph condition the nS == 0 branch guards.
    */
  private[graft] def forwardPush(spark: org.apache.spark.sql.SparkSession,
      cs: org.apache.spark.sql.DataFrame, deg: org.apache.spark.sql.DataFrame,
      earlyExit: Boolean, strictSeeds: Boolean = false,
      maxRounds: Int = 6,
      nSOverride: Option[Long] = None): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val Total = PprTotal
    val Eps = PprEps // push while res > degree x 1e6, i.e. 1e-6 of the walk mass
    // the pushing node's degree rides ON the frontier row (node-sized),
    // so the big edge list needs no degree join at all — round 8
    // persisted edges⋈deg and paid that join's materialization
    val edges = BipartiteGraph
      .fanOut(spark, BipartiteGraph.edgesOf(cs)).persist()
    val degN = deg.select($"src".as("node"), $"degree")
    val seeds = deg.select($"src".as("node"))
      .where(BipartiteGraph.isPprSeed($"node"))
      .persist()
    val nS = nSOverride.getOrElse(seeds.count())
    if (nS == 0) {
      seeds.unpersist(blocking = false)
      edges.unpersist(blocking = false)
      // Batch q163 passes strictSeeds = true: there an empty seed set
      // means staged-graph data damage, and a silently-fast empty
      // bench line would mask it — fail the query.
      if (strictSeeds)
        throw new IllegalStateException(
          "graft.GraphOps.forwardPush(strictSeeds): empty seed set - " +
            "the staged graph holds no seed-pattern nodes; refusing to " +
            "return an empty PPR snapshot from the batch path")
      // No seed-pattern nodes yet — legitimate in the streaming twin's
      // early micro-batches, where the accumulated degree store may
      // hold only odd customer keys. An empty snapshot (all walk mass
      // undefined) is the correct PPR of an empty seed set; throwing
      // here would kill the whole streaming query from inside
      // foreachBatch (round-9 ADVICE #3).
      System.err.println(
        "WARN graft.GraphOps.forwardPush: empty seed set - returning an " +
          "empty PPR snapshot (legitimate only for an early streaming batch)")
      return spark.range(0)
        .select($"id".as("node"), $"id".as("est"), $"id".as("res"))
    }
    // r0 is a cheap projection over the seeds cache — no materialization
    // of its own; round 1's checkpoint job builds both
    var r = seeds.select($"node", lit(Total / nS).as("res"))
    // per-round checkpoints released after the output seals — a local
    // checkpoint is a persist; without this the 6 rd frames per call
    // outlive the query (round-9 ADVICE #5)
    val ckpts = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.DataFrame]
    val contribs = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.DataFrame]
    var round = 0
    var fixedPoint = false
    while (round < maxRounds && !fixedPoint) {
      round += 1
      // node-sized; checkpointed ONCE so the push/hold split, the
      // estimate contribution, and the spread join all read the same
      // cached rows instead of re-running the degree join per consumer.
      // ONE action per round: the observe() metric rides the eager
      // checkpoint's own materialization job, so the push-count probe
      // costs no job of its own — the round-17 shape paid a second
      // driver-synchronous job per round for a separate isEmpty probe
      // over the just-checkpointed frame (guide §1.2: with node-sized
      // rounds, the loop's JOB STRUCTURE is the cost; JobCount measured
      // 45 jobs for the 6-round push, half of them probes).
      val obs = org.apache.spark.sql.Observation()
      val rd = r.join(degN, "node")
        .withColumn("pushes", $"res" > $"degree" * Eps)
        .observe(obs, count(when($"pushes", lit(1))).as("npush"))
        .localCheckpoint()
      ckpts += rd
      val nPush = obs.get("npush").asInstanceOf[Long]
      val push = rd.where($"pushes").select($"node", $"res", $"degree")
      if (earlyExit && nPush == 0L) fixedPoint = true
      else {
        contribs += push.select($"node", expr("(15 * res) DIV 100").as("est"))
        val hold = rd.where(!$"pushes").select($"node", $"res")
        val spread = edges
          .join(push.withColumnRenamed("node", "src"), "src")
          .select($"dst".as("node"),
            expr("(85 * res) DIV (100 * degree)").as("res"))
        // LAZY: the next round's rd checkpoint (or the final fold)
        // materializes this aggregate — checkpointing r here too would
        // pay a second eager job per round for a lineage the rd
        // checkpoint already flattens
        r = hold.unionByName(spread)
          .groupBy($"node").agg(sum($"res").as("res"))
      }
    }
    val pF =
      if (contribs.isEmpty)
        spark.range(0).select($"id".as("node"), $"id".as("est"))
      else contribs.reduce(_ unionByName _)
        .groupBy($"node").agg(sum($"est").as("est"))
    val out = pF.select($"node", $"est", lit(0L).as("res"))
      .unionByName(r.select($"node", lit(0L).as("est"), $"res"))
      .groupBy($"node")
      .agg(sum($"est").as("est"), sum($"res").as("res"))
      .localCheckpoint()
      .orderBy($"node")
    edges.unpersist(blocking = false)
    seeds.unpersist(blocking = false)
    // RDD-level release: these are localCheckpoints, which
    // Dataset.unpersist silently ignores (round-10 hygiene finding)
    Relational.releaseCkpt(ckpts.toSeq: _*)
    out
  }

  /** q156: synchronous label propagation community detection
    * (Raghavan et al. 2007) — 4 rounds, every node adopts the most
    * frequent label among its NEIGHBORS with ties to the smallest
    * label (the deterministic variant; the async/random classic is
    * not reproducible cross-engine). Output is the community
    * histogram with a membership checksum. Complements q77/q91:
    * connected components finds "linked at all", LP finds densely
    * linked regions WITHIN a component.
    *
    * Scale shape: per round, one edge⋈labels join, one (node, label)
    * count aggregate with map-side combine, one max_by argmax per
    * node — no window sort. Labels localCheckpoint per round (the
    * q77/q91 discipline). At 100 TB: the edge list shuffles once per
    * round on src; bucketing it on src makes every round
    * zero-exchange on that side (q123 economics).
    */
  val q156_label_propagation: Q = (spark, dir) =>
    labelPropagation(spark, dir, earlyExit = true)

  private[graft] def labelPropagation(spark: org.apache.spark.sql.SparkSession,
      dir: String, earlyExit: Boolean): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val (cs, deg) = stagedGraph(spark, dir)
    val edges = BipartiteGraph
      .fanOut(spark, BipartiteGraph.edgesOf(cs)).persist()
    val init = deg.select($"src".as("node"), $"src".as("lbl"))
      .localCheckpoint()
    // labels are a deterministic function of the previous round's
    // labels, so an UNCHANGED label table is a fixed point and every
    // remaining round is a no-op — exit there (pinned equal to the
    // always-run loop in AnalyticsSpec). ONE driver-synchronous action
    // per round: the previous round's label rides the new label table
    // as a `prev` column (a full join of two node-sized tables — the
    // same join the round-17 probe ran as its own second job), and an
    // `observe()` metric counts the changed/appeared/vanished labels
    // DURING the table's eager checkpoint job (guide §1.2: with
    // node-sized rounds the loop's job structure is the cost; JobCount
    // measured 39 jobs for the 4-round loop, probes included).
    var labels = init
    var round = 0
    var fixedPoint = false
    while (round < 4 && !fixedPoint) {
      round += 1
      val obs = org.apache.spark.sql.Observation()
      val nextJ = edges
        .join(labels.withColumnRenamed("node", "src")
          .withColumnRenamed("lbl", "slbl"), "src")
        .groupBy($"dst", $"slbl").agg(count(lit(1)).as("c"))
        .groupBy($"dst")
        .agg(max_by($"slbl", struct($"c", -$"slbl")).as("lbl"))
        .select($"dst".as("node"), $"lbl")
        .join(labels.withColumnRenamed("lbl", "prev"), Seq("node"), "full")
        .observe(obs, count(when(
          $"lbl".isNull || $"prev".isNull || $"lbl" =!= $"prev",
          lit(1))).as("nchanged"))
        .localCheckpoint()
      // the adopted labels are exactly the full join's non-null `lbl`
      // rows (max_by over non-null neighbor labels is never null, so
      // no adopted row is lost; prev-only rows are the vanished ones)
      val next = nextJ.where($"lbl".isNotNull).select($"node", $"lbl")
      fixedPoint = earlyExit && round < 4 &&
        obs.get("nchanged").asInstanceOf[Long] == 0L
      // the checkpoint above was the last reader of the previous
      // round's checkpoint — RDD-level release (Dataset.unpersist
      // ignores it)
      Relational.releaseCkpt(labels)
      labels = next
    }
    // the per-round eager checkpoints mean the final labels no longer
    // reference the edge cache — drop it before returning
    edges.unpersist(blocking = false)
    val out = labels.groupBy($"lbl".as("community"))
      .agg(count(lit(1)).as("n_members"), sum($"node").as("sum_node"))
      .orderBy($"community")
    // seal: community histogram is tiny vs the node-sized label table
    Relational.dropAfter(out, labels)
  }

  private val lpOracle: String = {
    val head =
      """WITH cs AS (
        |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT c AS src, s AS dst FROM cs
        |      UNION ALL SELECT s AS src, c AS dst FROM cs),
        |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM e)""".stripMargin
    val steps = (1 to 4).map { i =>
      s"""l$i AS (
         |  SELECT node, lbl FROM (
         |    SELECT e.dst AS node, l.lbl, COUNT(*) AS c,
         |      ROW_NUMBER() OVER (PARTITION BY e.dst
         |        ORDER BY COUNT(*) DESC, l.lbl) AS rn
         |    FROM e JOIN l${i - 1} l ON e.src = l.node
         |    GROUP BY e.dst, l.lbl) t
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$steps
       |SELECT lbl AS community, COUNT(*) AS n_members,
       |  CAST(SUM(node) AS BIGINT) AS sum_node
       |FROM l4 GROUP BY lbl ORDER BY community""".stripMargin
  }

  private val pprOracle: String = {
    val head =
      """WITH cs AS (
        |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT c AS src, s AS dst FROM cs
        |      UNION ALL SELECT s AS src, c AS dst FROM cs),
        |deg AS (SELECT src, COUNT(*) AS degree FROM e GROUP BY src),
        |ed AS (SELECT e.src, e.dst, d.degree FROM e JOIN deg d ON e.src = d.src),
        |seeds AS (SELECT src AS node FROM deg
        |          WHERE src % 2 = 0 AND (src // 2) % 10 = 0),
        |p AS (SELECT COUNT(*) AS ns FROM seeds),
        |r0 AS (SELECT node,
        |         (SELECT 1000000000000 // ns FROM p) AS rank FROM seeds)""".stripMargin
    val steps = (1 to 3).map { i =>
      s"""r$i AS (
         |  SELECT node, CAST(SUM(v) AS BIGINT) AS rank FROM (
         |    SELECT ed.dst AS node,
         |      (85 * SUM(r.rank // ed.degree)) // 100 AS v
         |    FROM ed JOIN r${i - 1} r ON ed.src = r.node GROUP BY ed.dst
         |    UNION ALL
         |    SELECT node,
         |      (SELECT (1000000000000 * 15 // 100) // ns FROM p) FROM seeds) t
         |  GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$steps
       |SELECT node, CAST(rank AS BIGINT) AS rank FROM r3 ORDER BY node""".stripMargin
  }

  private val pushOracle: String = {
    val head =
      """WITH cs AS (
        |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT c AS src, s AS dst FROM cs
        |      UNION ALL SELECT s AS src, c AS dst FROM cs),
        |deg AS (SELECT src, COUNT(*) AS degree FROM e GROUP BY src),
        |ed AS (SELECT e.src, e.dst, d.degree FROM e JOIN deg d ON e.src = d.src),
        |seeds AS (SELECT src AS node FROM deg
        |          WHERE src % 2 = 0 AND (src // 2) % 10 = 0),
        |ns AS (SELECT COUNT(*) AS n FROM seeds),
        |p0 AS (SELECT CAST(NULL AS BIGINT) AS node, CAST(NULL AS BIGINT) AS est
        |       WHERE FALSE),
        |r0 AS (SELECT node,
        |         (SELECT 1000000000000 // n FROM ns) AS res FROM seeds)""".stripMargin
    val steps = (1 to 6).map { i =>
      s"""push$i AS (
         |  SELECT r.node, r.res FROM r${i - 1} r JOIN deg d ON r.node = d.src
         |  WHERE r.res > d.degree * 1000000),
         |hold$i AS (
         |  SELECT r.node, r.res FROM r${i - 1} r JOIN deg d ON r.node = d.src
         |  WHERE r.res <= d.degree * 1000000),
         |p$i AS (
         |  SELECT node, CAST(SUM(est) AS BIGINT) AS est FROM (
         |    SELECT node, est FROM p${i - 1}
         |    UNION ALL SELECT node, (15 * res) // 100 FROM push$i) t
         |  GROUP BY node),
         |r$i AS (
         |  SELECT node, CAST(SUM(res) AS BIGINT) AS res FROM (
         |    SELECT node, res FROM hold$i
         |    UNION ALL
         |    SELECT ed.dst AS node, (85 * pu.res) // (100 * ed.degree) AS res
         |    FROM ed JOIN push$i pu ON ed.src = pu.node) t
         |  GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$steps
       |SELECT node, CAST(SUM(est) AS BIGINT) AS est,
       |  CAST(SUM(res) AS BIGINT) AS res
       |FROM (SELECT node, est, 0 AS res FROM p6
       |      UNION ALL SELECT node, 0 AS est, res FROM r6) t
       |GROUP BY node ORDER BY node""".stripMargin
  }

  /** q168: HITS hubs & authorities (Kleinberg, JACM 1999) on the
    * DIRECTED bipartite customer→supplier graph — customers score as
    * hubs (they point at good suppliers), suppliers as authorities.
    * Two mutual-reinforcement rounds, L1-normalized.
    *
    * Integer-exact discipline (the q104/q145 stance, which is what
    * makes the unrolled SQL oracle hash-exact): scores live as
    * parts-per-1e9 longs; each half-round is ONE equi-join on the
    * staged pair index + one map-side-combined aggregate, then the L1
    * normalization divides by the total, collected to the driver in
    * the same job that materializes the half-round's cache (never a
    * second shuffle). L2 — the paper's normalization — needs a square
    * root, so the L1 variant is the deterministic fixture; the
    * ranking it induces per side is identical at every round because
    * normalization is a positive scalar either way.
    *
    * At 100 TB: per round 2 joins keyed by the pair index's own keys,
    * partial aggregation before each exchange, a driver-collected
    * 1-row total — the same shape as one PageRank iteration, and the
    * staged-parquet graph is shared with every other traversal query.
    */
  val q168_hits: Q = (spark, dir) => {
    import spark.implicits._
    val S = 1000000000L
    // the pair index is referenced 4x (2 rounds x 2 sides) as a cheap
    // staged-parquet scan; at cluster scale persist it fanned-out —
    // at bench scale the re-scan is cheaper than a 32-wide cache
    val (cs, _) = stagedGraph(spark, dir)
    // Each half-step's raw sums are cached and their L1 total is
    // collected in the SAME job that materializes the cache; the total
    // then enters the normalization as a LITERAL — identical DECIMAL
    // arithmetic to the round-17 crossJoin(broadcast(agg)) shape (the
    // sum is the same BIGINT either way) at half the driver actions:
    // no per-step broadcast-exchange job, no per-step checkpoint job,
    // and the normalized side stays a lazy projection over the cache
    // (it is consumed exactly once, by the next half-step). persist
    // (not localCheckpoint + observe, which was measured SLOWER here:
    // the tiny aggregate checkpoints at 1 post-AQE partition and the
    // next half-step's join serializes on that scan, while the cache
    // keeps the aggregate's full width).
    val caches = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.DataFrame]
    def l1norm(rawDf: org.apache.spark.sql.DataFrame, key: String) = {
      val raw = rawDf.persist()
      caches += raw
      val totRow = raw.agg(sum($"raw")).head()
      // empty input ⇒ null sum ⇒ zero rows to normalize: the literal's
      // value is never evaluated, any placeholder avoids the ANSI
      // division-by-null difference
      val tot = if (totRow.isNullAt(0)) 1L else totRow.getLong(0)
      raw.select(col(key).as("node"),
        expr(s"CAST(CAST(raw AS DECIMAL(38,0)) * $S DIV CAST($tot AS DECIMAL(38,0)) AS BIGINT)")
          .as("score"))
    }
    var hub = cs.select($"c").distinct()
      .select($"c".as("node"), lit(S).as("score"))
    var auth = spark.emptyDataFrame
    for (_ <- 1 to 2) {
      auth = l1norm(
        cs.join(hub.withColumnRenamed("node", "c"), "c")
          .groupBy($"s").agg(sum($"score").as("raw")), "s")
      hub = l1norm(
        cs.join(auth.withColumnRenamed("node", "s"), "s")
          .groupBy($"c").agg(sum($"score").as("raw")), "c")
    }
    val out = hub.select(lit("hub").as("side"), $"node", $"score")
      .union(auth.select(lit("auth").as("side"), $"node", $"score"))
      .orderBy($"side", $"node")
    // seal the (2 x nodes)-row result, drop the per-step raw caches
    Relational.dropAfter(out, caches.toSeq: _*)
  }

  /** q174: k-core peeling (Seidman 1983; the standard graph-curation
    * primitive — link-spam and low-engagement filtering keep only the
    * subgraph where every node retains ≥ K partners AFTER its weak
    * neighbors are gone, which single-pass degree filtering cannot
    * decide). Four synchronous peeling rounds on the staged
    * customer–supplier pair index: per round, both sides' degrees are
    * ONE map-side-combined aggregate each, and the edge set shrinks
    * via two semi-join-shaped filters; the shrinking edge set
    * localCheckpoints per round (the q77/q91 iterative discipline —
    * flat plans, monotone work). Reports (nodes, edges) per round —
    * the fixed-point diagnostic a curation pipeline actually reads.
    * At 100 TB each round is two degree aggregates + two joins keyed
    * by the edge list's own columns; rounds-to-converge is bounded by
    * the peeling depth, not graph size.
    */
  val q174_kcore: Q = (spark, dir) => kcore(spark, dir, earlyExit = true)

  private[graft] def kcore(spark: org.apache.spark.sql.SparkSession,
      dir: String, earlyExit: Boolean): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val rounds = 4
    val (cs, _) = stagedGraph(spark, dir)
    // k = half the mean customer degree (floor-of-floor, mirrored by
    // the oracle's subquery): a FIXED k either prunes nothing or
    // everything as the scale factor moves the degree distribution —
    // the threshold has to come from the graph itself
    val base = cs.agg(count(lit(1)).as("ne"),
      countDistinct($"c").as("nc")).collect()(0)
    val k = math.max(base.getLong(0) / base.getLong(1) / 2, 1L)
    var edges = cs.select($"c", $"s")
    val out = Seq.newBuilder[(Int, Long, Long)]
    // the edge set only ever SHRINKS, so an unchanged edge COUNT means
    // the keep-filters pruned nothing and every remaining round is the
    // identical fixed point — fill those rows without running the
    // joins (pinned round-for-round equal to the always-run loop in
    // AnalyticsSpec; the oracle unrolls all 4 rounds either way)
    var prevNe = -1L
    var r = 1
    while (r <= rounds) {
      val keepC = edges.groupBy($"c").agg(count(lit(1)).as("dc"))
        .where($"dc" >= k).select($"c")
      val keepS = edges.groupBy($"s").agg(count(lit(1)).as("ds"))
        .where($"ds" >= k).select($"s")
      // the edge count rides the eager checkpoint's own job as an
      // observe() metric; the node count is one more aggregate over
      // the just-checkpointed blocks (distinct counts cannot be
      // observation metrics). Two jobs per round where the round-17
      // shape paid three (checkpoint, edge count, node distinct-count)
      // — and the second reads cached rows only.
      val obs = org.apache.spark.sql.Observation()
      val next = edges.join(keepC, "c").join(keepS, "s")
        .observe(obs, count(lit(1)).as("ne")).localCheckpoint()
      val prev = edges
      edges = next
      val ne = obs.get("ne").asInstanceOf[Long]
      val nn = edges.select($"c".as("n")).union(edges.select($"s".as("n")))
        .distinct().count()
      // previous round's edge checkpoint is dead once the new one is
      // materialized (round 1: `edges` is a lazy staged-parquet scan,
      // so the release is a no-op there)
      Relational.releaseCkpt(prev)
      out += ((r, nn, ne))
      if (earlyExit && ne == prevNe) {
        // fixed point: replicate the settled counts for the rest
        while (r < rounds) { r += 1; out += ((r, nn, ne)) }
      }
      prevNe = ne
      r += 1
    }
    // the result is driver-side rows — the last edge checkpoint has no
    // remaining consumer
    Relational.releaseCkpt(edges)
    out.result().toDF("round", "n_nodes", "n_edges").orderBy($"round")
  }

  /** q175: degree assortativity (Newman 2002) — the Pearson
    * correlation of endpoint degrees over the symmetric edge list,
    * THE one-number summary of whether hubs attach to hubs (r > 0,
    * social-graph shape) or to leaves (r < 0, bipartite/star shape —
    * this customer–supplier graph should be strongly negative).
    * Plan: degree table joined onto both edge endpoints (degree table
    * is node-sized), then ONE moment aggregate — all sums exact
    * BIGINTs (degrees are integers), one double conversion, round 6
    * (the q110 parity device).
    */
  val q175_assortativity: Q = (spark, dir) => {
    import spark.implicits._
    val (cs, deg) = stagedGraph(spark, dir)
    val edges = cs.select($"c".as("src"), $"s".as("dst"))
      .union(cs.select($"s".as("src"), $"c".as("dst")))
    val m = edges
      .join(deg.select($"src", $"degree".as("x")), "src")
      .join(deg.select($"src".as("dst"), $"degree".as("y")), "dst")
      .agg(count(lit(1)).as("n_edges"),
        count(lit(1)).cast("double").as("n"),
        sum($"x").cast("double").as("sx"),
        sum($"y").cast("double").as("sy"),
        sum($"x" * $"y").cast("double").as("sxy"),
        sum($"x" * $"x").cast("double").as("sxx"),
        sum($"y" * $"y").cast("double").as("syy"))
    m.select($"n_edges",
      round(($"n" * $"sxy" - $"sx" * $"sy") /
        (sqrt($"n" * $"sxx" - $"sx" * $"sx") *
         sqrt($"n" * $"syy" - $"sy" * $"sy")), 6).as("assortativity"))
  }

  private val assortOracle: String =
    """WITH cs AS (
      |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |e AS (SELECT c AS src, s AS dst FROM cs
      |      UNION ALL SELECT s AS src, c AS dst FROM cs),
      |d AS (SELECT src, COUNT(*) AS degree FROM e GROUP BY src),
      |m AS (
      |  SELECT COUNT(*) AS n_edges,
      |    CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(dx.degree) AS DOUBLE) AS sx,
      |    CAST(SUM(dy.degree) AS DOUBLE) AS sy,
      |    CAST(SUM(dx.degree * dy.degree) AS DOUBLE) AS sxy,
      |    CAST(SUM(dx.degree * dx.degree) AS DOUBLE) AS sxx,
      |    CAST(SUM(dy.degree * dy.degree) AS DOUBLE) AS syy
      |  FROM e JOIN d dx ON e.src = dx.src JOIN d dy ON e.dst = dy.src)
      |SELECT CAST(n_edges AS BIGINT) AS n_edges,
      |  ROUND((n * sxy - sx * sy) /
      |    (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
      |    AS assortativity
      |FROM m""".stripMargin

  /** q174's oracle: the four peeling rounds unrolled as MATERIALIZED
    * CTEs (each e{r} is the prior edge set filtered to both sides'
    * surviving-degree nodes).
    */
  private val kcoreOracle: String = {
    val rounds = 4
    val steps = (1 to rounds).map { r =>
      s"""kc$r AS MATERIALIZED (
         |  SELECT c FROM e${r - 1} GROUP BY c
         |  HAVING COUNT(*) >= (SELECT k FROM kk)),
         |ks$r AS MATERIALIZED (
         |  SELECT s FROM e${r - 1} GROUP BY s
         |  HAVING COUNT(*) >= (SELECT k FROM kk)),
         |e$r AS MATERIALIZED (
         |  SELECT e.c, e.s FROM e${r - 1} e
         |  JOIN kc$r USING (c) JOIN ks$r USING (s))""".stripMargin
    }
    val sel = (1 to rounds).map { r =>
      s"""SELECT $r AS round,
         |  (SELECT COUNT(*) FROM (
         |     SELECT c AS n FROM e$r UNION SELECT s AS n FROM e$r)) AS n_nodes,
         |  (SELECT COUNT(*) FROM e$r) AS n_edges""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH e0 AS MATERIALIZED (
       |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |kk AS MATERIALIZED (
       |  SELECT GREATEST(COUNT(*) // COUNT(DISTINCT c) // 2, 1) AS k
       |  FROM e0),
       |""".stripMargin + steps.mkString(",\n") + "\n" + sel + "\nORDER BY round"
  }

  /** q168's oracle: the two rounds unrolled; HUGEINT (not DECIMAL)
    * arithmetic because DuckDB's `//` on DECIMAL operands rounds the
    * intermediate division before flooring, while Spark's DIV
    * truncates the exact quotient.
    */
  private val hitsOracle: String = {
    val S = 1000000000L
    def norm(src: String, key: String) =
      s"""SELECT $key AS node,
         |  CAST(CAST(raw AS HUGEINT) * $S //
         |    (SELECT CAST(SUM(raw) AS HUGEINT) FROM $src) AS BIGINT) AS score
         |FROM $src""".stripMargin
    s"""WITH cs AS (
       |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |h0 AS (SELECT DISTINCT c AS node, $S AS score FROM cs),
       |a1r AS MATERIALIZED (
       |  SELECT s, SUM(score) AS raw FROM cs JOIN h0 ON cs.c = h0.node GROUP BY s),
       |a1 AS MATERIALIZED (${norm("a1r", "s")}),
       |h1r AS MATERIALIZED (
       |  SELECT c, SUM(score) AS raw FROM cs JOIN a1 ON cs.s = a1.node GROUP BY c),
       |h1 AS MATERIALIZED (${norm("h1r", "c")}),
       |a2r AS MATERIALIZED (
       |  SELECT s, SUM(score) AS raw FROM cs JOIN h1 ON cs.c = h1.node GROUP BY s),
       |a2 AS MATERIALIZED (${norm("a2r", "s")}),
       |h2r AS MATERIALIZED (
       |  SELECT c, SUM(score) AS raw FROM cs JOIN a2 ON cs.s = a2.node GROUP BY c),
       |h2 AS MATERIALIZED (${norm("h2r", "c")})
       |SELECT 'hub' AS side, node, score FROM h2
       |UNION ALL
       |SELECT 'auth' AS side, node, score FROM a2
       |ORDER BY side, node""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q134_bfs_hops" -> q134_bfs_hops,
    "q145_ppr" -> q145_ppr,
    "q156_label_propagation" -> q156_label_propagation,
    "q163_ppr_forward_push" -> q163_ppr_forward_push,
    "q168_hits" -> q168_hits,
    "q174_kcore" -> q174_kcore,
    "q175_assortativity" -> q175_assortativity)

  val oracles: Map[String, String] = Map(
    "q145_ppr" -> pprOracle,
    "q168_hits" -> hitsOracle,
    "q174_kcore" -> kcoreOracle,
    "q175_assortativity" -> assortOracle,
    "q163_ppr_forward_push" -> pushOracle,
    "q156_label_propagation" -> lpOracle,
    "q134_bfs_hops" ->
      // recursive-CTE BFS: UNION (not UNION ALL) dedups (node, hop)
      // pairs so the frontier is bounded by nodes x 5 hops; MIN(hop)
      // then collapses to the BFS level. The -1 row only exists when
      // some node is unreachable (HAVING guard, mirrored by the
      // Spark side's n_nodes > 0 filter).
      """WITH RECURSIVE cs AS (
        |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT c AS src, s AS dst FROM cs
        |      UNION ALL SELECT s AS src, c AS dst FROM cs),
        |nodes AS (SELECT DISTINCT src AS node FROM e),
        |bfs(node, hop) AS (
        |  SELECT node, 0 FROM nodes WHERE node <= 20 AND node % 2 = 0
        |  UNION
        |  SELECT e.dst, b.hop + 1 FROM bfs b JOIN e ON e.src = b.node
        |  WHERE b.hop < 4),
        |lab AS (SELECT node, MIN(hop) AS hop FROM bfs GROUP BY node),
        |hist AS (
        |  SELECT hop AS hops, COUNT(*) AS n_nodes, SUM(node) AS sum_node
        |  FROM lab GROUP BY hop
        |  UNION ALL
        |  SELECT -1, COUNT(*), SUM(node) FROM nodes
        |  WHERE node NOT IN (SELECT node FROM lab) HAVING COUNT(*) > 0)
        |SELECT CAST(hops AS INTEGER) AS hops, CAST(n_nodes AS BIGINT) AS n_nodes,
        |  CAST(sum_node AS BIGINT) AS sum_node
        |FROM hist ORDER BY hops""".stripMargin)
}
