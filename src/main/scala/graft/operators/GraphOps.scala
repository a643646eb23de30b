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
object GraphOps {
  import Relational.Q

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
  val q134_bfs_hops: Q = (spark, dir) => {
    import spark.implicits._
    val cs = Tables.load(spark, dir, "lineitem").select($"l_orderkey", $"l_suppkey")
      .join(Tables.load(spark, dir, "orders").select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .select(($"o_custkey" * 2).as("c"), ($"l_suppkey" * 2 + 1).as("s"))
      .distinct().persist()
    val edges = cs.select($"c".as("src"), $"s".as("dst"))
      .union(cs.select($"s".as("src"), $"c".as("dst")))
      .persist()
    val nodes = edges.select($"src".as("node")).distinct()
    val seeds = nodes.where($"node" <= 20 && $"node" % 2 === 0)
    require(seeds.limit(1).count() > 0, s"q134: no seed nodes under $dir")
    val init = seeds.select($"node", lit(0).as("hop"))
    val labels = (1 to 4).foldLeft(init) { (lab, _) =>
      val relaxed = edges
        .join(lab.withColumnRenamed("node", "src"), "src")
        .select($"dst".as("node"), ($"hop" + 1).as("hop"))
      lab.union(relaxed).groupBy($"node").agg(min($"hop").as("hop"))
        .localCheckpoint()
    }
    val hist = labels.groupBy($"hop")
      .agg(count(lit(1)).as("n_nodes"), sum($"node").as("sum_node"))
    val unreached = nodes.join(labels, Seq("node"), "left_anti")
      .agg(count(lit(1)).as("n_nodes"), sum($"node").as("sum_node"))
      .select(lit(-1).as("hop"), $"n_nodes", $"sum_node")
      .where($"n_nodes" > 0)
    hist.unionByName(unreached)
      .select($"hop".as("hops"), $"n_nodes", $"sum_node")
      .orderBy($"hops")
  }

  val queries: Map[String, Q] = Map(
    "q134_bfs_hops" -> q134_bfs_hops)

  val oracles: Map[String, String] = Map(
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
