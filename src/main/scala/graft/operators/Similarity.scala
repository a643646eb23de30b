package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions._

/** Similarity search over the `embeddings` table (Array[Float], dim 64).
  *
  *  - q32: brute-force cosine top-k — the exactness baseline. Query set
  *    broadcast; one linear scan of the corpus per batch of queries
  *    (NOT per query); ranking via per-query top-k window. At 100 TB
  *    this is the right plan when the query batch is small: zero
  *    shuffle of the corpus, map-side scoring, TakeOrdered-style
  *    reduction per query.
  *  - q33: random-hyperplane LSH bucketed ANN — the scale path when the
  *    query set itself is large: both sides hash to sign-pattern
  *    buckets, candidates meet in an equi-join on the bucket key
  *    (corpus shuffled by bucket once, reusable), then exact rescoring
  *    within buckets. Approximate → rows-only check (no oracle).
  */
object Similarity {
  import Relational.Q

  /** Deterministic pseudo-random hyperplanes: plane p, dim d coefficient
    * derived from a splitmix of (p, d) — reproducible anywhere, no RNG
    * state (Date/random is unavailable and undesirable in a plan).
    */
  private def planeCoef(p: Int, d: Int): Double = {
    val h = graft.functions.TextKernels.mix64(p.toLong * 131 + d.toLong * 7919)
    // map to [-1, 1)
    (h >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
  }

  val q32_knn_exact: Q = (spark, dir) => {
    import spark.implicits._
    val emb = Tables.load(spark, dir, "embeddings")
    val queries = emb.where($"vec_id" < 8)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id")
    emb.crossJoin(broadcast(queries))
      .where($"vec_id" =!= $"q_id")
      .withColumn("cos", cosine_sim($"q_emb", $"embedding"))
      .withColumn("rank", row_number().over(w))
      .where($"rank" <= 3)
      .select($"q_id", $"vec_id".as("neighbor_id"), $"rank")
      .orderBy($"q_id", $"rank")
  }

  /** 8-bit sign-pattern LSH bucketing + exact cosine rescoring within
    * buckets; top-k per query among same-bucket candidates.
    */
  val q33_knn_lsh: Q = (spark, dir) => {
    import spark.implicits._
    val nPlanes = 8
    // bucket = sign bits of 8 fixed hyperplane projections
    def bucketCol(embCol: String) = {
      val bits = (0 until nPlanes).map { p =>
        val coefs = array((0 until 64).map(d => lit(planeCoef(p, d))): _*)
        val proj = aggregate(
          zip_with(col(embCol), coefs, (x, c) => x.cast("double") * c),
          lit(0.0), (acc, v) => acc + v)
        when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
      }
      bits.reduce(_ + _)
    }
    val emb = Tables.load(spark, dir, "embeddings")
      .withColumn("bucket", bucketCol("embedding"))
    val queries = emb.where($"vec_id" < 8)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"), $"bucket")
    val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id")
    emb.join(broadcast(queries), "bucket")
      .where($"vec_id" =!= $"q_id")
      .withColumn("cos", cosine_sim($"q_emb", $"embedding"))
      .withColumn("rank", row_number().over(w))
      .where($"rank" <= 3)
      .select($"q_id", $"vec_id".as("neighbor_id"), $"rank")
      .orderBy($"q_id", $"rank")
  }

  val oracles: Map[String, String] = Map(
    "q32_knn_exact" ->
      """WITH q AS (
        |  SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qe
        |  FROM embeddings WHERE vec_id < 8),
        |s AS (
        |  SELECT q.q_id, e.vec_id,
        |    list_dot_product(q.qe, CAST(e.embedding AS DOUBLE[])) /
        |      (sqrt(list_dot_product(q.qe, q.qe)) *
        |       sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
        |                             CAST(e.embedding AS DOUBLE[])))) AS cos
        |  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.q_id)
        |SELECT q_id, vec_id AS neighbor_id, CAST(rank AS INTEGER) AS rank
        |FROM (SELECT q_id, vec_id,
        |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
        |      FROM s) t
        |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin)

  val queries: Map[String, Q] = Map(
    "q32_knn_exact" -> q32_knn_exact,
    "q33_knn_lsh" -> q33_knn_lsh)
}
