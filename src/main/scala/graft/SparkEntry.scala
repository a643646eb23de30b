package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Analytics, Curation, Dedup, Extras, GraphOps, Pipelines, Relational, Similarity, TextOps, Training}

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * Every operator family from SURVEY.md §2 (plus the training-data
  * pipeline extensions: dedup, similarity search, text analysis,
  * multimodal) is declared here as a named query with, where the
  * semantics are ANSI-SQL-expressible, a DuckDB oracle over the same
  * parquet tables. Queries without an oracle (custom 64-bit hashes /
  * InDel similarity / approximate ANN) get the driver's rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * 3-way join + theta filter + sort (reference GAIN_SELECT shape,
    * params_queries.py:13-20).
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.q04_theta_join(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextOps.queries ++ Dedup.queries ++
      Similarity.queries ++ Pipelines.queries ++ Extras.queries ++
      Training.queries ++ Curation.queries ++ Analytics.queries ++ GraphOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted ONLY for genuinely approximate
    * ops — exactly six: q33/q47/q95 (LSH/IVF/PQ ANN, recall-pinned in
    * SimilaritySpec), q59 (IVF-blocked embedding dedup, recall-pinned),
    * q61/q70 (sketches, error-bound-pinned). Everything else —
    * including q23 (InDel via DuckDB list_reduce DP), q27
    * (fingerprint) and q30 (simhash), whose kernels are unrolled into
    * the oracle SQL (`Relational.q23Oracle`, `HashOracleSql`) — is
    * hash-gated; QuerySuiteSpec asserts the set stays exactly six.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TextOps.oracles ++ Dedup.oracles ++
      Similarity.oracles ++ Pipelines.oracles ++ Extras.oracles ++
      Training.oracles ++ Curation.oracles ++ Analytics.oracles ++ GraphOps.oracles
}
