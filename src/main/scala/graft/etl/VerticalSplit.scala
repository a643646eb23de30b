package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vertical partitioning of one wide denormalized frame into N narrow
  * target tables (reference P2: the media-tag ETL splits a 29-column
  * record into artist/album/track/genre/metadata by catalog-driven
  * column subsets, postgres_media.py:261-270 driven by
  * query_table_columns :211-226).
  *
  * Spark-first shape: the wide scan is ONE job, cached, then each
  * target is a pure projection — no per-row loops, no catalog query
  * per row (the reference re-queried the catalog for every row).
  * At 100 TB the cache becomes a first staging write; projections
  * still read the wide scan once each with column pruning.
  */
object VerticalSplit {

  /** Split `wide` into `targets` (name -> column subset). Unknown
    * columns raise immediately (the reference's catalog lookup
    * guaranteed existence; we check eagerly instead).
    */
  def split(wide: DataFrame, targets: Map[String, Seq[String]]): Map[String, DataFrame] = {
    val have = wide.columns.toSet
    val missing = targets.flatMap { case (t, cols) => cols.filterNot(have).map(c => s"$t.$c") }
    require(missing.isEmpty, s"columns not in wide frame: ${missing.mkString(", ")}")
    val cached = wide.cache()
    targets.map { case (name, cols) => name -> cached.select(cols.map(col): _*) }
  }

  /** Stamp the ingest timestamp (reference F6: extract_date appended to
    * every row at load, postgres_media.py:302).
    */
  def stampExtractDate(df: DataFrame): DataFrame =
    df.withColumn("extract_date", current_timestamp())

  /** Composite formatted natural key with a 1-based zero-padded ordinal
    * (reference F12 track_tag: "{i:03d} | {artist} | {album} |
    * {track#:02d}-{title}", postgres_media.py:256-260). The ordinal is
    * a global row number over the caller's ordering.
    *
    * NOT a `Window.orderBy` with no partition key: an unpartitioned
    * window funnels every row through a single task. Instead the frame
    * is range-sort-partitioned (parallel), and the contiguous 1-based
    * index comes from `zipWithIndex` — one extra lightweight job to
    * count partition sizes, zero single-task walls. The RDD hop drops
    * out of whole-stage codegen for this one stamping step; that is
    * the price of a contiguous global ordinal at scale.
    */
  def withTag(df: DataFrame, orderBy: Seq[Column], parts: Seq[Column],
      tagCol: String = "tag"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType
    val spark = df.sparkSession
    val sorted = df.sort(orderBy: _*)
    val rnField = "__graft_rn"
    val schema = sorted.schema.add(rnField, LongType, nullable = false)
    val indexed = spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) },
      schema)
    val fmt = "%03d | " + Seq.fill(parts.size)("%s").mkString(" | ")
    indexed
      .withColumn(tagCol, format_string(fmt, col(rnField) +: parts: _*))
      .drop(rnField)
  }
}
