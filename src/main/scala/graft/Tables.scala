package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated star schema
  * (see TESTDATA.md). All queries take an `sfDir` so the same code runs
  * at any scale factor; at cluster scale these would be catalog tables
  * partitioned on date/key columns, locally they're single parquet files.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // Driver datasets have shipped events.ts as parquet
      // TIMESTAMP(NANOS) (which Spark's vectorized reader only accepts
      // as epoch-nanos Long via nanosAsLong) and as tz-naive
      // TIMESTAMP(MICROS) (which Spark reads as TIMESTAMP_NTZ). All
      // query code and every DuckDB oracle treats ts as epoch-nanos
      // BIGINT of the naive-UTC instant, so normalize both physical
      // encodings to that one logical type here — the single choke
      // point every events consumer goes through.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Pin the session timezone at this choke point, BEFORE the
      // read: see the TIMESTAMP_LTZ branch below for why.
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => df
        case _: org.apache.spark.sql.types.TimestampNTZType =>
          // timestampdiff on two NTZ values is timezone-independent.
          df.withColumn("ts", org.apache.spark.sql.functions.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) * 1000L"))
        case _ =>
          // TIMESTAMP_LTZ: unix_micros is exact when the parquet
          // column is genuinely isAdjustedToUTC=true. But a vintage
          // can also land here with TZ-NAIVE micros read as LTZ (e.g.
          // inferTimestampNTZ disabled, or a writer that omitted the
          // annotation) — then the naive value is interpreted in the
          // SESSION timezone and ts would shift by the UTC offset.
          // The session timezone is pinned to UTC above (before the
          // read) so both cases yield the naive-UTC instant:
          // true-UTC values are unaffected, naive-as-LTZ values get
          // interpreted as UTC.
          df.withColumn("ts", org.apache.spark.sql.functions.expr(
            "unix_micros(ts) * 1000L"))
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }
  /** Register every table as a temp view (for the SQL surface / EP3). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

  /** Cheap dataset fingerprint for the per-JVM index caches (IVF
    * centroids, decontamination Blooms): name, length and mtime of
    * every file under the table path, hashed. Changes whenever the
    * data under a dir is rewritten, so a cache keyed on
    * (dir, fingerprint) can never serve a stale artifact — the
    * in-JVM stand-in for the dataset snapshot id a production
    * catalog would provide.
    */
  def fingerprint(sfDir: String, name: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().sortBy(_.getName).toSeq.flatMap(walk)
      else Seq(f)
    val sig = walk(new java.io.File(s"$sfDir/$name.parquet"))
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}").mkString("|")
    Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(sig))
  }
}
