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
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects; read it as epoch-nanos Long instead. Queries
      // needing a timestamp derive one via `ts DIV 1000` -> micros.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$sfDir/$name.parquet")
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
