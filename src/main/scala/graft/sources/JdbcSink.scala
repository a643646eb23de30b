package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** JDBC sink (reference K1/K2: row-at-a-time INSERTs per table,
  * postgres_media.py:262-275, and per-record ORM session.add/commit,
  * run_playlist_etl.py:46-59).
  *
  * Spark-first replacement: one DataFrameWriter per target table,
  * batched statements, writer parallelism bounded by `numPartitions`
  * (the DB is the bottleneck — unbounded executor parallelism would
  * recreate the reference's connection churn at 1000x scale).
  *
  * No Postgres runs in this container; the write path is exercised
  * end-to-end against embedded Derby (on Spark's own classpath) in
  * EtlModulesSpec — a real JDBC URL, real INSERTs, read-back compare.
  */
object JdbcSink {

  final case class Config(url: String, table: String,
      user: String = "", password: String = "",
      batchSize: Int = 10000, numPartitions: Int = 8,
      isolationLevel: String = "READ_COMMITTED",
      driver: String = "")

  /** Configure the writer (append mode — the reference's INSERT path;
    * the drop/create DDL lifecycle D1-D3 is Engine.ddl's job).
    */
  def writer(df: DataFrame, cfg: Config): org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row] = {
    val w = df.repartition(cfg.numPartitions)
      .write.mode(SaveMode.Append)
      .format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", cfg.table)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("batchsize", cfg.batchSize)
      .option("isolationLevel", cfg.isolationLevel)
    if (cfg.driver.nonEmpty) w.option("driver", cfg.driver) else w
  }

  def write(df: DataFrame, cfg: Config): Unit = writer(df, cfg).save()

  /** Read a table back through the same JDBC seam (round-trip checks). */
  def read(spark: org.apache.spark.sql.SparkSession, cfg: Config): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", cfg.table)
      .option("user", cfg.user)
      .option("password", cfg.password)
    (if (cfg.driver.nonEmpty) r.option("driver", cfg.driver) else r).load()
  }
}
