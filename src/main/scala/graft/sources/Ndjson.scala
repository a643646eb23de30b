package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, input_file_name, length, trim}
import org.apache.spark.sql.types.StructType

/** NDJSON staging source/sink (reference S1-S3 + K3: newline-delimited
  * JSON is the reference's offline staging contract —
  * pd.read_json(lines=True) at postgres_media.py:300, one model.json()
  * per line at spotify_client.py:118-134, file discovery glob at
  * postgres_media.py:285-293).
  *
  * Schema is ALWAYS declared, never inferred: the reference fixture has
  * mixed-type fields (album_gain is string in 11 rows, number in 1 —
  * SURVEY §1.3) and a 2-pass inference over 100 TB is a non-starter.
  */
object Ndjson {

  /** Read NDJSON under a path/glob with a declared schema. Empty lines
    * are skipped by the Spark JSON source; `filterPushdown` prunes at
    * the scan.
    */
  def read(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema)
      .option("encoding", "UTF-8")
      .option("mode", "PERMISSIVE")
      .json(path)

  /** Read with provenance + ordering by source file (reference S3:
    * sorted glob, postgres_media.py:291).
    */
  def readWithProvenance(spark: SparkSession, schema: StructType, path: String): DataFrame =
    read(spark, schema, path).withColumn("source_file", input_file_name())

  /** Write one NDJSON dataset (reference K3 writes one file per table;
    * `singleFile` coalesces to reproduce that contract — only for
    * dimension-sized outputs, never a 100 TB fact).
    */
  def write(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode(SaveMode.Overwrite).json(path)
  }

  /** Non-empty-string filter helper (reference P7 skips empty JSON
    * lines, run_playlist_etl.py:44).
    */
  def nonEmpty(df: DataFrame, column: String): DataFrame =
    df.where(col(column).isNotNull && length(trim(col(column))) > 0)

  /** Debug side-output: pretty-printed JSON dump of a SMALL frame to a
    * dated path (reference K4 save_response: indent=2 payload dumps to
    * api/YYYY-MM-DD/{name}.json, spotify_client.py:91-116).
    * Observability only — driver-side collect, never for facts.
    */
  def debugDump(df: DataFrame, baseDir: String, name: String,
      maxRows: Int = 1000): java.nio.file.Path = {
    val date = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
      .format(java.time.LocalDate.now(java.time.ZoneOffset.UTC))
    val dir = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(baseDir, date))
    val rows = df.limit(maxRows).toJSON.collect()
    val pretty = rows.map { r =>
      "  " + r.replace("{", "{\n    ").replace(",\"", ",\n    \"").replace("}", "\n  }")
    }.mkString("[\n", ",\n", "\n]")
    java.nio.file.Files.writeString(dir.resolve(s"$name.json"), pretty)
  }
}
