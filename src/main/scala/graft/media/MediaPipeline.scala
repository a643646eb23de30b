package graft.media

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.{Validate, VerticalSplit}
import graft.sources.Ndjson

/** The media-tag ETL, end to end (reference EP1,
  * run_pipeline.py trigger_etl -> postgres_media.py):
  *
  *   NDJSON scan (declared schema) -> trim -> typed casts ->
  *   extract_date stamp -> vertical split into
  *   artist/album/track/genre/metadata -> temp views ->
  *   the reference's 8 canned queries (params_queries.py:7-35).
  *
  * The reference executes this row-at-a-time with one INSERT per row
  * per table and a catalog query per row (postgres_media.py:240-275);
  * here the whole pipeline is 6 declarative plans over one cached scan.
  */
final class MediaPipeline(spark: SparkSession) {
  import spark.implicits._

  /** Scan + conform the wide frame (reference postgres_media.py:
    * 295-306): declared schema, trimmed strings, Postgres-DDL-typed
    * casts (create_tables.sql), UTC extract_date stamp.
    */
  def load(path: String): DataFrame =
    typed(Validate.trimStrings(Ndjson.read(spark, MediaSchema.wideSchema, path)))

  /** Casts mirroring the DDL types (SMALLINT/NUMERIC(5,2)/INT/
    * TIMESTAMP — create_tables.sql:3-66). rating is VARCHAR(16) in the
    * track DDL, so the JSON number becomes a string.
    */
  def typed(wide: DataFrame): DataFrame =
    wide
      .withColumn("track_number", $"track_number".cast(ShortType))
      .withColumn("year", $"year".cast(ShortType))
      .withColumn("path_len", $"path_len".cast(ShortType))
      .withColumn("track_gain", $"track_gain".cast(DecimalType(5, 2)))
      .withColumn("album_gain", $"album_gain".cast(DecimalType(5, 2)))
      .withColumn("file_size", $"file_size".cast(IntegerType))
      .withColumn("bitrate", $"bitrate".cast(IntegerType))
      .withColumn("sampling_rate", $"sampling_rate".cast(IntegerType))
      .withColumn("rating", $"rating".cast(StringType))
      .withColumn("last_modified", to_timestamp($"last_modified"))
      .withColumn("extract_date", current_timestamp())

  /** Vertical split (P2) into the 5 target tables. */
  def splitTables(wide: DataFrame): Map[String, DataFrame] =
    VerticalSplit.split(wide, MediaSchema.tableColumns)

  /** Register the split tables as temp views for the SQL surface. */
  def registerViews(tables: Map[String, DataFrame]): Unit =
    tables.foreach { case (n, df) => df.createOrReplaceTempView(n) }

  /** The 8 canned queries (reference params_queries.py:7-35, invoked
    * with these very parameters at run_pipeline.py:33-40), as
    * parameterized Spark SQL over the registered views.
    */
  def cannedQueries(
      artists: Seq[String] = Seq("Mazzy Star"),
      albums: Seq[String] = Seq("Debut"),
      tracks: Seq[String] = Seq("Future Proof"),
      genres2: Seq[String] = Seq("Trip-Hop", "Alternative"),
      fileExt: String = ".flac",
      gainBelow: BigDecimal = BigDecimal("-4.0"),
      joinGenre: Seq[String] = Seq("Classical")): Map[String, DataFrame] = {
    def in(xs: Seq[String]) = xs.map(x => s"'${x.replace("'", "''")}'").mkString(", ")
    Map(
      "artist_select" -> spark.sql(
        s"SELECT artist_id, artist_name, composer FROM artist WHERE artist_name IN (${in(artists)})"),
      "album_select" -> spark.sql(
        s"SELECT album_id, album_title, year, album_gain FROM album WHERE album_title IN (${in(albums)})"),
      "track_select" -> spark.sql(
        s"SELECT artist_id, album_title, track_title, track_length, rating FROM track WHERE track_title IN (${in(tracks)})"),
      "genre_select" -> spark.sql(
        s"SELECT artist_name, music_genre FROM genre WHERE music_genre IN (${in(genres2)})"),
      "file_select" -> spark.sql(
        s"SELECT file_name, encoding, file_ext FROM metadata WHERE file_ext = '$fileExt'"),
      "gain_select" -> spark.sql(
        s"""SELECT m.album_gain, a.artist_name, t.album_title
           |FROM track t
           |JOIN artist a ON t.artist_id = a.artist_id
           |JOIN album m ON m.artist_id = a.artist_id
           |WHERE m.album_gain < $gainBelow
           |ORDER BY m.album_gain DESC""".stripMargin),
      "join_select" -> spark.sql(
        s"""SELECT a.artist_name, t.album_title
           |FROM artist a
           |JOIN genre g ON g.artist_id = a.artist_id
           |JOIN track t ON t.artist_id = a.artist_id
           |WHERE g.music_genre IN (${in(joinGenre)})
           |ORDER BY artist_name""".stripMargin),
      "avg_size_select" -> spark.sql(
        "SELECT ROUND(AVG(file_size) / (1024 * 1024), 2) AS avg_mib FROM metadata"))
  }

  /** Full pipeline: path in, canned query results out. */
  def run(path: String): Map[String, DataFrame] = {
    val tables = splitTables(load(path))
    registerViews(tables)
    cannedQueries()
  }
}
