package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.Validate

/** Typed playlist-domain models + the playlist ETL (reference EP2,
  * run_playlist_etl.py + sql/models.py).
  *
  * Case classes mirror the validated SQLModel fields (models.py:29-71
  * liked_song; models.py:101-175 audio_feature); the pydantic
  * constraints become [[Validate]] constraint columns routing bad rows
  * to a reject side-output instead of raising per-record.
  */
object PlaylistModels {

  /** Valid URI-scheme kinds (reference VALID_TYPES, models.py:17-25). */
  val ValidTypes: Seq[String] = Seq(
    "track", "artist", "album", "playlist", "show", "episode", "audio_features")

  final case class LikedSong(
      track_id: String, `type`: String, artist_name: String, album_name: String,
      track_name: String, track_number: Int, duration: String,
      release_date: String, popularity: Int, added_at: String,
      external_url: String, extract_date: String, load_date: Option[String])

  final case class AudioFeature(
      `type`: String, id: String, uri: String,
      acousticness: BigDecimal, danceability: BigDecimal, duration_ms: Long,
      energy: BigDecimal, instrumentalness: BigDecimal, key: String,
      mode: String, liveness: BigDecimal, loudness: BigDecimal,
      speechiness: BigDecimal, tempo: BigDecimal, time_signature: Int,
      valence: BigDecimal, track_href: String, analysis_url: String,
      extract_date: String, load_date: Option[String])

  private def zeroOne(c: String) = col(c) >= 0 && col(c) <= 1

  /** Validate + canonicalize liked songs (constraints models.py:41-56). */
  def likedSongs(spark: SparkSession, raw: DataFrame): Validate.Validated[LikedSong] = {
    import spark.implicits._
    Validate[LikedSong](Validate.trimStrings(raw), Seq(
      "type_enum" -> col("type").isin(ValidTypes: _*),
      "track_number_ge0" -> (col("track_number") >= 0),
      "popularity_range" -> (col("popularity") >= 0 && col("popularity") <= 100)))
  }

  /** Validate + canonicalize audio features (constraints
    * models.py:116-150; pitch/mode decode models.py:156-168 — applied
    * before validation, as the reference's mode="before" validators do).
    */
  def audioFeatures(spark: SparkSession, raw: DataFrame): Validate.Validated[AudioFeature] = {
    import spark.implicits._
    val decoded = Validate.trimStrings(raw)
      .withColumn("key", Validate.decode(col("key").cast("string"), Validate.PitchClasses))
      .withColumn("mode", Validate.decode(col("mode").cast("string"), Validate.MusicalModes))
    Validate[AudioFeature](decoded, Seq(
      "type_enum" -> col("type").isin(ValidTypes: _*),
      "acousticness01" -> zeroOne("acousticness"),
      "danceability01" -> zeroOne("danceability"),
      "duration_ge0" -> (col("duration_ms") >= 0),
      "energy01" -> zeroOne("energy"),
      "instrumentalness01" -> zeroOne("instrumentalness"),
      "liveness01" -> zeroOne("liveness"),
      "loudness_le0" -> (col("loudness") <= 0),
      "speechiness01" -> zeroOne("speechiness"),
      "tempo_gt0" -> (col("tempo") > 0),
      "time_signature_gt0" -> (col("time_signature") > 0),
      "valence01" -> zeroOne("valence")))
  }

  /** Load staged NDJSON into the typed sink shape with a load_date
    * stamp (reference run_playlist_etl.py:46-59: read staging, stamp
    * load_date, insert).
    */
  def stampLoadDate[T](ds: Dataset[T]): DataFrame =
    ds.toDF().withColumn("load_date",
      date_format(current_timestamp(), "yyyy-MM-dd HH:mm:ss"))
}
