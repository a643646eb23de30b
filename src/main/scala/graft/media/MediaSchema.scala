package graft.media

import org.apache.spark.sql.types._

/** Declared schemas for the media-tag domain (reference §1.3).
  *
  * The wide NDJSON record serializes several numeric-looking fields as
  * STRINGS (`track_number`, `year`, `path_len`, `track_gain`) and
  * `album_gain` as a MIXED string/number — so inference is unsafe
  * (reference: data/local_media_extract.json; SURVEY §1.3). Everything
  * is declared StringType where the JSON is stringly and cast
  * explicitly in [[MediaPipeline.typed]].
  */
object MediaSchema {

  /** Wide denormalized record, one row per local music file
    * (reference: data/local_media_extract.json field set; loaded at
    * postgres_media.py:300).
    */
  val wideSchema: StructType = StructType(Seq(
    StructField("index", StringType),
    StructField("file_size", LongType),
    StructField("readable_size", StringType),
    StructField("file_ext", StringType),
    StructField("artist_name", StringType),
    StructField("album_title", StringType),
    StructField("track_title", StringType),
    StructField("track_number", StringType),   // stringly number
    StructField("track_length", StringType),
    StructField("music_genre", StringType),
    StructField("genre_in_dict", StringType),
    StructField("album_art", StringType),
    StructField("year", StringType),           // stringly number
    StructField("rating", DoubleType),
    StructField("encoder", StringType),
    StructField("composer", StringType),
    StructField("conductor", StringType),
    StructField("comment", StringType),
    StructField("track_gain", StringType),     // stringly decimal
    StructField("album_gain", StringType),     // MIXED string/number -> string
    StructField("bitrate", LongType),
    StructField("sampling_rate", LongType),
    StructField("file_name", StringType),
    StructField("path_len", StringType),       // stringly number
    StructField("last_modified", StringType),
    StructField("encoding", StringType),
    StructField("hash", StringType),
    StructField("artist_id", StringType),
    StructField("album_id", StringType),
    StructField("track_id", StringType)))

  /** Target table -> column subset (reference DDL create_tables.sql:
    * 3-66; `id SERIAL` omitted exactly as the loader omits it,
    * postgres_media.py:225).
    */
  val tableColumns: Map[String, Seq[String]] = Map(
    "artist" -> Seq("artist_id", "artist_name", "composer", "conductor",
      "extract_date"),
    "album" -> Seq("album_id", "artist_id", "album_title", "year",
      "album_gain", "album_art", "extract_date"),
    "track" -> Seq("track_id", "album_title", "track_title", "artist_id",
      "track_number", "track_length", "rating", "comment", "track_gain",
      "bitrate", "sampling_rate", "extract_date"),
    "genre" -> Seq("artist_id", "artist_name", "music_genre",
      "genre_in_dict", "extract_date"),
    "metadata" -> Seq("track_id", "file_size", "readable_size", "file_ext",
      "encoder", "file_name", "path_len", "last_modified", "encoding",
      "hash", "extract_date"))
}
