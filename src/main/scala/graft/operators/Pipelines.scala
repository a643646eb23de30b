package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end pipeline-shaped operators: multimodal binary-column
  * processing, NDJSON staging round-trip (the reference's load-bearing
  * staging contract), and the offline broadcast lookup join.
  */
object Pipelines {
  import Relational.Q

  /** Multimodal column plumbing (binary payload -> typed metadata)
    * with a REAL codec decode: each row carries a complete, spec-valid
    * PNG (written by the JDK's own ImageIO encoder in the ingest
    * stage, standing in for image bytes that arrived opaque — the
    * container has no image fixtures), and the decode stage runs the
    * actual `javax.imageio` PNG reader over the binary column — no
    * external dependency, no stub. The ingest synthesizes a solid
    * gray w x h image deterministically from doc_id, so every decoded
    * field has a closed-form oracle; `be_int` additionally parses the
    * IHDR width/height straight off the encoder's bytes, so the
    * codec's answer and the byte-level header parse cross-check each
    * other inside one hash-compared result.
    *
    * Scale shape: narrow map end to end (encode+decode per row inside
    * one mapPartitions, header fields as codegen'd expressions), no
    * shuffle until the presentation sort — decode throughput scales
    * linearly with executors.
    */
  val q34_multimodal_meta: Q = (spark, dir) => {
    import spark.implicits._
    graft.Tables.load(spark, dir, "documents")
      .select($"doc_id").as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // no tmp-file churn
        it.map { id =>
          // ingest: a real PNG, deterministic from doc_id
          val w = (id % 48 + 1).toInt
          val h = (id % 29 + 1).toInt
          val gray = (id % 256).toInt
          val rgb = (gray << 16) | (gray << 8) | gray
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          val bytes = bos.toByteArray
          // decode: the real codec reads the opaque bytes back
          val decoded = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          (id, bytes, decoded.getWidth, decoded.getHeight,
            decoded.getRGB(0, 0) & 0xFF)
        }
      }
      .toDF("doc_id", "payload", "width", "height", "gray")
      .select($"doc_id", $"width", $"height", $"gray",
        graft.functions.GraftFunctions.be_int($"payload", 16).as("header_width"),
        graft.functions.GraftFunctions.be_int($"payload", 20).as("header_height"),
        lit("png").as("format"))
      .orderBy($"doc_id")
  }

  /** NDJSON staging round-trip (reference K3/S1: NDJSON is the offline
    * staging contract between extract and load, run_playlist_etl.py:30).
    * Writes a projection of `events` as newline-delimited JSON, reads
    * it back with a declared schema (never inference — SURVEY §1.2),
    * and aggregates. Verifies the sink+source pair end-to-end.
    */
  val q35_ndjson_roundtrip: Q = (spark, dir) => {
    import spark.implicits._
    val stage = Files.createDirectories(
      Paths.get(sys.props("java.io.tmpdir"), "graft_stage")).toString +
      s"/events_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    Tables_events(spark, dir)
      .select($"event_id", $"user_id", $"event_type", $"value")
      .write.mode("overwrite").json(stage)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    spark.read.schema(schema).json(stage)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .orderBy($"event_type")
  }

  private def Tables_events(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.load(spark, dir, "events")

  /** Offline lookup join (reference J5/S7: OFFLINE_*_IDS broadcast maps
    * with 'not_found' default, sql/offline_ids.py:3-46,
    * spotify_client.py:266-268). Broadcast left join + coalesce.
    */
  val q36_offline_lookup: Q = (spark, dir) => {
    import spark.implicits._
    val dim = graft.Tables.load(spark, dir, "nation")
      .where($"n_nationkey" < 12)
      .select($"n_nationkey", concat(lit("N-"), $"n_nationkey").as("code"))
    graft.Tables.load(spark, dir, "customer")
      .join(broadcast(dim), $"c_nationkey" === $"n_nationkey", "left")
      .select($"c_custkey", coalesce($"code", lit("not_found")).as("lookup_code"))
      .orderBy($"c_custkey")
  }

  /** Multimodal frame sampling: slice each binary payload into 4
    * fixed-stride "frames" (the video-pipeline shape: one row per
    * sampled frame with per-frame metadata). Real binary slicing via
    * substring-on-binary + posexplode; the per-frame decode is the
    * same deterministic stub policy as q34. At scale this is a
    * narrow map — one input row fans out to k frame rows with no
    * shuffle.
    */
  val q52_frame_sample: Q = (spark, dir) => {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val nFrames = 4
    val docs = graft.Tables.load(spark, dir, "documents")
      .select($"doc_id", encode($"text", "utf-8").as("payload"))
      .withColumn("stride", ceil(length($"payload") / lit(nFrames.toDouble)).cast("int"))
    val frames = (0 until nFrames).map { i =>
      struct(lit(i).as("frame_id"),
        length(substring($"payload", $"stride" * i + 1, $"stride")).as("frame_bytes")).as(s"f$i")
    }
    docs
      .select($"doc_id", explode(array(frames: _*)).as("f"))
      .select($"doc_id", $"f.frame_id", $"f.frame_bytes")
      .where($"frame_bytes" > 0)
      .orderBy($"doc_id", $"frame_id")
  }

  /** REAL byte-level header decode (no codec dependency): each row
    * carries a spec-valid PNG prefix (8-byte signature + IHDR length/
    * type + big-endian width/height) synthesized in a mapPartitions
    * ingest stage — standing in for bytes that arrived opaque — and
    * the engine parses dimensions back out with the generic `be_int`
    * field reader and a binary substring for the chunk type. This is
    * the part of image decode that IS expressible without a codec,
    * and the same `be_int` kernel reads ISOBMFF/WAV-style layouts.
    * Narrow map end to end: no shuffle until the presentation sort.
    */
  val q60_image_header: Q = (spark, dir) => {
    import spark.implicits._
    def pngPrefix(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(24)
      b.put(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
      b.putInt(13)                      // IHDR data length
      b.put("IHDR".getBytes("US-ASCII"))
      b.putInt(w).putInt(h)             // big-endian dimensions
      b.array()
    }
    graft.Tables.load(spark, dir, "documents")
      .select($"doc_id").as[Long]
      .mapPartitions(_.map { id =>
        (id, pngPrefix((id % 512 + 16).toInt, (id % 333 + 16).toInt))
      })
      .toDF("doc_id", "payload")
      .select($"doc_id",
        graft.functions.GraftFunctions.be_int($"payload", 16).as("width"),
        graft.functions.GraftFunctions.be_int($"payload", 20).as("height"),
        decode(substring($"payload", 13, 4), "US-ASCII").as("chunk_type"))
      .orderBy($"doc_id")
  }

  /** REAL little-endian header decode — the WAV/RIFF twin of q60 (PNG
    * is big-endian; consumer-audio RIFF layouts are little-endian, the
    * other half of real multimodal metadata; reference analog: the
    * binary `album_art` field of data/local_media_extract.json). Each
    * row carries a spec-valid 44-byte canonical PCM WAV header
    * synthesized in a mapPartitions ingest stage, and the engine
    * parses the fmt/data fields back out with the generic `le_int` /
    * `le_short` readers plus a binary substring for the RIFF tag;
    * duration is then derived in integer arithmetic (engine-exact).
    * Narrow map end to end: no shuffle until the presentation sort.
    */
  val q74_wav_header: Q = (spark, dir) => {
    import spark.implicits._
    val rates = Array(8000, 16000, 22050, 44100, 48000)
    def wavHeader(id: Long): Array[Byte] = {
      val sampleRate = rates((id % 5).toInt)
      val channels = 1 + (id % 2).toInt
      val bits = 16
      val byteRate = sampleRate * channels * bits / 8
      val dataBytes = ((id % 1000) + 1).toInt * 1024
      val b = java.nio.ByteBuffer.allocate(44)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      b.put("WAVE".getBytes("US-ASCII"))
      b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      b.putShort(1.toShort)                      // PCM
      b.putShort(channels.toShort)
      b.putInt(sampleRate)
      b.putInt(byteRate)
      b.putShort((channels * bits / 8).toShort)  // block align
      b.putShort(bits.toShort)
      b.put("data".getBytes("US-ASCII")).putInt(dataBytes)
      b.array()
    }
    import graft.functions.GraftFunctions.{le_int, le_short}
    graft.Tables.load(spark, dir, "documents")
      .select($"doc_id").as[Long]
      .mapPartitions(_.map(id => (id, wavHeader(id))))
      .toDF("doc_id", "payload")
      .select($"doc_id",
        decode(substring($"payload", 1, 4), "US-ASCII").as("riff_tag"),
        le_short($"payload", 22).as("channels"),
        le_int($"payload", 24).as("sample_rate"),
        le_int($"payload", 28).as("byte_rate"),
        le_int($"payload", 40).as("data_bytes"))
      .withColumn("duration_ms",
        expr("(CAST(data_bytes AS BIGINT) * 1000) DIV byte_rate"))
      .orderBy($"doc_id")
  }

  /** PCM sample-level audio analysis — the step AFTER q74's header
    * parse: decode the little-endian int16 sample stream out of each
    * WAV payload (REAL byte-level decode via the `pcm_samples` kernel,
    * one codegen'd call per row) and compute per-file energy, peak
    * amplitude, and silence-frame counts (64-sample frames, |peak| <
    * 256 threshold) — the silence-trim / loudness-filter pass an audio
    * training-data pipeline runs before transcription. The synthesized
    * payloads carry a spec-valid 44-byte header plus a deterministic
    * integer sample stream (quiet frames amplitude-reduced via `% 64`,
    * sign semantics identical in Scala/Spark/DuckDB), so the oracle
    * re-derives every metric arithmetically while the engine parses
    * actual bytes. Narrow map end-to-end: decode + HOF frame analysis,
    * no shuffle until the presentation sort. At 100 TB the sample
    * arrays never leave their input partition.
    */
  val q131_audio_energy: Q = (spark, dir) => {
    import spark.implicits._
    def wavBytes(id: Long): Array[Byte] = {
      val n = (64 * (1 + id % 4)).toInt
      val sampleRate = 16000
      val b = java.nio.ByteBuffer.allocate(44 + 2 * n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
      b.put("WAVE".getBytes("US-ASCII"))
      b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      b.putShort(1.toShort).putShort(1.toShort)
      b.putInt(sampleRate).putInt(sampleRate * 2)
      b.putShort(2.toShort).putShort(16.toShort)
      b.put("data".getBytes("US-ASCII")).putInt(2 * n)
      var i = 0L
      while (i < n) {
        val raw = ((id * 31 + i * 17 + (i * i) % 97) % 2048) - 1024
        val v = if ((id + i / 64) % 3 == 0) raw % 64 else raw
        b.putShort(v.toShort)
        i += 1
      }
      b.array()
    }
    import graft.functions.GraftFunctions.pcm_samples
    graft.Tables.load(spark, dir, "documents")
      .select($"doc_id").as[Long]
      .mapPartitions(_.map(id => (id, wavBytes(id))))
      .toDF("doc_id", "payload")
      .select($"doc_id", pcm_samples($"payload", 44).as("samples"))
      .selectExpr(
        "doc_id",
        "size(samples) AS n_samples",
        "aggregate(samples, CAST(0 AS BIGINT), (acc, s) -> acc + CAST(s AS BIGINT) * s) AS energy",
        "array_max(transform(samples, s -> abs(s))) AS peak",
        "CAST(size(samples) DIV 64 AS INT) AS frames",
        """CAST(size(filter(sequence(CAST(0 AS BIGINT), size(samples) DIV 64 - 1),
          |  f -> array_max(transform(slice(samples, CAST(f * 64 + 1 AS INT), 64),
          |                           s -> abs(s))) < 256)) AS INT) AS silence_frames"""
          .stripMargin)
      .orderBy($"doc_id")
  }

  val oracles: Map[String, String] = Map(
    "q131_audio_energy" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(64 * (1 + doc_id % 4) AS INTEGER) AS n FROM documents),
        |s AS (
        |  SELECT doc_id, n, unnest(range(n)) AS i FROM d),
        |sv AS (
        |  SELECT doc_id, n, i // 64 AS f,
        |    CASE WHEN (doc_id + i // 64) % 3 = 0
        |         THEN (((doc_id * 31 + i * 17 + (i * i) % 97) % 2048) - 1024) % 64
        |         ELSE ((doc_id * 31 + i * 17 + (i * i) % 97) % 2048) - 1024
        |    END AS v
        |  FROM s),
        |fr AS (
        |  SELECT doc_id, n, f, MAX(ABS(v)) AS fmax, SUM(v * v) AS fe
        |  FROM sv GROUP BY 1, 2, 3)
        |SELECT doc_id, n AS n_samples,
        |  CAST(SUM(fe) AS BIGINT) AS energy,
        |  CAST(MAX(fmax) AS INTEGER) AS peak,
        |  CAST(COUNT(*) AS INTEGER) AS frames,
        |  CAST(SUM(CASE WHEN fmax < 256 THEN 1 ELSE 0 END) AS INTEGER) AS silence_frames
        |FROM fr GROUP BY doc_id, n ORDER BY doc_id""".stripMargin,
    "q74_wav_header" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    [8000, 16000, 22050, 44100, 48000][CAST(doc_id % 5 AS INTEGER) + 1] AS sample_rate,
        |    CAST(1 + doc_id % 2 AS INTEGER) AS channels,
        |    CAST((doc_id % 1000 + 1) * 1024 AS INTEGER) AS data_bytes
        |  FROM documents)
        |SELECT doc_id, 'RIFF' AS riff_tag, channels,
        |  CAST(sample_rate AS INTEGER) AS sample_rate,
        |  CAST(sample_rate * channels * 2 AS INTEGER) AS byte_rate,
        |  data_bytes,
        |  CAST(data_bytes AS BIGINT) * 1000 // (sample_rate * channels * 2) AS duration_ms
        |FROM t ORDER BY doc_id""".stripMargin,
    "q60_image_header" ->
      """SELECT doc_id,
        | CAST(doc_id % 512 + 16 AS INTEGER) AS width,
        | CAST(doc_id % 333 + 16 AS INTEGER) AS height,
        | 'IHDR' AS chunk_type
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q52_frame_sample" ->
      """WITH d AS (
        |  SELECT doc_id, octet_length(encode(text)) AS len,
        |    CAST(CEIL(octet_length(encode(text)) / 4.0) AS INTEGER) AS stride
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, i AS frame_id,
        |    CAST(LEAST(GREATEST(len - stride * i, 0), stride) AS INTEGER) AS frame_bytes
        |  FROM d CROSS JOIN range(0, 4) t(i))
        |SELECT doc_id, CAST(frame_id AS INTEGER) AS frame_id, frame_bytes
        |FROM f WHERE frame_bytes > 0 ORDER BY doc_id, frame_id""".stripMargin,
    "q34_multimodal_meta" ->
      """SELECT doc_id,
        | CAST(doc_id % 48 + 1 AS INTEGER) AS width,
        | CAST(doc_id % 29 + 1 AS INTEGER) AS height,
        | CAST(doc_id % 256 AS INTEGER) AS gray,
        | CAST(doc_id % 48 + 1 AS INTEGER) AS header_width,
        | CAST(doc_id % 29 + 1 AS INTEGER) AS header_height,
        | 'png' AS format
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q35_ndjson_roundtrip" ->
      """SELECT event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q36_offline_lookup" ->
      """SELECT c_custkey, COALESCE(d.code, 'not_found') AS lookup_code
        |FROM customer LEFT JOIN (
        |  SELECT n_nationkey, 'N-' || n_nationkey AS code
        |  FROM nation WHERE n_nationkey < 12) d
        |ON c_nationkey = d.n_nationkey
        |ORDER BY c_custkey""".stripMargin)

  val queries: Map[String, Q] = Map(
    "q34_multimodal_meta" -> q34_multimodal_meta,
    "q52_frame_sample" -> q52_frame_sample,
    "q35_ndjson_roundtrip" -> q35_ndjson_roundtrip,
    "q36_offline_lookup" -> q36_offline_lookup,
    "q60_image_header" -> q60_image_header,
    "q74_wav_header" -> q74_wav_header,
    "q131_audio_energy" -> q131_audio_energy)
}
