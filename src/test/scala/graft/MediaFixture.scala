package graft

import java.nio.file.{Files, Paths}

/** Shared 12-row wide media NDJSON fixture reproducing the reference's
  * serialization quirks: numeric fields as strings, album_gain MIXED
  * (string in 11 rows, JSON number in 1 — SURVEY §1.3), empty
  * enrichment ids. Used by MediaPipelineSpec (pipeline semantics) and
  * EtlModulesSpec (JDBC round-trip of the split tables).
  */
object MediaFixture {
  lazy val path: String = {
    val dir = Files.createTempDirectory("media_fixture")
    val artists = Seq("alpha band", "beta trio", "gamma duo", "delta act")
    val lines = (1 to 12).map { i =>
      val artist = artists((i - 1) % 4)
      val gain = if (i == 12) "0.0" else s""""-${i}.25""""  // mixed type quirk
      s"""{"index":"${f"$i%03d"}","file_size":${1000000 * i},"readable_size":"${i}.0 MiB",""" +
        s""""file_ext":"${if (i % 3 == 0) ".flac" else ".mp3"}","artist_name":"$artist",""" +
        s""""album_title":"album_$i","track_title":"track_$i","track_number":"$i",""" +
        s""""track_length":"0:0$i:00","music_genre":"${if (i % 2 == 0) "genre_even" else "genre_odd"}",""" +
        s""""genre_in_dict":"GENRE_OK","album_art":"ALBUM_ART","year":"${2000 + i}","rating":${i % 5}.0,""" +
        s""""encoder":"","composer":"$artist","conductor":"","comment":"","track_gain":"-${i}.5",""" +
        s""""album_gain":$gain,"bitrate":320000,"sampling_rate":44100,"file_name":"f$i.mp3",""" +
        s""""path_len":"${100 + i}","last_modified":"2020-01-0${i % 9 + 1} 10:00:00.000000",""" +
        s""""encoding":"ascii","hash":"HASH$i","artist_id":"art_${(i - 1) % 4}","album_id":"alb_$i",""" +
        s""""track_id":"trk_$i"}"""
    }
    Files.writeString(Paths.get(dir.toString, "local_media_x.json"), lines.mkString("\n"))
    dir.toString
  }
}
