package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

/** Driver-side config source (reference S10: TOML -> pydantic settings,
  * util/settings.py:46-52, 82-106, 139-159). Zero-dependency parser for
  * the flat `[section]` / `key = value` TOML subset the reference's
  * config files use (config/settings_example.toml); validated typed
  * access mirrors the pydantic settings classes.
  */
object Config {

  final case class Settings(sections: Map[String, Map[String, String]]) {
    def apply(section: String): Map[String, String] =
      sections.getOrElse(section, Map.empty)
    def str(section: String, key: String): String =
      apply(section).getOrElse(key,
        throw new NoSuchElementException(s"missing [$section] $key"))
    def int(section: String, key: String): Int = str(section, key).toInt
    def double(section: String, key: String): Double = str(section, key).toDouble
  }

  /** Parse the flat TOML subset: sections, k = v with string/number/
    * bool values, # comments. (Arrays/tables/multiline are out of
    * scope — the reference's settings files are flat.)
    */
  def parse(text: String): Settings = {
    var section = ""
    val out = scala.collection.mutable.Map.empty[String, Map[String, String]]
      .withDefaultValue(Map.empty)
    // strip a # comment only when it appears OUTSIDE double quotes
    // (a '#' inside a quoted value is part of the value)
    def stripComment(line: String): String = {
      var inQuotes = false
      var i = 0
      while (i < line.length) {
        val ch = line.charAt(i)
        if (ch == '"') inQuotes = !inQuotes
        else if (ch == '#' && !inQuotes) return line.substring(0, i)
        i += 1
      }
      line
    }
    text.linesIterator.foreach { raw =>
      val line = stripComment(raw).trim
      if (line.startsWith("[") && line.endsWith("]")) {
        section = line.substring(1, line.length - 1).trim
      } else if (line.contains("=")) {
        val Array(k, v) = line.split("=", 2)
        val trimmed = v.trim
        val value =
          if (trimmed.length >= 2 && trimmed.startsWith("\"") && trimmed.endsWith("\""))
            trimmed.substring(1, trimmed.length - 1)
          else trimmed
        out(section) = out(section) + (k.trim -> value)
      }
    }
    Settings(out.toMap)
  }

  def load(path: String): Settings =
    parse(Files.readString(Paths.get(path)))
}
