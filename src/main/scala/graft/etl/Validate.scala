package graft.etl

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/** Typed validation at ingest (reference: pydantic/SQLModel validated
  * models with constrained types — conint/condecimal ranges, enum
  * checks, whitespace stripping; models.py:29-71, 101-175).
  *
  * The reference raises per-record on violation; a distributed engine
  * must not fail a 100 TB job for one bad row, so rows are routed:
  * valid rows become a typed Dataset[T], violations go to a reject
  * side-output carrying the first failed constraint name.
  */
object Validate {

  final case class Validated[T](valid: Dataset[T], rejected: DataFrame)

  /** Apply named constraints; rows failing any go to `rejected` with a
    * `violation` column naming the first failed constraint.
    */
  def apply[T: Encoder](df: DataFrame, constraints: Seq[(String, Column)]): Validated[T] = {
    val violation = constraints.foldRight(lit(null: String)) {
      case ((name, pred), elseCol) => when(!coalesce(pred, lit(false)), name).otherwise(elseCol)
    }
    val tagged = df.withColumn("violation", violation)
    Validated(
      tagged.where(col("violation").isNull).drop("violation").as[T],
      tagged.where(col("violation").isNotNull))
  }

  /** Trim every string column (reference str_strip_whitespace=True,
    * models.py:37,112).
    */
  def trimStrings(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.dataType == org.apache.spark.sql.types.StringType)
        d.withColumn(f.name, trim(col(f.name)))
      else d
    }

  /** Decode maps (reference F8/F9 pitch-class + mode decode,
    * models.py:76-97): applied only when the input is all-digits,
    * mirroring `if v.isdigit()` (models.py:156-161).
    */
  val PitchClasses: Map[String, String] = Map(
    "0" -> "C", "1" -> "C#,Db", "2" -> "D", "3" -> "D#,Eb", "4" -> "E",
    "5" -> "F", "6" -> "F#,Gb", "7" -> "G", "8" -> "G#,Ab", "9" -> "A",
    "10" -> "A#,Bb", "11" -> "B", "-1" -> "")
  val MusicalModes: Map[String, String] = Map("0" -> "minor", "1" -> "Major")

  def decode(c: Column, mapping: Map[String, String]): Column =
    when(c.rlike("^-?[0-9]+$"), element_at(typedLit(mapping), c)).otherwise(c)
}
