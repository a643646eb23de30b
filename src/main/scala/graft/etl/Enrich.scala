package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Enrichment joins (reference J3-J5): attach external identifiers to
  * records by exact lookup where possible and fuzzy best-match where
  * names are dirty.
  *
  *  - offline lookup (J5): broadcast left join against a static
  *    dictionary, missing -> "not_found" (spotify_client.py:266-268,
  *    sql/offline_ids.py:3-46).
  *  - fuzzy top-1 (J4): score candidates with InDel similarity
  *    (fuzz_ratio), keep the argmax per key, route matches below the
  *    confidence threshold to a diagnostics side-output
  *    (spotify_client.py:140-179; thold=70 config/settings_example.toml:34).
  *
  * Scale: candidates broadcast (dictionaries are small relative to the
  * fact side); scoring runs map-side inside whole-stage codegen; the
  * per-key argmax uses row_number + WindowGroupLimit, which pre-reduces
  * to k rows per partition before any shuffle.
  */
object Enrich {

  /** Broadcast left lookup with default for misses. `dict` must have
    * columns (key, value).
    */
  def offlineLookup(facts: DataFrame, factKey: Column, dict: DataFrame,
      outCol: String, default: String = "not_found"): DataFrame = {
    val d = dict.toDF("__k", "__v")
    facts.join(broadcast(d), factKey === col("__k"), "left")
      .withColumn(outCol, coalesce(col("__v"), lit(default)))
      .drop("__k", "__v")
  }

  /** Fuzzy best-match result: matched rows + below-threshold rejects. */
  final case class FuzzyResult(matched: DataFrame, rejected: DataFrame)

  /** For each distinct value of `keyCol` in `facts`, find the top-1
    * candidate by InDel similarity after ascii-folding both sides
    * (the reference normalizes with its unicode fold before scoring,
    * spotify_client.py:160-164). Candidates must have columns
    * (name, id).
    */
  def fuzzyTopOne(facts: DataFrame, keyCol: Column, candidates: DataFrame,
      threshold: Double = 70.0): FuzzyResult = {
    val keys = facts.select(keyCol.as("__key")).distinct()
    val cand = candidates.toDF("__name", "__id")
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__score").desc, col("__name"))
    val scored = keys.crossJoin(broadcast(cand))
      .withColumn("__score",
        fuzz_ratio(ascii_fold(lower(col("__key"))), ascii_fold(lower(col("__name")))))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
    val matched = scored.where(col("__score") >= threshold)
      .select(col("__key").as("key"), col("__id").as("id"),
        col("__name").as("matched_name"), col("__score").as("confidence"))
    // below-threshold keys: logged/dumped by the reference for diagnosis
    // (spotify_client.py:176-179) — here a queryable side-output.
    val rejected = scored.where(col("__score") < threshold)
      .select(col("__key").as("key"), col("__name").as("best_name"),
        col("__score").as("best_score"))
    FuzzyResult(matched, rejected)
  }

  /** Attach fuzzy-matched ids back onto the fact rows (J3 shape: the
    * reference enriched each row with artist/album/track ids before
    * loading, postgres_media.py:242-255).
    */
  def enrich(facts: DataFrame, keyCol: Column, candidates: DataFrame,
      outCol: String, threshold: Double = 70.0): DataFrame = {
    val top = fuzzyTopOne(facts, keyCol, candidates, threshold).matched
    facts.join(broadcast(top), keyCol === col("key"), "left")
      .withColumn(outCol, coalesce(col("id"), lit("not_found")))
      .drop("key", "id", "matched_name", "confidence")
  }
}
