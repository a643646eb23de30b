package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._
import graft.plans.AsOfJoinStrategy

/** Production registration path: install the engine's planner strategy
  * and SQL functions at session build time —
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * (`AsOf.join` also self-injects via experimental.extraStrategies for
  * sessions built without extensions; `GraftFunctions.register` is the
  * equivalent runtime path for functions.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    GraftExtensions.functionSpecs.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.package", name), builder))
    }
  }
}

object GraftExtensions {
  private[graft] val functionSpecs: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "fuzz_ratio" -> (xs => FuzzRatioExpr(xs.head, xs(1))),
    "ascii_fold" -> (xs => AsciiFoldExpr(xs.head)),
    "sim_hash" -> (xs => SimHashExpr(xs.head)),
    "doc_fingerprint" -> (xs => DocFingerprintExpr(xs.head, 8)),
    "jaccard_grams" -> (xs => JaccardGramsExpr(xs.head, xs(1), 3)),
    "cosine_sim" -> (xs => CosineSimExpr(xs.head, xs(1))))
}
