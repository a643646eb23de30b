package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Character n-gram generator — the custom UDTF/Generator surface
  * (SURVEY §2.12): one input string row fans out to one row per n-gram
  * occurrence (duplicates preserved — this is the occurrence stream,
  * `gram_set` is the distinct-set form). Plans as a GenerateExec, the
  * same narrow no-shuffle fan-out as explode.
  */
case class NGramsGenerate(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(n > 0, "n must be positive")

  override def elementSchema: StructType =
    StructType(Seq(StructField("ngram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      // slide by CODE POINTS, not UTF-16 units: substring on char
      // indices would split surrogate pairs (emoji, CJK extensions)
      // into invalid lone-surrogate grams and diverge from the
      // codepoint-based SQL oracle
      val s = v.asInstanceOf[UTF8String].toString
      val cpCount = s.codePointCount(0, s.length)
      if (cpCount < n) Nil
      else {
        val out = new Array[InternalRow](cpCount - n + 1)
        var start = 0 // char offset of window start
        var i = 0
        while (i <= cpCount - n) {
          val end = s.offsetByCodePoints(start, n)
          out(i) = InternalRow(UTF8String.fromString(s.substring(start, end)))
          start = s.offsetByCodePoints(start, 1)
          i += 1
        }
        out
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object NGramsGenerate {
  /** Column API: `df.select($"id", ngrams($"text", 3).as("ngram"))`. */
  def ngrams(text: Column, n: Int): Column =
    GraftBridge.column(NGramsGenerate(GraftBridge.expression(text), n))
}
