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
      val s = v.asInstanceOf[UTF8String].toString
      if (s.length < n) Nil
      else (0 to s.length - n).map(i =>
        InternalRow(UTF8String.fromString(s.substring(i, i + n))))
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object NGramsGenerate {
  /** Column API: `df.select($"id", ngrams($"text", 3).as("ngram"))`. */
  def ngrams(text: Column, n: Int): Column =
    GraftBridge.column(NGramsGenerate(GraftBridge.expression(text), n))
}
