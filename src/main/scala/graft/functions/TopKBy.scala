package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Exact top-k per group as a custom aggregate (SURVEY §2.12 extension:
  * the argmax family generalized from k=1 to k rows carried per group).
  *
  * Why an aggregate and not a window: a window top-k shuffles EVERY row
  * to its group's partition before ranking (WindowGroupLimit prunes to
  * k per map partition, but rows still carry full width); this
  * aggregate keeps a k-element heap per group and combines heaps
  * map-side, so only k (value, payload) pairs per group per partition
  * ever cross the wire — the right shape when groups are huge and k is
  * small, which is the 100 TB norm.
  *
  * Ordering: value desc, payload asc (deterministic tie-break).
  * Restricted to (Double value, Long payload) — the common analytic
  * case; wrap other types by casting upstream.
  */
case class TopKByAgg(valueChild: Expression, payloadChild: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByAgg.Heap] {
  import TopKByAgg.Heap

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(valueChild, payloadChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", DoubleType, nullable = false),
    StructField("payload", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "top_k_by"

  override def createAggregationBuffer(): Heap = new Heap(k)

  private def toDouble(v: Any): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: Number => n.doubleValue()
    case other => throw new IllegalArgumentException(
      s"top_k_by value must be numeric, got ${other.getClass.getName}")
  }

  override def update(buf: Heap, input: InternalRow): Heap = {
    val v = valueChild.eval(input)
    val p = payloadChild.eval(input)
    if (v != null && p != null)
      buf.offer(toDouble(v), p.asInstanceOf[Number].longValue())
    buf
  }

  override def merge(a: Heap, b: Heap): Heap = { a.absorb(b); a }

  override def eval(buf: Heap): Any = {
    val sorted = buf.sortedDesc
    new GenericArrayData(sorted.map { case (v, p) =>
      InternalRow(v, p)
    })
  }

  override def serialize(buf: Heap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val items = buf.sortedDesc
    out.writeInt(items.length)
    items.foreach { case (v, p) => out.writeDouble(v); out.writeLong(p) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Heap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val h = new Heap(k)
    (0 until n).foreach(_ => h.offer(in.readDouble(), in.readLong()))
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByAgg =
    copy(valueChild = newChildren(0), payloadChild = newChildren(1))
}

object TopKByAgg {

  /** Bounded min-heap over (value asc, payload desc) so the ROOT is the
    * worst retained element; offer/absorb keep the k best under the
    * output ordering (value desc, payload asc).
    */
  final class Heap(k: Int) {
    private val pq = new java.util.PriorityQueue[(Double, Long)](
      math.max(k, 1),
      (a: (Double, Long), b: (Double, Long)) => {
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(b._2, a._2)
      })

    def offer(v: Double, p: Long): Unit = {
      if (pq.size < k) pq.offer((v, p))
      else {
        val worst = pq.peek()
        // keep if strictly better: higher value, or equal value and lower payload
        if (v > worst._1 || (v == worst._1 && p < worst._2)) {
          pq.poll(); pq.offer((v, p))
        }
      }
    }

    def absorb(other: Heap): Unit = {
      val it = other.pq.iterator()
      while (it.hasNext) { val (v, p) = it.next(); offer(v, p) }
    }

    /** (value desc, payload asc) — the output order. */
    def sortedDesc: Array[(Double, Long)] = {
      val arr = pq.toArray(new Array[(Double, Long)](pq.size))
      scala.util.Sorting.stableSort(arr,
        (a: (Double, Long), b: (Double, Long)) =>
          a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
      arr
    }
  }

  /** Column API: `df.groupBy(...).agg(top_k_by(value, payload, 3))`. */
  def top_k_by(value: Column, payload: Column, k: Int): Column =
    GraftBridge.column(
      TopKByAgg(GraftBridge.expression(value), GraftBridge.expression(payload), k)
        .toAggregateExpression())
}
