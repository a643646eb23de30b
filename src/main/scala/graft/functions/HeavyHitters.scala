package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary as a mergeable custom aggregate
  * (SURVEY §2.12 extension; the sketch family's frequent-items member,
  * next to q61's HLL++/quantile summaries).
  *
  * Constant memory per group — at most `capacity` counters — where an
  * exact token count is O(vocabulary): the right shape for "what are
  * the heavy tokens" over a 100 TB corpus whose vocabulary does not
  * fit anywhere. Guarantees (classic MG + the Agarwal et al. merge):
  *
  *  - estimates UNDER-count: count_min <= true count <= count_max,
  *    with count_max - count_min == the summary's accumulated error
  *    (total decrement depth), itself <= N/(capacity+1);
  *  - NO FALSE NEGATIVES above the error: any item whose true count
  *    exceeds the accumulated error is guaranteed present — so the
  *    summary is a candidate superset for any support threshold
  *    above it, and an exact second pass over the <= capacity
  *    candidates (broadcast semi join) yields exact heavy hitters
  *    without ever building the full vocabulary (q76's shape).
  *
  * Merging sums counters pointwise, then subtracts the (capacity+1)-th
  * largest count from every counter and drops the non-positive ones —
  * the standard mergeable-summaries construction, used here by Spark's
  * partial aggregation exactly as map-side combine.
  */
case class HeavyHittersAgg(child: Expression, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HeavyHittersAgg.Summary] {
  import HeavyHittersAgg.Summary

  require(capacity > 0, "capacity must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count_min", LongType, nullable = false),
      StructField("count_max", LongType, nullable = false))),
      containsNull = false), nullable = false)))
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): Summary = new Summary(capacity)

  override def update(buf: Summary, input: InternalRow): Summary = {
    val v = child.eval(input)
    if (v != null) buf.offer(v.toString)
    buf
  }

  override def merge(a: Summary, b: Summary): Summary = { a.absorb(b); a }

  override def eval(buf: Summary): Any = {
    val items = buf.sorted.map { case (item, est) =>
      InternalRow(UTF8String.fromString(item), est, est + buf.maxError)
    }
    InternalRow(buf.total, new GenericArrayData(items))
  }

  override def serialize(buf: Summary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.total)
    out.writeLong(buf.maxError)
    val items = buf.sorted
    out.writeInt(items.length)
    items.foreach { case (item, est) => out.writeUTF(item); out.writeLong(est) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Summary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new Summary(capacity)
    s.total = in.readLong()
    s.maxError = in.readLong()
    val n = in.readInt()
    (0 until n).foreach(_ => s.put(in.readUTF(), in.readLong()))
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(child = newChildren(0))
}

object HeavyHittersAgg {

  /** At most `capacity` counters + the running total and accumulated
    * decrement depth (the per-item error bound).
    */
  final class Summary(capacity: Int) {
    private val counts = new java.util.HashMap[String, java.lang.Long]()
    var total: Long = 0L
    var maxError: Long = 0L

    private[HeavyHittersAgg] def put(item: String, c: Long): Unit =
      counts.put(item, c)

    def offer(item: String): Unit = {
      total += 1
      val cur = counts.get(item)
      if (cur != null) counts.put(item, cur + 1)
      else if (counts.size < capacity) counts.put(item, 1L)
      else decrementAll()
    }

    /** The arriving item and every counter shed one occurrence — the
      * classic MG step; each decrement is charged against capacity+1
      * distinct items, hence the N/(capacity+1) error bound.
      */
    private def decrementAll(): Unit = {
      maxError += 1
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1)
      }
    }

    def absorb(other: Summary): Unit = {
      total += other.total
      maxError += other.maxError
      val it = other.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cur = counts.get(e.getKey)
        counts.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
      }
      if (counts.size > capacity) {
        // subtract the (capacity+1)-th largest count from everything,
        // drop the non-positive rest (Agarwal et al. mergeable MG)
        val vals = new Array[Long](counts.size)
        var i = 0
        val vi = counts.values().iterator()
        while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
        java.util.Arrays.sort(vals)
        val cut = vals(counts.size - capacity - 1)
        maxError += cut
        val ei = counts.entrySet().iterator()
        while (ei.hasNext) {
          val e = ei.next()
          if (e.getValue <= cut) ei.remove() else e.setValue(e.getValue - cut)
        }
      }
    }

    /** (estimate desc, item asc) — deterministic presentation order. */
    def sorted: Array[(String, Long)] = {
      import scala.jdk.CollectionConverters._
      counts.asScala.toArray.map { case (k, v) => (k, v.longValue()) }
        .sortBy { case (k, v) => (-v, k) }
    }
  }

  /** Column API: `df.agg(heavy_hitters(col, 64))`. */
  def heavy_hitters(item: Column, capacity: Int): Column =
    GraftBridge.column(
      HeavyHittersAgg(GraftBridge.expression(item), capacity).toAggregateExpression())
}
