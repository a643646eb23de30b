package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.{col, negate}

/** AS-OF JOIN — a whole-operator semantic Spark lacks (composing it
  * from window functions requires a union + two windows + a filter and
  * shuffles the right side twice). For every left row, attach the
  * single right row with the greatest `rightTime <= leftTime` within
  * the same key group, or nulls (left outer).
  *
  * Implemented the Catalyst-native way (SURVEY §7.3 "stretch"):
  * logical node -> planner strategy -> physical exec with
  * ClusteredDistribution + intra-partition (key, time) ordering, so
  * EnsureRequirements inserts exactly one hash exchange and one sort
  * per side, and execution is a streaming two-pointer merge per
  * partition — O(n+m), no state beyond one buffered right row.
  *
  * Scale: identical shape to SortMergeJoin — shuffle each side once on
  * the key, merge sorted runs; skew on the key behaves exactly like a
  * skewed SMJ (salt the key upstream if a single entity dominates).
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    tolerance: Option[Long] = None, nearest: Boolean = false)
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, tol, near) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol, near) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    tolerance: Option[Long] = None, nearest: Boolean = false)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys
    val rk = rightKeys
    val lt = BindReferences.bindReference(leftTime, lOut)
    val rt = BindReferences.bindReference(rightTime, rOut)
    val keyTypes = leftKeys.map(_.dataType)
    val rWidth = rOut.size
    val tol = tolerance
    val near = nearest
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      def timeOf(e: Expression, row: InternalRow): Long =
        e.eval(row) match {
          case l: java.lang.Long => l
          case i: java.lang.Integer => i.toLong
          case other => throw new IllegalArgumentException(
            s"as-of time must evaluate to an integral type, got $other")
        }
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rWidth)
      // materialize to UnsafeRow: downstream exchanges/aggregates expect
      // it. Right attributes MUST be re-bound as nullable — the outer
      // side emits a null row even when the child schema is non-null;
      // binding the child's non-nullable attrs would skip the null
      // check and read garbage zeros.
      val outAttrs = lOut ++ rOut.map(_.withNullability(true))
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)

      new Iterator[InternalRow] {
        private var rHead: InternalRow = _
        private var rHeadKey: UnsafeRow = _
        private var lastMatch: InternalRow = _   // copied
        private var lastMatchKey: UnsafeRow = _  // copied
        private var lastMatchTime: Long = _
        private def advanceRight(): Unit =
          if (rIt.hasNext) { rHead = rIt.next(); rHeadKey = rKeyProj(rHead) }
          else { rHead = null; rHeadKey = null }
        advanceRight()

        override def hasNext: Boolean = lIt.hasNext
        override def next(): InternalRow = {
          val l = lIt.next()
          val lKey = lKeyProj(l)
          // SQL equi-join semantics: NULL keys never match (the natural
          // row ordering would compare null == null, which would wrongly
          // pair null-keyed rows and diverge from the SQL/ASOF oracle)
          if (lKey.anyNull) return resultProj(joined(l, nullRight))
          val lTime = timeOf(lt, l)
          var cont = rHead != null
          while (cont) {
            val c = if (rHeadKey.anyNull) -1 // null right keys: skip past
              else keyOrd.compare(rHeadKey, lKey)
            if (c < 0) advanceRight()
            else if (c == 0 && timeOf(rt, rHead) <= lTime) {
              lastMatch = rHead.copy()
              lastMatchKey = rHeadKey.copy()
              lastMatchTime = timeOf(rt, lastMatch)
              advanceRight()
            } else cont = false
            if (rHead == null) cont = false
          }
          // tolerance (pandas merge_asof semantics): the nearest match
          // is the ONLY candidate — if it is too old, no older one can
          // qualify, so the row goes out null-extended
          val backOk = lastMatch != null &&
            keyOrd.compare(lastMatchKey, lKey) == 0 &&
            tol.forall(t => lTime - lastMatchTime <= t)
          if (!near) {
            if (backOk) resultProj(joined(l, lastMatch))
            else resultProj(joined(l, nullRight))
          } else {
            // nearest: the merge left rHead at the FIRST right row with
            // time > lTime (equal times were consumed as the backward
            // match, where the gap is 0 and backward wins anyway), so
            // rHead IS the forward candidate when its key matches
            val fwdGap =
              if (rHead != null && !rHeadKey.anyNull &&
                  keyOrd.compare(rHeadKey, lKey) == 0) {
                val g = timeOf(rt, rHead) - lTime
                if (tol.forall(g <= _)) g else -1L
              } else -1L
            if (backOk && (fwdGap < 0 || lTime - lastMatchTime <= fwdGap))
              resultProj(joined(l, lastMatch))
            else if (fwdGap >= 0) resultProj(joined(l, rHead))
            else resultProj(joined(l, nullRight))
          }
        }
      }
    }
  }
}

/** Public DataFrame-level API. */
object AsOf {

  /** True when [[AsOfJoinStrategy]] is installed session-wide (the
    * production path: `spark.sql.extensions=graft.GraftExtensions`).
    */
  private def viaExtensions(spark: SparkSession): Boolean =
    spark.sessionState.planner.strategies.contains(AsOfJoinStrategy)

  /** Left as-of join: for each left row, the latest right row with
    * `right(timeRight) <= left(timeLeft)` and equal key. Column names
    * must be disjoint between the two sides (alias beforehand).
    * Time columns must be integral (epoch numbers); timestamps compare
    * by their internal micros via cast upstream.
    *
    * Sessions built with [[graft.GraftExtensions]] get the AQE-friendly
    * plan: no user repartition, EnsureRequirements inserts the two
    * hash exchanges and AQE is free to coalesce them (it coalesces the
    * sibling stages of a co-partitioning-requiring binary node as one
    * group — the same guarantee SortMergeJoin leans on, verified in
    * AsOfJoinSpec). Sessions without extensions self-install via
    * `experimental.extraStrategies` and pre-partition explicitly.
    */
  def join(left: DataFrame, right: DataFrame,
      keyLeft: String, keyRight: String,
      timeLeft: String, timeRight: String): DataFrame =
    join(left, right, keyLeft, keyRight, timeLeft, timeRight,
      preShuffle = !viaExtensions(left.sparkSession))

  /** As [[join]], with the co-partitioning mode explicit:
    * `preShuffle = true` pins both sides to a fixed-count repartition
    * on the key (user-numbered repartitions are exempt from AQE
    * coalescing); `false` leaves the exchanges to EnsureRequirements.
    */
  def join(left: DataFrame, right: DataFrame,
      keyLeft: String, keyRight: String,
      timeLeft: String, timeRight: String,
      preShuffle: Boolean): DataFrame =
    join(left, right, keyLeft, keyRight, timeLeft, timeRight,
      preShuffle, tolerance = None)

  /** As [[join]], but a match older than `tolerance` (in the time
    * columns' own unit) is rejected and the row null-extends — pandas
    * `merge_asof(tolerance=...)` semantics. The nearest match is the
    * only candidate, so the check is a per-row comparison in the merge,
    * not a second pass.
    */
  def join(left: DataFrame, right: DataFrame,
      keyLeft: String, keyRight: String,
      timeLeft: String, timeRight: String,
      tolerance: Long): DataFrame =
    join(left, right, keyLeft, keyRight, timeLeft, timeRight,
      preShuffle = !viaExtensions(left.sparkSession), tolerance = Some(tolerance))

  /** Forward as-of: for each left row, the EARLIEST right row with
    * `right(timeRight) >= left(timeLeft)` (pandas merge_asof
    * direction='forward'). Implemented by running the backward merge
    * over negated times — "latest at-or-before -t" IS "earliest
    * at-or-after t" — so the exec stays a single streaming merge and
    * the negation columns never appear in the output.
    */
  def joinForward(left: DataFrame, right: DataFrame,
      keyLeft: String, keyRight: String,
      timeLeft: String, timeRight: String,
      tolerance: Option[Long] = None): DataFrame = {
    val ln = "__fwd_" + timeLeft
    val rn = "__fwd_" + timeRight
    join(left.withColumn(ln, negate(col(timeLeft))),
        right.withColumn(rn, negate(col(timeRight))),
        keyLeft, keyRight, ln, rn,
        preShuffle = !viaExtensions(left.sparkSession), tolerance)
      .drop(ln, rn)
  }

  /** Nearest as-of: for each left row, the closer of its backward and
    * forward candidates (ties and exact-time matches go backward —
    * pandas merge_asof direction='nearest'). Single streaming merge:
    * the forward candidate is simply the right head the merge stopped
    * at, so nearest costs one extra comparison per left row, not a
    * second pass or join.
    */
  def joinNearest(left: DataFrame, right: DataFrame,
      keyLeft: String, keyRight: String,
      timeLeft: String, timeRight: String,
      tolerance: Option[Long] = None): DataFrame =
    join(left, right, keyLeft, keyRight, timeLeft, timeRight,
      preShuffle = !viaExtensions(left.sparkSession), tolerance,
      nearest = true)

  private def join(left: DataFrame, right: DataFrame,
      keyLeft: String, keyRight: String,
      timeLeft: String, timeRight: String,
      preShuffle: Boolean, tolerance: Option[Long],
      nearest: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    if (!viaExtensions(spark) &&
        !spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val (l, r) =
      if (preShuffle) {
        val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
        (left.repartition(n, col(keyLeft)), right.repartition(n, col(keyRight)))
      } else (left, right)
    val lp = GraftBridge.analyzedPlan(l)
    val rp = GraftBridge.analyzedPlan(r)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name in ${p.output.map(_.name)}"))
    GraftBridge.ofRows(spark, AsOfJoinNode(lp, rp,
      Seq(attr(lp, keyLeft)), Seq(attr(rp, keyRight)),
      attr(lp, timeLeft), attr(rp, timeRight), tolerance, nearest))
  }
}
