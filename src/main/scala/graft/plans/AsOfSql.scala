package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType, StructType}

/** SQL surface for the AS-OF join (the engine's flagship custom
  * operator — [[AsOfJoinNode]]): a tiny dialect extension installed by
  * [[graft.GraftExtensions]].
  *
  * {{{
  * SELECT ... FROM purchases p
  * ASOF JOIN clicks c
  *   ON p.user_id = c.user_id AND asof_backward(p.ts, c.ts)
  * }}}
  *
  * Two cooperating pieces, neither of which re-implements SQL parsing:
  *
  *  1. [[GraftSqlParser]] — a delegating parser that rewrites the
  *     `ASOF JOIN` keyword pair to `LEFT JOIN` (quote-aware, so string
  *     literals are never touched) and hands everything else to
  *     Spark's own parser. The keyword is declarative sugar; the MATCH
  *     SEMANTICS ride in the ON clause as a marker function, which
  *     also makes plain `LEFT JOIN ... AND asof_backward(...)` an
  *     accepted spelling.
  *  2. [[AsOfSqlRule]] — a post-hoc resolution rule that finds a left
  *     join whose condition carries exactly one [[AsOfMatch]] marker,
  *     splits the remaining conjuncts into equi-keys, and replaces the
  *     join with [[AsOfJoinNode]] (attribute ids preserved — a left
  *     outer join has the identical output schema, so references above
  *     the join are untouched).
  *
  * Markers (match the pandas merge_asof directions the DataFrame API
  * exposes; `tol` is an optional integer literal in the time column's
  * own unit):
  *
  *  - `asof_backward(l_time, r_time [, tol])` — latest right row with
  *    `r_time <= l_time`
  *  - `asof_forward(l_time, r_time [, tol])` — earliest right row with
  *    `r_time >= l_time` (negated times over the same backward merge,
  *    exactly like [[AsOf.joinForward]])
  *  - `asof_nearest(l_time, r_time [, tol])` — the closer of the two,
  *    ties backward
  *
  * A marker that survives to execution (used outside a join's ON
  * clause) is [[Unevaluable]] and fails with its pretty name — it
  * cannot silently evaluate to a boolean.
  */
case class AsOfMatch(children: Seq[Expression], direction: String)
    extends Expression with Unevaluable {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = s"asof_$direction"
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(children = c)
}

object AsOfMatch {
  /** Function builder for [[graft.GraftExtensions]] registration. */
  def builder(direction: String)(xs: Seq[Expression]): Expression = {
    if (xs.length < 2 || xs.length > 3)
      throw new IllegalArgumentException(
        s"asof_$direction(l_time, r_time[, tolerance]) takes 2 or 3 arguments, got ${xs.length}")
    AsOfMatch(xs, direction)
  }
}

/** Rewrites a resolved `LEFT JOIN` carrying one [[AsOfMatch]] marker
  * into [[AsOfJoinNode]]. Runs as a post-hoc resolution rule: after
  * the condition's attributes are resolved, before CheckAnalysis.
  */
object AsOfSqlRule extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case j @ Join(l, r, LeftOuter, Some(cond), _)
        if j.resolved && cond.exists(_.isInstanceOf[AsOfMatch]) =>
      convert(l, r, cond)
    case j: Join if j.resolved && j.condition.exists(_.exists(_.isInstanceOf[AsOfMatch])) =>
      throw new IllegalArgumentException(
        "asof_* match conditions require ASOF JOIN (or LEFT JOIN), got " + j.joinType)
  }

  private def convert(l: LogicalPlan, r: LogicalPlan, cond: Expression): LogicalPlan = {
    val (markers, rest) =
      splitConjunctivePredicates(cond).partition(_.isInstanceOf[AsOfMatch])
    if (markers.size != 1)
      throw new IllegalArgumentException(
        s"ASOF JOIN needs exactly one asof_* match condition, found ${markers.size}")
    val m = markers.head.asInstanceOf[AsOfMatch]
    def fromLeft(e: Expression) = e.references.subsetOf(l.outputSet)
    def fromRight(e: Expression) = e.references.subsetOf(r.outputSet)
    val (leftKeys, rightKeys) = rest.map {
      case EqualTo(a, b) if fromLeft(a) && fromRight(b) => (a, b)
      case EqualTo(a, b) if fromLeft(b) && fromRight(a) => (b, a)
      case other => throw new IllegalArgumentException(
        "ASOF JOIN ON supports equi-key conjuncts plus one asof_* condition; " +
          s"cannot use: ${other.sql}")
    }.unzip
    if (leftKeys.isEmpty)
      throw new IllegalArgumentException("ASOF JOIN needs at least one equi-key conjunct")
    val (lt, rt) = (m.children(0), m.children(1)) match {
      case (a, b) if fromLeft(a) && fromRight(b) => (a, b)
      case (a, b) if fromLeft(b) && fromRight(a) => (b, a)
      case _ => throw new IllegalArgumentException(
        s"${m.prettyName}: one time expression must come from each join side")
    }
    val tolerance = m.children.drop(2).headOption.map {
      case Literal(v: Long, LongType) => v
      case Literal(v: Int, IntegerType) => v.toLong
      case other => throw new IllegalArgumentException(
        s"${m.prettyName}: tolerance must be an integer literal, got ${other.sql}")
    }
    m.direction match {
      case "backward" =>
        AsOfJoinNode(l, r, leftKeys, rightKeys, lt, rt, tolerance)
      case "forward" => // latest at-or-before -t IS earliest at-or-after t
        AsOfJoinNode(l, r, leftKeys, rightKeys,
          UnaryMinus(lt, failOnError = false), UnaryMinus(rt, failOnError = false),
          tolerance)
      case "nearest" =>
        AsOfJoinNode(l, r, leftKeys, rightKeys, lt, rt, tolerance, nearest = true)
      case other =>
        throw new IllegalArgumentException(s"unknown as-of direction: $other")
    }
  }
}

/** Filter pushdown through [[AsOfJoinNode]]: Catalyst's own
  * PushDownPredicates cannot see through an unknown binary node, so
  * without this rule every predicate written above an ASOF JOIN scans
  * both sides in full — at 100 TB, the difference between a pruned
  * parquet read and a full one.
  *
  * Safe moves for the left-outer as-of semantics:
  *  - a deterministic conjunct referencing only LEFT columns pushes to
  *    the left child (each left row's match depends only on the right
  *    side, so pre-filtering left rows equals post-filtering);
  *  - a conjunct referencing only left JOIN KEYS additionally
  *    propagates to the right child rewritten over the right keys
  *    (a right row whose key fails the predicate could only have
  *    matched left rows that the push already removed);
  *  - anything touching right-side outputs stays put (null-extension
  *    would change its meaning).
  *
  * Once pushed below the node, Spark's stock rules carry the filter
  * the rest of the way into the scan (PushedFilters) — this rule only
  * bridges the custom-node gap.
  */
object AsOfFilterPushdown extends Rule[LogicalPlan] with PredicateHelper {
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case f @ Filter(cond, a: AsOfJoinNode) =>
      val (pushable, keep) = splitConjunctivePredicates(cond).partition(p =>
        p.deterministic && p.references.subsetOf(a.left.outputSet))
      if (pushable.isEmpty) f
      else {
        // key-only predicates also mirror to the right side over the
        // corresponding right keys
        val keyMap = a.leftKeys.zip(a.rightKeys).collect {
          case (lk: Attribute, rk) => (lk: Expression) -> rk
        }.toMap
        val leftKeyAttrs = keyMap.keySet.map(_.references.head)
        val mirrored = pushable
          .filter(_.references.subsetOf(AttributeSet(leftKeyAttrs.toSeq)))
          .map(_.transform { case at: Attribute if keyMap.contains(at) => keyMap(at) })
        val newLeft = Filter(pushable.reduce(And), a.left)
        val newRight = mirrored.reduceOption(And)
          .map(Filter(_, a.right)).getOrElse(a.right)
        val pushed = a.copy(left = newLeft, right = newRight)
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Column pruning through [[AsOfJoinNode]] — the projection sibling of
  * [[AsOfFilterPushdown]]: Catalyst's ColumnPruning cannot narrow the
  * children of an unknown binary node, so `SELECT three, columns FROM
  * wide ASOF JOIN wide` would read every column of both sides. When a
  * Project above the node references only a subset of a child's
  * output, a Project over (referenced ∪ join keys ∪ time) is inserted
  * on that child; the node's own output shrinks with its children
  * (it is derived from them), and the stock rules then push the
  * child Projects into the scans (ReadSchema). Fires only when it
  * actually narrows something, so it is fixed-point-safe.
  */
object AsOfColumnPruning extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.Project

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case p @ Project(_, a: AsOfJoinNode) =>
      val needed = AttributeSet(p.references.toSeq) ++
        AttributeSet(a.leftKeys.flatMap(_.references) ++
          a.rightKeys.flatMap(_.references) ++
          a.leftTime.references ++ a.rightTime.references)
      def prune(child: LogicalPlan): LogicalPlan = {
        val keep = child.output.filter(needed.contains)
        if (keep.size < child.output.size) Project(keep, child) else child
      }
      val (nl, nr) = (prune(a.left), prune(a.right))
      if (nl.eq(a.left) && nr.eq(a.right)) p
      else p.copy(child = a.copy(left = nl, right = nr))
  }
}

/** Delegating parser: rewrites the `ASOF JOIN` keyword pair to
  * `LEFT JOIN` outside string literals and defers everything to the
  * session's stock parser. See [[AsOfSqlRule]] for why this is safe:
  * the keyword is sugar, the semantics live in the marker function.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  import GraftSqlParser.rewriteAsOf
  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(rewriteAsOf(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(rewriteAsOf(sqlText))
  // ParserInterface DEFAULT method (Spark 4.1): spark.sql(text, args)
  // binds named/positional parameters through it. Without this
  // forward, the interface default runs instead of the delegate's
  // binding override and every parameterized query fails UNBOUND —
  // the one method a delegating wrapper must not forget.
  override def parsePlanWithParameters(
      sqlText: String,
      ctx: org.apache.spark.sql.catalyst.parser.ParameterContext): LogicalPlan =
    delegate.parsePlanWithParameters(rewriteAsOf(sqlText), ctx)
  override def parseExpression(s: String): Expression = delegate.parseExpression(s)
  override def parseTableIdentifier(s: String): TableIdentifier =
    delegate.parseTableIdentifier(s)
  override def parseFunctionIdentifier(s: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(s)
  override def parseMultipartIdentifier(s: String): Seq[String] =
    delegate.parseMultipartIdentifier(s)
  override def parseRoutineParam(s: String): StructType = delegate.parseRoutineParam(s)
  override def parseTableSchema(s: String): StructType = delegate.parseTableSchema(s)
  override def parseDataType(s: String): DataType = delegate.parseDataType(s)
}

object GraftSqlParser {
  /** `ASOF JOIN` -> `LEFT JOIN`, skipping single-quoted string
    * literals ('' escapes fall out naturally: the closing quote flips
    * state and the next immediately reopens it).
    */
  private[graft] def rewriteAsOf(sql: String): String = {
    val sb = new StringBuilder(sql.length)
    var i = 0
    var inQuote = false
    def wordAt(pos: Int, w: String): Boolean =
      pos + w.length <= sql.length && sql.regionMatches(true, pos, w, 0, w.length) &&
        (pos + w.length == sql.length || !isWordChar(sql.charAt(pos + w.length)))
    def isWordChar(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inQuote) {
        sb.append(c); if (c == '\'') inQuote = false; i += 1
      } else if (c == '\'') {
        sb.append(c); inQuote = true; i += 1
      } else if (wordAt(i, "ASOF") && (i == 0 || !isWordChar(sql.charAt(i - 1)))) {
        var j = i + 4
        while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
        if (wordAt(j, "JOIN")) { sb.append("LEFT JOIN"); i = j + 4 }
        else { sb.append(c); i += 1 }
      } else {
        sb.append(c); i += 1
      }
    }
    sb.toString
  }
}
