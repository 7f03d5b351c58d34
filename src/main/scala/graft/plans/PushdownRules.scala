package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{BigEndianLong, ExprHelpers}

/** Optimizer rule: rewrite comparisons on `graft_be_long(col)` into
  * additional RAW-BYTE comparisons on `col` that parquet can push down.
  *
  * The decoded sort key is opaque to scan pushdown (it is a function of
  * the column), so `WHERE graft_be_long(col_name) = 42` or a numeric
  * BETWEEN scans every page. Legal raw-byte equivalents (big-endian
  * two's-complement order analysis, see Comparators.pushdownRange):
  *  - equality: decode is injective on the 8-byte domain, and any row the
  *    original predicate accepts has length 8 ⇒ `col = beBytes(v)` always;
  *  - range with BOTH bounds non-negative: byte order == numeric order on
  *    the sign-bit-clear region and negatives fall outside both forms.
  * The original predicate is kept (the added conjunct is redundant), so
  * semantics are unchanged — the rewrite only feeds the scan's filter
  * pushdown. This generalizes the hint `operators/Slice` adds for its own
  * plans to ANY user query (spark.sql included) on a session where
  * [[GraftOptimizations.install]] ran.
  */
object PushBeLongComparisons extends Rule[LogicalPlan] {

  private def beLit(v: Long): Literal =
    Literal(ExprHelpers.longBytes(v), org.apache.spark.sql.types.BinaryType)

  private def nonNeg(v: Any): Boolean = v.asInstanceOf[Long] >= 0

  /** Raw-byte conjunct implied by one comparison, if any. */
  private def rawHint(e: Expression): Option[Expression] = e match {
    case EqualTo(BigEndianLong(c), l @ Literal(v: Long, _)) => Some(EqualTo(c, beLit(v)))
    case EqualTo(l @ Literal(v: Long, _), BigEndianLong(c)) => Some(EqualTo(c, beLit(v)))
    case _ => None
  }

  /** Find [lo, hi] bounds on the same decoded column within a conjunction;
    * emit the byte BETWEEN when both are non-negative.
    */
  private def rangeHints(conjuncts: Seq[Expression]): Seq[Expression] = {
    def loOf(e: Expression): Option[(Expression, Long, Boolean)] = e match {
      case GreaterThanOrEqual(BigEndianLong(c), Literal(v: Long, _)) => Some((c, v, true))
      case GreaterThan(BigEndianLong(c), Literal(v: Long, _)) => Some((c, v, false))
      case LessThanOrEqual(Literal(v: Long, _), BigEndianLong(c)) => Some((c, v, true))
      case LessThan(Literal(v: Long, _), BigEndianLong(c)) => Some((c, v, false))
      case _ => None
    }
    def hiOf(e: Expression): Option[(Expression, Long, Boolean)] = e match {
      case LessThanOrEqual(BigEndianLong(c), Literal(v: Long, _)) => Some((c, v, true))
      case LessThan(BigEndianLong(c), Literal(v: Long, _)) => Some((c, v, false))
      case GreaterThanOrEqual(Literal(v: Long, _), BigEndianLong(c)) => Some((c, v, true))
      case GreaterThan(Literal(v: Long, _), BigEndianLong(c)) => Some((c, v, false))
      case _ => None
    }
    val los = conjuncts.flatMap(loOf)
    val his = conjuncts.flatMap(hiOf)
    for {
      (cl, lo, loIncl) <- los
      (ch, hi, hiIncl) <- his
      if cl.semanticEquals(ch) && lo >= 0 && hi >= 0
    } yield {
      val lower: Expression =
        if (loIncl) GreaterThanOrEqual(cl, beLit(lo)) else GreaterThan(cl, beLit(lo))
      val upper: Expression =
        if (hiIncl) LessThanOrEqual(cl, beLit(hi)) else LessThan(cl, beLit(hi))
      And(lower, upper)
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjuncts(cond)
      val eqHints = conjuncts.flatMap(rawHint)
      val rHints = rangeHints(conjuncts)
      val fresh = (eqHints ++ rHints).filterNot(h => conjuncts.exists(_.semanticEquals(h)))
      if (fresh.isEmpty) f
      else Filter(fresh.foldLeft(cond)(And(_, _)), child)
  }
}

/** Session-scoped installation of the engine's optimizer rules. Uses the
  * public `experimental.extraOptimizations` hook so it composes with an
  * already-running session (the `SparkSessionExtensions` route only
  * applies at session construction); `GraftSession.create` installs it.
  */
object GraftOptimizations {
  def install(spark: org.apache.spark.sql.SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[PushBeLongComparisons.type]))
      spark.experimental.extraOptimizations = cur :+ PushBeLongComparisons
  }
}
