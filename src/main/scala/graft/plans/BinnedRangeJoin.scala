package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Opt-in planner support for date range joins: `point_in_range(p, lo, hi,
  * binDays)` is a plain boolean expression (exactly `p BETWEEN lo AND hi`),
  * and [[BinnedRangeJoinRule]] rewrites any inner join whose condition
  * carries it into the binned equi-join `core.RangeJoin` builds by hand —
  * bin-key equality + exact refine — so the physical plan is a hash/sort
  * join instead of the broadcast-nested-loop Spark plans for a bare
  * BETWEEN condition.
  *
  * The marker design keeps the rule surgically scoped: it can only ever
  * fire on joins that asked for it, and if the rule is NOT installed the
  * marker still evaluates correctly (the join just stays a nested loop),
  * so plans never change semantics with or without the extension. This is
  * the (c)-tier custom-planner path of the build rules — used where the
  * built-in planner genuinely lacks a strategy, kept opt-in because
  * Catalyst handles everything else.
  *
  * Install: `spark.sql.extensions=graft.functions.GraftExtensions`, or on
  * a live session `spark.experimental.extraOptimizations ++= Seq(
  * BinnedRangeJoinRule)`.
  */
case class PointInRange(point: Expression, lo: Expression, hi: Expression,
                        binDays: Int)
    extends Expression with CodegenFallback {
  require(binDays >= 1, s"binDays must be >= 1, got $binDays")

  override def children: Seq[Expression] = Seq(point, lo, hi)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "point_in_range"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DateType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"point_in_range expects three DATE arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))

  // fallback semantics when the rule is not installed: p BETWEEN lo AND hi
  // (DateType is day-count ints internally)
  override def eval(input: InternalRow): Any = {
    val p = point.eval(input)
    val l = lo.eval(input)
    val h = hi.eval(input)
    if (p == null || l == null || h == null) null
    else {
      val pi = p.asInstanceOf[Int]
      pi >= l.asInstanceOf[Int] && pi <= h.asInstanceOf[Int]
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PointInRange =
    copy(point = newChildren(0), lo = newChildren(1), hi = newChildren(2))
}

object PointInRange {
  /** Join-condition marker: semantically `point BETWEEN lo AND hi`. */
  def apply(point: Column, lo: Column, hi: Column, binDays: Int): Column =
    ColumnBridge.column(PointInRange(ColumnBridge.expression(point),
      ColumnBridge.expression(lo), ColumnBridge.expression(hi), binDays))
}

/** Rewrites `Join(..., cond containing point_in_range)` into the binned
  * form: points side projected with its bin, intervals side exploded to
  * the bins it covers, join on bin equality refined by the exact range
  * (plus any other conjuncts untouched). A top Project restores the
  * original output, so parents are unaffected. Fires only on INNER joins
  * carrying exactly one marker whose point/bounds sit on opposite sides. */
object BinnedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(_, _, Inner, Some(cond), _)
        if cond.exists(_.isInstanceOf[PointInRange]) =>
      val preds = splitConjunctivePredicates(cond)
      val markers = preds.collect { case m: PointInRange => m }
      if (markers.size != 1) j
      else rewrite(j, markers.head, preds.filterNot(_ eq markers.head))
        .getOrElse(j)
  }

  private def rewrite(j: Join, m: PointInRange,
                      rest: Seq[Expression]): Option[LogicalPlan] = {
    val boundRefs = m.lo.references ++ m.hi.references
    val pointOnLeft = m.point.references.subsetOf(j.left.outputSet) &&
      boundRefs.subsetOf(j.right.outputSet)
    val pointOnRight = m.point.references.subsetOf(j.right.outputSet) &&
      boundRefs.subsetOf(j.left.outputSet)
    if (!pointOnLeft && !pointOnRight) return None

    val (ptsPlan, ivPlan) = if (pointOnLeft) (j.left, j.right) else (j.right, j.left)

    // bin(d) = floor(datediff(d, epoch) / binDays), as a LONG
    val epoch = Literal(0, DateType)
    def binOf(e: Expression): Expression =
      Floor(Divide(Cast(DateDiff(e, epoch), DoubleType),
        Literal(m.binDays.toDouble, DoubleType)))

    val ptBin = Alias(binOf(m.point), "__pt_bin")()
    val ptsProj = Project(ptsPlan.output :+ ptBin, ptsPlan)

    // inverted/null intervals match nothing under BETWEEN; filtering them
    // here also keeps Sequence's (stop-start)*step >= 0 contract
    val ivFiltered = Filter(GreaterThanOrEqual(m.hi, m.lo), ivPlan)
    val ivBin = AttributeReference("__iv_bin", LongType, nullable = false)()
    val gen = Generate(
      // Sequence is TimeZoneAware — without an explicit zone the new node
      // is unresolved and the optimizer rejects the rewritten plan
      Explode(Sequence(binOf(m.lo), binOf(m.hi), Some(Literal(1L)),
        Some(conf.sessionLocalTimeZone))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(ivBin), child = ivFiltered)

    val refined = And(
      GreaterThanOrEqual(m.point, m.lo), LessThanOrEqual(m.point, m.hi))
    val newCond = (Seq(EqualTo(ptBin.toAttribute, ivBin), refined) ++ rest)
      .reduce(And)
    val (nl, nr) = if (pointOnLeft) (ptsProj, gen) else (gen, ptsProj)
    Some(Project(j.output, Join(nl, nr, Inner, Some(newCond), j.hint)))
  }
}
