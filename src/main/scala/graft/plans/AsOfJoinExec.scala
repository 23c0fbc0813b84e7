package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode => LogicalBinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.PlanBridge

/** Whole-operator custom plan: as-of (backward) join as a first-class
  * physical operator — the (c)-tier of the build rules (LogicalPlan +
  * Strategy + SparkPlan), used because Spark's Scala API has no native
  * as-of join and the composed form (`core.AsOf.joinBackward`: union both
  * sides + running `last(ignoreNulls)` window + filter back) pays for
  * materializing right rows as output rows.
  *
  * Physical contract (what Catalyst schedules around it):
  *   - `requiredChildDistribution`: both children hash-clustered on the
  *     `by` keys → EnsureRequirements co-partitions them with ONE shuffle
  *     each (same cost envelope as a sort-merge join, strictly less than
  *     the union form which shuffles the union).
  *   - `requiredChildOrdering`: (keys..., time) ascending on both sides →
  *     the sorts ride the shuffle's local sort slot; AQE still re-plans
  *     partition counts.
  *   - `doExecute`: per co-partition, a single forward merge pass — for
  *     each left row, the latest right row with the same keys and
  *     `right.time <= left.time` contributes the value columns (atomic
  *     row carry, Polars `join_asof` semantics); no match → NULLs.
  *
  * Determinism: among right rows sharing one (keys, time) the winner
  * follows sort order, which is NOT stable across runs — dedupe the right
  * side first (same contract as `AsOf.joinBackward`'s tieBreak). NULL keys
  * group together (window-partition semantics); a NULL left time matches
  * nothing; NULL right times are skipped.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTime: Expression, rightTime: Expression,
                        rightValues: Seq[Attribute])
  extends LogicalBinaryNode {
  require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
    "as-of join needs at least one equality key, same count both sides")
  // the exec compares right-side rows with orderings built from LEFT types;
  // a type mismatch would mis-compare silently, not throw
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    s"as-of key types differ: ${leftKeys.map(_.dataType.simpleString)} vs " +
      s"${rightKeys.map(_.dataType.simpleString)}")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of time types differ: ${leftTime.dataType.simpleString} vs " +
      s"${rightTime.dataType.simpleString}")
  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, rv) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rv) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTime: Expression, rightTime: Expression,
                        rightValues: Seq[Attribute])
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // output rows keep the left child's partitioning (each output row IS a
  // left row plus attached values) — without this, downstream operators
  // keyed on the same keys would re-shuffle already co-partitioned data
  override def outputPartitioning = left.outputPartitioning

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val nValues = rightValues.size
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys
    val rk = rightKeys
    val lt = leftTime
    val rt = rightTime
    val rv = rightValues

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      val valProj = UnsafeProjection.create(rv, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val nullValues = InternalRow.fromSeq(Seq.fill[Any](nValues)(null))
      val joined = new JoinedRow
      // downstream exchanges/serializers require UnsafeRow output; the
      // value attrs must be re-bound NULLABLE or codegen elides the null
      // checks and an unmatched row reads as 0/"" instead of NULL
      val outAttrs = lOut ++ rv.map(_.withNullability(true))
      val resultProj = UnsafeProjection.create(
        outAttrs.map(a => a: Expression), outAttrs)

      new Iterator[InternalRow] {
        private var rRow: InternalRow = advanceRight()
        private var rKey: UnsafeRow = if (rRow != null) rKeyProj(rRow).copy() else null
        private var rTime: UnsafeRow = if (rRow != null) rTimeProj(rRow).copy() else null
        private var matchKey: UnsafeRow = _
        private var matchVal: UnsafeRow = _

        private def advanceRight(): InternalRow =
          if (rIter.hasNext) rIter.next() else null

        private def stepRight(): Unit = {
          rRow = advanceRight()
          if (rRow != null) {
            rKey = rKeyProj(rRow).copy()
            rTime = rTimeProj(rRow).copy()
          } else { rKey = null; rTime = null }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTime = lTimeProj(l)
          // a match cached for a previous key is stale once the key moves on
          if (matchKey != null && keyOrd.compare(matchKey, lKey) != 0) {
            matchKey = null; matchVal = null
          }
          if (!lTime.isNullAt(0)) {
            // consume right rows at-or-before this left row; the last one
            // with matching keys is the as-of match
            var continue = rRow != null
            while (continue) {
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0) stepRight()
              else if (c == 0 && rTime.isNullAt(0)) {
                // null right times sort first within the key and never
                // match — skip, or they'd block the scan from reaching
                // this key's real rows
                stepRight()
              } else if (c == 0 && timeOrd.compare(rTime, lTime) <= 0) {
                matchVal = valProj(rRow).copy()
                matchKey = lKey.copy()
                stepRight()
              } else continue = false
              if (rRow == null) continue = false
            }
          }
          val matched = matchVal != null && matchKey != null &&
            keyOrd.compare(matchKey, lKey) == 0 && !lTime.isNullAt(0)
          resultProj(joined(l, if (matched) matchVal else nullValues))
        }
      }
    }
  }
}

/** DataFrame-facing constructor for [[AsOfJoinPlan]]. */
object AsOfJoinApi {
  /** Registers the strategy (idempotent) and builds the as-of-backward join
    * `left ⟕asof right` attaching `valueCols` — same semantics as
    * `core.AsOf.joinBackward` (spec-pinned equivalence), different physical
    * plan: two co-partitioned sorted children + one merge pass instead of
    * union + window + filter. */
  def joinBackward(left: DataFrame, right: DataFrame, by: Seq[String],
                   timeCol: String, valueCols: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val lPlan = PlanBridge.analyzed(left)
    val rPlan0 = PlanBridge.analyzed(right)
    // Self-join hazard: when both sides derive from one relation they share
    // attribute ids, and the optimizer resolves the node's right-side
    // references against the LEFT child (pruning the right child to
    // nothing). Re-alias every right output to fresh ids — the analysis
    // dedup Spark's own Join gets from DeduplicateRelations, done by hand
    // because this node is built post-analysis.
    val rPlan: LogicalPlan =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).nonEmpty)
        org.apache.spark.sql.catalyst.plans.logical.Project(
          rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)
      else rPlan0
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in [${plan.output.map(_.name).mkString(", ")}]"))
    require(!left.columns.exists(valueCols.contains),
      s"value columns ${valueCols.mkString(",")} collide with left columns")
    val node = AsOfJoinPlan(lPlan, rPlan,
      by.map(attr(lPlan, _)), by.map(attr(rPlan, _)),
      attr(lPlan, timeCol), attr(rPlan, timeCol),
      valueCols.map(attr(rPlan, _)))
    PlanBridge.ofRows(spark, node)
  }

  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
}
