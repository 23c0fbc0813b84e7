package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The reference's validation engine (SURVEY §2.10,
  * `/root/reference/src/dataprep/validation/validate_dynamic_row.py`)
  * re-expressed as one declarative DataFrame transform: each pass contributes
  * violation tags; status = "flagged" iff any tag fired; violations stored as
  * a ";"-joined string (reference `ticker_batch_runner.py:462`).
  *
  * Everything is `when`-chains inside a single `select` — one codegen stage,
  * no shuffle except the jump pass (which needs a `lag` window per entity).
  */
object Validation {

  /** Range rule: value must lie in [lo, hi) (or [lo, hi] when
    * `hiInclusive`); nulls pass silently (the reference's NaN-tolerant set,
    * `validate_dynamic_row.py:41-46`). */
  final case class RangeRule(colName: String, lo: Double, hi: Double,
                             hiInclusive: Boolean = false) {
    def violation: Column = {
      val c = col(colName)
      val outHi = if (hiInclusive) c > hi else c >= hi
      when(c.isNotNull && (c < lo || outHi),
        lit(s"$colName: out-of-bounds"))
    }
  }

  /** Single-pass pipeline observability: `df.observe` attaches aggregate
    * metrics (row count, null counts, value bounds) that are computed
    * DURING whatever action consumes the frame — at 100 TB a separate
    * stats scan doubles the I/O bill; observed metrics ride the existing
    * pass for free (they run as accumulator-backed aggregates, no extra
    * shuffle, no extra scan). Returns the instrumented frame plus the
    * Observation handle; call `obs.get` AFTER an action completes. */
  def observedStats(df: DataFrame, cols: Seq[String]): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation()
    val metrics: Seq[Column] =
      count(lit(1)).as("n_rows") +:
      cols.flatMap { c =>
        Seq(count_if(col(c).isNull).as(s"${c}_nulls"),
          min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))
      }
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** Jump rule (reference V3): flag when |cur/prev| > limit and |prev| >=
    * floor, prev taken from the previous row per entity. */
  final case class JumpRule(colName: String, limit: Double, prevFloor: Double) {
    def violation(prev: Column): Column =
      when(prev.isNotNull && col(colName).isNotNull &&
        abs(prev) >= prevFloor && abs(col(colName) / prev) > limit,
        lit(s"$colName: abnormal change"))
  }

  /** Nullification rule (reference V1): when `unstableWhen` holds, null the
    * target column and tag it. */
  final case class NullifyRule(colName: String, unstableWhen: Column, tag: String)

  /** Consistency rule (reference V4): boolean predicate => violation tag. */
  final case class ConsistencyRule(predicate: Column, tag: String)

  /** Apply all passes. Appends `validation_status` and `violations` columns;
    * nullify rules rewrite their target columns in place.
    *
    * @param orderCols ordering for the jump pass's lag window (use a unique
    *                  composite so results are deterministic under ties)
    * @param entityCols partition keys for the jump pass
    */
  def validate(df: DataFrame,
               ranges: Seq[RangeRule] = Nil,
               jumps: Seq[JumpRule] = Nil,
               nullifies: Seq[NullifyRule] = Nil,
               consistencies: Seq[ConsistencyRule] = Nil,
               entityCols: Seq[String] = Nil,
               orderCols: Seq[String] = Nil): DataFrame = {

    // V1 nullification first (reference pass order): rewrite + tag.
    val nullified = nullifies.foldLeft(df) { (d, r) =>
      d.withColumn(r.colName, when(r.unstableWhen, lit(null)).otherwise(col(r.colName)))
    }
    val nullifyTags: Seq[Column] = nullifies.map(r => when(r.unstableWhen, lit(r.tag)))

    val rangeTags: Seq[Column] = ranges.map(_.violation)

    val jumpTags: Seq[Column] =
      if (jumps.nonEmpty && orderCols.nonEmpty) {
        val w = Window.partitionBy(entityCols.map(col): _*)
          .orderBy(orderCols.map(col): _*)
        jumps.map(j => j.violation(lag(col(j.colName), 1).over(w)))
      } else Nil

    val consistencyTags: Seq[Column] = consistencies.map(r => when(r.predicate, lit(r.tag)))

    val allTags = nullifyTags ++ rangeTags ++ jumpTags ++ consistencyTags
    if (allTags.isEmpty) {
      nullified.withColumn("validation_status", lit("ok"))
        .withColumn("violations", lit(""))
    } else {
      nullified
        .withColumn("violations", concat_ws(";", allTags: _*))
        .withColumn("validation_status",
          when(col("violations") === "", lit("ok")).otherwise(lit("flagged")))
    }
  }
}
