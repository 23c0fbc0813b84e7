package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (backward) join — the reference's `join_asof(strategy="backward")`
  * (`/root/reference/src/dataprep/features/engineering/utils.py:60`).
  *
  * Spark has no native as-of join; this is the union + `last(ignoreNulls)`
  * window construction: tag both sides, union on (keys..., time), sort within
  * each key partition, carry the right side's values forward, keep left rows.
  *
  * Scale: ONE shuffle on the `by` keys (the window partition); no broadcast
  * or nested-loop range join. Both inputs are shuffled once regardless of
  * size skew between sides, which is the right trade at 100 TB where both
  * sides are large. For a tiny right side, broadcast+filter would also work,
  * but this form is uniformly safe.
  */
object AsOf {

  /** Left as-of-backward join.
    *
    * For each left row, attaches `valueCols` from the latest right row with
    * `right(timeCol) <= left(timeCol)` within the same `by` keys (ties on the
    * time column resolve to the right row — i.e. "at or before", inclusive).
    * Right rows that share an exact timestamp with a left row ARE visible to
    * that left row. If several right rows share one timestamp, the last one
    * in `tieBreak` order wins (pass e.g. a sequence column for determinism).
    * The matched row's values attach ATOMICALLY — a NULL in one value column
    * of the matched right row stays NULL (Polars `join_asof` semantics),
    * it is not backfilled from an older right row.
    *
    * @param left      left frame; must contain `by` and `timeCol`
    * @param right     right frame; must contain `by`, `timeCol`, `valueCols`
    * @param by        equality keys (e.g. ticker / user_id)
    * @param timeCol   ordering column name, present on both sides
    * @param valueCols right columns to attach
    * @param tieBreak  optional extra ordering among same-timestamp right rows
    */
  def joinBackward(left: DataFrame, right: DataFrame, by: Seq[String],
                   timeCol: String, valueCols: Seq[String],
                   tieBreak: Seq[Column] = Nil): DataFrame = {
    val leftCols = left.columns
    require(!leftCols.exists(valueCols.contains),
      s"value columns ${valueCols.mkString(",")} collide with left columns")

    // side: right=0 sorts before left=1 at equal time => right visible to left.
    val taggedLeft = left.withColumn("__side", lit(1))
    val taggedRight = right.select(
      (by.map(col) :+ col(timeCol) :+ lit(0).as("__side")) ++ valueCols.map(col): _*)

    val unioned = SchemaOps.unionHarmonized(Seq(taggedLeft, taggedRight), sortColumns = false)

    val w = Window.partitionBy(by.map(col): _*)
      .orderBy((col(timeCol).asc +: col("__side").asc +: tieBreak): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    // Carry ONE struct of all value columns so the whole matched right row
    // wins atomically: per-column last(ignoreNulls) would mix columns from
    // different right rows when the matched row holds a NULL.
    val packed = unioned.withColumn("__asof_row",
      when(col("__side") === 0, struct(valueCols.map(col): _*)))
      .withColumn("__asof_row", last(col("__asof_row"), ignoreNulls = true).over(w))
    val unpacked = valueCols.foldLeft(packed) { (df, v) =>
      df.withColumn(v, col("__asof_row").getField(v))
    }
    unpacked.filter(col("__side") === 1).drop("__side", "__asof_row")
  }

  /** Left as-of-FORWARD join: attaches `valueCols` from the EARLIEST right
    * row with `right(timeCol) >= left(timeCol)` within the same `by` keys
    * ("at or after", inclusive — a right row at the exact left timestamp
    * matches). Among several right rows sharing that earliest timestamp the
    * FIRST in `tieBreak` order wins. Same single-shuffle union+window
    * construction as [[joinBackward]], with the frame looking forward. */
  def joinForward(left: DataFrame, right: DataFrame, by: Seq[String],
                  timeCol: String, valueCols: Seq[String],
                  tieBreak: Seq[Column] = Nil): DataFrame = {
    val leftCols = left.columns
    require(!leftCols.exists(valueCols.contains),
      s"value columns ${valueCols.mkString(",")} collide with left columns")

    // left=0 sorts before right=1 at equal time, so an equal-time right row
    // is inside the left row's [current, following] frame.
    val taggedLeft = left.withColumn("__side", lit(0))
    val taggedRight = right.select(
      (by.map(col) :+ col(timeCol) :+ lit(1).as("__side")) ++ valueCols.map(col): _*)

    val unioned = SchemaOps.unionHarmonized(Seq(taggedLeft, taggedRight), sortColumns = false)

    val w = Window.partitionBy(by.map(col): _*)
      .orderBy((col(timeCol).asc +: col("__side").asc +: tieBreak): _*)
      .rowsBetween(0, Window.unboundedFollowing)
    val packed = unioned.withColumn("__asof_row",
      when(col("__side") === 1, struct(valueCols.map(col): _*)))
      .withColumn("__asof_row", first(col("__asof_row"), ignoreNulls = true).over(w))
    val unpacked = valueCols.foldLeft(packed) { (df, v) =>
      df.withColumn(v, col("__asof_row").getField(v))
    }
    unpacked.filter(col("__side") === 0).drop("__side", "__asof_row")
  }
}
