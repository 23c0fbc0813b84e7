package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Distributed global row numbering.
  *
  * The naive form — `row_number().over(Window.orderBy(key))` — plans an
  * empty-partition Window: EVERY row moves to one task, which is the
  * single most common accidental scale killer (fine at 60k rows, dead at
  * 100 TB). The scalable shape assigns ids in two distributed passes:
  *
  *   1. bucket each row by a MONOTONE function of the key (fixed-width
  *      ranges from a min/max pre-aggregate — one tiny scan-level agg);
  *   2. per-bucket local row_number (one shuffle, partitioned by bucket)
  *      plus the exclusive prefix sum of bucket counts (a BROADCAST of at
  *      most `nBuckets` longs) — id = offset(bucket) + local - 1.
  *
  * Bucket boundaries affect only load balance, never the result: offsets
  * absorb any size skew, so ids are exactly `row_number over (order by
  * key, tieBreak) - 1` for every input. Equivalent to RDD zipWithIndex
  * but staying in DataFrame land (codegen, AQE, no lineage break).
  */
object Indexing {

  /** Append a dense 0-based `idCol` ordered by (key, tieBreak...). The key
    * must be numeric (monotone bucketing needs arithmetic); tie-break
    * columns make the ordering total when keys repeat. */
  def globalRowIds(df: DataFrame, key: String, idCol: String,
                   nBuckets: Int = 1024, tieBreak: Seq[String] = Nil): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val k = col(key).cast(DoubleType)
    val Array(bounds) = df.agg(min(k).as("lo"), max(k).as("hi")).collect()
    if (bounds.isNullAt(0)) return df.withColumn(idCol, lit(null).cast(LongType))
    val (lo, hi) = (bounds.getDouble(0), bounds.getDouble(1))
    // monotone, clamped: bucket 0..nBuckets-1 even when lo == hi
    val width = (hi - lo) / nBuckets.toDouble
    val bucket = if (width == 0.0) lit(0)
      else least(floor((k - lit(lo)) / lit(width)).cast(IntegerType), lit(nBuckets - 1))
    val bucketed = df.withColumn("__bucket", bucket)
    // exclusive prefix sum over the (tiny) bucket histogram — collected and
    // rebroadcast as a join against at most nBuckets rows
    val counts = bucketed.groupBy("__bucket").agg(count(lit(1)).as("__n"))
    val offsets = counts
      .withColumn("__offset",
        coalesce(sum(col("__n")).over(
          Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("__bucket", "__offset")
    val order = (col(key).asc +: tieBreak.map(col(_).asc))
    val local = row_number().over(
      Window.partitionBy("__bucket").orderBy(order: _*))
    bucketed
      .join(broadcast(offsets), Seq("__bucket"))
      .withColumn(idCol, col("__offset") + local - 1)
      .drop("__bucket", "__offset")
  }
}
