package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join: point-in-interval joins as equi-joins.
  *
  * Spark plans a bare `p BETWEEN start AND end` join as a broadcast
  * nested-loop (or worse, a cartesian product) — quadratic work that dies
  * at scale. The standard fix bins the time axis: each interval is exploded
  * to the bins it covers, each point belongs to exactly one bin, and the
  * join becomes a hash equi-join on the bin key refined by the exact
  * BETWEEN predicate. Work is linear in points + intervals × bins-covered;
  * the bin shuffle key is high-cardinality (dates), so no skew hot-spot.
  *
  * Pick `binDays` near the typical interval length: one interval then
  * explodes to ~2 rows, and each point meets only the intervals in its own
  * bin. (DuckDB's IEJoin solves the same problem with a sort-based
  * algorithm on one node; binning is the shuffle-friendly equivalent.)
  */
object RangeJoin {

  private def binOf(d: Column, binDays: Int): Column =
    floor(datediff(d, lit("1970-01-01")) / binDays)

  /** Join each row of `points` to every row of `intervals` whose
    * [startCol, endCol] contains its `pointCol` (dates, inclusive both
    * ends). Returns points columns + intervals columns. Intervals with
    * end < start yield no matches. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, startCol: String, endCol: String,
                      binDays: Int = 16): DataFrame = {
    val binned = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn("__bin",
        explode(sequence(binOf(col(startCol), binDays),
          binOf(col(endCol), binDays))))
    points
      .withColumn("__bin", binOf(col(pointCol), binDays))
      .join(binned, Seq("__bin"))
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop("__bin")
  }
}
