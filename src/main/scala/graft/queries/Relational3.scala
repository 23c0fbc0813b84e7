package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import QueryDef.moneySum

/** Third coverage batch — relational operators beyond the reference's own
  * surface that a warehouse-grade engine must still provide: hierarchical
  * aggregation (ROLLUP: one pass computes every grouping level, vs N
  * re-aggregations), and forward-looking window access (lead /
  * first_value / last_value with explicit frames).
  */
object Relational3 {

  def defs: Seq[QueryDef] = Seq(q51, q52, q53, q54, q55)

  /** ROLLUP over (returnflag, linestatus): partial-agg reuse across
    * grouping levels — at 100 TB one shuffle instead of three. Labels
    * coalesced to 'ALL' so null-ordering differences between engines
    * can't reorder rows. */
  val q51 = QueryDef("q51_rollup_sales",
    (s, dir) => Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(moneySum(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("ret_flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("line_status"),
        col("sum_price"), col("n"))
      .orderBy("ret_flag", "line_status"),
    Some("""SELECT COALESCE(l_returnflag, 'ALL') AS ret_flag,
      COALESCE(l_linestatus, 'ALL') AS line_status,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      COUNT(*) AS n
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY ret_flag, line_status"""))

  /** lead + first_value/last_value with an explicit frame per customer
    * order history: next-order gap in days, first and final order dates.
    * Frames declared identically on both engines. final_date uses the
    * FULL-partition frame, not [current, unboundedFollowing]: the values
    * are identical (last over either frame = the partition's final row),
    * but Spark evaluates the full frame once per partition (O(n)) while
    * any frame STARTING at the current row is re-aggregated per row
    * (O(n^2) per key — the joinForward deep-history hazard, AsOf.scala). */
  val q52 = QueryDef("q52_lead_frames",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_date"), col("o_orderkey"))
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast(DateType).as("o_date"))
        .withColumn("next_gap_days",
          datediff(lead(col("o_date"), 1).over(w), col("o_date")))
        .withColumn("first_date", first(col("o_date")).over(w))
        .withColumn("final_date", last(col("o_date")).over(wFull))
        .orderBy("o_custkey", "o_date", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
      CAST(datediff('day', CAST(o_orderdate AS DATE),
        lead(CAST(o_orderdate AS DATE), 1) OVER w) AS INT) AS next_gap_days,
      first_value(CAST(o_orderdate AS DATE)) OVER w AS first_date,
      last_value(CAST(o_orderdate AS DATE)) OVER
        (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS final_date
      FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_date, o_orderkey"""))

  /** Custom DeclarativeAggregate on the judged surface: exact product
    * (graft's `product_agg`) vs DuckDB's built-in `product()` — per-part
    * compounded discount growth. Partial/final merge is planned by
    * Catalyst like any built-in (products compose), so map-side combine
    * still applies at 100 TB. */
  val q53 = QueryDef("q53_group_product",
    (s, dir) => Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"))
      .agg(
        round(graft.functions.ProductAgg.product(lit(1.0) + col("l_discount")), 6)
          .as("growth_product"),
        count(lit(1)).as("n"))
      .orderBy("l_partkey"),
    Some("""SELECT l_partkey,
      ROUND(product(1.0 + l_discount), 6) AS growth_product,
      COUNT(*) AS n
      FROM lineitem GROUP BY l_partkey ORDER BY l_partkey"""))

  /** INTERSECT / EXCEPT set operators (distinct semantics both engines):
    * customers partitioned into ever-ordered vs never-ordered. */
  val q54 = QueryDef("q54_set_ops",
    (s, dir) => {
      val allCust = Tables.customer(s, dir).select(col("c_custkey").as("k"))
      val ordered = Tables.orders(s, dir).select(col("o_custkey").as("k"))
      allCust.intersect(ordered).withColumn("tag", lit("both"))
        .unionByName(allCust.except(ordered).withColumn("tag", lit("never_ordered")))
        .orderBy("k", "tag")
    },
    Some("""SELECT k, 'both' AS tag
      FROM (SELECT c_custkey AS k FROM customer
            INTERSECT SELECT o_custkey FROM orders) t1
      UNION ALL
      SELECT k, 'never_ordered' AS tag
      FROM (SELECT c_custkey AS k FROM customer
            EXCEPT SELECT o_custkey FROM orders) t2
      ORDER BY k, tag"""))

  /** PIVOT: order counts by status per year — wide reshaping as a native
    * operator (Spark pivot with an explicit value list so the output
    * schema is static and plannable; DuckDB PIVOT ... IN (...)). */
  val q55 = QueryDef("q55_pivot_status",
    (s, dir) => Tables.orders(s, dir)
      .select(year(col("o_orderdate")).cast(LongType).as("yr"), col("o_orderstatus"))
      .groupBy("yr").pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("yr"), coalesce(col("F"), lit(0L)).as("F"),
        coalesce(col("O"), lit(0L)).as("O"), coalesce(col("P"), lit(0L)).as("P"))
      .orderBy("yr"),
    Some("""PIVOT (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, o_orderstatus
        FROM orders)
      ON o_orderstatus IN ('F', 'O', 'P') USING COUNT(*)
      GROUP BY yr ORDER BY yr"""))
}
