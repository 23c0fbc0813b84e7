package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import QueryDef.moneySum

/** Fourth coverage batch: semi-structured JSON extraction, GROUPING SETS
  * (the grouping lattice rollup/cube can't express), ordered string
  * aggregation, and calendar truncation — engine surface a warehouse user
  * expects, each oracle-gated.
  */
object Relational4 {

  def defs: Seq[QueryDef] = Seq(q64, q65, q66, q67, q68)

  /** JSON extraction from a string column (semi-structured events payload):
    * `get_json_object` path extraction, typed cast, then a per-key
    * aggregation. At 100 TB the parse runs codegen'd inside the scan
    * projection — no UDF, no re-parse per field (single path here; multi-
    * field extraction would use one `from_json` struct instead). */
  val q64 = QueryDef("q64_json_extract",
    (s, dir) => Tables.events(s, dir)
      .select(get_json_object(col("props"), "$.k").cast(LongType).as("k"),
        col("value"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
      // null-ordering pinned on BOTH engines: a props row without '$.k'
      // (none today, but the gate must survive data regeneration) sorts
      // first in Spark by default and LAST in DuckDB unless told otherwise
      .orderBy(col("k").asc_nulls_first),
    Some("""SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k,
      COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY k ORDER BY k NULLS FIRST"""))

  /** GROUPING SETS ((rf), (ls), ()) — two independent marginals + grand
    * total in ONE shuffle (rollup/cube can't produce this set list; naive
    * form is three scans + a union). grouping() tags which level each row
    * belongs to, so 'ALL' labels stay unambiguous even if the data ever
    * contained a literal 'ALL'. */
  val q65 = QueryDef("q65_grouping_sets",
    (s, dir) => Tables.lineitem(s, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(moneySum(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n"),
        // grouping() resolves only directly over the GroupingSets node —
        // it must ride the agg, not a downstream projection
        grouping(col("l_returnflag")).cast(LongType).as("g_rf"),
        grouping(col("l_linestatus")).cast(LongType).as("g_ls"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("ret_flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("line_status"),
        col("g_rf"), col("g_ls"), col("sum_price"), col("n"))
      .orderBy("g_rf", "g_ls", "ret_flag", "line_status"),
    Some("""SELECT COALESCE(l_returnflag, 'ALL') AS ret_flag,
      COALESCE(l_linestatus, 'ALL') AS line_status,
      CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
      CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      COUNT(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY g_rf, g_ls, ret_flag, line_status"""))

  /** Ordered, capped string aggregation (LISTAGG ... WITHIN GROUP): per
    * customer, the first 10 order statuses in date order as one string.
    * collect_list arrival order is nondeterministic under shuffle — the
    * struct sort imposes the ORDER BY, and the cap bounds per-group state
    * (an uncapped listagg over a hot key is a driver-sized string at
    * 100 TB). */
  val q66 = QueryDef("q66_listagg",
    (s, dir) => Tables.orders(s, dir)
      .select(col("o_custkey"),
        struct(col("o_orderdate").cast(DateType).as("d"), col("o_orderkey").as("k"),
          col("o_orderstatus").as("st")).as("row"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        concat_ws("|",
          slice(transform(array_sort(collect_list(col("row"))), r => r.getField("st")),
            1, 10)).as("status_head"))
      .orderBy("o_custkey"),
    Some("""SELECT o_custkey, COUNT(*) AS n_orders,
      array_to_string(
        (list(o_orderstatus ORDER BY CAST(o_orderdate AS DATE), o_orderkey))[1:10],
        '|') AS status_head
      FROM orders GROUP BY o_custkey ORDER BY o_custkey"""))

  /** Calendar truncation: ISO week (Monday start) and quarter boundaries —
    * the time-bucketing every reporting rollup needs; both engines truncate
    * identically so the group keys byte-match. */
  val q67 = QueryDef("q67_date_trunc",
    (s, dir) => Tables.orders(s, dir)
      .select(
        date_trunc("week", col("o_orderdate")).cast(DateType).as("week_start"),
        date_trunc("quarter", col("o_orderdate")).cast(DateType).as("quarter_start"),
        col("o_totalprice"))
      .groupBy("week_start", "quarter_start")
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("sum_price"))
      .orderBy("week_start", "quarter_start"),
    Some("""SELECT CAST(date_trunc('week', CAST(o_orderdate AS DATE)) AS DATE) AS week_start,
      CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE) AS quarter_start,
      COUNT(*) AS n,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders GROUP BY week_start, quarter_start
      ORDER BY week_start, quarter_start"""))

  /** Running DISTINCT count over a window — an operator Spark has no
    * native form for (COUNT(DISTINCT) OVER is unsupported): re-expressed
    * as size(collect_set) over the running frame, which accumulates
    * per-partition state exactly once (no retraction needed on an
    * unbounded-preceding frame). DuckDB runs its native windowed distinct
    * aggregate — the oracle proves the re-expression. Sort keys carry the
    * q26 lesson (full-key collision at sf0.1 → l_quantity tie-break). */
  val q68 = QueryDef("q68_window_distinct",
    (s, dir) => {
      // l_partkey closes the window order: on a residual full-key tie the
      // tied rows' RUNNING counts would depend on engine tie order (the
      // value, not just the output position — stronger than the q26 fix)
      val w = Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity",
          "l_partkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, dir)
        .withColumn("distinct_parts",
          size(collect_set(col("l_partkey")).over(w)).cast(LongType))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_shipdate").cast(DateType).as("ship_date"),
          col("distinct_parts"))
        // (suppkey, orderkey, linenumber) is NOT unique in this testdata
        // (q26 lesson) — ship_date + the count close the output order
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "ship_date",
          "distinct_parts")
    },
    Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
      CAST(l_shipdate AS DATE) AS ship_date,
      CAST(count(DISTINCT l_partkey) OVER (PARTITION BY l_suppkey
        ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_partkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        AS distinct_parts
      FROM lineitem
      ORDER BY l_suppkey, l_orderkey, l_linenumber, ship_date, distinct_parts"""))
}
