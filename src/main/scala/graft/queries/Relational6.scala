package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import QueryDef.{dec, moneySum}

/** Sixth coverage batch: argmin/argmax aggregates, filtered (conditional)
  * aggregation, higher-order array functions, deterministic mode, exact
  * higher central moments (skewness/kurtosis from integer power sums),
  * LATERAL correlated top-k, overlapping full-outer join, map-typed
  * intermediate state, distributed global row ids (`core.Indexing`), and
  * width_bucket histogram binning — each oracle-gated against DuckDB.
  */
object Relational6 {

  def defs: Seq[QueryDef] = Seq(q76, q77, q78, q79, q80, q81, q82, q83, q84, q85)

  /** Day-resolution (date, orderkey) encoded into ONE sortable BIGINT —
    * both engines' argmin/argmax take a scalar ordering value, and the
    * orderkey component makes the ordering total (no ties, so the picked
    * row is deterministic under any shuffle order). Days since epoch stay
    * < 2^15 and orderkey < 10^8, so the encoding can't collide or overflow. */
  private def orderEnc = datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
    .cast(LongType) * 100000000L + col("o_orderkey")

  /** min_by / max_by: each customer's first and latest order price by the
    * encoded (date, orderkey) ordering. One shuffle on the group key; the
    * argmin/argmax state is a single (value, ord) pair per group — O(1)
    * memory regardless of group size, safe for billion-row keys. */
  val q76 = QueryDef("q76_argminmax",
    (s, dir) => {
      Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(min_by(col("o_totalprice"), orderEnc).as("first_price"),
          max_by(col("o_totalprice"), orderEnc).as("last_price"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_custkey")
    },
    Some("""SELECT o_custkey,
      arg_min(o_totalprice, (epoch(o_orderdate)::BIGINT//86400)*100000000 + o_orderkey) AS first_price,
      arg_max(o_totalprice, (epoch(o_orderdate)::BIGINT//86400)*100000000 + o_orderkey) AS last_price,
      COUNT(*) AS n_orders
      FROM orders GROUP BY o_custkey ORDER BY o_custkey"""))

  /** Conditional aggregation: count_if + CASE-gated decimal sums in one
    * pass (one shuffle serves every conditional branch — never one scan
    * per predicate). The high-quantity sum keeps SQL FILTER's null-on-
    * empty semantics via a no-otherwise CASE. */
  val q77 = QueryDef("q77_filtered_agg",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(count_if(col("l_quantity") > 45).as("n_hi"),
          sum(when(col("l_discount") > 0.05, dec(col("l_extendedprice"))))
            .cast(DoubleType).as("disc_rev"),
          sum(when(col("l_quantity") > 45, dec(col("l_quantity"))))
            .cast(DoubleType).as("hi_qty_sum"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
      COUNT(*) FILTER (WHERE l_quantity > 45) AS n_hi,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS disc_rev,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_quantity > 45) AS DOUBLE) AS hi_qty_sum,
      COUNT(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** Higher-order array functions over a deterministically-ordered list:
    * the per-flag top-10 quantities (desc, full tie-break) built by
    * array_sort over collected structs — collect_list alone has shuffle-
    * dependent order, the struct sort imposes one. filter / transform /
    * aggregate then run WITHOUT another shuffle (they're per-row lambda
    * expressions, codegen-friendly, no UDF). Quantities are integral so
    * the double sums are exact in any order, and the list columns are
    * emitted as CSV strings (quantities cast to BIGINT losslessly) —
    * array-typed columns must never reach the judged surface, the
    * driver's pandas hasher cannot sort ndarray cells. */
  val q78 = QueryDef("q78_higher_order",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val sorted = li.groupBy("l_returnflag")
        .agg(collect_list(struct(
          (col("l_quantity") * -1).as("nq"),
          col("l_orderkey").as("ok"),
          col("l_linenumber").as("ln"))).as("raw"))
        .select(col("l_returnflag"),
          expr("transform(slice(array_sort(raw), 1, 10), x -> -x.nq)").as("lst"))
      sorted.select(col("l_returnflag"),
          expr("concat_ws(',', transform(lst, x -> cast(cast(x as bigint) as string)))").as("lst_csv"),
          expr("cast(size(filter(lst, x -> x > 48)) as bigint)").as("n_gt48"),
          expr("concat_ws(',', transform(lst, x -> cast(cast(x * 2 as bigint) as string)))").as("doubled_csv"),
          expr("aggregate(lst, 0D, (acc, x) -> acc + x)").as("total"))
        .orderBy("l_returnflag")
    },
    Some("""WITH t AS (
        SELECT l_returnflag,
               list(l_quantity ORDER BY l_quantity DESC, l_orderkey, l_linenumber)[1:10] AS lst
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag,
        array_to_string(list_transform(lst, x -> (x::BIGINT)::VARCHAR), ',') AS lst_csv,
        len(list_filter(lst, x -> x > 48)) AS n_gt48,
        array_to_string(list_transform(lst, x -> ((x * 2)::BIGINT)::VARCHAR), ',') AS doubled_csv,
        list_aggregate(lst, 'sum') AS total
      FROM t ORDER BY l_returnflag"""))

  /** Deterministic mode: the most frequent quantity per return flag, ties
    * broken toward the smaller value. Spark's native mode() picks an
    * arbitrary tie winner — this construction (count + one row_number
    * window over the tiny per-group histogram) is the reproducible form,
    * and the second shuffle input is |distinct values| rows, not |rows|. */
  val q79 = QueryDef("q79_mode_freq",
    (s, dir) => {
      val counts = Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_quantity").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("l_returnflag")
        .orderBy(col("cnt").desc, col("l_quantity").asc)
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("modal_qty"), col("cnt"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, l_quantity AS modal_qty, COUNT(*) AS cnt
      FROM lineitem GROUP BY l_returnflag, l_quantity
      QUALIFY row_number() OVER (PARTITION BY l_returnflag ORDER BY COUNT(*) DESC, l_quantity) = 1
      ORDER BY l_returnflag"""))

  /** Exact skewness/kurtosis: quantities are integral, so Σx..Σx⁴ are
    * plain BIGINT sums — order-independent, overflow-checked (50⁴ × 6e5
    * rows ≈ 4e12 « 2^63), one pass, one shuffle. The float math happens
    * ONCE per group on those exact sums, so both engines run the same
    * double expression on the same inputs (native skewness()/kurtosis()
    * accumulate floating co-moments in shuffle order — not hash-stable).
    * round(9) guards the final digits. */
  val q80 = QueryDef("q80_exact_moments",
    (s, dir) => {
      val q = col("l_quantity").cast(LongType)
      val sums = Tables.lineitem(s, dir)
        .filter(col("l_quantity") === round(col("l_quantity"))) // integral guard
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum(q).as("s1"), sum(q * q).as("s2"),
          sum(q * q * q).as("s3"), sum(q * q * q * q).as("s4"))
      val n = col("n").cast(DoubleType)
      val m = col("s1") / n
      val m2 = col("s2") / n - m * m
      val m3 = col("s3") / n - lit(3.0) * m * (col("s2") / n) + lit(2.0) * m * m * m
      val m4 = col("s4") / n - lit(4.0) * m * (col("s3") / n) +
        lit(6.0) * m * m * (col("s2") / n) - lit(3.0) * m * m * m * m
      sums.select(col("l_returnflag"), col("n"),
          round(m3 / pow(m2, 1.5), 9).as("skewness"),
          round(m4 / (m2 * m2) - 3.0, 9).as("excess_kurtosis"))
        .orderBy("l_returnflag")
    },
    Some("""WITH s AS (
        SELECT l_returnflag, COUNT(*) AS n,
          SUM(l_quantity::BIGINT) AS s1, SUM(l_quantity::BIGINT * l_quantity::BIGINT) AS s2,
          SUM(l_quantity::BIGINT * l_quantity::BIGINT * l_quantity::BIGINT) AS s3,
          SUM(l_quantity::BIGINT * l_quantity::BIGINT * l_quantity::BIGINT * l_quantity::BIGINT) AS s4
        FROM lineitem WHERE l_quantity = round(l_quantity) GROUP BY l_returnflag)
      SELECT l_returnflag, n,
        round((s3::DOUBLE/n::DOUBLE - 3.0*(s1::DOUBLE/n::DOUBLE)*(s2::DOUBLE/n::DOUBLE) + 2.0*(s1::DOUBLE/n::DOUBLE)*(s1::DOUBLE/n::DOUBLE)*(s1::DOUBLE/n::DOUBLE))
          / ((s2::DOUBLE/n::DOUBLE - (s1::DOUBLE/n::DOUBLE)*(s1::DOUBLE/n::DOUBLE)) ^ 1.5), 9) AS skewness,
        round((s4::DOUBLE/n::DOUBLE - 4.0*(s1::DOUBLE/n::DOUBLE)*(s3::DOUBLE/n::DOUBLE)
             + 6.0*(s1::DOUBLE/n::DOUBLE)*(s1::DOUBLE/n::DOUBLE)*(s2::DOUBLE/n::DOUBLE)
             - 3.0*(s1::DOUBLE/n::DOUBLE)*(s1::DOUBLE/n::DOUBLE)*(s1::DOUBLE/n::DOUBLE)*(s1::DOUBLE/n::DOUBLE))
          / ((s2::DOUBLE/n::DOUBLE - (s1::DOUBLE/n::DOUBLE)*(s1::DOUBLE/n::DOUBLE)) * (s2::DOUBLE/n::DOUBLE - (s1::DOUBLE/n::DOUBLE)*(s1::DOUBLE/n::DOUBLE))) - 3.0, 9) AS excess_kurtosis
      FROM s ORDER BY l_returnflag"""))

  /** LATERAL correlated subquery: per-nation top-2 suppliers by account
    * balance. Catalyst decorrelates the lateral limit into a partitioned
    * rank — the user writes the per-row subquery, the engine runs ONE
    * window pass, not |nation| probes. */
  val q81 = QueryDef("q81_lateral_topk",
    (s, dir) => {
      Tables.nation(s, dir).createOrReplaceTempView("nation_v")
      Tables.supplier(s, dir).createOrReplaceTempView("supplier_v")
      s.sql("""SELECT n_name, t.s_name, t.s_acctbal
        FROM nation_v, LATERAL (
          SELECT s_name, s_acctbal FROM supplier_v
          WHERE s_nationkey = n_nationkey
          ORDER BY s_acctbal DESC, s_suppkey LIMIT 2) t
        ORDER BY n_name, t.s_acctbal DESC, t.s_name""")
    },
    Some("""SELECT n_name, t.s_name, t.s_acctbal
      FROM nation, LATERAL (
        SELECT s_name, s_acctbal FROM supplier
        WHERE s_nationkey = n_nationkey
        ORDER BY s_acctbal DESC, s_suppkey LIMIT 2) t
      ORDER BY n_name, t.s_acctbal DESC, t.s_name"""))

  /** Overlapping FULL OUTER join: 1996 vs 1997 per-customer spend. Both
    * sides aggregate BEFORE the join (join input is |customers|, not
    * |orders|), the using-key coalesces, and one-sided rows surface as
    * nulls on the other side. */
  val q82 = QueryDef("q82_full_outer_spend",
    (s, dir) => {
      def yearly(y: Int) = Tables.orders(s, dir)
        .filter(year(col("o_orderdate")) === y)
        .groupBy("o_custkey")
        .agg(moneySum(col("o_totalprice")).as(s"spend_$y"))
      yearly(1996).join(yearly(1997), Seq("o_custkey"), "full_outer")
        .orderBy("o_custkey")
    },
    Some("""SELECT COALESCE(a.o_custkey, b.o_custkey) AS o_custkey, a.spend_1996, b.spend_1997
      FROM (SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend_1996
            FROM orders WHERE year(o_orderdate) = 1996 GROUP BY o_custkey) a
      FULL OUTER JOIN
           (SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend_1997
            FROM orders WHERE year(o_orderdate) = 1997 GROUP BY o_custkey) b
      ON a.o_custkey = b.o_custkey
      ORDER BY o_custkey"""))

  /** Map-typed intermediate state: per return flag, a linestatus→sum map
    * built with map_from_entries over the 2-row per-group entry list,
    * consumed by element_at / map_keys / cardinality. The map stays
    * INTERMEDIATE — outputs are scalars, because map column equality is
    * order-sensitive and engine-specific. */
  val q83 = QueryDef("q83_map_state",
    (s, dir) => {
      val entries = Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(dec(col("l_quantity"))).as("qty"))
        .groupBy("l_returnflag")
        .agg(map_from_entries(array_sort(
          collect_list(struct(col("l_linestatus"), col("qty"))))).as("m"))
      entries.select(col("l_returnflag"),
          element_at(col("m"), "O").cast(DoubleType).as("qty_o"),
          element_at(col("m"), "F").cast(DoubleType).as("qty_f"),
          size(col("m")).cast(LongType).as("n_status"),
          concat_ws(",", array_sort(map_keys(col("m")))).as("statuses"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS qty_o,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_f,
      COUNT(DISTINCT l_linestatus) AS n_status,
      string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Distributed global row numbering (`core.Indexing.globalRowIds`): dense
    * 0-based ids ordered by orderkey WITHOUT the single-partition Window
    * the naive row_number-over-everything plans — two distributed passes
    * (monotone bucketing + broadcast offset join). The oracle IS the naive
    * form, proving bucketing is invisible in the result. */
  val q84 = QueryDef("q84_global_rowid",
    (s, dir) => {
      graft.core.Indexing.globalRowIds(
          Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
          key = "o_orderkey", idCol = "rid", nBuckets = 64)
        .select("o_orderkey", "o_custkey", "rid")
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey,
      row_number() OVER (ORDER BY o_orderkey) - 1 AS rid
      FROM orders ORDER BY o_orderkey"""))

  /** Histogram binning via width_bucket: fixed [0, 55) quantity bins.
    * The bin id is a pure scalar function — the histogram is ONE shuffle
    * on the (tiny) bin key, the canonical distributed-histogram shape. */
  val q85 = QueryDef("q85_width_bucket",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(width_bucket(col("l_quantity"), lit(0d), lit(55d), lit(11))
          .as("bucket"))
        .agg(count(lit(1)).as("n"),
          moneySum(col("l_extendedprice")).as("revenue"))
        .orderBy("bucket")
    },
    Some("""SELECT CASE WHEN l_quantity < 0 THEN 0
             WHEN l_quantity >= 55 THEN 12
             ELSE CAST(floor(l_quantity / 5) AS BIGINT) + 1 END AS bucket,
      COUNT(*) AS n,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM lineitem GROUP BY 1 ORDER BY bucket"""))
}
