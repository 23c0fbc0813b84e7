package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables
import graft.features.TickerFeatures
import QueryDef.moneySum

/** Oracle conversions for the ticker-feature blocks that were previously
  * pinned only by golden specs (SURVEY §2.6 W6/W9/W10/W11/W14): the judged
  * queries drive the ACTUAL pipeline operators (`TickerFeatures.ratiosBlock`
  * / `dividendBlock`, including `SeriesOps.adjustForSplits`) over series
  * synthesized deterministically from the orders table, and DuckDB
  * recomputes the full semantics — grace windows, month-clamped date
  * arithmetic, validity-filtered max_by/median, NaN policies — from the
  * same rows. Money-derived bases go through DECIMAL sums so every input
  * double is shuffle-order independent; judged doubles round(6) to absorb
  * interpolation ulp differences in the median.
  */
object FeatureBlocks {

  def defs: Seq[QueryDef] = Seq(w1, w2, w3)

  /** Deterministic per-(customer, date) base series: one ratio spine, no
    * duplicate dates (max_by ties would be engine-arbitrary otherwise). */
  private def base(orders: DataFrame): DataFrame =
    orders.groupBy(
      col("o_custkey").cast(StringType).as("ticker"),
      col("o_orderdate").as("date"))
      .agg(moneySum(col("o_totalprice")).as("b"))

  /** (ticker, as_of) grid over the distinct keys of `keyCol` — the two
    * judged as-of dates live here and in the two oracle SQL strings. */
  private def gridFrom(src: DataFrame, keyCol: String): DataFrame =
    src.select(col(keyCol).cast(StringType).as("ticker")).distinct()
      .withColumn("as_of", explode(array(
        to_date(lit("1997-06-30")), to_date(lit("1998-06-30")))))

  private def gridOf(orders: DataFrame): DataFrame = gridFrom(orders, "o_custkey")

  private val oracleGrid =
    """grid AS (
      SELECT DISTINCT o_custkey::VARCHAR AS ticker, t.as_of
      FROM orders CROSS JOIN (VALUES (DATE '1997-06-30'), (DATE '1998-06-30')) t(as_of))"""

  private val oracleBase =
    """base AS (
      SELECT o_custkey::VARCHAR AS ticker, o_orderdate AS date,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS b
      FROM orders GROUP BY 1, 2)"""

  /** W9/W10/W11 (+ fcf CAGR): the full ratios block — dividend yield with
    * 0.0-on-empty, yield vs the 5y-window median (90d grace, NaN below 2
    * points), latest-valid P/E and P/FCF (positive-only max_by), latest
    * payout, and the 3y FCF CAGR whose start value comes from a ±90d
    * grace window. pfcf is shifted so some rows go negative and the
    * validity filters actually discriminate. Divisor choice is
    * load-bearing: b carries cents (n/100), so divisors are powers of
    * ten ≤ 1e4 (or /50) making every DIRECTLY-copied output terminate
    * within 6 decimals — a /1e5-style divisor terminates at digit 7,
    * creating exact round-half boundaries where Spark's BigDecimal
    * HALF_UP and DuckDB's float-multiply round() disagree. Derived
    * outputs (median ratio, pow) are non-terminating, where a boundary
    * hit is ~1e-10 probability instead of systematic. */
  val w1 = QueryDef("w1_ratios_block",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val ratios = base(o).select(col("ticker"), col("date"),
        (col("b") / 10000.0).as("dividendYield"),
        (col("b") / 100.0).as("priceEarningsRatio"),
        (col("b") / 50.0 - 1500.0).as("priceToFreeCashFlowsRatio"),
        (col("b") / 10000.0).as("payoutRatio"),
        (col("b") / 10.0).as("freeCashFlowPerShare"))
      TickerFeatures.ratiosBlock(gridOf(o), ratios)
        .select(col("ticker"), col("as_of"),
          round(col("dividend_yield"), 6).as("dividend_yield"),
          round(col("yield_vs_5y_median"), 6).as("yield_vs_5y_median"),
          round(col("pe_ratio"), 6).as("pe_ratio"),
          round(col("pfcf_ratio"), 6).as("pfcf_ratio"),
          round(col("payout_ratio"), 6).as("payout_ratio"),
          round(col("fcf_cagr_3y"), 6).as("fcf_cagr_3y"))
        .orderBy("ticker", "as_of")
    },
    Some(s"""WITH $oracleBase,
      ratios AS (
        SELECT ticker, date, b/10000 AS dy, b/100 AS pe, b/50 - 1500 AS pfcf,
               b/10000 AS po, b/10 AS fcf FROM base),
      $oracleGrid,
      sliced AS (
        SELECT g.ticker, g.as_of, r.date, r.dy, r.pe, r.pfcf, r.po, r.fcf
        FROM grid g LEFT JOIN ratios r ON r.ticker = g.ticker AND r.date <= g.as_of),
      marked AS (
        SELECT *,
          (dy IS NOT NULL AND dy > 0 AND
           date >= ((end_date - INTERVAL 60 MONTH) - INTERVAL 90 DAY)::DATE) AS yv,
          (pe > 0 AND pfcf > 0) AS pv,
          (po IS NOT NULL AND po > 0) AS pov,
          (date BETWEEN ((end_date - INTERVAL 1095 DAY) - INTERVAL 90 DAY)::DATE
                    AND ((end_date - INTERVAL 1095 DAY) + INTERVAL 90 DAY)::DATE) AS fw
        FROM (SELECT *, max(date) OVER (PARTITION BY ticker, as_of) AS end_date
              FROM sliced)),
      agg AS (
        SELECT ticker, as_of,
          count(date) AS n,
          arg_max(dy, date) AS dy_last,
          arg_max(CASE WHEN yv THEN dy END, CASE WHEN yv THEN date END) AS y_cur,
          quantile_cont(CASE WHEN yv THEN dy END, 0.5) AS y_med,
          count(CASE WHEN yv THEN 1 END) AS y_n,
          arg_max(CASE WHEN pv THEN pe END, CASE WHEN pv THEN date END) AS pe_l,
          arg_max(CASE WHEN pv THEN pfcf END, CASE WHEN pv THEN date END) AS pfcf_l,
          arg_max(CASE WHEN pov THEN po END, CASE WHEN pov THEN date END) AS po_l,
          arg_max(fcf, date) AS fcf_end,
          arg_max(CASE WHEN fw THEN fcf END, CASE WHEN fw THEN date END) AS fcf_start
        FROM marked GROUP BY 1, 2)
      SELECT ticker, as_of,
        round(CASE WHEN n > 0 THEN COALESCE(dy_last, 0.0) ELSE 0.0 END, 6) AS dividend_yield,
        round(CASE WHEN n < 2 THEN 'NaN'::DOUBLE
              WHEN y_n = 0 THEN 'NaN'::DOUBLE
              WHEN y_med = 0 THEN 0.0
              ELSE (y_cur - y_med) / y_med END, 6) AS yield_vs_5y_median,
        round(COALESCE(pe_l, 0.0), 6) AS pe_ratio,
        round(COALESCE(pfcf_l, 0.0), 6) AS pfcf_ratio,
        round(COALESCE(po_l, 0.0), 6) AS payout_ratio,
        round(CASE WHEN n >= 2 AND fcf_start IS NOT NULL AND fcf_start > 0
                   AND fcf_end IS NOT NULL AND fcf_end > 0
              THEN pow(fcf_end / fcf_start, 1.0/3) - 1 ELSE 'NaN'::DOUBLE END, 6) AS fcf_cagr_3y
      FROM agg ORDER BY ticker, as_of"""))

  /** W1/W3/W5/W8 + A1/A3/A5 as COMPOSED in the pipeline: the full price
    * block — global prefix-stable daily returns (lag), 6m/12m
    * point-to-point returns with 0.0-on-missing, annualized sample-stddev
    * volatility, 1y+15d-grace max drawdown (running peak over the shared
    * ascending sort), and the 50/200 SMA delta gated at 200 observations.
    * The series is supplier × ship-date (≈600 dates per supplier at any
    * SF) so the SMA-200 gate and both its branches actually fire — the
    * orders-per-customer series would leave n<200 everywhere. stddev and
    * the SMA means are floating aggregates: round(6) at the boundary per
    * the repo-wide rule. */
  val w3 = QueryDef("w3_price_block",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val prices = li.groupBy(
        col("l_suppkey").cast(StringType).as("ticker"),
        col("l_shipdate").as("date"))
        .agg((moneySum(col("l_extendedprice")) / 100.0).as("close"))
      TickerFeatures.priceBlock(gridFrom(li, "l_suppkey"), prices)
        .select(col("ticker"), col("as_of"),
          round(col("6m_return"), 6).as("ret_6m"),
          round(col("12m_return"), 6).as("ret_12m"),
          round(col("volatility"), 6).as("volatility"),
          round(col("max_drawdown_1y"), 6).as("max_drawdown_1y"),
          round(col("sma_50_200_delta"), 6).as("sma_50_200_delta"))
        .orderBy("ticker", "as_of")
    },
    Some("""WITH base AS (
        SELECT l_suppkey::VARCHAR AS ticker, l_shipdate AS date,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 100 AS close
        FROM lineitem GROUP BY 1, 2),
      rets AS (
        SELECT ticker, date, close,
               close / lag(close) OVER (PARTITION BY ticker ORDER BY date) - 1 AS ret
        FROM base),
      grid AS (
        SELECT DISTINCT l_suppkey::VARCHAR AS ticker, t.as_of
        FROM lineitem CROSS JOIN (VALUES (DATE '1997-06-30'), (DATE '1998-06-30')) t(as_of)),
      sliced AS (
        SELECT g.ticker, g.as_of, r.date, r.close, r.ret
        FROM grid g LEFT JOIN rets r ON r.ticker = g.ticker AND r.date <= g.as_of),
      staged AS (
        SELECT *,
          (count(*) OVER (PARTITION BY ticker, as_of)
           - row_number() OVER (PARTITION BY ticker, as_of ORDER BY date) + 1) AS rn_desc,
          (date >= (max(date) OVER (PARTITION BY ticker, as_of) - INTERVAL 380 DAY)::DATE) AS in_dd
        FROM sliced),
      dded AS (
        SELECT *,
          CASE WHEN in_dd THEN
            (max(CASE WHEN in_dd THEN close END) OVER (
               PARTITION BY ticker, as_of ORDER BY date
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - close)
            / max(CASE WHEN in_dd THEN close END) OVER (
               PARTITION BY ticker, as_of ORDER BY date
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          END AS dd
        FROM staged),
      agg AS (
        SELECT ticker, as_of,
          arg_max(close, date) AS p_now,
          arg_max(CASE WHEN date <= (as_of - INTERVAL 6 MONTH)::DATE THEN close END,
                  CASE WHEN date <= (as_of - INTERVAL 6 MONTH)::DATE THEN date END) AS p6,
          arg_max(CASE WHEN date <= (as_of - INTERVAL 12 MONTH)::DATE THEN close END,
                  CASE WHEN date <= (as_of - INTERVAL 12 MONTH)::DATE THEN date END) AS p12,
          stddev_samp(ret) AS sd,
          avg(CASE WHEN rn_desc <= 50 THEN close END) AS sma50,
          avg(CASE WHEN rn_desc <= 200 THEN close END) AS sma200,
          count(date) AS n,
          sum(CASE WHEN in_dd THEN 1 ELSE 0 END) AS n_dd,
          max(dd) AS max_dd
        FROM dded GROUP BY 1, 2)
      SELECT ticker, as_of,
        round(CASE WHEN p6 IS NOT NULL AND p_now IS NOT NULL
              THEN (p_now - p6) / p6 ELSE 0.0 END, 6) AS ret_6m,
        round(CASE WHEN p12 IS NOT NULL AND p_now IS NOT NULL
              THEN (p_now - p12) / p12 ELSE 0.0 END, 6) AS ret_12m,
        round(COALESCE(sd * sqrt(252.0), 0.0), 6) AS volatility,
        round(CASE WHEN n < 2 OR n_dd < 2 THEN 0.0
              ELSE COALESCE(max_dd, 0.0) END, 6) AS max_drawdown_1y,
        round(CASE WHEN n >= 200 THEN
              CASE WHEN sma200 <> 0 THEN (sma50 - sma200) / sma200 ELSE 0.0 END
              END, 6) AS sma_50_200_delta
      FROM agg ORDER BY ticker, as_of"""))

  /** W6/W14: split-adjusted dividend CAGR at 3y and 5y horizons — the
    * dividends ride `SeriesOps.adjustForSplits` (divide by the cumulative
    * split ratio at or before each date, default 1.0), then the CAGR
    * start values come from ±3-MONTH grace windows (month-clamped
    * arithmetic on both engines). Splits are a deterministic subset:
    * every 10th customer gets a 2:1 in 1995, every 20th another 3:2 in
    * mid-1996 — so unadjusted, singly- and doubly-adjusted series all
    * appear. */
  val w2 = QueryDef("w2_dividend_cagr_block",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val divs = base(o).select(col("ticker"), col("date"),
        (col("b") / 1000.0).as("dividend"))
      val custs = o.select(col("o_custkey").cast(StringType).as("ticker")).distinct()
      val splits = custs.filter(col("ticker").cast(LongType) % 10 === 0)
        .select(col("ticker"), to_date(lit("1995-01-01")).as("date"),
          lit(2.0).as("split_ratio"))
        .union(custs.filter(col("ticker").cast(LongType) % 20 === 0)
          .select(col("ticker"), to_date(lit("1996-06-01")).as("date"),
            lit(1.5).as("split_ratio")))
      TickerFeatures.dividendBlock(gridOf(o), divs, splits)
        .select(col("ticker"), col("as_of"),
          round(col("dividend_cagr_3y"), 6).as("dividend_cagr_3y"),
          round(col("dividend_cagr_5y"), 6).as("dividend_cagr_5y"))
        .orderBy("ticker", "as_of")
    },
    Some(s"""WITH $oracleBase,
      divs AS (SELECT ticker, date, b/1000 AS dividend FROM base),
      splits AS (
        SELECT DISTINCT o_custkey::VARCHAR AS ticker, DATE '1995-01-01' AS date,
               2.0 AS ratio FROM orders WHERE o_custkey % 10 = 0
        UNION ALL
        SELECT DISTINCT o_custkey::VARCHAR, DATE '1996-06-01', 1.5
        FROM orders WHERE o_custkey % 20 = 0),
      adj AS (
        SELECT d.ticker, d.date,
          d.dividend / COALESCE((SELECT product(s.ratio) FROM splits s
            WHERE s.ticker = d.ticker AND s.date <= d.date), 1.0) AS dividend
        FROM divs d),
      $oracleGrid,
      sliced AS (
        SELECT g.ticker, g.as_of, a.date, a.dividend
        FROM grid g LEFT JOIN adj a ON a.ticker = g.ticker AND a.date <= g.as_of),
      marked AS (
        SELECT *,
          (date BETWEEN ((end_date - INTERVAL 1095 DAY) - INTERVAL 3 MONTH)::DATE
                    AND ((end_date - INTERVAL 1095 DAY) + INTERVAL 3 MONTH)::DATE) AS w3,
          (date BETWEEN ((end_date - INTERVAL 1825 DAY) - INTERVAL 3 MONTH)::DATE
                    AND ((end_date - INTERVAL 1825 DAY) + INTERVAL 3 MONTH)::DATE) AS w5
        FROM (SELECT *, max(date) OVER (PARTITION BY ticker, as_of) AS end_date
              FROM sliced)),
      agg AS (
        SELECT ticker, as_of,
          arg_max(dividend, date) AS d_end,
          arg_max(CASE WHEN w3 THEN dividend END, CASE WHEN w3 THEN date END) AS s3,
          arg_max(CASE WHEN w5 THEN dividend END, CASE WHEN w5 THEN date END) AS s5,
          count(date) AS n
        FROM marked GROUP BY 1, 2)
      SELECT ticker, as_of,
        round(CASE WHEN n >= 2 AND s3 IS NOT NULL AND s3 > 0
                   AND d_end IS NOT NULL AND d_end > 0
              THEN pow(d_end / s3, 1.0/3) - 1 ELSE 'NaN'::DOUBLE END, 6) AS dividend_cagr_3y,
        round(CASE WHEN n >= 2 AND s5 IS NOT NULL AND s5 > 0
                   AND d_end IS NOT NULL AND d_end > 0
              THEN pow(d_end / s5, 1.0/5) - 1 ELSE 'NaN'::DOUBLE END, 6) AS dividend_cagr_5y
      FROM agg ORDER BY ticker, as_of"""))
}
