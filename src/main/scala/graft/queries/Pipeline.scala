package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables
import graft.features.{TickerFeatures, TickerStatics}
import graft.pipeline.{TickerFeaturePipeline, TickerValidation}

/** End-to-end drive of the ticker feature pipeline over testdata-derived
  * inputs: customers play tickers, their order series plays the price
  * series, lineitem-derived tables play fundamentals. Deterministic but not
  * SQL-oracle-expressible in one readable statement — registered rows-only;
  * the per-operator golden specs pin the numeric semantics.
  */
object Pipeline {

  def defs: Seq[QueryDef] = Seq(p1, p2, p3)

  private def inputsFrom(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val orders = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir)
    val prices = orders.select(
      col("o_custkey").cast(StringType).as("ticker"),
      col("o_orderdate").cast(DateType).as("date"),
      col("o_totalprice").as("close"))
      // keep-last per (ticker, date): price series needs one close per day
      .groupBy("ticker", "date").agg(max("close").as("close"))
    val dividends = orders
      .filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").cast(StringType).as("ticker"),
        col("o_orderdate").cast(DateType).as("date"),
        (col("o_totalprice") / 1000).as("dividend"))
      .groupBy("ticker", "date").agg(max("dividend").as("dividend"))
    val splits = orders.filter(lit(false))
      .select(col("o_custkey").cast(StringType).as("ticker"),
        col("o_orderdate").cast(DateType).as("date"),
        lit(2.0).as("split_ratio"))
    val yearly = orders.join(li, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").cast(StringType).as("ticker"),
        to_date(concat(year(col("o_orderdate")), lit("-12-31"))).as("date"))
      .agg(
        sum(col("l_extendedprice")).as("incomeBeforeTax"),
        sum(col("l_extendedprice") * col("l_discount")).as("interestExpense"),
        sum(col("l_extendedprice") * col("l_tax")).as("depreciationAndAmortization"),
        avg(col("l_quantity")).as("eps"),
        (avg(col("l_quantity")) / 10).as("freeCashFlowPerShare"),
        (stddev_samp(col("l_quantity")) / 100).as("dividendYield"),
        avg(col("l_extendedprice") / col("l_quantity")).as("priceEarningsRatio"),
        avg(col("l_extendedprice") / greatest(col("l_quantity"), lit(1.0)))
          .as("priceToFreeCashFlowsRatio"),
        (avg(col("l_discount")) * 10).as("payoutRatio"))
    val income = yearly.select("ticker", "date", "incomeBeforeTax",
      "interestExpense", "depreciationAndAmortization", "eps")
    val balance = yearly.select(col("ticker"), col("date"),
      (col("incomeBeforeTax") / 10).as("cashAndShortTermInvestments"),
      (col("incomeBeforeTax") / 5).as("totalDebt"))
    val ratios = yearly.select("ticker", "date", "priceEarningsRatio",
      "priceToFreeCashFlowsRatio", "payoutRatio", "dividendYield",
      "freeCashFlowPerShare")
    // every "ticker" tracks the market index: overall daily avg price
    val index = orders.groupBy(col("o_orderdate").cast(DateType).as("date"))
      .agg(avg(col("o_totalprice")).as("close"))
    val sectorIndex = prices.select("ticker").distinct().crossJoin(index)
      .select("ticker", "date", "close")
    TickerFeatures.Inputs(prices, dividends, splits, ratios, income, balance,
      sectorIndex)
  }

  /** Full pipeline: grid -> gate -> features -> validation -> round2f32. */
  val p1 = QueryDef("p1_ticker_pipeline",
    (s, dir) => {
      val in = inputsFrom(s, dir)
      val grid = TickerFeaturePipeline.grid(s,
        in.prices.select("ticker").distinct(), "1997-12-31", 4)
      // testdata customers have ~10 orders, not 260 trading days — gate at 5
      val gated = TickerFeaturePipeline.hasEnoughPriceData(grid, in.prices,
        requiredDays = 5)
      val features = TickerFeatures.dynamicFeatures(gated, in)
      val validated = TickerValidation.validate(features)
      TickerFeaturePipeline.normalize(validated)
        .orderBy("ticker", "as_of")
    },
    None)

  /** A12: RandomForest feature importance + R² (MLlib) over lineitem
    * numerics — analysis output, rows-only (tree ensembles aren't an
    * oracle surface). */
  val p3 = QueryDef("p3_rf_importance",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select("l_quantity", "l_discount", "l_tax", "l_extendedprice")
      graft.analysis.Analysis.rfImportance(li,
        Seq("l_quantity", "l_discount", "l_tax"), "l_extendedprice",
        numTrees = 10)
        .orderBy("feature")
    },
    None)

  /** Static one-hot rows from customer segments/nations as sector/country. */
  val p2 = QueryDef("p2_static_encoding",
    (s, dir) => {
      val profile = Tables.customer(s, dir)
        .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey").cast(StringType).as("ticker"),
          col("c_mktsegment").as("sector"), col("n_name").as("country"))
      TickerStatics.staticRows(profile).orderBy("ticker")
    },
    None)
}
