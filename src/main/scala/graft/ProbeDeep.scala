package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.features.TickerFeatures

/** Deep-history scale rehearsal (dev tool, like [[GenScale]]): times the two
  * price-block physical forms over a directory's orders-derived price series
  * with as_ofs anchored at the END of the date range — the shape where
  * histories are long relative to the bounded ~380-day slice and
  * [[TickerFeatures.choosePriceForm]]'s inequality should flip to the
  * series form. Run against `GenScale … deep` output (≈10× longer
  * histories, same entities) vs plain sf0.1 to validate the cost model
  * with data rather than anchors.
  *
  * Usage: runMain graft.ProbeDeep [sfDir] [nAsOfs]
  */
object ProbeDeep {

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("target/testdata/sf1deep")
    val nAsOfs = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = Verify.makeSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    // the price series exactly as Pipeline.inputsFrom derives it, built
    // directly here so the probe doesn't pay the orders⨝lineitem
    // fundamentals checkpoint it never reads (600M lineitem rows at the
    // 100-tile sf0.1 shape)
    val prices = graft.core.Tables.orders(spark, dir).select(
        col("o_custkey").cast(org.apache.spark.sql.types.StringType).as("ticker"),
        col("o_orderdate").cast(org.apache.spark.sql.types.DateType).as("date"),
        col("o_totalprice").as("close"))
      .groupBy("ticker", "date").agg(max("close").as("close"))
      .localCheckpoint()
    val maxDate = prices.agg(max(col("date"))).head.getDate(0)
    // yearly as_ofs counting back from the data's end, so every cell sees
    // the full history depth at or before its as_of
    val grid = prices.select(col("ticker")).distinct()
      .crossJoin(spark.range(nAsOfs.toLong)
        .select(add_months(lit(maxDate), (col("id") * -12).cast("int")).as("as_of")))
      .localCheckpoint()

    // force full computation of every output column (sum of row hashes
    // defeats column pruning); values between forms differ in last ulps on
    // the two order-sensitive aggregates, so only timings are compared here
    // (TickerFeaturesSpec pins the equivalence with tolerance)
    def drive(df: DataFrame): Long = {
      // sum(hash) — not count(hash): count of a non-nullable expression lets
      // the optimizer drop the hash and prune every aggregate column, which
      // would time the row counting, not the block computation
      val h = df.select(xxhash64(df.columns.map(col): _*).as("h"))
      val r = h.agg(count(col("h")).as("n"), sum(col("h")).as("s")).head
      r.getLong(1); r.getLong(0)
    }
    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    val shape = prices.groupBy(col("ticker")).agg(count(lit(1)).as("n"))
      .agg(avg(col("n")).as("avgHist"), count(lit(1)).as("nTickers")).head
    val chose = TickerFeatures.choosePriceForm(grid, prices)
    val (tGrid, nGrid) = time(drive(TickerFeatures.priceBlock(grid, prices)))
    val (tSeries, nSeries) = time(drive(TickerFeatures.priceBlockSeries(grid, prices)))
    require(nGrid == nSeries, s"row-count mismatch: grid=$nGrid series=$nSeries")
    println(f"""PROBE_DEEP {"dir":"$dir","avgHist":${shape.getDouble(0)}%.1f,""" +
      f""""nTickers":${shape.getLong(1)},"nAsOfs":$nAsOfs,"cells":$nGrid,""" +
      f""""choseSeries":$chose,"gridSec":$tGrid%.2f,"seriesSec":$tSeries%.2f}""")
    spark.stop()
  }
}
