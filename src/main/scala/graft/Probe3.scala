package graft

import org.apache.spark.sql.functions._
import graft.features.TickerFeatures
import graft.pipeline.{TickerFeaturePipeline, TickerValidation}

/** p1 internal stage profiling. */
object Probe3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Verify.makeSession("32")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val in = time("inputsFrom (incl eager checkpoints)")(
      graft.queries.Pipeline.inputsForProbe(spark, dir))
    val grid = TickerFeaturePipeline.grid(spark,
      in.prices.select("ticker").distinct(), "1997-12-31", 4)
    val gated = time("gate")(
      TickerFeaturePipeline.hasEnoughPriceData(grid, in.prices, 5).localCheckpoint())
    println("[probe] cells=" + gated.count())
    def bench(label: String, df: => org.apache.spark.sql.DataFrame): Unit =
      time(label)(df.write.format("noop").mode("overwrite").save())
    bench("priceBlock", TickerFeatures.priceBlock(gated, in.prices))
    bench("fundamentals", TickerFeatures.fundamentalsBlock(gated, in.income, in.balance))
    bench("incomeGrowth", TickerFeatures.incomeGrowthBlock(gated, in.income))
    bench("ratios", TickerFeatures.ratiosBlock(gated, in.ratios))
    bench("dividends", TickerFeatures.dividendBlock(gated, in.dividends, in.splits))
    val (tickerEtf, etfIndex) = graft.queries.Pipeline.indexForProbe(spark, dir)
    bench("full dynamicFeatures (shared index)",
      TickerFeatures.dynamicFeaturesSharedIndex(gated, in, tickerEtf, etfIndex))
    bench("validated+normalized", TickerFeaturePipeline.normalize(
      TickerValidation.validate(
        TickerFeatures.dynamicFeaturesSharedIndex(gated, in, tickerEtf, etfIndex))))
    spark.stop()
  }
}
