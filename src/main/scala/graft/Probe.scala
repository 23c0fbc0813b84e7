package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Dedup
import graft.features.TickerFeatures
import graft.pipeline.{TickerFeaturePipeline, TickerValidation}

/** Stage-level profiling tool for the hot paths.
  * Usage: runMain graft.Probe [dedup|pipeline|p4] [sfDir]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val what = args.headOption.getOrElse("dedup")
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Verify.makeSession("32")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    what match {
      case "dedup" =>
        val docs = Tables.documents(spark, dir)
        println("[probe] docs=" + docs.count())
        println("[probe] d5 pairs=" + time("d5 minhash")(
          Dedup.minHashNearDuplicates(docs, "doc_id", "text",
            numHashes = 32, numBands = 4, jaccardThreshold = 0.5).count()))
        println("[probe] d6 pairs=" + time("d6 jaccard")(
          Dedup.blockedJaccardPairs(docs, "doc_id", "text",
            Seq("source", "lang"), 3, 0.05).count()))
        println("[probe] d7 pairs=" + time("d7 simhash")(
          Dedup.simHashNearDuplicates(docs, "doc_id", "text", 3).count()))

      case "pipeline" =>
        val in = time("inputs (incl eager checkpoints)")(
          graft.queries.Pipeline.inputsForProbe(spark, dir))
        val grid = TickerFeaturePipeline.grid(spark,
          in.prices.select("ticker").distinct(), "1997-12-31", 4)
        val gated = time("gate")(TickerFeaturePipeline
          .hasEnoughPriceData(grid, in.prices, 5).localCheckpoint())
        println("[probe] cells=" + gated.count())
        val (tickerEtf, etfIndex) = graft.queries.Pipeline.indexForProbe(spark, dir)
        def bench(label: String, df: => org.apache.spark.sql.DataFrame): Unit =
          time(label)(df.write.format("noop").mode("overwrite").save())
        bench("priceBlock", TickerFeatures.priceBlock(gated, in.prices))
        bench("fundamentals", TickerFeatures.fundamentalsBlock(gated, in.income, in.balance))
        bench("ratios", TickerFeatures.ratiosBlock(gated, in.ratios))
        bench("dividends", TickerFeatures.dividendBlock(gated, in.dividends, in.splits))
        bench("full features (shared index)",
          TickerFeatures.dynamicFeaturesSharedIndex(gated, in, tickerEtf, etfIndex))
        bench("validated+normalized", TickerFeaturePipeline.normalize(
          TickerValidation.validate(
            TickerFeatures.dynamicFeaturesSharedIndex(gated, in, tickerEtf, etfIndex))))

      case "p1" =>
        // JIT-warm the whole codepath at sf0.001 first, then time sf0.1
        // stage by stage (the bench measures p1 warm too).
        time("warm (sf0.001 full p1)")(
          graft.queries.Pipeline.p1.fn(spark, "/root/testdata/sf0.001").count())
        graft.queries.Pipeline.clearMaterialized()
        val in = time("inputs (2 eager checkpoints)")(
          graft.queries.Pipeline.inputsForProbe(spark, dir))
        val grid = TickerFeaturePipeline.grid(spark,
          in.prices.select("ticker").distinct(), "1997-12-31", 4)
        val (tickerEtf, etfIndex) = graft.queries.Pipeline.indexForProbe(spark, dir)
        def noop(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        val features = TickerFeatures.dynamicFeaturesSharedIndex(grid, in,
          tickerEtf, etfIndex, minPriceRows = 5)
        time("features (fused, gate-fused)")(noop(features))
        time("validated")(noop(TickerValidation.validate(features)))
        time("validated+normalized+ordered")(noop(TickerFeaturePipeline.normalize(
          TickerValidation.validate(features)).orderBy("ticker", "as_of")))

      case "p4" =>
        val features = graft.queries.Pipeline.p1.fn(spark, dir)
        val labeled = features.withColumn("cut_label",
          when(col("max_drawdown_1y") > 0.5, 1.0).otherwise(0.0)).localCheckpoint()
        println("[probe] labeled rows=" + time("materialize p1")(labeled.count()))
        val (scored, auc) = time("gbt fit+score")(
          graft.analysis.Scoring.fitCutProbability(labeled, "cut_label", "2000-01-01"))
        println("[probe] auc=" + auc)
        println("[probe] scored=" + time("score+materialize")(
          graft.analysis.Scoring.score(scored).count()))
    }
    spark.stop()
  }
}
