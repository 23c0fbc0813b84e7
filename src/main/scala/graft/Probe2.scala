package graft

import org.apache.spark.sql.functions._

/** Stage-level profiling of p4. */
object Probe2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Verify.makeSession("32")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val features = graft.queries.Pipeline.p1.fn(spark, dir)
    val labeled = features.withColumn("cut_label",
      when(col("max_drawdown_1y") > 0.5, 1.0).otherwise(0.0)).persist()
    println("[probe] labeled rows=" + time("materialize p1")(labeled.count()))
    val (scored, auc) = time("gbt fit+score")(
      graft.analysis.Scoring.fitCutProbability(labeled, "cut_label", "2000-01-01"))
    println("[probe] auc=" + auc)
    val withScores = time("score formula")(graft.analysis.Scoring.score(scored))
    println("[probe] scored rows=" + time("materialize scored")(withScores.count()))
    val port = graft.analysis.Scoring.constructPortfolio(
      withScores.withColumn("sector", lit("X")), n = 20,
      groupCols = Seq("sector"), maxPerGroup = 0.2, maxCutProb = 0.9)
    println("[probe] port=" + time("portfolio")(port.count()))
    spark.stop()
  }
}
