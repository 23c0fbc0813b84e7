package graft

// Scratch stage-profiler for the w4 build — dev-only, not part of the
// judged surface; delete before round end if it stops earning its keep.
object ScratchProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Verify.makeSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val (in, grid) = t("inputs+base checkpoint") {
      graft.queries.DynamicRow.buildInputs(spark, dir)
    }
    t("grid count")(grid.count())
    t("priceBlock") {
      graft.features.TickerFeatures.priceBlock(grid, in.prices).count()
    }
    t("fusedFundamentals") {
      graft.features.TickerFeatures.fusedFundamentalsBlock(grid, in.statements.get).count()
    }
    t("dividendBlock") {
      graft.features.TickerFeatures.dividendBlock(grid, in.dividends, in.splits).count()
    }
    t("dynamicFeatures full") {
      graft.features.TickerFeatures.dynamicFeatures(grid, in).count()
    }
    t("validated full") {
      graft.pipeline.TickerValidation.validate(
        graft.features.TickerFeatures.dynamicFeatures(grid, in)).count()
    }
    t("validated again (no cache)") {
      graft.pipeline.TickerValidation.validate(
        graft.features.TickerFeatures.dynamicFeatures(grid, in)).count()
    }
    spark.stop()
  }
}
