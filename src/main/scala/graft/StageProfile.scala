package graft

/** Stage profiler for the expensive composite queries (dev tool, like
  * GenScale/ProbeDeep): times the pieces of a drive separately so a slow
  * bench median can be attributed to a stage — or to VM load — instead of
  * guessed at. Modes:
  *
  *   runMain graft.StageProfile w4  [sfDir]   # DynamicRow build stages
  *   runMain graft.StageProfile d23 [sfDir]   # pair mining vs components
  *
  * Round-6 provenance: the d23 mode caught connectedComponents evaluating
  * its input pair plan once per union branch (77 s → 5 s after the input
  * checkpoint); the w4 mode showed the 14–22 s bench medians were VM load
  * on top of a 1.7 s warm build.
  */
object StageProfile {
  private def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("w4")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = Verify.makeSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    mode match {
      case "w4" =>
        val (in, grid) = t("inputs+base checkpoint") {
          graft.queries.DynamicRow.buildInputs(spark, dir)
        }
        t("grid count")(grid.count())
        t("priceBlock") {
          graft.features.TickerFeatures.priceBlock(grid, in.prices).count()
        }
        t("fusedFundamentals") {
          graft.features.TickerFeatures
            .fusedFundamentalsBlock(grid, in.statements.get).count()
        }
        t("dividendBlock") {
          graft.features.TickerFeatures
            .dividendBlock(grid, in.dividends, in.splits).count()
        }
        t("dynamicFeatures + validate") {
          graft.pipeline.TickerValidation.validate(
            graft.features.TickerFeatures.dynamicFeatures(grid, in)).count()
        }
      case "d23" =>
        val pairs = graft.operators.Dedup.blockedJaccardPairs(
          graft.core.Tables.documents(spark, dir), "doc_id", "text",
          blockCols = Seq("source", "lang"), shingleK = 3, threshold = 0.02)
          .select("id_a", "id_b")
        t("pair mining (count)") { println("  n_pairs=" + pairs.count()) }
        t("connectedComponents (full d23 shape)") {
          println("  n_nodes=" + graft.operators.Dedup
            .connectedComponents(pairs, "id_a", "id_b").count())
        }
      case other => sys.error(s"unknown mode '$other' — use w4 | d23")
    }
    spark.stop()
  }
}
