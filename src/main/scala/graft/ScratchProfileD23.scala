package graft

// Scratch profiler for d23's two stages at a given SF dir — dev-only.
object ScratchProfileD23 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/testdata/sf1")
    val spark = Verify.makeSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = graft.core.Tables.documents(spark, dir)
    val pairs = graft.operators.Dedup.blockedJaccardPairs(
      docs, "doc_id", "text",
      blockCols = Seq("source", "lang"), shingleK = 3, threshold = 0.02)
      .select("id_a", "id_b")
    t("pairs count") { println("  n_pairs=" + pairs.count()) }
    val cached = pairs.localCheckpoint()
    t("pairs re-count (checkpointed)") { cached.count() }
    t("connectedComponents") {
      println("  n_nodes=" + graft.operators.Dedup
        .connectedComponents(cached, "id_a", "id_b").count())
    }
    t("connectedComponents UNCACHED pairs (the d23 shape)") {
      println("  n_nodes=" + graft.operators.Dedup
        .connectedComponents(pairs, "id_a", "id_b").count())
    }
    spark.stop()
  }
}
