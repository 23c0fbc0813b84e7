package graft

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query wall-clock seconds. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Verify.makeSession(cpus)
    // warm the JVM/codegen once on the smallest scale so per-query numbers
    // measure the plan, not first-call JIT + classloading. One query per
    // expression family (relational agg, shingle/minhash, vector math) —
    // different dataset (sf0.001), so nothing but JIT state is reused.
    val warm = Seq("d5_minhash_dedup", "e2_knn_brute")
    try {
      SparkEntry.entry(spark).count()
      warm.foreach(q => SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count())
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // ms precision keeps the whole line short enough for log-tail capture
    def s3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + s3(v) }
      .mkString("{", ",", "}")
    val total = s3(results.map(_._2).sum)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
