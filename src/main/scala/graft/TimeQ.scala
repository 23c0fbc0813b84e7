package graft
/** Single-query wall-clock timer. Caveat: queries backed by a session-level
  * materialized store (p1/p4 share Pipeline.p1Materialized) pay the build
  * cost on the FIRST run only — repeat runs time the cached read. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val name = args(0); val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Verify.makeSession("32")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    for (i <- 1 to args.drop(2).headOption.map(_.toInt).getOrElse(1)) {
      // Bench's round-isolation hygiene, or runs leak each other's
      // checkpointed blocks/shuffle files and legs differ 2-6x.
      queries.Pipeline.clearMaterialized()
      queries.DynamicRow.clearMaterialized()
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
      System.gc()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"[timeq] $name run$i: ${(System.nanoTime()-t0)/1e9}%.2f s, rows=$n")
    }
    spark.stop()
  }
}
