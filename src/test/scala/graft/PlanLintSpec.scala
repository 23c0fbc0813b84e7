package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Proves PlanLint's check 5 (unpersisted-RDD rescan) actually FIRES on
  * the pattern it gates — the round-10 m5 shape: an RDD-backed relation
  * consumed by more than one plan branch re-runs its lineage per branch.
  * A gate that can never trip is worse than none (it reads as "checked"). */
class PlanLintSpec extends SparkSpec {

  private val schema = StructType(Seq(StructField("id", LongType),
    StructField("v", LongType)))

  private def rddDf = spark.createDataFrame(
    spark.sparkContext.parallelize((1L to 100L).map(i => Row(i, i * 7))),
    schema)

  test("check 5 fires on an unpersisted RDD relation consumed twice, " +
    "stays silent after a checkpoint and on single consumers") {
    // true positive: the same unpersisted RDD under both union branches
    val hot = rddDf
    val twice = hot.select("id").unionByName(hot.select("id"))
    assert(PlanLint.rddRescanCount(twice.queryExecution.executedPlan) >= 1,
      "two scans of one unpersisted RDD must be flagged")
    // true negative 1: localCheckpoint materializes the relation — the
    // scans read blocks, not lineage
    val cp = rddDf.localCheckpoint()
    val cpTwice = cp.select("id").unionByName(cp.select("id"))
    assert(PlanLint.rddRescanCount(cpTwice.queryExecution.executedPlan) == 0,
      "a checkpointed relation scanned twice is the intended shape")
    // true negative 2: one consumer of an unpersisted RDD is fine
    assert(PlanLint.rddRescanCount(
      rddDf.select("id").queryExecution.executedPlan) == 0)
    // true negative 3: two scans of the same PARQUET source are pushed-down
    // re-reads, not lineage re-runs — parquet never hits this check
    val dir = java.nio.file.Files.createTempDirectory("planlint").toString
    rddDf.write.mode("overwrite").parquet(s"$dir/t.parquet")
    val pq = spark.read.parquet(s"$dir/t.parquet")
    val pqTwice = pq.select("id").unionByName(pq.select("id"))
    assert(PlanLint.rddRescanCount(pqTwice.queryExecution.executedPlan) == 0)
  }

  test("check 3 fires on a global window over a GROUPED aggregate (the " +
    "pre-r12 d77 shape), stays silent on keyless-agg / limit-bounded / " +
    "partitioned windows") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // TRUE POSITIVE — the exact shape the r11 verdict flagged: rank a
      // grouped-aggregate output (a corpus-growing vocabulary) through a
      // partition-less window. Before r12 the grouped agg exempted it.
      // RDD-backed source: its maxRows is UNKNOWN, like a parquet scan's —
      // a range() source would let the optimizer PROVE boundedness and
      // eliminate globalRowIds' visibility limit (correctly: a subtree
      // with proven maxRows <= limit is bounded with or without the node).
      val vocab = spark.createDataFrame(
          spark.sparkContext.parallelize((1L to 1000L).map(i => Row(i % 97))),
          StructType(Seq(StructField("token", LongType))))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
      val oldD77 = vocab.withColumn("r",
        row_number().over(Window.orderBy(col("cnt").desc, col("token").asc)))
      assert(PlanLint.nakedGlobalWindows(
        oldD77.queryExecution.executedPlan) >= 1,
        "a global window over a grouped aggregate must be flagged")

      // TRUE NEGATIVE 1: a keyless aggregate below bounds the subtree to
      // one row — a window over it sorts nothing
      val oneRow = spark.range(1000L).agg(count(lit(1)).as("n"))
        .withColumn("r", row_number().over(Window.orderBy("n")))
      assert(PlanLint.nakedGlobalWindows(
        oneRow.queryExecution.executedPlan) == 0)

      // TRUE NEGATIVE 2: a limit below bounds the subtree
      val limited = spark.range(1000L).limit(20)
        .withColumn("r", row_number().over(Window.orderBy("id")))
      assert(PlanLint.nakedGlobalWindows(
        limited.queryExecution.executedPlan) == 0)

      // TRUE NEGATIVE 3: a PARTITIONED window is never this check's
      // business, grouped aggregate below or not
      val partitioned = vocab.withColumn("r", row_number().over(
        Window.partitionBy(col("token") % 7).orderBy(col("cnt").desc)))
      assert(PlanLint.nakedGlobalWindows(
        partitioned.queryExecution.executedPlan) == 0)

      // and the scale-safe replacement passes: globalRowIds' interior
      // window is partitioned by bucket, its offset window sits over the
      // keyless... (grouped-by-bucket ≤ nBuckets+1 rows) — assert the
      // rewritten shape plans ZERO naked global windows end-to-end
      val rewritten = graft.core.Indexing.globalRowIds(
        vocab.withColumn("__negcnt", -col("cnt")), "__negcnt", "__rid",
        withinOrder = Seq(col("cnt").desc, col("token").asc))
      assert(PlanLint.nakedGlobalWindows(
        rewritten.queryExecution.executedPlan) == 0,
        "globalRowIds is the scale-safe ranking — it must not trip the " +
          "check it exists to satisfy")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  test("check 6 fires on an oversized broadcast whose subtree is only " +
    "filter-reduced, stays silent on limit-bounded query batches and " +
    "keyless aggregates") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    // PlanLint inspects STATIC plans (AQE off in its session); with AQE
    // on, executedPlan is an AdaptiveSparkPlanExec leaf that hides the
    // exchange from collect — match the production configuration here
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    // the corpus side every shape joins against
    val corpus = spark.range(1000L).select(col("id"), (col("id") % 7).as("k"))
    // ceiling scaled down so the spec proves the MECHANISM without
    // shuffling real gigabytes: 1 kB here plays 64 MB in production
    val ceiling = 1024L

    // TRUE POSITIVE (the verdict's example): a "query sample" that is a
    // FILTER over a large relation — bounded by construction, but the
    // bound grows with the corpus. range(1M) estimates 8 MB >> 1 kB;
    // the filter must NOT reduce the estimate.
    val sample = spark.range(1000000L).filter(col("id") % 10 === 0)
      .select(col("id").as("k"))
    val sampled = corpus.join(broadcast(sample), Seq("k"))
    assert(PlanLint.oversizedBroadcasts(
      sampled.queryExecution.executedPlan, ceiling) >= 1,
      "a filter-only 'sample' broadcast over the ceiling must be flagged")

    // TRUE NEGATIVE 1: the e2-class bounded query batch — a LIMIT bounds
    // the subtree no matter how large the source
    val batch = spark.range(1000000L).limit(20).select(col("id").as("k"))
    val batched = corpus.join(broadcast(batch), Seq("k"))
    assert(PlanLint.oversizedBroadcasts(
      batched.queryExecution.executedPlan, ceiling) == 0,
      "a limit-20 query batch is the intended broadcast shape")

    // TRUE NEGATIVE 2: a keyless (1-row) aggregate — the d26 IDF
    // denominator pattern
    val total = spark.range(1000000L).agg(count(lit(1)).as("n"))
      .select(lit(0L).as("k"), col("n"))
    val agged = corpus.join(broadcast(total), Seq("k"))
    assert(PlanLint.oversizedBroadcasts(
      agged.queryExecution.executedPlan, ceiling) == 0,
      "a 1-row aggregate broadcast is bounded by construction")

    // TRUE NEGATIVE 3: an opaque leaf (RDD-backed relation) makes the
    // subtree unknowable — skipped, not flagged on a garbage estimate
    val opaque = rddDf.select(col("id").as("k"))
    val viaRdd = corpus.join(broadcast(opaque), Seq("k"))
    assert(PlanLint.oversizedBroadcasts(
      viaRdd.queryExecution.executedPlan, ceiling) == 0,
      "stats-free subtrees are out of a stats-based check's scope")

    // and the size model itself: a small broadcast under the REAL ceiling
    // passes (the production configuration is not vacuously strict)
    val smallDim = spark.range(100L).select(col("id").as("k"))
    val dimJoin = corpus.join(broadcast(smallDim), Seq("k"))
    assert(PlanLint.oversizedBroadcasts(
      dimJoin.queryExecution.executedPlan) == 0)
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }
}
