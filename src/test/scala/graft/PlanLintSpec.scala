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
}
