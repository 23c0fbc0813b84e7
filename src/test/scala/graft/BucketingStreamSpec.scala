package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sinks.Bucketing
import graft.streaming.EventStreams
import java.nio.file.Files

class BucketingStreamSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join on the bucket key plans without a shuffle") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = (1 to 1000).map(i => (i.toLong % 100, i.toDouble)).toDF("k", "v")
      val dims = (0 until 100).map(i => (i.toLong, s"dim$i")).toDF("k", "name")
      Bucketing.writeBucketed(facts, "graft_facts", Seq("k"), 8)
      Bucketing.writeBucketed(dims, "graft_dims", Seq("k"), 8)
      val joined = Bucketing.bucketedJoin(spark, "graft_facts", "graft_dims", Seq("k"))
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"),
        s"bucketed join should be shuffle-free, got:\n$physical")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS graft_facts")
      spark.sql("DROP TABLE IF EXISTS graft_dims")
    }
  }

  test("AvailableNow file-stream processes a parquet directory then stops") {
    val dir = Files.createTempDirectory("graft-stream")
    val input = dir.resolve("in").toString
    val output = dir.resolve("out").toString
    val ckpt = dir.resolve("ckpt").toString
    val events = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 05:10:00"), 1L, "click", 10.0),
      (java.sql.Timestamp.valueOf("2024-01-01 06:20:00"), 2L, "view", 5.0))
      .toDF("ts", "user_id", "event_type", "value")
    events.write.parquet(input)
    val q = EventStreams.runHourlyAvailableNow(spark, input, output, ckpt,
      events.schema)
    q.awaitTermination(60000)
    // append-mode windows flush when the stream ends (AvailableNow finalizes)
    val out = spark.read.parquet(output)
    assert(out.columns.toSet ==
      Set("window_start", "event_type", "n", "sum_value"))
    // rerun with same checkpoint: no new data, no duplicate output
    val n1 = out.count()
    val q2 = EventStreams.runHourlyAvailableNow(spark, input, output, ckpt,
      events.schema)
    q2.awaitTermination(60000)
    assert(spark.read.parquet(output).count() == n1)
  }
}
