package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** Specs for the fourth coverage batch (q64-q67, d26-d27, s5). The DuckDB
  * oracle pins full-output equality; these pin the semantic invariants and
  * the streaming/batch agreement the oracle can't see.
  */
class Coverage4Spec extends SparkSpec {
  import spark.implicits._

  private val t = (s: String) => java.sql.Timestamp.valueOf(s)

  test("slidingByType: every event lands in exactly windowDuration/slide windows") {
    val events = Seq(
      (t("2024-01-01 05:07:00"), "click", 1.0),
      (t("2024-01-01 05:59:00"), "view", 2.0),
      (t("2024-01-01 23:45:00"), "click", 4.0))
      .toDF("ts", "event_type", "value")
    val out = EventStreams.slidingByType(events, withWatermark = false)
    assert(out.agg(sum("n")).as[Long].head() == 3L * 4)
    // the 05:07 click's 4 windows: starts 03:30, 04:00, 04:30, 05:00
    val starts = out.filter(col("event_type") === "click" &&
        col("window_start") < t("2024-01-01 06:00:00"))
      .select("window_start").as[java.sql.Timestamp].collect().toSet
    assert(starts == Set(t("2024-01-01 03:30:00"), t("2024-01-01 04:00:00"),
      t("2024-01-01 04:30:00"), t("2024-01-01 05:00:00")))
  }

  test("streaming slidingByType agrees with the batch twin") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      EventStreams.EventIn(1L, t("2024-01-01 05:07:00"), "click", 1.0),
      EventStreams.EventIn(2L, t("2024-01-01 05:59:00"), "view", 2.0),
      EventStreams.EventIn(1L, t("2024-01-01 06:20:00"), "click", 4.0))
    val stream = MemoryStream[EventStreams.EventIn]
    val q = EventStreams.slidingByType(stream.toDF(), withWatermark = false)
      .writeStream.format("memory").queryName("sliding_test")
      .outputMode(OutputMode.Complete).start()
    try {
      stream.addData(rows.take(2)); q.processAllAvailable()
      stream.addData(rows.drop(2)); q.processAllAvailable()
      val streamed = spark.table("sliding_test")
        .select("window_start", "event_type", "n", "sum_value")
        .orderBy("window_start", "event_type")
        .as[(java.sql.Timestamp, String, Long, Double)].collect().toSeq
      val batch = EventStreams.slidingByType(
          rows.toDF().select(col("ts"), col("event_type"), col("value")),
          withWatermark = false)
        .orderBy("window_start", "event_type")
        .as[(java.sql.Timestamp, String, Long, Double)].collect().toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("tfidf ranks a distinctive term above corpus-wide ones") {
    // drives the PRODUCTION d26 construction (TextVector2.tfidfTop)
    val docs = Seq((1L, "alpha beta beta"), (2L, "alpha gamma"),
      (3L, "alpha alpha delta")).toDF("doc_id", "text")
    val ranked = graft.queries.TextVector2.tfidfTop(docs, topK = 3)
    // 'alpha' is in every doc => idf = ln(1) = 0; doc 1's top term is beta
    val top = ranked.filter(col("doc_id") === 1L && col("rank") === 1)
      .select("term").as[String].head()
    assert(top == "beta")
    val alphaScore = ranked.filter(col("term") === "alpha")
      .agg(max(abs(col("tfidf_r")))).as[Double].head()
    assert(alphaScore == 0.0)
    // df counts documents, tf occurrences
    val alphaRow = ranked.filter(col("doc_id") === 3L && col("term") === "alpha").head()
    assert(alphaRow.getAs[Long]("df") == 3L && alphaRow.getAs[Long]("tf") == 2L)
  }

  test("inverted index: posting head capped at 8, df counts docs not occurrences") {
    // drives the PRODUCTION d27 construction (TextVector2.invertedIndex)
    val docs = (1L to 12L).map(i => (i, "common rare" + (if (i == 5) " unique" else "")))
      .toDF("doc_id", "text")
    val idx = graft.queries.TextVector2.invertedIndex(docs, postingCap = 8)
    val common = idx.filter(col("term") === "common").head()
    assert(common.getAs[Long]("df") == 12L)
    assert(common.getAs[Long]("total_tf") == 12L)
    assert(common.getAs[String]("posting_head") == "1,2,3,4,5,6,7,8")
    val unique = idx.filter(col("term") === "unique").head()
    assert(unique.getAs[Long]("df") == 1L)
    assert(unique.getAs[String]("posting_head") == "5")
  }

  test("grouping sets: each marginal sums to the grand total") {
    val q = graft.queries.Relational4.q65.fn(spark, "/root/testdata/sf0.001")
    val rows = q.collect()
    val total = rows.filter(r => r.getAs[Long]("g_rf") == 1 && r.getAs[Long]("g_ls") == 1)
    assert(total.length == 1)
    val grand = total.head.getAs[Long]("n")
    val rfSum = rows.filter(r => r.getAs[Long]("g_rf") == 0).map(_.getAs[Long]("n")).sum
    val lsSum = rows.filter(r => r.getAs[Long]("g_ls") == 0 && r.getAs[Long]("g_rf") == 1)
      .map(_.getAs[Long]("n")).sum
    assert(rfSum == grand && lsSum == grand)
  }

  test("listagg: head capped at 10 and ordered by date") {
    val q = graft.queries.Relational4.q66.fn(spark, "/root/testdata/sf0.001")
    val heads = q.select("status_head").as[String].collect()
    assert(heads.forall(_.split('|').length <= 10))
    assert(heads.exists(_.nonEmpty))
  }
}
