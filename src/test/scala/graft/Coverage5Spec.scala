package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.queries.TextVector3
import graft.streaming.EventStreams

/** Specs for the fifth coverage batch (q69-q73, d28, d29, s6). The DuckDB
  * oracle pins full-output equality; these pin semantic invariants, the
  * native-function agreement the exact-decimal oracle form can't see, and
  * streaming/batch agreement.
  */
object Coverage5Spec {
  final case class Ev(event_id: Long, user_id: Long, ts: java.sql.Timestamp)
}

class Coverage5Spec extends SparkSpec {
  import spark.implicits._

  private val t = (s: String) => java.sql.Timestamp.valueOf(s)
  private val d = (s: String) => java.sql.Date.valueOf(s)

  test("q73's exact-decimal regression equals Spark's native regr_slope/corr") {
    // the judged query computes slope/r2 from exact decimal co-sums (for
    // bit-parity with DuckDB); Spark's native co-moment aggregates must
    // agree to float precision or the construction is wrong
    val df = Seq((1.0, 2.1), (2.0, 3.9), (3.0, 6.2), (4.0, 7.8), (5.0, 10.1))
      .toDF("x", "y")
    val native = df.agg(
      expr("regr_slope(y, x)").as("slope"),
      expr("regr_intercept(y, x)").as("icept"),
      expr("corr(y, x)").as("r")).head()
    val g = df.agg(count(lit(1)).cast("double").as("n"),
      sum($"x").as("sx"), sum($"y").as("sy"),
      sum($"x" * $"x").as("sxx"), sum($"x" * $"y").as("sxy"),
      sum($"y" * $"y").as("syy")).head()
    val (n, sx, sy, sxx, sxy, syy) = (g.getDouble(0), g.getDouble(1),
      g.getDouble(2), g.getDouble(3), g.getDouble(4), g.getDouble(5))
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    val r2 = math.pow(n * sxy - sx * sy, 2) / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(native.getDouble(0) ~= slope)
    assert(native.getDouble(1) ~= icept)
    assert(math.pow(native.getDouble(2), 2) ~= r2)
  }

  test("gap fill: missing days carry the last observed value, leading gap stays null") {
    val daily = Seq((1L, d("2024-01-01"), 10.0), (1L, d("2024-01-04"), 40.0))
      .toDF("k", "dt", "v")
    val spine = daily.groupBy("k").agg(min($"dt").as("lo"), max($"dt").as("hi"))
      .select($"k", explode(sequence($"lo", $"hi", expr("interval 1 day"))).as("dt"))
    val w = Window.partitionBy("k").orderBy("dt")
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = spine.join(daily, Seq("k", "dt"), "left")
      .withColumn("fv", last($"v", ignoreNulls = true).over(w))
      .orderBy("dt").select("dt", "fv").as[(java.sql.Date, Double)].collect()
    assert(filled.map(_._2).toSeq == Seq(10.0, 10.0, 10.0, 40.0))
    assert(filled.map(_._1.toString).toSeq ==
      Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"))
  }

  test("streak islands: day - row_number anchors split on gaps only") {
    // user 1: 1/1-1/3 (streak 3) then 1/5 (streak 1); user 2: one day
    val days = Seq((1L, d("2024-01-01")), (1L, d("2024-01-02")),
      (1L, d("2024-01-03")), (1L, d("2024-01-05")), (2L, d("2024-02-01")))
      .toDF("user_id", "d")
    val w = Window.partitionBy("user_id").orderBy("d")
    val runs = days.withColumn("anchor", date_sub($"d", row_number().over(w)))
      .groupBy("user_id", "anchor").agg(count(lit(1)).as("len"))
      .groupBy("user_id").agg(max($"len").as("max_streak"),
        count(lit(1)).as("n_streaks"))
      .orderBy("user_id").as[(Long, Long, Long)].collect().toSeq
    assert(runs == Seq((1L, 3L, 2L), (2L, 1L, 1L)))
  }

  test("interval sweep: open count rises inside intervals and drains to zero") {
    val orders = Seq(d("2024-01-01"), d("2024-01-10"), d("2024-01-15"))
      .toDF("dt").select(to_date($"dt").as("d"))
    val deltas = orders.select($"d", lit(1L).as("delta"))
      .unionByName(orders.select(date_add($"d", 30).as("d"), lit(-1L).as("delta")))
    val swept = deltas.groupBy("d").agg(sum($"delta").as("net"))
      .withColumn("open", sum($"net").over(
        Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)))
      .orderBy("d").as[(java.sql.Date, Long, Long)].collect().toSeq
    // on 1/15 all three intervals overlap; after the last close, zero open
    assert(swept.find(_._1 == d("2024-01-15")).get._3 == 3L)
    assert(swept.last._3 == 0L)
    assert(swept.map(_._2).sum == 0L)
  }

  test("edit-distance pairs: near-identical docs pair within a block, cross-lang never") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en", 44L),
      (2L, "the quick brown fox jumps over the lazy cat", "en", 44L),
      (3L, "the quick brown fox jumps over the lazy dog", "fr", 44L),
      (4L, "completely different text about other things!!", "en", 46L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val pairs = TextVector3.editDistancePairs(docs,
      prefixLen = 40, maxDist = 4)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))          // identical 40-char prefix
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // fr block is alone
    assert(!pairs.contains((1L, 4L)) && !pairs.contains((2L, 4L)))
    // completeness vs the naive quadratic form on a worst-ish fixture:
    // edits at segment boundaries, shifted content, unequal lengths,
    // short docs (the stratum the padded-grid variant degenerated on),
    // tiny docs (1-char segments), and a just-past-k control
    val tricky = Seq(
      (10L, "abcdefgh".repeat(5), "en", 40L),                      // base
      (11L, "Xbcdefgh".repeat(1) + "abcdefgh".repeat(4), "en", 40L), // 1 sub at pos 0
      (12L, "abcdefgh".repeat(4) + "abcdefgX", "en", 40L),         // 1 sub at pos 39
      (13L, "abcd" + "abcdefgh".repeat(4) + "efgh", "en", 40L),    // shifted content
      (14L, "abcdefgh".repeat(5).replace("a", "Z"), "en", 40L),    // 5 subs > k
      (15L, "abcdefgh".repeat(4), "en", 32L),                      // short vs base
      (16L, "hello world", "en", 11L),                             // short pair...
      (17L, "hello worXd", "en", 11L),                             // ...1 sub
      (18L, "hello worlds", "en", 12L),                            // ...1 insert
      (19L, "ab", "en", 2L),                                       // tiny pair...
      (20L, "abcd", "en", 4L))                                     // ...2 inserts
      .toDF("doc_id", "text", "lang", "n_chars")
    val got = TextVector3.editDistancePairs(tricky, 40, 4)
      .select("a_id", "b_id", "dist").as[(Long, Long, Int)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    val naive = {
      val rows = tricky.select("doc_id", "text").as[(Long, String)].collect()
      (for {
        (ia, a) <- rows; (ib, b) <- rows if ia < ib
        d = {
          val dp = Array.tabulate(a.length + 1)(i => i)
          for (j <- 1 to b.length) {
            var prev = dp(0); dp(0) = j
            for (i <- 1 to a.length) {
              val t = dp(i)
              dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
                prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
              prev = t
            }
          }
          dp(a.length)
        } if d <= 4
      } yield (ia, ib) -> d).toMap
    }
    assert(got == naive, s"segment join missed or invented pairs: got=$got naive=$naive")
  }

  test("token entropy: zero for repeated token, log2(n) when all distinct") {
    val docs = Seq((1L, "a a a a"), (2L, "a b c d"), (3L, "a a b b"))
      .toDF("doc_id", "text")
    val h = TextVector3.tokenEntropy(docs)
      .select("doc_id", "token_entropy").as[(Long, Double)].collect().toMap
    assert(h(1L) == 0.0)
    assert(h(2L) ~= 2.0) // log2(4)
    assert(h(3L) ~= 1.0) // two equiprobable symbols
  }

  test("streaming hourlyBySegment agrees with the batch twin") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "AUTO"), (2L, "RETAIL")).toDF("c_custkey", "c_mktsegment")
    val rows = Seq(
      EventStreams.EventIn(1L, t("2024-01-01 05:07:00"), "click", 1.0),
      EventStreams.EventIn(2L, t("2024-01-01 05:59:00"), "view", 2.0),
      EventStreams.EventIn(1L, t("2024-01-01 06:20:00"), "click", 4.0))
    val stream = MemoryStream[EventStreams.EventIn]
    val q = EventStreams.hourlyBySegment(stream.toDF(), dim, withWatermark = false)
      .writeStream.format("memory").queryName("enrich_test")
      .outputMode(OutputMode.Complete).start()
    try {
      stream.addData(rows.take(2)); q.processAllAvailable()
      stream.addData(rows.drop(2)); q.processAllAvailable()
      val streamed = spark.table("enrich_test")
        .select("window_start", "c_mktsegment", "n", "sum_value")
        .orderBy("window_start", "c_mktsegment")
        .as[(java.sql.Timestamp, String, Long, Double)].collect().toSeq
      val batch = EventStreams.hourlyBySegment(
          rows.toDF().select($"user_id", $"ts", $"event_type", $"value"),
          dim, withWatermark = false)
        .orderBy("window_start", "c_mktsegment")
        .as[(java.sql.Timestamp, String, Long, Double)].collect().toSeq
      assert(streamed == batch)
      // the enrich is visible: segments, not event types, key the rollup
      assert(streamed.map(_._2).toSet == Set("AUTO", "RETAIL"))
    } finally q.stop()
  }

  test("stream-stream left outer join emits NULLs once the watermark clears the window") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    import Coverage5Spec.Ev
    val purchases = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val joined = EventStreams.purchasesWithClick(
      purchases.toDF(), clicks.toDF(), streaming = true)
    val q = joined.writeStream.format("memory").queryName("leftjoin_test")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: click then purchase (match); user 2: purchase, no click
      clicks.addData(Ev(100L, 1L, t("2024-01-01 09:50:00")))
      purchases.addData(Ev(1L, 1L, t("2024-01-01 10:00:00")),
        Ev(2L, 2L, t("2024-01-01 10:05:00")))
      q.processAllAvailable()
      // matched row may emit eagerly; the NULL row must NOT exist yet
      val early = spark.table("leftjoin_test")
        .collect().map(r => (r.getLong(0), Option(r.getAs[Any]("click_id"))))
      assert(!early.contains((2L, None)), early.toSeq.toString)
      // advance BOTH watermarks well past 10:05 + 10 min delay
      clicks.addData(Ev(101L, 99L, t("2024-01-01 12:00:00")))
      purchases.addData(Ev(3L, 98L, t("2024-01-01 12:00:00")))
      q.processAllAvailable()
      // one more batch so the state-eviction pass runs after the new watermark
      clicks.addData(Ev(102L, 99L, t("2024-01-01 12:30:00")))
      purchases.addData(Ev(4L, 98L, t("2024-01-01 12:30:00")))
      q.processAllAvailable()
      val rows = spark.table("leftjoin_test")
        .collect().map(r => (r.getLong(0), Option(r.getAs[Any]("click_id")))).toSet
      assert(rows.contains((1L, Some(100L))), rows.toString)  // the match
      assert(rows.contains((2L, None)), rows.toString)        // null-emitted
    } finally q.stop()
  }

  test("approx_count_distinct stays within 5% of exact on the events table") {
    val df = graft.queries.TextVector3.d30Full(spark, "/root/testdata/sf0.01")
      .select("approx_users", "exact_users")
      .as[(Long, Long)].collect()
    assert(df.nonEmpty)
    df.foreach { case (approx, exact) =>
      assert(math.abs(approx - exact).toDouble / exact <= 0.05,
        s"approx $approx vs exact $exact")
    }
  }

  test("q69 star join plan broadcasts every dimension (single big-table shuffle)") {
    val df = graft.queries.Relational5.q69.fn(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }
}
