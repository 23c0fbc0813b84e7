package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{AsOf, Tables}

/** Hot-key rehearsal (dev tool, the ProbeDeep pattern): reassigns a
  * deterministic ~30% of events to ONE user and times the three as-of
  * constructions — union+window ([[AsOf.joinBackward]]), the physical
  * merge exec (plans.AsOfJoinApi), and the bucketed form
  * ([[AsOf.joinBackwardBucketed]], daily buckets) — against the uniform
  * baseline. Windows and per-key merges have no AQE skew mitigation, so
  * the hot key concentrates in one task in the first two forms; the
  * bucketed form bounds the straggler by rows-per-(key,bucket).
  *
  * Usage: runMain graft.ProbeSkew [sfDir] [hotPct] [amp] [forms] —
  * hotPct 0 = uniform; amp unions that many ts/id-shifted copies of
  * events first (in-memory row-count amplifier, no extra disk tiling
  * needed); forms selects the probed family: "back" (default: window /
  * exec / bucketed_day), "fwd" (fwd_window / fwd_bucketed_day), "all".
  * Run one family per JVM — anything else is rejected loudly.
  */
object ProbeSkew {

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("target/testdata/deep100big")
    val hotPct = args.lift(1).map(_.toInt).getOrElse(30)
    val amp = args.lift(2).map(_.toInt).getOrElse(1)
    val mode = (if (hotPct == 0) "uniform" else s"hot$hotPct") +
      (if (amp > 1) s"_x$amp" else "")
    val spark = Verify.makeSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    val ev1 = Tables.events(spark, dir)
    val ev0 = (0 until amp).map(i => ev1
        .withColumn("event_id", col("event_id") + lit(i.toLong * 100000000000L))
        .withColumn("ts", col("ts") + expr(s"make_interval(0,0,0,0,0,0,$i)")))
      .reduce(_.unionByName(_))
    val ev = (if (hotPct > 0)
      ev0.withColumn("user_id",
        when(pmod(xxhash64(col("event_id")), lit(100)) < hotPct, lit(1L))
          .otherwise(col("user_id")))
    else ev0).localCheckpoint()
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"), col("value").as("click_value"))

    def drive(df: DataFrame): Long = {
      val h = df.select(xxhash64(df.columns.map(col): _*).as("h"))
      val r = h.agg(count(col("h")).as("n"), sum(col("h")).as("s")).head
      r.getLong(1); r.getLong(0)
    }
    def time(tag: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime(); val n = drive(f)
      println(f"""PROBE_SKEW {"mode":"$mode","form":"$tag","sec":${(System.nanoTime() - t0) / 1e9}%.2f,"rows":$n}""")
    }

    // arg 4 selects form families — one JVM per family: five heavy probes
    // in one process leave the last ones fighting the accumulated shuffle
    // blocks + checkpoint for heap (GC-bound timings, not operator cost)
    val forms = args.lift(3).getOrElse("back")
    require(Set("back", "fwd", "all")(forms),
      s"forms must be back|fwd|all, got '$forms' — a typo would otherwise probe NOTHING and exit 0")
    if (forms == "back" || forms == "all") {
      time("window") {
        AsOf.joinBackward(purchases, clicks, Seq("user_id"), "ts",
          Seq("click_id", "click_value"))
      }
      time("exec") {
        graft.plans.AsOfJoinApi.joinBackward(purchases, clicks,
          Seq("user_id"), "ts", Seq("click_id", "click_value"))
      }
      time("bucketed_day") {
        AsOf.joinBackwardBucketed(purchases, clicks, Seq("user_id"), "ts",
          Seq("click_id", "click_value"),
          c => floor(unix_micros(c).cast(DoubleType) / lit(86400e6)).cast("long"))
      }
    }
    // forward mirror: same probe/build sides, "earliest click at or after"
    if (forms == "fwd" || forms == "all") {
      time("fwd_window") {
        AsOf.joinForward(purchases, clicks, Seq("user_id"), "ts",
          Seq("click_id", "click_value"))
      }
      time("fwd_bucketed_day") {
        AsOf.joinForwardBucketed(purchases, clicks, Seq("user_id"), "ts",
          Seq("click_id", "click_value"),
          c => floor(unix_micros(c).cast(DoubleType) / lit(86400e6)).cast("long"))
      }
    }
    spark.stop()
  }
}
