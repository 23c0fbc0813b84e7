package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Specs for the sixth coverage batch (q76-q83). The DuckDB oracle pins
  * full-output equality at both SFs; these pin the semantic invariants the
  * oracle form can't see: argmin/argmax tie determinism, native-function
  * agreement for the exact-moment construction, and the decorrelated
  * LATERAL plan shape.
  */
class Coverage6Spec extends SparkSpec {
  import spark.implicits._

  test("min_by/max_by with an encoded total ordering is tie-deterministic") {
    // two rows share the same date; the orderkey component of the encoding
    // must decide the winner identically on every run
    val df = Seq(
      (1L, "2024-01-05", 10.0, 100L), (1L, "2024-01-05", 20.0, 101L),
      (1L, "2024-01-01", 5.0, 50L))
      .toDF("k", "d", "price", "ok")
      .withColumn("enc", datediff(to_date($"d"), lit("1970-01-01")).cast("long") * 100000000L + $"ok")
    val r = df.groupBy("k")
      .agg(min_by($"price", $"enc").as("first"), max_by($"price", $"enc").as("last"))
      .head()
    assert(r.getDouble(1) == 5.0)   // earliest date wins min
    assert(r.getDouble(2) == 20.0)  // same-date tie broken by larger orderkey
  }

  test("exact-moment skewness/kurtosis agrees with Spark's native aggregates") {
    // q80 computes skew/kurtosis from exact integer power sums (for DuckDB
    // bit-parity); the native float co-moment versions must agree to 1e-9
    // on integral data or the closed-form expansion is wrong
    val df = Seq(1L, 2L, 2L, 3L, 3L, 3L, 7L, 9L, 9L, 50L).toDF("q")
    val native = df.agg(skewness($"q".cast("double")).as("sk"),
      kurtosis($"q".cast("double")).as("ku")).head()
    val g = df.agg(count(lit(1)).as("n"), sum($"q").as("s1"),
      sum($"q" * $"q").as("s2"), sum($"q" * $"q" * $"q").as("s3"),
      sum($"q" * $"q" * $"q" * $"q").as("s4")).head()
    val n = g.getLong(0).toDouble
    val (s1, s2, s3, s4) = (g.getLong(1).toDouble, g.getLong(2).toDouble,
      g.getLong(3).toDouble, g.getLong(4).toDouble)
    val m = s1 / n
    val m2 = s2 / n - m * m
    val m3 = s3 / n - 3 * m * (s2 / n) + 2 * m * m * m
    val m4 = s4 / n - 4 * m * (s3 / n) + 6 * m * m * (s2 / n) - 3 * m * m * m * m
    assert(native.getDouble(0) ~= (m3 / math.pow(m2, 1.5), 1e-9))
    assert(native.getDouble(1) ~= (m4 / (m2 * m2) - 3.0, 1e-9))
  }

  test("LATERAL top-k decorrelates to a window, not a per-row nested loop") {
    Seq((1L, "A"), (2L, "B")).toDF("nk", "nname").createOrReplaceTempView("lat_n")
    Seq((1L, 10.0, "s1"), (1L, 20.0, "s2"), (1L, 30.0, "s3"), (2L, 5.0, "s4"))
      .toDF("snk", "bal", "sname").createOrReplaceTempView("lat_s")
    val df = spark.sql("""SELECT nname, t.sname, t.bal
      FROM lat_n, LATERAL (
        SELECT sname, bal FROM lat_s WHERE snk = nk
        ORDER BY bal DESC, sname LIMIT 2) t
      ORDER BY nname, t.bal DESC""")
    val rows = df.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("A", "s3"), ("A", "s2"), ("B", "s4")))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"lateral limit should decorrelate into a partitioned rank, got:\n$plan")
  }

  test("deterministic mode picks the smallest value among tied frequencies") {
    val df = Seq(("A", 5.0), ("A", 5.0), ("A", 3.0), ("A", 3.0), ("A", 9.0))
      .toDF("g", "q")
    val counts = df.groupBy("g", "q").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("g").orderBy($"cnt".desc, $"q".asc)
    val r = counts.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).select("q").head()
    assert(r.getDouble(0) == 3.0) // 3.0 and 5.0 both occur twice; smaller wins
  }

  test("map_from_entries state: element_at finds entries, missing key is null") {
    val df = Seq(("A", "O", 1.0), ("A", "F", 2.0)).toDF("g", "st", "v")
      .groupBy("g")
      .agg(map_from_entries(array_sort(collect_list(struct($"st", $"v")))).as("m"))
    val r = df.select(element_at($"m", "O"), element_at($"m", "X"), size($"m")).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.isNullAt(1))
    assert(r.getInt(2) == 2)
  }

  test("higher-order pipeline: sort-slice-filter-aggregate over one group") {
    val df = Seq(("A", 10.0, 1L, 1), ("A", 30.0, 2L, 1), ("A", 20.0, 3L, 1))
      .toDF("g", "q", "ok", "ln")
    val r = df.groupBy("g")
      .agg(collect_list(struct(($"q" * -1).as("nq"), $"ok", $"ln")).as("raw"))
      .select(
        expr("transform(slice(array_sort(raw), 1, 2), x -> -x.nq)").as("lst"),
        expr("size(filter(transform(array_sort(raw), x -> -x.nq), x -> x > 15))").as("n_hi"),
        expr("aggregate(transform(array_sort(raw), x -> -x.nq), 0D, (a, x) -> a + x)").as("tot"))
      .head()
    assert(r.getSeq[Double](0) == Seq(30.0, 20.0))
    assert(r.getInt(1) == 2)
    assert(r.getDouble(2) == 60.0)
  }
}
