package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.SeriesOps
import graft.functions.{GraftFunctions, ProductAgg}

class ProductAggSpec extends SparkSpec {
  import spark.implicits._

  test("groupBy product is exact (2*2*0.25 == 1.0 bit-exact)") {
    val df = Seq(("a", 2.0), ("a", 2.0), ("a", 0.25), ("b", 3.0))
      .toDF("k", "v")
    val out = df.groupBy("k").agg(ProductAgg.product(col("v")).as("p"))
      .orderBy("k").as[(String, Double)].collect()
    assert(out(0) == (("a", 1.0))) // exact, not 0.9999999999999998
    assert(out(1) == (("b", 3.0)))
  }

  test("nulls are skipped, all-null group yields null, zero annihilates") {
    val df = Seq(("a", Some(2.0)), ("a", None), ("b", None), ("c", Some(0.0)),
      ("c", Some(5.0))).toDF("k", "v")
    val rows = df.groupBy("k").agg(ProductAgg.product(col("v")).as("p"))
      .orderBy("k").collect()
    assert(rows(0).getDouble(1) == 2.0)
    assert(rows(1).isNullAt(1))
    assert(rows(2).getDouble(1) == 0.0)
  }

  test("windowed cumulative product equals running product; exact on split ratios") {
    val w = Window.partitionBy("k").orderBy("i")
      .rowsBetween(Window.unboundedPreceding, 0)
    val df = Seq(("t", 1, 2.0), ("t", 2, 2.0), ("t", 3, 7.0)).toDF("k", "i", "v")
    val out = df.withColumn("cp", SeriesOps.cumProdExact(col("v"), w))
      .orderBy("i").select("cp").as[Double].collect()
    assert(out.toSeq == Seq(2.0, 4.0, 28.0))
  }

  test("partial/final merge is planned (map-side combine) and result matches driver math") {
    val vals = (1 to 1000).map(i => (i % 7, 1.0 + (i % 13) * 0.01))
    val df = vals.toDF("k", "v").repartition(8)
    val got = df.groupBy("k").agg(ProductAgg.product(col("v")).as("p"))
      .orderBy("k").as[(Int, Double)].collect().toMap
    val expected = vals.groupBy(_._1).map { case (k, vs) =>
      k -> vs.map(_._2).product }
    got.foreach { case (k, p) =>
      assert(math.abs(p / expected(k) - 1.0) < 1e-12, s"key $k")
    }
    // the physical plan must contain a partial aggregation below the exchange
    val plan = df.groupBy("k").agg(ProductAgg.product(col("v")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_product_agg"))
  }

  test("SQL-registered product_agg works in plain SQL incl. windows") {
    GraftFunctions.registerAll(spark)
    Seq((1, 2.0), (1, 3.0), (2, 4.0)).toDF("k", "v").createOrReplaceTempView("pa_t")
    val g = spark.sql("SELECT k, product_agg(v) AS p FROM pa_t GROUP BY k ORDER BY k")
      .as[(Int, Double)].collect()
    assert(g.toSeq == Seq((1, 6.0), (2, 4.0)))
    val wsql = spark.sql(
      """SELECT k, product_agg(v) OVER (PARTITION BY k ORDER BY v
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp
         FROM pa_t ORDER BY k, v""").as[(Int, Double)].collect()
    assert(wsql.toSeq == Seq((1, 2.0), (1, 6.0), (2, 4.0)))
  }

  test("agrees with exp(sum(log)) on positive inputs within 1 ulp-ish tolerance") {
    val w = Window.partitionBy("k").orderBy("i")
      .rowsBetween(Window.unboundedPreceding, 0)
    val df = (1 to 200).map(i => ("t", i, 1.0 + (i % 9) * 0.013)).toDF("k", "i", "v")
    val out = df
      .withColumn("exact", SeriesOps.cumProdExact(col("v"), w))
      .withColumn("approx", SeriesOps.cumProd(col("v"), w))
      .select(max(abs(col("exact") / col("approx") - 1.0)))
      .as[Double].head()
    assert(out < 1e-12)
  }
}
