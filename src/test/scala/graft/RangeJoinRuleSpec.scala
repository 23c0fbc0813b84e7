package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.{BinnedRangeJoinRule, PointInRange}

/** The opt-in binned range-join planner rule: correctness with and without
  * the rule installed, plan shape when it fires, conjunct preservation. */
class RangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  private lazy val pts = Seq(
    (1, d("2024-01-01")), (2, d("2024-01-15")), (3, d("2024-02-10")),
    (4, d("2024-03-01")), (5, null.asInstanceOf[java.sql.Date]))
    .toDF("pid", "pd")
  private lazy val iv = Seq(
    ("a", d("2024-01-01"), d("2024-01-20"), 1),
    ("b", d("2024-01-10"), d("2024-02-15"), 1),
    ("c", d("2024-05-01"), d("2024-05-02"), 1),   // matches nothing
    ("d", d("2024-02-01"), d("2024-01-01"), 1),   // inverted: no matches
    ("e", null.asInstanceOf[java.sql.Date], d("2024-03-05"), 1), // null lo
    ("f", d("2024-02-20"), d("2024-03-05"), 2))   // wrong tag for conjunct test
    .toDF("iid", "s", "e", "tag")

  private def markerJoin(extraConjunct: Boolean): DataFrame = {
    val cond0 = PointInRange(col("pd"), col("s"), col("e"), 16)
    val cond = if (extraConjunct) cond0 && col("tag") === 1 else cond0
    pts.join(iv, cond).select("pid", "iid").orderBy("pid", "iid")
  }

  private def naive: Seq[(Int, String)] =
    pts.crossJoin(iv).filter(col("pd").between(col("s"), col("e")))
      .select("pid", "iid").orderBy("pid", "iid")
      .as[(Int, String)].collect().toSeq

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BinnedRangeJoinRule
    try f finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq BinnedRangeJoinRule)
    }
  }

  test("marker join matches BETWEEN semantics with and without the rule") {
    val expected = naive
    assert(expected.nonEmpty)
    // without the rule: marker evaluates as a plain BETWEEN (nested loop)
    assert(markerJoin(extraConjunct = false)
      .as[(Int, String)].collect().toSeq == expected)
    // with the rule: rewritten to the binned equi-join, same rows
    withRule {
      assert(markerJoin(extraConjunct = false)
        .as[(Int, String)].collect().toSeq == expected)
    }
  }

  test("the rule replaces the nested loop with an equi-join on the bin") {
    withRule {
      val plan = markerJoin(extraConjunct = false)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan)
      assert(plan.contains("__pt_bin") || plan.contains("__iv_bin"), plan)
    }
    // sanity: without the rule the same plan IS a nested loop
    val bare = markerJoin(extraConjunct = false)
      .queryExecution.executedPlan.toString
    assert(bare.contains("BroadcastNestedLoopJoin") ||
      bare.contains("CartesianProduct"), bare)
  }

  test("other conjuncts survive the rewrite") {
    val expected = pts.crossJoin(iv)
      .filter(col("pd").between(col("s"), col("e")) && col("tag") === 1)
      .select("pid", "iid").orderBy("pid", "iid")
      .as[(Int, String)].collect().toSeq
    withRule {
      assert(markerJoin(extraConjunct = true)
        .as[(Int, String)].collect().toSeq == expected)
    }
  }

  test("markerless joins untouched; swapped sides (point on the right) still rewrite correctly") {
    withRule {
      // plain equi-join: rule must not touch it
      val j = pts.join(iv.withColumnRenamed("tag", "pid2"),
        col("pid") === col("pid2"))
      assert(j.count() >= 0)
      // intervals ⋈ points (point side on the RIGHT): the rule detects the
      // orientation and rewrites with sides preserved
      val flipped = iv.join(pts, PointInRange(col("pd"), col("s"), col("e"), 16))
      val plan = flipped.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan)
      assert(flipped.select("pid", "iid").orderBy("pid", "iid")
        .as[(Int, String)].collect().toSeq == naive)
    }
  }
}
