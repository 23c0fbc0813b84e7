package graft

import org.apache.spark.sql.functions._

/** Construction pins for the Count-Min batch (value parity is the DuckDB
  * oracle's job). */
class TextVector11Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("d70: estimates are one-sided (never below exact) and the query " +
    "set is exactly the top-20 by (count desc, token asc)") {
    val rows = graft.queries.TextVector11.d70.fn(spark, dir).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (exact, est, over) = (r.getLong(1), r.getLong(2), r.getBoolean(3))
      assert(est >= exact, s"${r.getString(0)}: CMS must never underestimate")
      assert(over == (est > exact))
    }
  }

  test("CMS at width 2 forces collisions: estimates still bound from " +
    "above, and some token overestimates") {
    val toks = Seq.fill(5)("alpha") ++ Seq.fill(3)("beta") ++
      Seq.fill(2)("gamma") ++ Seq("delta")
    val df = toks.toDF("t")
    val cms = graft.operators.CountMin.sketch(df, "t", depth = 2, width = 2)
    val est = graft.operators.CountMin
      .estimate(df.distinct(), "t", cms, depth = 2, width = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = toks.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    exact.foreach { case (t, n) =>
      assert(est(t) >= n, s"$t underestimated: ${est(t)} < $n") }
    // 4 tokens into 2 buckets per row: pigeonhole guarantees a collision
    assert(exact.exists { case (t, n) => est(t) > n },
      "width 2 with 4 distinct tokens must overestimate someone")
  }

  test("e13: augmented norms are constant M², and MIPS order == " +
    "augmented-cosine order per query") {
    val rows = graft.queries.TextVector11.e13.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    assert(rows.map(_._6).distinct.length == 1,
      "every augmented corpus vector must have the same squared norm M²")
    rows.groupBy(_._1).foreach { case (q, g) =>
      val byIp = g.sortBy(x => (-x._4, x._3)).map(_._3).toSeq
      val byCos = g.sortBy(x => (-x._5, x._3)).map(_._3).toSeq
      assert(byIp == byCos,
        s"query $q: augmented-cosine ranking must reproduce MIPS ranking")
    }
  }

  test("the transform exists because raw cosine DISAGREES with MIPS: " +
    "hand fixture where the long vector wins on inner product") {
    // q=[1,0]; x1=[3,4] (ip 3, cos 0.6), x2=[1,0] (ip 1, cos 1.0):
    // raw cosine prefers x2, MIPS prefers x1. M=5; x1_aug=[3,4,0],
    // x2_aug=[1,0,sqrt(24)]: cos_aug(x1)=0.6 > cos_aug(x2)=0.2 — the
    // transform flips the order back to MIPS.
    import graft.functions.VectorFns
    val corpus = Seq((1L, Seq(3.0f, 4.0f)), (2L, Seq(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val qv = Seq((0L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val rawCos = corpus.crossJoin(qv.select(col("embedding").as("qv")))
      .select(col("vec_id"), VectorFns.cosine(col("qv"), col("embedding")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rawCos(2L) > rawCos(1L), "raw cosine must prefer the unit vector")
    val m2 = 25.0
    val aug = corpus.select(col("vec_id"),
      concat(transform(col("embedding"), x => x.cast("double")),
        array(sqrt(greatest(lit(m2) -
          graft.functions.VectorExprs.dot(col("embedding"), col("embedding")),
          lit(0.0))))).as("av"))
    val qAug = Seq((0L, Seq(1.0, 0.0, 0.0))).toDF("vec_id", "qa")
    val augCos = aug.crossJoin(qAug.select(col("qa")))
      .select(col("vec_id"), VectorFns.cosine(col("qa"), col("av")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(augCos(1L) > augCos(2L),
      "augmented cosine must prefer the MIPS winner")
    assert(math.abs(augCos(1L) - 0.6) < 1e-12 &&
      math.abs(augCos(2L) - 0.2) < 1e-12)
  }

  test("sketches over disjoint halves merge by counter addition into the " +
    "whole-corpus sketch") {
    val docs = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(graft.functions.TextFns.tokens(col("text"))).as("t"))
      .filter(col("t") =!= "").localCheckpoint(false)
    val whole = graft.operators.CountMin.sketch(docs, "t")
    val merged = graft.operators.CountMin
      .sketch(docs.filter(col("doc_id") % 2 === 0), "t")
      .unionByName(graft.operators.CountMin
        .sketch(docs.filter(col("doc_id") % 2 =!= 0), "t"))
      .groupBy("seed", "bucket").agg(sum("cnt").as("cnt"))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty,
      "merge(cms_a, cms_b) must equal cms(a ++ b) counter-for-counter")
  }
}
