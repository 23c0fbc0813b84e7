package graft

import org.apache.spark.sql.functions._

/** Construction pins for the round-8 continuation batch (the DuckDB
  * oracle owns value parity; these pin the structural claims each
  * scaladoc makes, at sf0.001). */
class TextVector9Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("leakageSafeSplit: the split is a pure function of the group key " +
    "(no group ever straddles splits) and carves 100 buckets exactly") {
    val df = (0 until 400).map(i => (i.toLong, s"g${i % 37}")).toDF("id", "g")
    val out = graft.operators.Splits.leakageSafeSplit(df, col("g"), 70, 20)
    // group-atomicity: one distinct (bucket, split) pair per group
    val perGroup = out.groupBy("g")
      .agg(countDistinct("split_bucket").as("nb"), countDistinct("split").as("ns"))
      .agg(max("nb"), max("ns")).head()
    assert(perGroup.getLong(0) == 1L && perGroup.getLong(1) == 1L,
      "every member of a group must receive the identical split")
    // carving: bucket < 70 -> train, < 90 -> val, else test — no other combo
    val bad = out.filter(
      (col("split_bucket") < 70 && col("split") =!= "train") ||
        (col("split_bucket") >= 70 && col("split_bucket") < 90 && col("split") =!= "val") ||
        (col("split_bucket") >= 90 && col("split") =!= "test")).count()
    assert(bad == 0L, "bucket carving must follow the documented ranges")
    assert(out.filter(col("split_bucket") < 0 || col("split_bucket") > 99).count() == 0L)
    // degenerate carves: train+val = 100 leaves no test range
    val noTest = graft.operators.Splits.leakageSafeSplit(df, col("g"), 90, 10)
    assert(noTest.filter(col("split") === "test").count() == 0L)
    intercept[IllegalArgumentException] {
      graft.operators.Splits.leakageSafeSplit(df, col("g"), 95, 10)
    }
  }

  test("d60: injected twins share their original's cluster AND split; " +
    "realized fractions sit near 80/10/10") {
    val out = graft.queries.TextVector9.d60.fn(spark, dir)
      .select("doc_id", "grp_h", "n_in_group", "split").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val byId = out.map(t => t._1 -> t).toMap
    val twins = out.filter(_._1 >= 3000000000L)
    assert(twins.nonEmpty, "twin injection must produce rows")
    twins.foreach { case (id, grp, n, split) =>
      val orig = byId(id - 3000000000L)
      assert(orig._2 == grp && orig._4 == split,
        s"twin $id must share its original's cluster and split")
      assert(n >= 2, "twin clusters must be multi-member")
    }
    val frac = out.groupBy(_._4).view.mapValues(_.length.toDouble / out.length)
    // hash-carved groups at 500+ clusters: generous envelope, not exactness
    assert(frac("train") > 0.7 && frac("train") < 0.9, s"train frac ${frac("train")}")
  }

  test("d61: the fixture exercises every epoch polarity and the allocation " +
    "arithmetic holds row-wise") {
    val rows = graft.queries.TextVector9.d61.fn(spark, dir)
      .select("unique_tokens", "target_tokens", "epochs", "allocated_tokens",
        "shortfall_tokens")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val epochs = rows.map(_._3).toSet
    assert(epochs.contains(1L) && epochs.contains(4L) && epochs.exists(e => e > 1L && e < 4L),
      s"fixture must span 1-epoch, intermediate, and 4-capped sources; got $epochs")
    assert(rows.exists(_._5 > 0L), "some 4-capped source must carry a real shortfall")
    rows.foreach { case (u, t, e, a, sf) =>
      assert(e == math.min(4L, (t + u - 1) / u), "epochs rule")
      assert(a == math.min(t, e * u), "allocation rule")
      assert(sf == t - a && sf >= 0L, "shortfall rule")
      assert(e < 4L || a == math.min(t, 4L * u), "cap binds only at 4")
      if (e < 4L) assert(sf == 0L, "an uncapped source meets its target")
    }
  }
}
