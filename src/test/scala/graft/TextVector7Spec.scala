package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Specs for the tenth coverage batch: CCNet normalization-keyed dedup and
  * deterministic shuffle-sharding. */
class TextVector7Spec extends SparkSpec {
  import spark.implicits._

  test("ccnetNormalize: lowercase, accent fold, digits->0, punctuation " +
    "strip, whitespace collapse — the exact string DuckDB's replay produces") {
    val out = Seq("Héllo  Wörld 42! ÀÇÇÉNT—touché úñý").toDF("t")
      .select(TextFns.ccnetNormalize(col("t"))).as[String].head()
    // pinned against a measured DuckDB run of the oracle's normalization
    // chain on the same input (dev check, round 7): the two engines must
    // produce THIS byte sequence or d51's hash keys fork
    assert(out == "hello world 00 accenttouche uny")
  }

  test("ccnetNormalize strips vertical tab as punctuation — the explicit " +
    "whitespace class, where Java \\s (VT included) would fork from RE2") {
    val out = Seq("a\u000Bb c").toDF("t")
      .select(TextFns.ccnetNormalize(col("t"))).as[String].head()
    assert(out == "ab c")
  }

  test("ccnetNormalize collapses trivial variants to one dedup key") {
    val docs = Seq(
      (1L, "The Quick Brown Fox!"),
      (2L, "the quick  brown fox"),
      (3L, "thé quick brown fóx..."),
      (4L, "a different document")).toDF("id", "t")
    val keys = docs.select(col("id"), md5(TextFns.ccnetNormalize(col("t"))).as("k"))
      .as[(Long, String)].collect().toMap
    assert(keys(1L) == keys(2L) && keys(2L) == keys(3L))
    assert(keys(4L) != keys(1L))
  }

  test("d55 containment: injected excerpt twins are flagged contained with " +
    "full intersection; unrelated pairs are not") {
    val out = graft.queries.TextVector7.d55.fn(spark, "/root/testdata/sf0.001")
      .cache()
    val excerptPairs = out.filter(col("id_b") >= 4000000000L &&
      col("id_b") - 4000000000L === col("id_a"))
    val rows = excerptPairs.select("n_a", "n_b", "n_int", "contained")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty, "excerpt-original pairs must surface")
    rows.foreach { case (na, nb, nInt, contained) =>
      assert(contained, "an excerpt is contained in its original")
      assert(nInt == math.min(na, nb), "excerpt shingles are a full subset")
    }
    // the contained set is a small fraction: random cross-doc pairs are not
    val n = out.count(); val c = out.filter(col("contained")).count()
    assert(c < n / 2)
    out.unpersist()
  }

  test("d52 shuffle shards: positions are a permutation, shards balanced " +
    "within 1, and the order is the md5 order") {
    val out = graft.queries.TextVector7.d52.fn(spark, "/root/testdata/sf0.001")
      .select("doc_id", "hkey", "position", "shard").cache()
    val n = out.count()
    val pos = out.select("position").as[Long].collect().sorted
    assert(pos.sameElements(0L until n), "positions must be a dense permutation")
    val shardSizes = out.groupBy("shard").count().select("count").as[Long].collect()
    assert(shardSizes.max - shardSizes.min <= 1, "strided shards balance within 1")
    // position order == (hkey, doc_id) order
    val byPos = out.orderBy("position").select("hkey", "doc_id")
      .as[(Long, Long)].collect()
    assert(byPos.sameElements(byPos.sortBy(identity)), "position must follow md5 order")
    out.unpersist()
  }
}
