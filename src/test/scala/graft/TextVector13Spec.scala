package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import graft.queries.TextVector13

/** Construction pins for the MRL-recall / k-anonymity / fertility batch. */
class TextVector13Spec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("tv13").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events")) {
      Files.copy(Paths.get(s"/root/testdata/sf0.001/$t.parquet"),
        Paths.get(s"$d/$t.parquet"), StandardCopyOption.REPLACE_EXISTING)
    }
    // embeddings where the 16-dim prefix is PERFECTLY informative for one
    // query and USELESS for another:
    //   v0 (query): e1 = [1,0,...]-ish
    //   v1: identical to v0            → full cos 1, prefix cos 1
    //   v2: same prefix, opposite tail → prefix can't tell v1 from v2
    //   v10 (query): all signal in dims 17..64, prefix all zeros
    val mk = (f: Int => Float) => (1 to 64).map(f)
    val emb = Seq(
      (0L, mk(i => if (i <= 16) 1.0f else 0.5f), 0),
      (1L, mk(i => if (i <= 16) 1.0f else 0.5f), 0),
      (2L, mk(i => if (i <= 16) 1.0f else -0.5f), 0),
      (10L, mk(i => if (i > 16) 1.0f else 0.0f), 1),
      (40L, mk(i => if (i > 16) 1.0f else 0.0f), 1),
      (41L, mk(i => if (i > 16) -1.0f else 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    emb.coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val docs = Seq(
      (0L, "one two three", "en", "srcA", 13L),
      (1L, "four five", "en", "srcA", 9L),
      (2L, "six", "de", "srcB", 703L),
      (3L, "seven eight nine ten", "de", "srcB", 705L),
      (4L, "pad pad pad", "de", "srcB", 799L),
      (5L, "pad pad pad", "de", "srcB", 702L),
      (6L, "pad pad pad", "de", "srcB", 701L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("e15: zero-norm-prefix queries keep a defined (empty-overlap) row, " +
    "and an identical-vector neighbor survives truncation") {
    val rows = TextVector13.e15.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // query 0: v1 is identical, so it tops BOTH searches — overlap ≥ 1
    assert(rows(0L) >= 1L, s"identical neighbor must survive truncation: $rows")
    // query 10: its prefix is all zeros → prefix cosine is NULL for every
    // pair; the right-outer join must still emit the query with overlap
    // counted over a null-scored (id-ordered) prefix list, not drop it
    assert(rows.contains(10L), "null-prefix query must not vanish from the surface")
  }

  test("d75: hand-counted equivalence classes and the k<5 boundary") {
    val rows = TextVector13.d75.fn(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getLong(2)),
        (r.getLong(3), r.getBoolean(4)))).toMap
    assert(rows(("en", "srcA", 0L)) == ((2L, true)))
    // de/srcB docs at n_chars 701,702,703,705,799 → bucket 7 holds 5 → k=5
    assert(rows(("de", "srcB", 7L)) == ((5L, false)),
      "exactly k=5 must NOT be suppressed (boundary is k<5)")
  }

  test("d76: fertility is a weighted mean over words — cross-checked " +
    "against d65's per-doc counts on sf0.001") {
    val perDoc = graft.queries.TextVector10.d65.fn(spark, "/root/testdata/sf0.001")
      .join(spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "lang"), Seq("doc_id"))
      .groupBy("lang")
      .agg(sum("n_words").as("w"), sum("n_bpe_tokens").as("t"))
      .collect().map(r => Option(r.getString(0)) ->
        (r.getLong(1), r.getLong(2))).toMap
    val got = TextVector13.d76.fn(spark, "/root/testdata/sf0.001").collect()
      .map(r => Option(r.getString(0)) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == perDoc,
      "d76's per-lang word/subword totals must equal d65's rollup")
  }
}
