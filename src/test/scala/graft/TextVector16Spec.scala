package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import graft.queries.TextVector16

/** Construction pins for the power-iteration PCA / ECE batch. */
class TextVector16Spec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("tv16").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents")) {
      Files.copy(Paths.get(s"/root/testdata/sf0.001/$t.parquet"),
        Paths.get(s"$d/$t.parquet"), StandardCopyOption.REPLACE_EXISTING)
    }
    // variance lives along u = (e1+e2)/sqrt(2): points at +/-a, +/-2a on u,
    // plus a tiny orthogonal wiggle on e3 so the spectrum isn't degenerate
    val u = (i: Int) => if (i <= 2) 1.0f else 0.0f
    val mk = (a: Float, eps: Float) => (1 to 64).map(i =>
      (a * u(i) + (if (i == 3) eps else 0.0f)))
    val emb = Seq(
      (0L, mk(2.0f, 0.1f), 0), (1L, mk(-2.0f, -0.1f), 0),
      (2L, mk(1.0f, -0.1f), 0), (3L, mk(-1.0f, 0.1f), 0)
    ).toDF("vec_id", "embedding", "label")
    emb.coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("e16: recovers the planted principal direction, unit-normalized, " +
    "with the plant's eigenvalue") {
    val rows = TextVector16.e16.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.length == 64)
    // mean is 0 on every dim (points are symmetric)
    assert(rows.forall(r => math.abs(r._2) < 1e-9), "centered fixture has mu=0")
    val v = rows.map(_._3)
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-3,
      "v1 must be unit norm")
    // the planted direction: dims 1,2 at 1/sqrt(2) each, everything else ~0
    val s = 1.0 / math.sqrt(2)
    assert(math.abs(math.abs(v(0)) - s) < 0.01 && math.abs(math.abs(v(1)) - s) < 0.01,
      s"v1 must align with (e1+e2)/sqrt2, got ${v.take(3).toSeq}")
    assert(v.drop(3).forall(x => math.abs(x) < 0.01),
      "no mass outside the planted plane (dim 3 wiggle is tiny)")
    // eigenvalue = sum of squared projections onto u: a in {2,-2,1,-1} scaled
    // by sqrt(2) -> lambda = sum(2a^2) = 20 (plus the eps^2 dust)
    assert(math.abs(rows.head._4 - 20.0) < 0.1,
      s"lambda must be ~20, got ${rows.head._4}")
  }

  test("d85: a leaked eval doc is dirty at hit fraction 1.0; a " +
    "unique-vocabulary eval doc is clean at 0.0") {
    import org.apache.spark.sql.functions.col
    val d = Files.createTempDirectory("tv16b").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings")) {
      Files.copy(Paths.get(s"/root/testdata/sf0.001/$t.parquet"),
        Paths.get(s"$d/$t.parquet"), StandardCopyOption.REPLACE_EXISTING)
    }
    val leaked = (1 to 12).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, leaked, "en", "srcA", 50L),                              // eval, leaked
      (1L, (1 to 12).map(i => s"u$i").mkString(" "), "en", "srcA", 50L), // eval, clean
      (30L, "pad " + leaked + " tail tok", "en", "srcB", 70L)       // train superset
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = graft.queries.TextVector16.d85.fn(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    assert(rows(0L) == ((5L, 5L, true)),
      s"all 5 of the leaked doc's 8-grams occur in the train doc: ${rows(0L)}")
    assert(rows(1L) == ((5L, 0L, false)), s"clean doc must have zero hits: ${rows(1L)}")
  }

  test("d83: deciles are equal-mass, confidence is monotone across bins, " +
    "and the emitted ECE is the row-weighted gap mean") {
    val rows = TextVector16.d83.fn(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .sortBy(_._1)
    assert(rows.length == 10)
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1, "ntile fill rule")
    assert(rows.toSeq.sliding(2).forall {
      case Seq(a, b) => a._4 <= b._4 + 1e-9
      case _ => true
    }, "mean confidence must be nondecreasing over score deciles")
    val n = rows.map(_._2).sum.toDouble
    val ece = rows.map(r => r._2 * r._6).sum / n
    assert(math.abs(rows.head._7 - ece) < 1e-4,
      s"emitted ECE ${rows.head._7} must equal the recomputed $ece")
  }
}
