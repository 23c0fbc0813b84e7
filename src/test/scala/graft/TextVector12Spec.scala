package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import graft.queries.TextVector12

/** Construction pins for the retrieval/sampling/KN/binary-ANN batch
  * (value parity at corpus scale is the DuckDB oracle's job; these tests
  * pin hand-derivable math the oracle replays rather than re-derives). */
class TextVector12Spec extends SparkSpec {
  import spark.implicits._

  /** Tiny corpus + embeddings in a Tables-compatible dir. */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("tv12").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events")) {
      Files.copy(Paths.get(s"/root/testdata/sf0.001/$t.parquet"),
        Paths.get(s"$d/$t.parquet"), StandardCopyOption.REPLACE_EXISTING)
    }
    val docs = Seq(
      // d71: term x concentrated in doc 0; d73: (a,b) phrase fodder
      (0L, "a b a b a b a b a b", "en", "src0", 19L),
      (1L, (1 to 20).map(i => s"n$i").mkString(" "), "en", "src1", 80L),
      (2L, "e f e f e f e f e f " + Seq.fill(40)("e").mkString(" "), "en", "src2", 100L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val emb = Seq(
      // v0: +1 everywhere; v1: differs in sign at exactly dims 1, 32, 33, 64
      (0L, (1 to 64).map(_ => 1.0f), 0),
      (1L, (1 to 64).map(i =>
        if (i == 1 || i == 32 || i == 33 || i == 64) -1.0f else 1.0f), 1),
      // v2: orthogonal-ish negative half, for a third neighbor
      (2L, (1 to 64).map(i => if (i <= 32) 1.0f else -1.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    emb.coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("d71: hand-computed BM25 on a 3-doc fixture — top doc and exact score") {
    // corpus: doc0 "a b"×5 (dl 10), doc1 20 distinct n_i (dl 20),
    // doc2 "e f"×5 + "e"×40 (dl 50). N=3, avgdl=80/3.
    // term 'a': df=1, tf(doc0)=5; idf=ln((3-1+0.5)/1.5+1)=ln(8/3);
    // denom=5+1.2*(0.25+0.75*(10/(80/3.0)))=5+1.2*(0.25+0.28125)
    val rows = TextVector12.d71.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(5)))
    val a1 = rows.filter(x => x._1 == "a" && x._2 == 1).head
    assert(a1._3 == 0L, "term 'a' must retrieve doc 0 first")
    val idf = math.log((3 - 1 + 0.5) / (1 + 0.5) + 1.0)
    val expected = idf * (5 * 2.2) / (5 + 1.2 * (0.25 + 0.75 * (10 / (80.0 / 3))))
    assert(math.abs(a1._4 - BigDecimal(expected).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
      s"BM25 score mismatch: got ${a1._4}, want ~$expected")
  }

  test("d72: the judged sample IS the hand-replayed A-ES top-30 of sf0.001") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long, nc: Long): (BigDecimal, Long) = {
      val w = math.max(nc, 1L)
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 13)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4503599627370496.0
      (BigDecimal((0.0 - math.log(u)) / w)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP), id)
    }
    val expect = docs.map { case (id, nc) => (key(id, nc), id) }
      .sortBy(_._1).take(30).map(_._2).toSeq
    val got = TextVector12.d72.fn(spark, "/root/testdata/sf0.001")
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(got == expect, "A-ES selection must be a pure function of (id, w)")
  }

  test("d72: min-k selection is a semilattice merge — top30(A ∪ B) == " +
    "top30(top30(A) ∪ top30(B)) on any split (the distributed/streaming shape)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long, nc: Long): (Double, Long) = {
      val w = math.max(nc, 1L)
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 13)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4503599627370496.0
      ((0.0 - math.log(u)) / w, id)
    }
    def top30(xs: Seq[(Double, Long)]) = xs.sorted.take(30)
    val keyed = docs.map { case (id, nc) => key(id, nc) }.toSeq
    val (a, b) = keyed.partition(_._2 % 2 == 0)
    assert(top30(keyed) == top30(top30(a) ++ top30(b)),
      "partial top-30s must merge losslessly — the property that makes " +
        "A-ES a one-pass distributed/streaming sampler")
  }

  test("d73: hand counts on the fixture — (a,b) is a phrase, (e,f) is not") {
    // fixture tokens: doc0 a,b×5 (10) + doc1 20 noise + doc2 e,f×5,e×40 (50)
    // + injection (doc 0 only: id%25==0): new_york city ×3 (6). Ntok=86.
    // (a,b): c12=5, c(a)=5, c(b)=5 → (5-3)·86=172 > 2·25=50 → phrase.
    // (e,f): c12=5, c(e)=45, c(f)=5 → 172 > 2·225=450 false → not.
    val rows = TextVector12.d73.fn(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap
    assert(rows(("a", "b")) == ((5L, 5L, 5L, true)))
    assert(rows(("e", "f")) == ((5L, 45L, 5L, false)))
    // the literal-text twins need >=2 injected docs to clear the c12>=5
    // surface — pinned on the real corpus, where both polarities must show
    val polar = TextVector12.d73.fn(spark, "/root/testdata/sf0.001")
      .groupBy("is_phrase").count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(polar.getOrElse(true, 0L) > 0 && polar.getOrElse(false, 0L) > 0,
      s"both phrase polarities must be non-empty on the judged corpus: $polar")
  }

  test("d74: interpolated KN is a proper distribution — P(·|w1) sums to 1 " +
    "over the full vocabulary, and the judged per-doc mean matches hand math") {
    // Build the KN model in plain Scala from the fixture corpus (with
    // exactly the query's count definitions) and check both invariants.
    val texts = Seq(
      "a b a b a b a b a b",
      (1 to 20).map(i => s"n$i").mkString(" "),
      "e f e f e f e f e f " + Seq.fill(40)("e").mkString(" "))
    val bigrams = texts.flatMap(t => t.split("\\s+").sliding(2).map(p => (p(0), p(1))))
    val vocab = texts.flatMap(_.split("\\s+")).distinct
    val c12 = bigrams.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = bigrams.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val types = c12.keys.toSeq
    val n1f = types.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n1r = types.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val b = types.size.toDouble
    def p(w1: String, w2: String): Double =
      (math.max(c12.getOrElse((w1, w2), 0L) - 0.75, 0.0) +
        0.75 * n1f(w1) * (n1r.getOrElse(w2, 0L) / b)) / c1(w1)
    c1.keys.foreach { w1 =>
      val total = vocab.map(w2 => p(w1, w2)).sum
      assert(math.abs(total - 1.0) < 1e-9,
        s"KN must be a proper distribution for context '$w1', got $total")
    }
    val expect = texts.zipWithIndex.map { case (t, i) =>
      val bs = t.split("\\s+").sliding(2).map(x => p(x(0), x(1))).toSeq
      (i.toLong, bs.size.toLong,
        BigDecimal(bs.map(math.log).sum / bs.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = TextVector12.d74.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sortBy(_._1)
    assert(got == expect, s"judged KN surface diverged: $got vs $expect")
  }

  test("e14: sign-pack puts dim lo at bit 31, and hamming equals the " +
    "hand disagreement count through the packed XOR") {
    val df = Seq((Seq.tabulate(64)(i =>
      if (i == 0 || i == 31 || i == 32 || i == 63) 1.0f else -1.0f)))
      .toDF("v")
    val r = df.select(
      TextVector12.signCode(col("v"), 1).as("hi"),
      TextVector12.signCode(col("v"), 33).as("lo")).head()
    // dims 1 and 32 positive → bits 31 and 0 of hi; dims 33 and 64 → lo
    assert(r.getLong(0) == ((1L << 31) | 1L), s"hi=${r.getLong(0)}")
    assert(r.getLong(1) == ((1L << 31) | 1L), s"lo=${r.getLong(1)}")
    // v0 vs v1 differ at exactly dims 1, 32, 33, 64 → hamming 4
    val rows = TextVector12.e14.fn(spark, dir).collect()
      .map(r2 => ((r2.getLong(0), r2.getLong(2)), r2.getLong(3))).toMap
    assert(rows((0L, 1L)) == 4L, "v0↔v1 must be hamming 4")
    assert(rows((0L, 2L)) == 32L, "v0↔v2 flip the whole low word")
    assert(rows((1L, 0L)) == rows((0L, 1L)), "hamming is symmetric")
  }
}
