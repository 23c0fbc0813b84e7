package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import graft.queries.TextVector15

/** Construction pins for the LSH-PR-eval / DoReMi-step batch. */
class TextVector15Spec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("tv15").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events")) {
      Files.copy(Paths.get(s"/root/testdata/sf0.001/$t.parquet"),
        Paths.get(s"$d/$t.parquet"), StandardCopyOption.REPLACE_EXISTING)
    }
    // doc 0 and 20 are byte-identical (J=1: every band equal -> must be
    // TP); doc 40 shares no vocabulary with them (never in the surface).
    // 16 tokens each so the %40 twins also spawn (J ~ .7/.4 rows).
    val sixteen = (1 to 16).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (0L, sixteen, "en", "srcA", 100L),
      (20L, sixteen, "en", "srcA", 100L),
      (40L, (1 to 16).map(i => s"other$i").mkString(" "), "en", "srcB", 100L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("d80: an identical pair is TP with Jaccard 1; disjoint docs never " +
    "enter the surface; twin rows carry the designed polarity") {
    val rows = TextVector15.d80.fn(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getBoolean(5), r.getBoolean(6), r.getDouble(7)))).toMap
    val (nInt, isDup, pred, jacc) = rows((0L, 20L))
    assert(isDup && pred && jacc == 1.0 && nInt == 14L,
      s"identical docs must be a TP at J=1 with all 14 shingles shared: ${rows((0L, 20L))}")
    assert(!rows.keys.exists { case (a, b) =>
      (a == 40L || b == 40L) && (a <= 20L || b <= 20L) },
      "vocabulary-disjoint docs share no shingle and no band — never surfaced")
    // strong twin of doc 0 (id 6000000000): 11 tokens -> 9 shingles, all
    // shared with doc 0's 14 -> J = 9/14 >= 0.5 -> dup
    assert(rows((0L, 6000000000L))._2, "strong twin must be a truth dup")
    // weak twin of doc 20 (id 7000000020): 6 tokens -> 4 shared shingles,
    // J = 4/14 < 0.5 -> in surface via n_int>=2, not a dup
    val weak = rows((20L, 7000000020L))
    assert(weak._1 == 4L && !weak._2, s"weak twin must be surfaced non-dup: $weak")
  }

  test("d82: the Rand row is exactly the union-find replay of d80's pair surface") {
    // d80's judged relation carries every truth pair and every predicted
    // pair on the same panel; a Scala union-find over those pairs plus
    // singleton completion must reproduce d82's exact integer counts.
    val pairs = TextVector15.d80.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(5), r.getBoolean(6)))
    val nodes = (pairs.flatMap(p => Seq(p._1, p._2)) ++
      Seq(0L, 20L, 40L, 6000000000L, 6000000040L, 7000000020L)).distinct.sorted
    def cluster(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      nodes.map(n => n -> find(n)).toMap
    }
    val ct = cluster(pairs.filter(_._3).map(p => (p._1, p._2)).toSeq)
    val cp = cluster(pairs.filter(_._4).map(p => (p._1, p._2)).toSeq)
    def c2(n: Long) = n * (n - 1) / 2
    val tp = nodes.groupBy(n => (ct(n), cp(n))).values.map(g => c2(g.size.toLong)).sum
    val inT = nodes.groupBy(ct).values.map(g => c2(g.size.toLong)).sum
    val inP = nodes.groupBy(cp).values.map(g => c2(g.size.toLong)).sum
    val r = TextVector15.d82.fn(spark, dir).head()
    assert(r.getLong(0) == nodes.length.toLong)
    assert(r.getLong(2) == tp, s"pair_tp ${r.getLong(2)} vs replay $tp")
    assert(r.getLong(3) == inP - tp && r.getLong(4) == inT - tp,
      s"fp/fn mismatch: ${(r.getLong(3), r.getLong(4))} vs ${(inP - tp, inT - tp)}")
  }

  test("d84: an identical pair agrees on all 16 one-bit rows (Jhat = 1), " +
    "and the estimator tracks the truth ordering on the twins") {
    val rows = TextVector15.d84.fn(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(2), r.getLong(3), r.getDouble(4)))).toMap
    val ident = rows((0L, 20L))
    assert(ident == ((1.0, 16L, 1.0)),
      s"J=1 pair must agree on every one-bit row: $ident")
    // strong twin (J~0.64) must agree on at least as many bits as the
    // weak twin (J~0.29) — the monotone-in-expectation sanity the
    // 16-seed family realizes deterministically on this fixture
    assert(rows((0L, 6000000000L))._2 >= rows((20L, 7000000020L))._2,
      s"bit agreement must track resemblance: $rows")
  }

  test("d81: weights stay a distribution, excess is floored at zero, and " +
    "the update direction upweights exactly the high-excess sources") {
    val rows = TextVector15.d81.fn(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getDouble(2)))
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4, "sum w_old = 1")
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4, "sum w_new = 1")
    assert(rows.map(_._2).min == 0.0, "min excess is exactly 0 (rounded)")
    assert(rows.forall(_._2 >= 0.0), "excess is never negative")
    // exp is monotone: clearly-separated excess must imply a ratio gap in
    // the same direction (1e-3 slack covers the 6-dp emit rounding)
    for (a <- rows; b <- rows if a._2 < b._2 - 1e-3)
      assert(a._4 / a._3 < b._4 / b._3,
        s"EG must upweight ${b._1} (excess ${b._2}) over ${a._1} (${a._2})")
  }
}
