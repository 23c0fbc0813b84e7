package graft

import org.apache.spark.sql.functions._

/** Construction pins for the round-8 coverage batch (the DuckDB oracle
  * owns value parity; these pin the structural claims each scaladoc
  * makes, at sf0.001). */
class TextVector8Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("e10: trained PQ codebook is exactly the anchor slice set per subspace") {
    val out = graft.queries.TextVector8.e10.fn(spark, dir)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    // 8 subspaces x 4 codewords x 8 components (no subspace collapsed on
    // this corpus — four distinct anchors in every slice)
    assert(out.length == 8 * 4 * 8, s"expected 256 rows, got ${out.length}")
    // every codeword must BE one of the four anchor slices (rounded):
    // KMeans on cost-0 blobs may not invent centroids
    val anchors = graft.core.Tables.embeddings(spark, dir)
      .filter(col("vec_id") < 4).orderBy("vec_id")
      .select("embedding").as[Seq[Float]].collect()
      .map(_.map(_.toDouble).toArray)
    for (s <- 0 until 8) {
      val slices = anchors.map(a =>
        a.slice(s * 8, s * 8 + 8).map(x => math.rint(x * 1e6) / 1e6).toSeq).toSet
      val codewords = out.filter(_._1 == s).groupBy(_._2)
        .values.map(_.sortBy(_._3).map(_._4).toSeq).toSet
      assert(codewords == slices, s"subspace $s codebook is not the anchor slice set")
    }
  }

  test("d56: each injected line fails exactly its designed rule") {
    val rows = graft.queries.TextVector8.d56.fn(spark, dir)
      .filter(col("doc_id") % 10 === 0 && col("line_no") > 1)
      .collect().map(r => (r.getAs[Int]("line_no"), r.getAs[Long]("n_words"),
        r.getAs[Boolean]("ends_terminal"), r.getAs[Boolean]("has_js"),
        r.getAs[Boolean]("has_policy"), r.getAs[Boolean]("line_kept")))
    assert(rows.nonEmpty)
    rows.foreach {
      case (2, n, term, js, pol, kept) => // "short line"
        assert(n == 2 && !term && !js && !pol && !kept)
      case (3, n, term, js, pol, kept) => // the passing sentence
        assert(n >= 5 && term && !js && !pol && kept)
      case (4, _, term, js, _, kept) => // javascript line
        assert(term && js && !kept)
      case (5, n, term, js, pol, kept) => // cookie-policy line
        assert(n >= 5 && term && !js && pol && !kept)
      case (6, n, term, _, _, kept) => // no terminal punctuation
        assert(n >= 5 && !term && !kept)
      case (ln, _, _, _, _, _) => fail(s"unexpected injected line_no $ln")
    }
  }

  test("d57: injected twins die at dedup; suffix twins never die at c4") {
    val out = graft.queries.TextVector8.d57.fn(spark, dir)
      .select("doc_id", "stage").as[(Long, String)].collect().toMap
    val storeCopies = out.filter(_._1 >= 5000000000L).filter(_._1 < 6000000000L)
    val batchCopies = out.filter(_._1 >= 6000000000L)
    val suffixTwins = out.filter(k => k._1 >= 2000000000L && k._1 < 3000000000L)
    assert(storeCopies.nonEmpty && storeCopies.values.forall(_ == "dedup"),
      "copies of store docs must die against the incumbent hash set")
    assert(batchCopies.nonEmpty && batchCopies.values.forall(_ == "dedup"),
      "within-batch copies must die against the min-id keeper")
    assert(suffixTwins.nonEmpty && suffixTwins.values.forall(_ != "c4"),
      "punctuated suffix twins must pass the C4 gate")
    assert(out.values.exists(_ == "kept"), "some batch doc must survive to a shard")
  }

  test("e11: approx assignment with every centroid a meta equals exact assignment") {
    // metaEvery = 1 makes the meta level the full centroid set, so the
    // probe stage IS the exact argmax — approx must equal exact row for
    // row (anchor AND sim), pinning that the two-level search introduces
    // no error beyond unprobed cells
    val emb = graft.core.Tables.embeddings(spark, dir)
    val anchors = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid_vec"))
    val approx = graft.operators.Similarity
      .assignCellsApprox(emb, anchors, "vec_id", "embedding",
        metaEvery = 1, nProbe = 1)
      .select(col("id"), col("centroid_id"), round(col("centroid_sim"), 9).as("s"))
    val exact = graft.operators.Similarity
      .assignCellsSim(emb, anchors, "vec_id", "embedding")
      .select(col("id"), col("centroid_id"), round(col("centroid_sim"), 9).as("s"))
    assert(approx.except(exact).isEmpty && exact.except(approx).isEmpty,
      "metaEvery=1 must reduce the two-level search to the exact argmax")
  }

  test("d59: semDeDupApprox with every centroid a meta equals exact semDeDup") {
    // the drop-in contract end to end: with metaEvery = 1 the approximate
    // assignment reduces to the exact argmax (pinned above), so the FULL
    // pipeline — pairing, threshold, keeper policy — must produce
    // identical verdicts through the shared semDeDupFromCells body
    val emb = graft.core.Tables.embeddings(spark, dir)
    val anchors = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid_vec"))
    val exact = graft.operators.Dedup
      .semDeDup(emb, "vec_id", "embedding", anchors, cosineThreshold = 0.25)
      .select($"id", $"centroid_id", round($"centroid_sim", 9).as("s"), $"dropped")
    val approx = graft.operators.Dedup
      .semDeDupApprox(emb, "vec_id", "embedding", anchors,
        cosineThreshold = 0.25, metaEvery = 1, nProbe = 1)
      .select($"id", $"centroid_id", round($"centroid_sim", 9).as("s"), $"dropped")
    assert(approx.except(exact).isEmpty && exact.except(approx).isEmpty,
      "metaEvery=1 must make the approximate pipeline verdict-identical")
  }

  test("d58: shared-tail span forms one corpus-wide cluster with a single keeper") {
    val out = graft.queries.TextVector8.d58.fn(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("span_idx"),
        r.getAs[Long]("span_h"), r.getAs[Long]("dup_count"),
        r.getAs[Boolean]("is_first")))
    val perDoc = out.groupBy(_._1)
    assert(perDoc.nonEmpty)
    // every injected doc contributes exactly 3 spans (5 sentences)
    perDoc.foreach { case (id, spans) =>
      assert(spans.length == 3, s"doc $id: ${spans.length} spans") }
    // span 3 = the three shared tail sentences: one cluster over all docs
    val shared = out.filter(_._2 == 3)
    val h = shared.map(_._3).distinct
    assert(h.length == 1, "shared-tail spans must collide on one hash")
    assert(shared.forall(_._4 == shared.length.toLong))
    assert(shared.count(_._5) == 1, "exactly one global keeper")
    assert(shared.filter(_._5).map(_._1).head == shared.map(_._1).min,
      "keeper must be the lowest doc_id")
    // spans 1-2 contain the doc text / doc-id anchor: singletons
    val unique = out.filter(s => s._2 < 3)
    assert(unique.forall(s => s._4 == 1L && s._5))
  }
}
