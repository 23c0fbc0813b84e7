package graft

import org.apache.spark.sql.types._

/** Construction pins for the round-9 batch: suffix-index-driven span
  * removal (d86) on hand-built overlap geometries — value parity at
  * corpus size is the DuckDB oracle's job, these pin the removal
  * semantics where the intervals interact. */
class TextVector17Spec extends SparkSpec {
  import spark.implicits._

  test("spanRemoval: hand-built overlap geometries — cross-doc keeper, " +
    "exact twin erased, chained overlaps merged, periodic self-overlap, " +
    "sub-L duplicates untouched") {
    val docs = Seq(
      (1L, "1234XYZ"),     // keeper of the cross-doc "1234" group
      (2L, "1234QRS"),     // loses [1,4] -> "QRS"
      (3L, "hello world"), // keeper twin
      (4L, "hello world"), // exact twin: every window dropped -> ""
      (5L, "abcdefgh"),    // keeper of the chained-window run
      (6L, "XabcdefghY"),  // pos2..6 windows all dropped, [2,5]..[6,9] merge to [2,9] -> "XY"
      (7L, "aaaaaa"),      // periodic: pos2,3 dropped, [2,5]u[3,6]=[2,6] -> "a" (the d44 caveat)
      (8L, "unique9"),     // no duplicated window: passes through
      (9L, "ab"),          // shorter than L: no windows
      (10L, "cd"), (11L, "cd") // identical but sub-L: NOT removed (full-window rule)
    ).toDF("doc_id", "text")
    val out = graft.operators.SuffixRanks.spanRemoval(docs, 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((7L, 0L, "1234XYZ")))
    assert(out(2L) == ((7L, 4L, "QRS")))
    assert(out(3L) == ((11L, 0L, "hello world")))
    assert(out(4L) == ((11L, 11L, "")), "an exact twin must clean to empty")
    assert(out(5L) == ((8L, 0L, "abcdefgh")))
    assert(out(6L) == ((10L, 8L, "XY")),
      "chained overlapping windows must merge into one removed interval")
    assert(out(7L) == ((6L, 5L, "a")),
      "periodic self-overlap keeps fewer than L chars of the repeat")
    assert(out(8L) == ((7L, 0L, "unique9")))
    assert(out(9L) == ((2L, 0L, "ab")))
    assert(out(10L) == ((2L, 0L, "cd")) && out(11L) == ((2L, 0L, "cd")),
      "sub-L duplicates are out of an L-window index's scope")
    // conservation: removal is interval arithmetic, so kept + removed = n
    out.foreach { case (id, (n, rm, ct)) =>
      assert(ct.length.toLong + rm == n, s"doc $id: kept+removed != n_chars")
    }
  }

  test("round hygiene (RoundCheckpointer): iteration loops leave no " +
    "orphaned persisted rounds — integerPageRank and suffixRanks bound " +
    "their live checkpoints regardless of iteration count") {
    val sc = spark.sparkContext
    def persisted: Set[Int] = sc.getPersistentRDDs.keySet.toSet
    // PageRank, 8 rounds: unfixed (lazy, never freed) would leave 9 score
    // rounds + inputs persisted; the helper keeps only the final round +
    // the n/sym/deg input checkpoints
    val before1 = persisted
    val nodes = (1L to 50L).toDF("id")
    val edges = (1L to 49L).map(i => (i, i + 1)).toDF("src", "dst")
    graft.operators.Centrality.integerPageRank(nodes, edges, 8).count()
    val leak1 = (persisted -- before1).size
    assert(leak1 <= 5, s"integerPageRank left $leak1 persisted RDDs (want <=5: " +
      "inputs + final round only)")
    // suffixRanks (retain = false), a corpus needing several doubling
    // rounds: live rounds are bounded at the final one
    val before2 = persisted
    val docs = Seq((1L, "abcabcabcabcabc"), (2L, "bcabcabcabcabca"),
      (3L, "cabcabcabcabcab")).toDF("doc_id", "text")
    graft.operators.SuffixRanks.suffixRanks(docs).count()
    val leak2 = (persisted -- before2).size
    assert(leak2 <= 2, s"suffixRanks left $leak2 persisted RDDs (want <=2: " +
      "the final round only)")
  }

  test("BMP encode/decode: round trip exact; decode matches the JDK's " +
    "independent ImageIO reader byte-for-byte (padding + bottom-up flip " +
    "both exercised by width 7)") {
    val w = 7; val h = 3
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 251).toByte)
    val bmp = graft.operators.Multimodal.encodeBmp(w, h, rgb)
    // 1. our decode inverts our encode exactly
    val Some((dw, dh, px)) = graft.operators.Multimodal.decodeBmpPixels(bmp)
    assert(dw == w && dh == h && px.toSeq == rgb.toSeq)
    // 2. the JDK's OWN BMP reader agrees pixel-for-pixel — an independent
    // implementation of the format, so encode and decode cannot share a
    // compensating bug (channel order, padding, row direction)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
    assert(img != null && img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val argb = img.getRGB(x, y)
      val p = (y * w + x) * 3
      assert(((argb >> 16) & 0xff) == (rgb(p) & 0xff), s"R at ($x,$y)")
      assert(((argb >> 8) & 0xff) == (rgb(p + 1) & 0xff), s"G at ($x,$y)")
      assert((argb & 0xff) == (rgb(p + 2) & 0xff), s"B at ($x,$y)")
    }
    // 3. top-down BMPs (negative biHeight) decode with the flip skipped:
    // rewrite the height field and the row order, expect identical pixels
    val stride = (w * 3 + 3) / 4 * 4
    val td = bmp.clone()
    val bb = java.nio.ByteBuffer.wrap(td).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -h)
    for (r <- 0 until h)
      System.arraycopy(bmp, 54 + (h - 1 - r) * stride, td, 54 + r * stride, stride)
    val Some((_, th, tpx)) = graft.operators.Multimodal.decodeBmpPixels(td)
    assert(th == h && tpx.toSeq == rgb.toSeq)
    // 4. strictness: non-24bpp and truncated inputs reject to the stub path
    val bad = bmp.clone(); bad(28) = 8 // bpp field
    assert(graft.operators.Multimodal.decodeBmpPixels(bad).isEmpty)
    assert(graft.operators.Multimodal.decodeBmpPixels(bmp.take(53)).isEmpty)
  }

  test("spanRemoval: degenerate corpus and the power-of-two contract") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
    assert(graft.operators.SuffixRanks.spanRemoval(empty, 8).count() == 0L)
    intercept[IllegalArgumentException] {
      graft.operators.SuffixRanks.spanRemoval(empty, 6)
    }
  }
}
