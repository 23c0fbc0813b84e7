package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Construction pins for the round-10 batch: real nearest-neighbor resize,
  * perceptual average-hash (with its brightness-invariance contract), WAV
  * frame-window decimation, and hard-negative mining on a planted label
  * geometry — value parity at corpus size is the DuckDB oracle's job,
  * these pin the semantics on hand-computable cases. */
class TextVector18Spec extends SparkSpec {
  import spark.implicits._

  test("resizeNearest: index-map goldens — downsample picks ⌊i·h/th⌋ rows, " +
    "upsample repeats them, identity is exact, both axes at once") {
    // 4×2 source, distinct bytes per pixel so any index slip is visible
    val w = 4; val h = 2
    val src = Array.tabulate(w * h * 3)(i => (i + 1).toByte)
    def px(rgb: Array[Byte], w: Int, r: Int, c: Int): Seq[Byte] =
      rgb.slice((r * w + c) * 3, (r * w + c) * 3 + 3).toSeq
    // identity
    assert(graft.operators.Multimodal.resizeNearest(w, h, src, w, h).toSeq
      == src.toSeq)
    // downsample 4×2 → 2×1: rows ⌊0·2/1⌋=0; cols ⌊0·4/2⌋=0, ⌊1·4/2⌋=2
    val down = graft.operators.Multimodal.resizeNearest(w, h, src, 2, 1)
    assert(px(down, 2, 0, 0) == px(src, w, 0, 0))
    assert(px(down, 2, 0, 1) == px(src, w, 0, 2))
    // upsample 4×2 → 4×4: row map ⌊i·2/4⌋ = 0,0,1,1 — each source row twice
    val up = graft.operators.Multimodal.resizeNearest(w, h, src, 4, 4)
    for (c <- 0 until 4) {
      assert(px(up, 4, 0, c) == px(src, w, 0, c) &&
        px(up, 4, 1, c) == px(src, w, 0, c), s"upsampled rows 0/1, col $c")
      assert(px(up, 4, 2, c) == px(src, w, 1, c) &&
        px(up, 4, 3, c) == px(src, w, 1, c), s"upsampled rows 2/3, col $c")
    }
    // mixed: 4×2 → 2×4 (cols halve, rows double)
    val mix = graft.operators.Multimodal.resizeNearest(w, h, src, 2, 4)
    assert(px(mix, 2, 0, 1) == px(src, w, 0, 2))
    assert(px(mix, 2, 3, 0) == px(src, w, 1, 0))
    intercept[IllegalArgumentException] {
      graft.operators.Multimodal.resizeNearest(2, 2, new Array[Byte](11), 1, 1)
    }
  }

  test("ahashBands: hand-computed hash on a half-dark image; uniform " +
    "brightness shift leaves every band unchanged (the aHash invariance " +
    "m5's twins ride); non-BMP content yields the null row") {
    // 8×8 source (identity resize): left 4 columns dark (10,10,10), right
    // 4 bright (200,200,200) → gray 30 vs 600, mean 315 → bit = col ≥ 4
    // → every band 0b11110000 = 240
    def flat(v: Int): Array[Byte] = {
      val rgb = new Array[Byte](8 * 8 * 3)
      for (r <- 0 until 8; c <- 0 until 8; k <- 0 until 3)
        rgb((r * 8 + c) * 3 + k) = (if (c < 4) v else v + 190).toByte
      rgb
    }
    val mk = (id: Long, v: Int) => Row(id, graft.operators.Multimodal
      .encodeBmp(8, 8, flat(v)))
    val schema = StructType(Seq(StructField("asset_id", LongType),
      StructField("content", BinaryType)))
    val assets = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        mk(1L, 10), mk(2L, 17), // 2 = 1 shifted +7 per byte
        Row(3L, Array[Byte](1, 2, 3)))), schema) // not a BMP
    val out = graft.operators.Multimodal.ahashBands(assets)
      .collect().map(r => r.getLong(0) -> r).toMap
    val b1 = out(1L).getSeq[Long](3)
    assert(b1 == Seq.fill(8)(240L),
      s"half-dark image must hash to 0b11110000 per row, got $b1")
    assert(out(2L).getSeq[Long](3) == b1,
      "uniform brightness shift must not change the hash")
    assert(out(3L).isNullAt(3), "non-BMP content yields the null row")
    // sensitivity: flipping one resized cell's brightness flips exactly
    // that bit (hash is a real function of pixels, not a constant)
    val oneOff = flat(10); oneOff(0) = 127; oneOff(1) = 127; oneOff(2) = 127
    val assets2 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(4L,
        graft.operators.Multimodal.encodeBmp(8, 8, oneOff)))), schema)
    val b4 = graft.operators.Multimodal.ahashBands(assets2)
      .collect()(0).getSeq[Long](3)
    assert(b4 != b1 && b4.tail == b1.tail,
      "a single-cell change must only touch that cell's band")
  }

  test("wavWindows: window boundaries, trailing-partial drop, exact " +
    "energy/peak/first-sample goldens; non-WAV content emits no rows") {
    // stereo, 7 frames, win=3 → windows [0,2] and [3,5]; frame 6 dropped
    val s = Array[Short](100, -200, 300, 400, -500, 600, // frames 0-2
      7, -8, 9, 10, -11, 12, // frames 3-5
      9999, 9999) // frame 6: in the dropped partial window
    val wav = graft.operators.Multimodal.encodeWavPcm16(8000, 2, s)
    val schema = StructType(Seq(StructField("asset_id", LongType),
      StructField("content", BinaryType)))
    val assets = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, wav), Row(2L, Array[Byte](1, 2, 3)))), schema)
    val rows = graft.operators.Multimodal.wavWindows(assets, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(rows.size == 2 && rows.keySet == Set((1L, 0L), (1L, 1L)),
      "two full windows, the partial dropped, the non-WAV asset silent")
    val w0 = rows((1L, 0L))
    assert(w0.getLong(2) == 100L * 100 + 200 * 200 + 300 * 300 + 400 * 400 +
      500 * 500 + 600 * 600)
    assert(w0.getLong(3) == 600L && w0.getLong(4) == 100L)
    val w1 = rows((1L, 1L))
    assert(w1.getLong(2) == 7L * 7 + 8 * 8 + 9 * 9 + 10 * 10 + 11 * 11 + 12 * 12)
    assert(w1.getLong(3) == 12L && w1.getLong(4) == 7L)
  }

  test("e18 semantics on a planted label geometry: the hardest negative is " +
    "the highest-cosine wrong-label vector and a confusable query gets a " +
    "negative margin") {
    // axis-aligned 64-dim vectors: query 0 (label 0) sits ON the label-1
    // direction — its best positive is orthogonal (cos 0) while its best
    // negative is parallel (cos 1) → margin = 0 − 1 = −1
    def vec(dim: Int): Seq[Float] =
      (0 until 64).map(i => if (i == dim) 1.0f else 0.0f)
    val emb = Seq(
      (0L, 1, vec(0)),  // the query: label 1 but on axis 0
      (30L, 1, vec(1)), // its only positive: orthogonal
      (31L, 0, vec(0)), // hardest negative: identical direction
      (32L, 0, vec(2)), (33L, 2, vec(3))) // other negatives: orthogonal
      .toDF("vec_id", "label", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("e18fix").toString
    emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.queries.TextVector18.e18.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r).toMap
    val top = out((0L, 1))
    assert(top.getLong(3) == 31L, "rank-1 negative must be the parallel one")
    assert(math.abs(top.getDouble(5) - 1.0) < 1e-9)
    assert(top.getDouble(6) < 0.0,
      "a query whose best negative beats its best positive must show margin < 0")
    // orthogonal negatives tie at cos 0 → id ascending breaks the tie
    assert(out((0L, 2)).getLong(3) == 32L && out((0L, 3)).getLong(3) == 33L)
  }

  test("AVI DIB encode/decode: round trip exact; each frame's DIB bytes " +
    "match the JDK's independent ImageIO BMP reader pixel-for-pixel; the " +
    "RIFF walk skips unknown chunks; strictness rejects non-DIB streams") {
    import graft.operators.Multimodal
    val w = 7; val h = 3 // width 7 → non-trivial 4-byte row padding
    val frames = (0 until 3).map(f =>
      Array.tabulate(w * h * 3)(i => ((i * 31 + f * 97 + 5) % 251).toByte))
    val avi = Multimodal.encodeAviDib(w, h, 40000, frames)
    // 1. our decode inverts our encode exactly — geometry, rate, frame
    // order, every pixel
    val Some((dw, dh, dus, dfs)) = Multimodal.decodeAviDib(avi)
    assert(dw == w && dh == h && dus == 40000 && dfs.length == 3)
    frames.indices.foreach(f =>
      assert(dfs(f).toSeq == frames(f).toSeq, s"frame $f"))
    // 2. the existing header-only metadata parser agrees with the new
    // full decode on the same bytes (two independent walks of one file)
    val meta = Multimodal.decodeAvi(avi).get
    assert(meta.getInt(1) == w && meta.getInt(2) == h &&
      meta.getLong(4) == 3L * 40000 / 1000)
    // 3. JDK cross-check: a '00db' chunk's payload IS the BMP pixel
    // format, so wrapping it in a 54-byte BMP header must read back the
    // source RGB through ImageIO — an independent implementation, so
    // encode and decode cannot share a compensating bug
    val stride = (w * 3 + 3) / 4 * 4
    val frameSize = stride * h
    def indexOfTag(tag: String, from: Int): Int = {
      val t = tag.getBytes("US-ASCII")
      (from until avi.length - 3).find(i =>
        avi(i) == t(0) && avi(i + 1) == t(1) && avi(i + 2) == t(2) &&
          avi(i + 3) == t(3)).getOrElse(-1)
    }
    var at = 0
    frames.indices.foreach { f =>
      at = indexOfTag("00db", at + 1)
      assert(at > 0, s"frame chunk $f present")
      val dib = avi.slice(at + 8, at + 8 + frameSize)
      val bmp = java.nio.ByteBuffer.allocate(54 + frameSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bmp.put('B'.toByte).put('M'.toByte).putInt(54 + frameSize)
        .putShort(0).putShort(0).putInt(54)
        .putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        .putInt(0).putInt(frameSize).putInt(2835).putInt(2835)
        .putInt(0).putInt(0).put(dib)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bmp.array()))
      assert(img != null && img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val argb = img.getRGB(x, y)
        val p = (y * w + x) * 3
        assert(((argb >> 16) & 0xff) == (frames(f)(p) & 0xff), s"R f$f ($x,$y)")
        assert(((argb >> 8) & 0xff) == (frames(f)(p + 1) & 0xff), s"G f$f ($x,$y)")
        assert((argb & 0xff) == (frames(f)(p + 2) & 0xff), s"B f$f ($x,$y)")
      }
    }
    // 4. chunk WALK, not fixed offsets: a JUNK chunk (odd-sized, so the
    // word-alignment pad is exercised) inserted before hdrl still decodes
    val junk = Array[Byte]('J', 'U', 'N', 'K', 3, 0, 0, 0, 9, 9, 9, 0)
    val walked = avi.take(12) ++ junk ++ avi.drop(12)
    java.nio.ByteBuffer.wrap(walked).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, walked.length - 8)
    val Some((_, _, _, wfs)) = Multimodal.decodeAviDib(walked)
    assert(wfs.length == 3 && wfs(2).toSeq == frames(2).toSeq)
    // 5. strictness: a compressed fourcc, a non-vids stream, truncation,
    // and null all reject (codec territory stays the documented stub)
    val badHandler = avi.clone()
    val strhAt = indexOfTag("strh", 0)
    System.arraycopy("cvid".getBytes("US-ASCII"), 0, badHandler, strhAt + 12, 4)
    assert(Multimodal.decodeAviDib(badHandler).isEmpty)
    val badComp = avi.clone()
    val strfAt = indexOfTag("strf", 0)
    java.nio.ByteBuffer.wrap(badComp).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(strfAt + 8 + 16, 1) // biCompression = BI_RLE8
    assert(Multimodal.decodeAviDib(badComp).isEmpty)
    assert(Multimodal.decodeAviDib(avi.take(40)).isEmpty)
    assert(Multimodal.decodeAviDib(null).isEmpty)
    // 6. aviFrameStats: null content emits the null stats row, well-formed
    // assets emit one row per frame with the order-sensitive corner luma
    val assets = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, avi), Row(2L, null))),
      StructType(Seq(StructField("asset_id", LongType),
        StructField("content", BinaryType))))
    val stats = Multimodal.aviFrameStats(assets).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1 else r.getInt(1)) -> r).toMap
    assert(stats.size == 4) // 3 frames + 1 null row
    val f0 = stats((1L, 0))
    assert(f0.getInt(2) == w && f0.getInt(3) == h && f0.getInt(4) == 40000)
    val exp0 = 0.299 * (frames(0)(0) & 0xff) + 0.587 * (frames(0)(1) & 0xff) +
      0.114 * (frames(0)(2) & 0xff)
    assert(math.abs(f0.getDouble(8) - exp0) < 1e-12)
    assert(stats((2L, -1)).isNullAt(2))
  }
}
