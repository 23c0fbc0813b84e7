package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def assets = Seq(
    (1L, "image", "0123456789abcdef".getBytes),
    (2L, "video", ("x" * 100).getBytes),
    (3L, "audio", Array.empty[Byte]))
    .toDF("asset_id", "media_type", "content")

  test("withDecodedMeta attaches a deterministic typed metadata struct") {
    val out = Multimodal.withDecodedMeta(assets).orderBy("asset_id")
    val rows = out.select("meta.media_type", "meta.width", "meta.decoder").collect()
    assert(rows(0).getString(0) == "image")
    assert(rows(0).getInt(1) >= 64)
    assert(rows(0).getString(2) == "stub-v1")
    // deterministic: same content -> same meta
    val again = Multimodal.withDecodedMeta(assets).orderBy("asset_id")
      .select("meta.width").as[Int].collect()
    assert(again.toSeq == out.select("meta.width").as[Int].collect().toSeq)
  }

  test("decodeImage reads real PNG/BMP headers via javax.imageio, deterministically") {
    def png(w: Int, h: Int, imgType: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, imgType)
      img.setRGB(0, 0, 0xff0000)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rgb = png(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val m1 = Multimodal.decodeImage(rgb).get
    assert(m1.getString(0) == "image" && m1.getInt(1) == 2 && m1.getInt(2) == 2)
    assert(m1.getInt(3) == 3 && m1.getString(5) == "imageio-png")
    // RGBA carries the alpha channel; BMP goes through its own JDK reader
    val rgba = png(3, 1, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    assert(Multimodal.decodeImage(rgba).get.getInt(3) == 4)
    val img = new java.awt.image.BufferedImage(5, 4, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val mBmp = Multimodal.decodeImage(bos.toByteArray).get
    assert(mBmp.getInt(1) == 5 && mBmp.getInt(2) == 4 && mBmp.getString(5) == "imageio-bmp")
    // byte-for-byte deterministic across calls
    assert(Multimodal.decodeImage(rgb).get == m1)
    // undecodable bytes -> None (caller falls back to the stub)
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
    assert(Multimodal.decodeImage(Array.empty[Byte]).isEmpty)
    // ...and the dispatch wires that fallback into the frame path
    val mixed = Seq((1L, "image", rgb), (2L, "image", "junk".getBytes))
      .toDF("asset_id", "media_type", "content")
    val metas = Multimodal.withDecodedMeta(mixed).orderBy("asset_id")
      .select("meta.width", "meta.decoder").collect()
    assert(metas(0).getInt(0) == 2 && metas(0).getString(1) == "imageio-png")
    assert(metas(1).getString(1) == "stub-v1")
  }

  test("resizeStub emits target-geometry byte length") {
    val out = Multimodal.resizeStub(assets, 8, 4)
      .select(length(col("content"))).as[Int].collect()
    assert(out.forall(_ == 32))
  }

  test("sampleFramesStub explodes every-nth fixed windows") {
    val out = Multimodal.sampleFramesStub(assets, frameBytes = 10, everyNth = 2)
      .orderBy("asset_id", "frame_idx").collect()
    // asset 2 has 100 bytes -> 10 windows -> sampled 0,2,4,6,8
    val a2 = out.filter(_.getLong(0) == 2L)
    assert(a2.map(_.getInt(1)).toSeq == Seq(0, 2, 4, 6, 8))
    assert(a2.forall(_.getAs[Array[Byte]](2).length == 10))
    // empty asset 3 contributes no frames; 16-byte asset 1 -> 1 window
    assert(!out.exists(_.getLong(0) == 3L))
    assert(out.count(_.getLong(0) == 1L) == 1)
  }

  test("contentStats computes length + shannon entropy") {
    val out = Multimodal.contentStats(assets).orderBy("asset_id").collect()
    assert(out(0).getLong(1) == 16L)
    assert(out(0).getDouble(2) == 4.0) // 16 distinct bytes -> 4 bits
    assert(out(1).getDouble(2) == 0.0) // single repeated byte
    assert(out(2).getLong(1) == 0L && out(2).getDouble(2) == 0.0)
  }
}
