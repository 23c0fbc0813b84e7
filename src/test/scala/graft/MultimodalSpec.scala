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
