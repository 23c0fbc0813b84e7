package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal asset columns for the training-data pipeline: images / audio /
  * video ride along as opaque `binary` columns with a typed metadata struct;
  * decode / feature-extract / resize / frame-sample run as partition-local
  * batch transforms (`mapPartitions` over an `Encoder`-backed row type — the
  * Scala analog of `mapInPandas`: batched, arrow-friendly, no driver hop).
  *
  * The actual codecs are NOT in this environment (zero-egress container, no
  * image/audio libs) — `decodeStub` derives a DETERMINISTIC fake
  * decode from the bytes (documented stub, marked in `decoder` field), so
  * the Spark-side plumbing (schema, batching, partitioning, column
  * lifecycle) is real and testable; swap `decodeStub` for a JNI/codec call
  * in production.
  */
object Multimodal {

  /** Typed metadata carried with every asset. */
  val assetMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_channels", IntegerType),
    StructField("duration_ms", LongType),
    StructField("decoder", StringType)))

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("content", BinaryType),
    StructField("meta", assetMetaType)))

  /** STUB decode: deterministic pseudo-metadata from the byte content.
    * Replace with a real codec (libjpeg/ffmpeg via JNI) in production — the
    * signature (bytes -> meta) and the batch shape are the contract. */
  def decodeStub(mediaType: String, bytes: Array[Byte]): Row = {
    val h = scala.util.hashing.MurmurHash3.bytesHash(bytes, 42)
    val w = 64 + math.floorMod(h, 1024)
    val ht = 64 + math.floorMod(h >> 10, 1024)
    val ch = 1 + math.floorMod(h >> 20, 4)
    val dur = if (mediaType == "image") 0L else 1000L + math.floorMod(h.toLong, 600000L)
    Row(mediaType, w, ht, ch, dur, "stub-v1")
  }

  /** REAL image decode via javax.imageio (PNG/BMP/GIF/JPEG readers ship
    * with the JDK — in-JVM, no native deps). Header-only: width, height
    * and channel count come from the reader's metadata WITHOUT decoding
    * pixel data, so a 50 MB image costs a few KB of reads — the shape
    * that survives 100 TB of assets. Returns None for bytes no JDK
    * reader claims (true for video/audio containers), sending the caller
    * to the documented stub. */
  def decodeImage(bytes: Array[Byte]): Option[Row] = {
    // MemoryCacheImageInputStream directly: the createImageInputStream
    // factory defaults to a disk-backed cache — a temp file created and
    // deleted PER IMAGE inside the partition loop (and a null return on
    // factory failure). Header reads over a byte array need no cache file.
    val in = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(in, true, true)
          val types = r.getImageTypes(0)
          val ch = if (types.hasNext) types.next().getColorModel.getNumComponents else 0
          Some(Row("image", r.getWidth(0), r.getHeight(0), ch, 0L,
            "imageio-" + r.getFormatName.toLowerCase))
        } catch {
          // NonFatal, not just IOException: ImageIO readers throw
          // RuntimeExceptions (AIOOBE, NegativeArraySize, IllegalArgument)
          // on fuzzed/corrupt bytes whose magic number a reader claimed —
          // one bad asset must fall back to the stub, not kill the job.
          case scala.util.control.NonFatal(_) => None
        } finally r.dispose()
      }
    } finally in.close()
  }

  /** Decode dispatch: images go through the real javax.imageio path,
    * falling back to the stub for formats the JDK can't read; audio and
    * video stay on the stub (no codecs in this environment). */
  def decodeMeta(mediaType: String, bytes: Array[Byte]): Row =
    if (mediaType == "image")
      decodeImage(bytes).getOrElse(decodeStub(mediaType, bytes))
    else decodeStub(mediaType, bytes)

  /** Attach decoded metadata to a binary asset frame — partition-local,
    * no shuffle; the binary column never leaves its partition. */
  def withDecodedMeta(assets: DataFrame, mediaTypeCol: String = "media_type",
                      contentCol: String = "content"): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = StructType(assets.schema.fields :+ StructField("meta", assetMetaType))
    val mtIdx = assets.schema.fieldIndex(mediaTypeCol)
    val cIdx = assets.schema.fieldIndex(contentCol)
    val rdd = assets.rdd.mapPartitions { it =>
      it.map { row =>
        val meta = decodeMeta(row.getString(mtIdx), row.getAs[Array[Byte]](cIdx))
        Row.fromSeq(row.toSeq :+ meta)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Resize plumbing: emits a new binary whose length matches the target
    * geometry (stub: truncate/pad), preserving the partition-local batch
    * shape a real resampler would use. */
  def resizeStub(assets: DataFrame, targetW: Int, targetH: Int,
                 contentCol: String = "content"): DataFrame = {
    val spark = assets.sparkSession
    val cIdx = assets.schema.fieldIndex(contentCol)
    val targetLen = targetW * targetH
    val rdd = assets.rdd.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](cIdx)
        val out = java.util.Arrays.copyOf(bytes, targetLen)
        Row.fromSeq(row.toSeq.updated(cIdx, out))
      }
    }
    spark.createDataFrame(rdd, assets.schema)
  }

  /** Frame sampling for video assets: every nth "frame" (stub: fixed-size
    * byte windows) exploded to one row per sampled frame — the one-to-many
    * expansion shape of a real frame sampler. */
  def sampleFramesStub(assets: DataFrame, frameBytes: Int, everyNth: Int,
                       idCol: String = "asset_id",
                       contentCol: String = "content"): DataFrame = {
    val windows = floor(length(col(contentCol)) / frameBytes).cast(IntegerType)
    assets
      .withColumn("frame_idx",
        explode(when(windows > 0, sequence(lit(0), windows - 1, lit(everyNth)))
          .otherwise(array().cast(ArrayType(IntegerType)))))
      .withColumn("frame",
        expr(s"substring($contentCol, frame_idx * $frameBytes + 1, $frameBytes)"))
      .select(col(idCol), col("frame_idx"), col("frame"))
  }

  /** Feature extraction: per-asset byte histogram entropy + length — real
    * (non-stub) content statistics, native expressions where possible. */
  def contentStats(assets: DataFrame, idCol: String = "asset_id",
                   contentCol: String = "content"): DataFrame = {
    val spark = assets.sparkSession
    val idIdx = assets.schema.fieldIndex(idCol)
    val cIdx = assets.schema.fieldIndex(contentCol)
    val outSchema = StructType(Seq(
      StructField("asset_id", assets.schema(idIdx).dataType),
      StructField("n_bytes", LongType),
      StructField("entropy", DoubleType)))
    val rdd = assets.rdd.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](cIdx)
        val counts = new Array[Long](256)
        bytes.foreach(b => counts(b & 0xff) += 1)
        val n = bytes.length.toDouble
        val entropy = if (n == 0) 0.0 else -counts.filter(_ > 0).map { c =>
          val p = c / n
          p * math.log(p) / math.log(2)
        }.sum
        Row(row.get(idIdx), bytes.length.toLong, entropy)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
