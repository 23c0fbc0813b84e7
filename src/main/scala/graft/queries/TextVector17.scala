package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Twentieth coverage batch (round 9) —
  *
  *  - d86: the suffix-index halves finally meet: ExactSubstr
  *    duplicated-span REMOVAL (Lee et al. 2021 §4) driven by the real
  *    L-capped prefix-doubling rank index
  *    ([[graft.operators.SuffixRanks.spanRemoval]]) instead of d44's
  *    fixed-width window hashes — emitting the cleaned corpus itself.
  */
object TextVector17 {

  def defs: Seq[QueryDef] = Seq(d86, m3, m4, e17)

  /** Symmetric int8 scalar quantization + quantized-cosine top-k — the
    * third embedding-compression serving form beside PQ (e8/e12, 32×) and
    * 1-bit sign codes (e14, 256×): per-vector scale maxabs/127, code
    * q_i = round(x_i·127/maxabs) ∈ [−127, 127] (4× smaller scans, and
    * integer SIMD dot products in a real engine). The quantizer's ONLY
    * float is the scale division; the rounding is the judged surface
    * (Spark round = HALF_UP = away-from-zero, DuckDB round = away-from-
    * zero — same rule), and everything downstream is EXACT integer
    * arithmetic: the judged row carries the raw BIGINT code dot product
    * alongside the rounded quantized cosine, so the compression error is
    * a judged number (compare e2's exact cosine ranks). Zero-norm vectors
    * quantize to all-zero codes → NULL cosine, pinned below every real
    * score on both engines (the e14/e15 rule). Scale: corpus ×
    * broadcast(20-query batch) — the e2 exact-baseline contract. */
  val e17 = QueryDef("e17_int8_sq_topk",
    (s, dir) => {
      import org.apache.spark.sql.types.{DoubleType, LongType}
      val emb = Tables.embeddings(s, dir).filter(col("embedding").isNotNull)
      val codes = emb
        .withColumn("maxabs", aggregate(
          transform(col("embedding"), x => abs(x.cast(DoubleType))),
          lit(0.0), (acc, v) => greatest(acc, v)))
        .withColumn("q", when(col("maxabs") > 0.0,
            transform(col("embedding"),
              x => round(x.cast(DoubleType) * 127.0 / col("maxabs"), 0)
                .cast(LongType)))
          .otherwise(transform(col("embedding"), _ => lit(0L))))
        .withColumn("n2", aggregate(transform(col("q"), v => v * v),
          lit(0L), (acc, v) => acc + v))
        .select(col("vec_id"), col("q"), col("n2"))
      val qs = codes.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("q").as("qa"),
          col("n2").as("na"))
      val pairs = codes
        .select(col("vec_id").as("neighbor_id"), col("q").as("qb"),
          col("n2").as("nb"))
        .crossJoin(broadcast(qs))
        .filter(col("query_id") =!= col("neighbor_id"))
        // native codegen'd integer dot (round 10): the interpreted
        // aggregate(zip_with) fold allocated a zipped array per pair —
        // same values (Java long wrap ≡ the non-ANSI column fold)
        .withColumn("dotq",
          graft.functions.VectorExprs.dotLong(col("qa"), col("qb")))
        .withColumn("qcos", when(col("na") > 0L && col("nb") > 0L,
          col("dotq").cast(DoubleType) /
            (sqrt(col("na").cast(DoubleType)) * sqrt(col("nb").cast(DoubleType)))))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
        .orderBy(round(coalesce(col("qcos"), lit(-2.0)), 9).desc,
          col("neighbor_id").asc)
      pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          col("dotq"), round(col("qcos"), 4).as("qcos_r"))
        .orderBy("query_id", "rank")
    },
    Some("""WITH c AS (SELECT vec_id, embedding,
        list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
        FROM embeddings WHERE embedding IS NOT NULL),
      q8 AS (SELECT vec_id,
        CASE WHEN maxabs > 0.0
          THEN list_transform(embedding,
            x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / maxabs) AS BIGINT))
          ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS q
        FROM c),
      n AS (SELECT vec_id, q,
        CAST(list_sum(list_transform(q, v -> v * v)) AS BIGINT) AS n2 FROM q8),
      pr AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
          CAST(list_sum(list_transform(range(1, 65),
            i -> a.q[i] * b.q[i])) AS BIGINT) AS dotq,
          a.n2 AS na, b.n2 AS nb
        FROM n a CROSS JOIN n b
        WHERE a.vec_id < 20 AND a.vec_id <> b.vec_id),
      sc AS (SELECT query_id, neighbor_id, dotq,
          CASE WHEN na > 0 AND nb > 0
            THEN CAST(dotq AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)))
          END AS qcos
        FROM pr),
      rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY round(coalesce(qcos, -2.0), 9) DESC, neighbor_id ASC) AS rank
        FROM sc)
      SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, dotq,
        ROUND(qcos, 4) AS qcos_r
      FROM rk WHERE rank <= 5 ORDER BY query_id, rank"""))

  /** REAL multimodal decode judged end to end (r8 verdict task 5 — the
    * stub shrinks to genuinely-compressed formats): documents' ASCII bytes
    * become 7×h 24-bit BMPs through [[graft.operators.Multimodal.encodeBmp]]
    * (real headers, BGR, bottom-up, 4-byte row padding — width 7 makes the
    * padding non-trivial), then [[graft.operators.Multimodal.bmpPixelStats]]
    * REALLY decodes the pixel data back and the judged surface is the
    * decoded statistics: geometry, per-channel means, and the top-left
    * pixel's luminance (order-SENSITIVE — a decoder that forgot the row
    * flip matches the means but not the corner). The DuckDB oracle replays
    * the arithmetic from the SOURCE text (ascii codes at the pixel
    * positions), so any asymmetric encode/decode error — padding read as
    * pixels, channel-order drift, off-by-one in bfOffBits — hash-
    * mismatches; the spec additionally pins decode == the JDK's
    * independent ImageIO BMP reader, byte for byte. */
  val m3 = QueryDef("m3_bmp_decode",
    (s, dir) => {
      import org.apache.spark.sql.types._
      // ASCII gate (advisor r9): the byte derivation is getBytes(US-ASCII)
      // over UTF-16 length Spark-side but ascii()/len() over CODE POINTS
      // oracle-side — a non-ASCII doc would fork the engines (loudly, but
      // spuriously). The fixture filters to ASCII docs in BOTH engines so
      // the judged surface is the codec, not the charset mismatch.
      val docs = Tables.documents(s, dir)
        .filter(col("text").rlike("^[\\x00-\\x7F]*$"))
        .filter(length(col("text")) >= 63)
        .select(col("doc_id"), col("text"))
      val schema = StructType(Seq(StructField("asset_id", LongType),
        StructField("content", BinaryType)))
      val assets = s.createDataFrame(docs.rdd.mapPartitions { it =>
        it.map { row =>
          val text = row.getString(1)
          val h = math.min(text.length / 21, 9)
          val rgb = text.substring(0, 21 * h).getBytes("US-ASCII")
          org.apache.spark.sql.Row(row.getLong(0),
            graft.operators.Multimodal.encodeBmp(7, h, rgb))
        }
      }, schema)
      graft.operators.Multimodal.bmpPixelStats(assets)
        .select(col("asset_id"), col("width"), col("height"), col("n_px"),
          round(col("mean_r"), 6).as("mean_r"),
          round(col("mean_g"), 6).as("mean_g"),
          round(col("mean_b"), 6).as("mean_b"),
          round(col("first_luma"), 6).as("first_luma"))
        .orderBy("asset_id")
    },
    Some("""WITH d AS (
        SELECT doc_id, text, CAST(least(len(text) // 21, 9) AS INT) AS h
        FROM documents
        WHERE regexp_full_match(text, '[\x00-\x7F]*') AND len(text) >= 63),
      px AS (SELECT doc_id, h,
          CAST(p AS BIGINT) AS p,
          ascii(substr(text, CAST(3 * p + 1 AS INT), 1)) AS r,
          ascii(substr(text, CAST(3 * p + 2 AS INT), 1)) AS g,
          ascii(substr(text, CAST(3 * p + 3 AS INT), 1)) AS b
        FROM d, UNNEST(generate_series(0, 7 * h - 1)) AS u(p))
      SELECT doc_id AS asset_id, CAST(7 AS INT) AS width,
        CAST(MAX(h) AS INT) AS height,
        CAST(count(*) AS BIGINT) AS n_px,
        ROUND(AVG(r), 6) AS mean_r,
        ROUND(AVG(g), 6) AS mean_g,
        ROUND(AVG(b), 6) AS mean_b,
        ROUND(MAX(CASE WHEN p = 0
          THEN 0.299 * CAST(r AS DOUBLE) + 0.587 * CAST(g AS DOUBLE)
             + 0.114 * CAST(b AS DOUBLE) END), 6) AS first_luma
      FROM px GROUP BY doc_id ORDER BY asset_id"""))

  /** REAL audio decode judged end to end (r9 verdict task 6 — the second
    * self-decodable media family): documents' ASCII bytes become stereo
    * 16-bit PCM WAVs through [[graft.operators.Multimodal.encodeWavPcm16]]
    * (real RIFF/fmt/data chunks, little-endian int16 interleaved frames),
    * then [[graft.operators.Multimodal.wavSampleStats]] REALLY walks the
    * chunks back and the judged surface is the decoded statistics: header
    * geometry, per-channel means, the all-sample RMS, and the FIRST
    * channel-0 sample (order-SENSITIVE — a byte-swapping or
    * payload-offset bug matches nothing; a sample-order bug matches the
    * means but not the first sample). Samples derive from ascii codes
    * (b·256 − 16384 ∈ [−16384, 16128] — strictly inside int16), so the
    * DuckDB oracle replays the arithmetic from the SOURCE text with exact
    * BIGINT sums; the only floats on either engine are the final
    * divisions and one correctly-rounded sqrt. The spec cross-checks the
    * decode against the JDK's independent javax.sound.sampled reader. */
  val m4 = QueryDef("m4_wav_decode",
    (s, dir) => {
      import org.apache.spark.sql.types._
      val docs = Tables.documents(s, dir)
        .filter(col("text").rlike("^[\\x00-\\x7F]*$"))
        .filter(length(col("text")) >= 63)
        .select(col("doc_id"), col("text"))
      val schema = StructType(Seq(StructField("asset_id", LongType),
        StructField("content", BinaryType)))
      val assets = s.createDataFrame(docs.rdd.mapPartitions { it =>
        it.map { row =>
          val text = row.getString(1)
          val frames = math.min(text.length / 8, 25)
          val b = text.substring(0, 2 * frames).getBytes("US-ASCII")
          val samples = new Array[Short](2 * frames)
          var i = 0
          while (i < samples.length) {
            samples(i) = ((b(i) & 0xff) * 256 - 16384).toShort
            i += 1
          }
          org.apache.spark.sql.Row(row.getLong(0),
            graft.operators.Multimodal.encodeWavPcm16(8000, 2, samples))
        }
      }, schema)
      graft.operators.Multimodal.wavSampleStats(assets)
        .select(col("asset_id"), col("sample_rate"), col("channels"),
          col("n_frames"),
          round(col("mean_ch0"), 6).as("mean_ch0"),
          round(col("mean_ch1"), 6).as("mean_ch1"),
          round(col("rms"), 6).as("rms"), col("first_s0"))
        .orderBy("asset_id")
    },
    Some("""WITH d AS (
        SELECT doc_id, text, CAST(least(len(text) // 8, 25) AS INT) AS f
        FROM documents
        WHERE regexp_full_match(text, '[\x00-\x7F]*') AND len(text) >= 63),
      sm AS (SELECT doc_id, f, CAST(p AS BIGINT) AS p,
          ascii(substr(text, CAST(2 * p + 1 AS INT), 1)) * 256 - 16384 AS s0,
          ascii(substr(text, CAST(2 * p + 2 AS INT), 1)) * 256 - 16384 AS s1
        FROM d, UNNEST(generate_series(0, f - 1)) AS u(p))
      SELECT doc_id AS asset_id, CAST(8000 AS INT) AS sample_rate,
        CAST(2 AS INT) AS channels,
        CAST(count(*) AS BIGINT) AS n_frames,
        ROUND(CAST(SUM(s0) AS DOUBLE) / count(*), 6) AS mean_ch0,
        ROUND(CAST(SUM(s1) AS DOUBLE) / count(*), 6) AS mean_ch1,
        ROUND(sqrt(CAST(SUM(s0 * s0 + s1 * s1) AS DOUBLE) / (2 * count(*))), 6)
          AS rms,
        CAST(MAX(CASE WHEN p = 0 THEN s0 END) AS BIGINT) AS first_s0
      FROM sm GROUP BY doc_id ORDER BY asset_id"""))

  /** Suffix-index-driven duplicated-span removal: every 16-char window
    * occurring more than once in the corpus is a rank tie in the capped
    * doubling index (d68); all but the first occurrence (min (doc_id,
    * pos)) are cut, overlapping cuts merged by interval union, and the
    * document REBUILT from the complement segments — judged as the
    * cleaned corpus (doc_id, n_chars, chars_removed, cleaned_text), so
    * the hash gate replays span selection AND removal byte-for-byte.
    * The DuckDB oracle takes the quadratic-memory shortcut for the
    * grouping (window functions over substr(text, i, 16)) and then the
    * identical interval-merge + complement rebuild; agreement of the
    * two span-group derivations is the capped Manber-Myers invariant
    * d68 pins. Fixture: d68's — every 5th doc, twins every 15th under
    * id+5e9, so exact twins (fully removed, cleaned_text = '') and
    * partial boilerplate overlaps both occur at every SF. */
  val d86 = QueryDef("d86_suffix_span_removal",
    (s, dir) => {
      val base = Tables.documents(s, dir)
        .filter(col("doc_id") % 5 === 0 && length(col("text")) >= 1)
        .select(col("doc_id"), col("text"))
      val twins = base.filter(col("doc_id") % 15 === 0)
        .select((col("doc_id") + 5000000000L).as("doc_id"), col("text"))
      graft.operators.SuffixRanks.spanRemoval(base.unionByName(twins), 16)
        .orderBy("doc_id")
    },
    Some("""WITH base AS (
        SELECT doc_id, text FROM documents
        WHERE doc_id % 5 = 0 AND len(text) >= 1),
      d AS (SELECT doc_id, text FROM base
        UNION ALL
        SELECT doc_id + 5000000000, text FROM base WHERE doc_id % 15 = 0),
      dl AS (SELECT doc_id, CAST(len(text) AS BIGINT) AS n FROM d),
      f AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, substr(text, i, 16) AS g
        FROM d, UNNEST(generate_series(1, len(text) - 15)) AS u(i)
        WHERE len(text) >= 16),
      w AS (SELECT doc_id, pos FROM (
          SELECT doc_id, pos,
            row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
          FROM f) WHERE rn > 1),
      mk AS (SELECT doc_id, pos AS s, pos + 15 AS e,
          CASE WHEN max(pos + 15) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
            OR pos > max(pos + 15) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
          THEN 1 ELSE 0 END AS brk
        FROM w),
      grp AS (SELECT doc_id, s, e,
          SUM(brk) OVER (PARTITION BY doc_id ORDER BY s) AS gid FROM mk),
      mg AS (SELECT doc_id, gid, min(s) AS s, max(e) AS e FROM grp GROUP BY 1, 2),
      stats AS (SELECT doc_id, SUM(e - s + 1) AS removed FROM mg GROUP BY 1),
      segs AS (SELECT doc_id, ks, ke FROM (
          SELECT doc_id,
            coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) + 1 AS ks,
            s - 1 AS ke
          FROM mg
          UNION ALL
          SELECT t.doc_id, t.ks, dl.n AS ke
          FROM (SELECT doc_id, max(e) + 1 AS ks FROM mg GROUP BY 1) t
          JOIN dl USING (doc_id))
        WHERE ke >= ks),
      reb AS (SELECT segs.doc_id,
          string_agg(substr(text, CAST(ks AS INT), CAST(ke - ks + 1 AS INT)),
            '' ORDER BY ks) AS ct
        FROM segs JOIN d USING (doc_id) GROUP BY 1)
      SELECT d.doc_id, dl.n AS n_chars,
        CAST(coalesce(stats.removed, 0) AS BIGINT) AS chars_removed,
        CASE WHEN stats.doc_id IS NULL THEN d.text
             ELSE coalesce(reb.ct, '') END AS cleaned_text
      FROM d JOIN dl USING (doc_id)
      LEFT JOIN stats USING (doc_id)
      LEFT JOIN reb USING (doc_id)
      ORDER BY doc_id"""))
}
