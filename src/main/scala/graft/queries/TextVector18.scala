package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables
import graft.operators.Similarity

/** Twenty-first coverage batch (round 10) — the multimodal verbs the
  * round-9 verdict left open plus embedding-training data mining:
  *
  *  - m5: REAL image resize (nearest-neighbor 7×h → 8×8) feeding a
  *    perceptual average-hash and a banded Hamming near-dup join — image
  *    dedup, the visual sibling of d5's MinHash-LSH.
  *  - m6: REAL audio frame-sampling (fixed-window decimation over decoded
  *    PCM) with exact-integer per-window energy/peak features.
  *  - e18: hard-negative mining for embedding training — per query, the
  *    top-k highest-cosine WRONG-label candidates and their margin
  *    against the best same-label positive.
  */
object TextVector18 {

  def defs: Seq[QueryDef] = Seq(m5, m6, m7, e18, e19)

  /** Image near-duplicate detection via perceptual average-hash — the
    * chain a 100 TB image-curation pass runs: decode (real BMP) → REAL
    * nearest-neighbor resize to 8×8 ([[graft.operators.Multimodal.resizeNearest]],
    * downsampling rows and upsampling the 7-wide columns at once) → codec
    * round trip at the new geometry → 64-bit aHash (bit = cell gray·64 >
    * Σgray, exact cross-multiplied integers) → LSH-banded Hamming join:
    * the 8 row-bands pair into four 16-bit blocking keys, so any two
    * hashes within Hamming 3 share at least one key (pigeonhole: 4
    * disjoint bands all differing ⇒ distance ≥ 4) and the join is
    * value-keyed — never all-pairs — exactly d5's band-bucket shape.
    * Judged per asset: the full hash (8 band bytes — every asset's
    * resize+hash is value-checked, not just the colliding ones), the
    * near-dup degree, and the best partner. The fixture plants
    * brightness-shifted twins (+1 on every pixel byte): aHash is
    * invariant to uniform brightness by construction, so each twin lands
    * at Hamming 0 — the property that makes aHash a NEAR-dup key where
    * md5 (d1) only catches exact bytes. The DuckDB oracle replays pixel
    * selection, hash, banding, and pairing from the SOURCE text, so a
    * resize index-map bug, a channel-order drift, or a banding error all
    * hash-mismatch. */
  val m5 = QueryDef("m5_bmp_ahash_neardup",
    // materializeFinal wrapper (advisor r10): the build's two interior
    // localCheckpoints (`hashed`, `pairs`) are eager and used to outlive
    // every invocation until the ContextCleaner noticed — including
    // PlanLint's plan-only pass over the registry. Freeing them once the
    // result's own bytes exist bounds the per-invocation footprint to the
    // (asset-count-sized) output.
    (s, dir) => graft.core.RoundCheckpointer.materializeFinal(
      s.sparkContext, coalesceTo = 8) {
      // m3's fixture contract: ASCII-only docs (charset fork guard), h =
      // min(len/21, 9) ∈ [3, 9] so the 8×8 resize exercises both row
      // decimation (h 9→8) and row repetition (h 3→8).
      val base = Tables.documents(s, dir)
        .filter(col("text").rlike("^[\\x00-\\x7F]*$"))
        .filter(length(col("text")) >= 63)
        .select(col("doc_id"), col("text"), lit(0).as("shift"))
      val docs = base.unionByName(
        base.filter(col("doc_id") % 15 === 0)
          .select((col("doc_id") + 5000000000L).as("doc_id"), col("text"),
            lit(1).as("shift")))
      val schema = StructType(Seq(StructField("asset_id", LongType),
        StructField("content", BinaryType)))
      val assets = s.createDataFrame(docs.rdd.mapPartitions { it =>
        it.map { row =>
          val text = row.getString(1)
          val shift = row.getInt(2)
          val h = math.min(text.length / 21, 9)
          val rgb = text.substring(0, 21 * h).getBytes("US-ASCII")
          if (shift != 0) {
            var i = 0
            while (i < rgb.length) { rgb(i) = (rgb(i) + shift).toByte; i += 1 }
          }
          org.apache.spark.sql.Row(row.getLong(0),
            graft.operators.Multimodal.encodeBmp(7, h, rgb))
        }
      }, schema)
      // four consumers (banding, both pair-side joins, the final left
      // join) over an RDD-backed frame would re-run the decode+resize+hash
      // once each — materialize the narrow hash relation once (the
      // multi-consumer rule; ~40 bytes/asset, asset-count-sized)
      val hashed = graft.operators.Multimodal.ahashBands(assets)
        .localCheckpoint()
      // 16-bit blocking keys: rows (2k, 2k+1) combine little-endian.
      val banded = hashed.select(col("asset_id"), posexplode(array(
        (0 until 4).map(k => (col("bands")(2 * k) +
          col("bands")(2 * k + 1) * 256L).cast(LongType)): _*))
        .as(Seq("band", "v")))
      // stop-band cut (r13 — the d55 stop-shingle pattern on the visual
      // side): the candidate join is QUADRATIC in (band, value) bucket
      // occupancy, and occupancy is corpus-dependent — the r13 sf10 sweep
      // found band 0 (the images' top rows) collapsing 29k assets into
      // one bucket on the low-dynamic-range synthetic corpus, >1e9
      // candidate pairs from one band (ENOSPC + a 10-minute hot task).
      // Buckets past the cap are near-duplicate BOILERPLATE bands (almost
      // no pair information, all cost); dropping them bounds the stage at
      // O(assets × cap). Recall cost: only pairs whose EVERY exact-match
      // band is boilerplate-hot (the planted shift-twins share all 4
      // bands, so any one cold band keeps them paired). The occupancy
      // join is a plain shuffle join — hot-value cardinality grows with
      // the corpus, so no broadcast (PlanLint check 6).
      val occ = banded.groupBy("band", "v").agg(count(lit(1)).as("__n"))
      val cold = banded.join(occ.filter(col("__n") <= 64), Seq("band", "v"))
        .select(col("asset_id"), col("band"), col("v"))
      val cand = cold.as("x").join(cold.as("y"),
        col("x.band") === col("y.band") && col("x.v") === col("y.v") &&
          col("x.asset_id") < col("y.asset_id"))
        .select(col("x.asset_id").as("a"), col("y.asset_id").as("b"))
        .distinct()
      val pairs = cand
        .join(hashed.select(col("asset_id").as("a"), col("bands").as("ba")), Seq("a"))
        .join(hashed.select(col("asset_id").as("b"), col("bands").as("bb")), Seq("b"))
        .withColumn("ham", aggregate(
          zip_with(col("ba"), col("bb"),
            (x, y) => bit_count(x.bitwiseXOR(y)).cast(LongType)),
          lit(0L), (acc, v) => acc + v))
        .filter(col("ham") <= 3)
        .select(col("a"), col("b"), col("ham"))
        // the symmetric union below consumes pairs TWICE — un-materialized,
        // the whole candidate band join would run once per branch (plan
        // audit caught the duplicated SMJ chain); the relation is
        // near-dup-pair-sized, the cheapest thing in the query
        .localCheckpoint()
      val sym = pairs
        .select(col("a").as("asset_id"), col("b").as("partner"), col("ham"))
        .unionByName(pairs
          .select(col("b").as("asset_id"), col("a").as("partner"), col("ham")))
      val roll = sym.groupBy("asset_id").agg(
        count(lit(1)).as("n_near"),
        min(struct(col("ham"), col("partner"))).as("best"))
      hashed.join(roll, Seq("asset_id"), "left")
        .select(Seq(col("asset_id"), col("width"), col("height")) ++
          (0 until 8).map(k => col("bands")(k).as(s"b$k")) ++ Seq(
          coalesce(col("n_near"), lit(0L)).as("n_near"),
          col("best.partner").as("best_id"),
          col("best.ham").as("best_ham")): _*)
        .orderBy("asset_id")
    },
    Some("""WITH b0 AS (
        SELECT doc_id, text, CAST(least(len(text) // 21, 9) AS BIGINT) AS h
        FROM documents
        WHERE regexp_full_match(text, '[\x00-\x7F]*') AND len(text) >= 63),
      d AS (SELECT doc_id, text, h, 0 AS shift FROM b0
        UNION ALL
        SELECT doc_id + 5000000000, text, h, 1 FROM b0 WHERE doc_id % 15 = 0),
      g AS (SELECT doc_id, i, j,
          ascii(substr(text, CAST(3*((i*h//8)*7 + (j*7//8))+1 AS INT), 1))
        + ascii(substr(text, CAST(3*((i*h//8)*7 + (j*7//8))+2 AS INT), 1))
        + ascii(substr(text, CAST(3*((i*h//8)*7 + (j*7//8))+3 AS INT), 1))
        + 3*shift AS gr
        FROM d,
          UNNEST(generate_series(0, 7)) u(i),
          UNNEST(generate_series(0, 7)) v(j)),
      t AS (SELECT doc_id, SUM(gr) AS total FROM g GROUP BY 1),
      bands AS (SELECT g.doc_id, i AS band,
          CAST(SUM(CASE WHEN gr*64 > total
            THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS v
        FROM g JOIN t USING (doc_id) GROUP BY 1, 2),
      hx AS (SELECT doc_id, list(v ORDER BY band) AS bl FROM bands GROUP BY 1),
      b16 AS (SELECT doc_id, band // 2 AS band2,
          SUM(v * CASE WHEN band % 2 = 1 THEN 256 ELSE 1 END) AS v16
        FROM bands GROUP BY 1, 2),
      occ AS (SELECT band2, v16, COUNT(*) AS n FROM b16 GROUP BY 1, 2),
      cold AS (SELECT b16.doc_id, b16.band2, b16.v16
        FROM b16 JOIN occ USING (band2, v16) WHERE occ.n <= 64),
      cand AS (SELECT x.doc_id AS a, y.doc_id AS b
        FROM cold x JOIN cold y
          ON x.band2 = y.band2 AND x.v16 = y.v16 AND x.doc_id < y.doc_id
        GROUP BY 1, 2),
      pr AS (SELECT a, b, CAST(list_sum(list_transform(range(1, 9),
            k -> bit_count(xor(xa.bl[k], xb.bl[k])))) AS BIGINT) AS ham
        FROM cand JOIN hx xa ON xa.doc_id = cand.a
          JOIN hx xb ON xb.doc_id = cand.b),
      nd AS (SELECT * FROM pr WHERE ham <= 3),
      sym AS (SELECT a AS doc_id, b AS partner, ham FROM nd
        UNION ALL SELECT b, a, ham FROM nd),
      cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_near
        FROM sym GROUP BY 1),
      best AS (SELECT doc_id, partner, ham FROM (
          SELECT doc_id, partner, ham,
            row_number() OVER (PARTITION BY doc_id ORDER BY ham, partner) AS rn
          FROM sym) WHERE rn = 1)
      SELECT hx.doc_id AS asset_id, CAST(7 AS INT) AS width,
        CAST(d.h AS INT) AS height,
        bl[1] AS b0, bl[2] AS b1, bl[3] AS b2, bl[4] AS b3,
        bl[5] AS b4, bl[6] AS b5, bl[7] AS b6, bl[8] AS b7,
        coalesce(cnt.n_near, CAST(0 AS BIGINT)) AS n_near,
        best.partner AS best_id, best.ham AS best_ham
      FROM hx JOIN d ON d.doc_id = hx.doc_id
      LEFT JOIN cnt ON cnt.doc_id = hx.doc_id
      LEFT JOIN best ON best.doc_id = hx.doc_id
      ORDER BY asset_id"""))

  /** Audio frame-sampling + per-window features — the decimation pass a
    * 100 TB audio-curation pipeline runs before feature extraction: m4's
    * stereo PCM16 WAVs decode ([[graft.operators.Multimodal.wavWindows]])
    * into fixed 5-frame windows (FULL windows only — the trailing partial
    * drops, the decimation contract), each carrying exact-BIGINT energy
    * (Σ s² over both channels), peak |s|, and its first channel-0 sample
    * (the decimated waveform itself). Judged per asset: window count, the
    * argmax-energy window (ties → lowest index, the deterministic rule),
    * max peak, and the decimated-sequence sum — so a window-boundary
    * off-by-one, a partial-window leak, or a channel mixup all
    * hash-mismatch against the oracle's replay from source text. */
  val m6 = QueryDef("m6_wav_frame_energy",
    (s, dir) => {
      // m4's fixture contract: ASCII docs, stereo frames = min(len/8, 25),
      // samples b·256 − 16384 — strictly inside int16.
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
      graft.operators.Multimodal.wavWindows(assets, 5)
        .groupBy("asset_id")
        .agg(count(lit(1)).as("n_win"),
          max(struct(col("energy"), (-col("win_idx")).as("neg_win"))).as("top"),
          max(col("peak")).as("peak_max"),
          sum(col("first_s0")).as("dec_sum"))
        .select(col("asset_id"), col("n_win"),
          (-col("top.neg_win")).as("top_win"),
          col("top.energy").as("top_energy"),
          col("peak_max"), col("dec_sum"))
        .orderBy("asset_id")
    },
    Some("""WITH d AS (
        SELECT doc_id, text, CAST(least(len(text) // 8, 25) AS INT) AS f
        FROM documents
        WHERE regexp_full_match(text, '[\x00-\x7F]*') AND len(text) >= 63),
      sm AS (SELECT doc_id, f, CAST(p AS BIGINT) AS p,
          CAST(ascii(substr(text, CAST(2*p+1 AS INT), 1)) * 256 - 16384 AS BIGINT) AS s0,
          CAST(ascii(substr(text, CAST(2*p+2 AS INT), 1)) * 256 - 16384 AS BIGINT) AS s1
        FROM d, UNNEST(generate_series(0, f - 1)) AS u(p)),
      wn AS (SELECT doc_id, p // 5 AS w, s0, s1, p
        FROM sm WHERE p < (f // 5) * 5),
      we AS (SELECT doc_id, w,
          CAST(SUM(s0*s0 + s1*s1) AS BIGINT) AS energy,
          CAST(MAX(greatest(abs(s0), abs(s1))) AS BIGINT) AS peak,
          CAST(MAX(CASE WHEN p % 5 = 0 THEN s0 END) AS BIGINT) AS first_s0
        FROM wn GROUP BY 1, 2),
      agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_win,
          CAST(MAX(peak) AS BIGINT) AS peak_max,
          CAST(SUM(first_s0) AS BIGINT) AS dec_sum
        FROM we GROUP BY 1),
      top AS (SELECT doc_id, w, energy, row_number() OVER (
          PARTITION BY doc_id ORDER BY energy DESC, w) AS rn FROM we)
      SELECT agg.doc_id AS asset_id, n_win,
        CAST(t.w AS BIGINT) AS top_win, t.energy AS top_energy,
        peak_max, dec_sum
      FROM agg JOIN (SELECT doc_id, w, energy FROM top WHERE rn = 1) t
        USING (doc_id)
      ORDER BY asset_id"""))

  /** REAL video decode judged end to end (r11 verdict task 5 — the third
    * self-decodable media family; uncompressed AVI is pure byte math like
    * WAV): documents' ASCII bytes become 7×3 24-bit DIB frames inside a
    * RIFF 'AVI ' container through
    * [[graft.operators.Multimodal.encodeAviDib]] (real avih/strh/strf
    * headers, one '00db' chunk per frame carrying the BMP pixel format —
    * bottom-up BGR with 4-byte row padding, non-trivial at width 7), then
    * [[graft.operators.Multimodal.aviFrameStats]] REALLY walks the
    * two-level RIFF tree back and decodes every frame. Judged per
    * (asset, frame): geometry, µs-per-frame from the avih header,
    * per-channel means, and the frame's TOP-LEFT pixel luminance
    * (order-SENSITIVE — a forgotten row flip, BGR swap, or frame-order
    * scramble matches means but not the corner/frame pair). The DuckDB
    * oracle replays the arithmetic from the SOURCE text; the spec
    * additionally pins each decoded frame byte-identical to what the
    * JDK's independent ImageIO reads from the same DIB bytes wrapped as
    * a BMP. */
  val m7 = QueryDef("m7_avi_frame_stats",
    (s, dir) => {
      // m3's ASCII-gate contract; 63 bytes per 7×3 frame, ≤4 frames
      val docs = Tables.documents(s, dir)
        .filter(col("text").rlike("^[\\x00-\\x7F]*$"))
        .filter(length(col("text")) >= 63)
        .select(col("doc_id"), col("text"))
      val schema = StructType(Seq(StructField("asset_id", LongType),
        StructField("content", BinaryType)))
      val assets = s.createDataFrame(docs.rdd.mapPartitions { it =>
        it.map { row =>
          val text = row.getString(1)
          val nf = math.min(text.length / 63, 4)
          val frames = (0 until nf).map(f =>
            text.substring(63 * f, 63 * (f + 1)).getBytes("US-ASCII"))
          org.apache.spark.sql.Row(row.getLong(0),
            graft.operators.Multimodal.encodeAviDib(7, 3, 40000, frames))
        }
      }, schema)
      graft.operators.Multimodal.aviFrameStats(assets)
        .select(col("asset_id"), col("frame_idx"), col("width"), col("height"),
          col("us_per_frame"),
          round(col("mean_r"), 6).as("mean_r"),
          round(col("mean_g"), 6).as("mean_g"),
          round(col("mean_b"), 6).as("mean_b"),
          round(col("first_luma"), 6).as("first_luma"))
        .orderBy("asset_id", "frame_idx")
    },
    Some("""WITH d AS (
        SELECT doc_id, text, CAST(least(len(text) // 63, 4) AS INT) AS nf
        FROM documents
        WHERE regexp_full_match(text, '[\x00-\x7F]*') AND len(text) >= 63),
      px AS (SELECT doc_id, CAST(f AS INT) AS frame_idx, CAST(p AS BIGINT) AS p,
          ascii(substr(text, CAST(63 * f + 3 * p + 1 AS INT), 1)) AS r,
          ascii(substr(text, CAST(63 * f + 3 * p + 2 AS INT), 1)) AS g,
          ascii(substr(text, CAST(63 * f + 3 * p + 3 AS INT), 1)) AS b
        FROM d, UNNEST(generate_series(0, nf - 1)) AS uf(f),
             UNNEST(generate_series(0, 20)) AS up(p))
      SELECT doc_id AS asset_id, frame_idx, CAST(7 AS INT) AS width,
        CAST(3 AS INT) AS height, CAST(40000 AS INT) AS us_per_frame,
        ROUND(AVG(r), 6) AS mean_r,
        ROUND(AVG(g), 6) AS mean_g,
        ROUND(AVG(b), 6) AS mean_b,
        ROUND(MAX(CASE WHEN p = 0
          THEN 0.299 * CAST(r AS DOUBLE) + 0.587 * CAST(g AS DOUBLE)
             + 0.114 * CAST(b AS DOUBLE) END), 6) AS first_luma
      FROM px GROUP BY doc_id, frame_idx ORDER BY asset_id, frame_idx"""))

  /** Hard-negative mining for embedding training — the pair-mining pass
    * behind every contrastive fine-tune (DPR/SimCSE-style): per query, the
    * top-3 highest-cosine candidates with a DIFFERENT label (the hardest
    * negatives — most confusable under the current embedding) plus the
    * margin against the best same-label positive (margin ≤ 0 means a
    * negative outranks every positive — the rows a trainer most wants).
    * Scale: corpus × broadcast(20-query batch), e2's exact-baseline
    * contract — at fleet scale the query side stays a bounded batch and
    * the corpus side streams. Cosines ride the codegen'd
    * [[graft.functions.VectorExprs.cosine]]; ordering on round(·, 9) with
    * id tie-break and the zero-norm→NULL pin (coalesce −2.0) keep both
    * engines on identical bits — the e2/e17-proven construction. */
  val e18 = QueryDef("e18_hard_negative_mining",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .filter(col("embedding").isNotNull && col("label").isNotNull)
      val q = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("label").as("query_label"),
          col("embedding").as("qv"))
      val scored = emb
        .select(col("vec_id").as("neighbor_id"), col("label").as("neg_label"),
          col("embedding").as("cv"))
        .crossJoin(broadcast(q))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("cosine",
          graft.functions.VectorExprs.cosine(col("qv"), col("cv")))
      val bestPos = scored.filter(col("neg_label") === col("query_label"))
        .groupBy("query_id").agg(max(col("cosine")).as("best_pos"))
      val w = Window.partitionBy("query_id")
        .orderBy(round(coalesce(col("cosine"), lit(-2.0)), 9).desc,
          col("neighbor_id").asc)
      scored.filter(col("neg_label") =!= col("query_label"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .join(bestPos, Seq("query_id"), "left")
        .select(col("query_id"), col("query_label"), col("rank"),
          col("neighbor_id").as("neg_id"), col("neg_label"),
          round(col("cosine"), 4).as("neg_cos_r"),
          round(col("best_pos") - col("cosine"), 4).as("margin_r"))
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH e AS (SELECT vec_id, label, embedding FROM embeddings
        WHERE embedding IS NOT NULL AND label IS NOT NULL),
      q AS (SELECT vec_id AS query_id, label AS query_label, embedding AS qv
        FROM e WHERE vec_id < 20),
      pr AS (SELECT q.query_id, q.query_label, c.vec_id AS neighbor_id,
          c.label AS neg_label,
          ${QueryDef.cosSql64("q.qv", "c.embedding")} AS cosine
        FROM q CROSS JOIN e c WHERE c.vec_id <> q.query_id),
      bp AS (SELECT query_id, MAX(cosine) AS best_pos FROM pr
        WHERE neg_label = query_label GROUP BY 1),
      ng AS (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY round(coalesce(cosine, -2.0), 9) DESC, neighbor_id ASC)
          AS rank
        FROM pr WHERE neg_label <> query_label)
      SELECT ng.query_id, ng.query_label, CAST(rank AS INT) AS rank,
        neighbor_id AS neg_id, neg_label,
        ROUND(cosine, 4) AS neg_cos_r,
        ROUND(bp.best_pos - cosine, 4) AS margin_r
      FROM ng LEFT JOIN bp ON bp.query_id = ng.query_id
      WHERE rank <= 3 ORDER BY ng.query_id, rank"""))

  /** IVF recall on a CLUSTERED corpus (r12 verdict task 4): e7's ≥0.8
    * envelope is calibrated on the near-random testdata embeddings — the
    * documented WORST case for a space-partitioning index, where cell
    * membership carries almost no neighbor signal. Users deploy IVF on
    * clustered embeddings, where far fewer probes reach the same recall —
    * this query pins that claim as a judged boolean on a deterministic
    * planted-Gaussian-blob-style fixture: 8 anchor blobs (vector =
    * anchor(vec_id % 8) + 0.05 × own vector — a tight deterministic
    * "Gaussian" cloud around each anchor, no RNG) plus a 20% noise floor
    * of untouched near-random vectors (vec_id % 10 ≥ 8). Queries are blob
    * members; with nCells = 10 the fit places centroids on the blobs, a
    * query's true top-5 are blob-mates in its own (or a split-blob
    * sibling) cell, and nProbe = 2 — A THIRD of e7's 6 — already clears a
    * HIGHER bound (recall@5 ≥ 0.9; green at all 3 judged SFs on arrival.
    * Measured sf0.001 curves, TextVectorSpec recall-curve spec: clustered
    * 1.000 at EVERY nProbe ∈ {1,2,4,6,8} vs near-random 0.287 / 0.487 /
    * 0.733 / 0.847 / 0.947 — clustering buys ~4× fewer probes at equal
    * recall, which is the deployment claim e7 alone could not judge).
    * The oracle asserts the verdict like e7's: same query-set size, TRUE. */
  /** The clustered-corpus fixture, shared with the TextVectorSpec recall
    * CURVE (nProbe ∈ {1,2,4,6,8} on both corpus classes). */
  private[graft] def e19Fixture(s: org.apache.spark.sql.SparkSession,
                                dir: String): org.apache.spark.sql.DataFrame = {
    val emb = Tables.embeddings(s, dir).filter(col("embedding").isNotNull)
    val anchors = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("__blob"), col("embedding").as("__anchor"))
    emb.select(col("vec_id"), (col("vec_id") % 8).as("__blob"),
        col("embedding"))
      .join(broadcast(anchors), Seq("__blob"))
      .select(col("vec_id"),
        when(col("vec_id") % 10 >= 8, col("embedding"))
          .otherwise(zip_with(col("__anchor"), col("embedding"),
            (a, v) => (a + lit(0.05f) * v).cast(FloatType))).as("embedding"))
      // multi-consumer fixture (brute both sides, kmeans, cells, queries)
      .localCheckpoint(false)
  }

  val e19 = QueryDef("e19_ivf_recall_clustered",
    (s, dir) => {
      val fix = e19Fixture(s, dir)
      val queries = fix.filter(col("vec_id") < 40 && col("vec_id") % 10 < 8)
      val brute = Similarity.bruteForceTopK(queries, fix, "vec_id", "embedding",
          k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val centroids = Similarity.kmeansCentroids(fix, "embedding", k = 10)
      val cells = Similarity.assignCells(fix, centroids, "vec_id", "embedding")
      val ivf = Similarity.ivfTopK(
        queries.select(col("vec_id").as("query_id"), col("embedding").as("qv")),
        cells, centroids, k = 5, nProbe = 2)
        .select(col("query_id"), col("neighbor_id"))
      val hits = brute.join(ivf, Seq("query_id", "neighbor_id"), "left_semi")
      brute.agg(count(lit(1)).as("__n_exact"))
        .crossJoin(hits.agg(count(lit(1)).as("__n_hit")))
        .crossJoin(queries.agg(count(lit(1)).as("n_queries")))
        .select(col("n_queries"),
          (col("__n_hit").cast(DoubleType) / col("__n_exact").cast(DoubleType)
            >= 0.9).as("recall_ok"))
    },
    Some("""SELECT COUNT(*) AS n_queries, TRUE AS recall_ok
      FROM embeddings
      WHERE embedding IS NOT NULL AND vec_id < 40 AND vec_id % 10 < 8"""))
}
