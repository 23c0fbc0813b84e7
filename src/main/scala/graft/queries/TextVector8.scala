package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Similarity

/** Eleventh coverage batch (round 8): judged surfaces for the previously
  * spec-only ML fit interiors — the production [[Similarity.pqTrain]]
  * per-subspace KMeans path. */
object TextVector8 {

  def defs: Seq[QueryDef] = Seq(e10, d56)

  /** Line-level C4 rules (Raffel et al. 2020, arXiv:1910.10683 §2.2 and
    * the released TF c4.py) — the rules d50 could not judge on the
    * driver's single-line corpus (the documented TextVector6 boundary,
    * round-7 verdict task 4): keep a line iff it ends in terminal
    * punctuation (./!/?/closing quote), has ≥ 5 words, does not mention
    * javascript, and is not cookie/policy boilerplate. Judged surface =
    * one row per (doc, line) with every rule's verdict. Multi-line
    * twins are injected deterministically (the d35 pattern): every
    * doc_id % 10 == 0 gains four crafted lines that each fail exactly
    * one rule plus one line that passes all — so every verdict polarity
    * is non-empty at every SF, and the remaining docs judge their single
    * line organically. The oracle replays the injection and the line
    * split (string_split on chr(10)) and every rule in DuckDB.
    * Scale shape: one narrow posexplode per doc (fan-out = line count),
    * all verdicts codegen'd scalar exprs, no shuffle before the ORDER BY
    * — a pure map at 100 TB. */
  val d56 = QueryDef("d56_c4_line_rules",
    (s, dir) => {
      val tail = "\nshort line" +
        "\nThis appended sentence definitely contains more than five words." +
        "\nEnable javascript to view this page." +
        "\nThis website uses cookies to improve your browsing experience." +
        "\nA trailing line with many words but no terminal punctuation at all"
      val multi = Tables.documents(s, dir).select(col("doc_id"),
        when(col("doc_id") % 10 === 0, concat(col("text"), lit(tail)))
          .otherwise(col("text")).as("text2"))
      val lines = multi
        .select(col("doc_id"), posexplode(split(col("text2"), "\n", -1)))
        .select(col("doc_id"), (col("pos") + 1).as("line_no"),
          col("col").as("line"))
      val lowered = lower(col("line"))
      val policyPhrases = Seq("terms of use", "privacy policy",
        "cookie policy", "uses cookies", "use of cookies", "use cookies")
      val verdicts = lines.select(
        col("doc_id"), col("line_no"),
        size(split(trim(col("line")), "\\s+")).cast("long").as("n_words"),
        substring(rtrim(col("line")), -1, 1).isin(".", "!", "?", "\"")
          .as("ends_terminal"),
        lowered.contains("javascript").as("has_js"),
        policyPhrases.map(p => lowered.contains(p)).reduce(_ || _)
          .as("has_policy"))
      verdicts
        .withColumn("line_kept",
          col("ends_terminal") && col("n_words") >= 5 &&
            !col("has_js") && !col("has_policy"))
        .orderBy("doc_id", "line_no")
    },
    Some("""WITH m AS (SELECT doc_id,
        CASE WHEN doc_id % 10 = 0 THEN text
          || chr(10) || 'short line'
          || chr(10) || 'This appended sentence definitely contains more than five words.'
          || chr(10) || 'Enable javascript to view this page.'
          || chr(10) || 'This website uses cookies to improve your browsing experience.'
          || chr(10) || 'A trailing line with many words but no terminal punctuation at all'
        ELSE text END AS text2 FROM documents),
      sp AS (SELECT doc_id, string_split(text2, chr(10)) AS ln FROM m),
      l AS (SELECT doc_id, CAST(i AS INT) AS line_no, ln[i] AS line
        FROM sp, UNNEST(generate_series(1, len(ln))) AS u(i)),
      v AS (SELECT doc_id, line_no,
        CAST(len(regexp_split_to_array(trim(line), '\s+')) AS BIGINT) AS n_words,
        right(rtrim(line), 1) IN ('.', '!', '?', '"') AS ends_terminal,
        contains(lower(line), 'javascript') AS has_js,
        (contains(lower(line), 'terms of use')
          OR contains(lower(line), 'privacy policy')
          OR contains(lower(line), 'cookie policy')
          OR contains(lower(line), 'uses cookies')
          OR contains(lower(line), 'use of cookies')
          OR contains(lower(line), 'use cookies')) AS has_policy
      FROM l)
      SELECT doc_id, line_no, n_words, ends_terminal, has_js, has_policy,
        (ends_terminal AND n_words >= 5 AND NOT has_js AND NOT has_policy)
          AS line_kept
      FROM v ORDER BY doc_id, line_no"""))

  /** Oracle-gated run of the PRODUCTION pqTrain path — the real MLlib
    * KMeans per subspace, not the e8/e9 anchor-derived stand-in
    * (closes the round-7 "unjudged fit interiors" gap for PQ).
    *
    * Fixture: every corpus vector is replaced by an exact copy of anchor
    * vec_id % 4 ∈ {0,1,2,3} — four well-separated blobs of IDENTICAL
    * points (one broadcast join; blob sizes ≈ n/4 at every SF). On such a
    * corpus the per-subspace k-means optimum is unique with cost 0: the
    * four anchor subvectors themselves. MLlib reaches it
    * deterministically — k-means|| samples candidate centers only from
    * data points with probability proportional to their current cost, so
    * duplicates of an already-chosen center (cost 0) are never sampled
    * and the distinct anchor points are the only possible centers; Lloyd
    * then fixes them (each center's cluster mean is the center itself, up
    * to mean-of-N-identical-doubles accumulation, ≤ ulps, absorbed by
    * round(6)). If two anchors COINCIDE in some subspace slice the
    * guarded fit ([[Similarity]] fitCenters) clamps k to the distinct
    * count — and the oracle's DISTINCT collapses identically, so the gate
    * still matches. Centroid ORDER is an MLlib internal, so the judged
    * claim is the SET of codewords: sorted lexicographically per
    * subspace, flattened to one row per (s, cw_rank, i) component.
    * The oracle re-derives the unique optimum relationally: the distinct
    * per-subspace anchor slices in the same lexicographic order. */
  val e10 = QueryDef("e10_pq_train_codebook",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val anchors = emb.filter(col("vec_id") < 4)
        .select(col("vec_id").as("aid"), col("embedding").as("avec"))
      val fixture = emb.select(col("vec_id"), (col("vec_id") % 4).as("aid"))
        .join(broadcast(anchors), "aid")
        .select(col("vec_id"), col("avec").as("embedding"))
      val cb = Similarity.pqTrain(fixture, "embedding", dim = 64, m = 8,
        k = 4, seed = 7L, maxIter = 8)
      import scala.math.Ordering.Implicits.seqOrdering
      val flat = for {
        (subCb, si) <- cb.zipWithIndex.toSeq
        (cw, r) <- subCb.map(_.toSeq).sorted.zipWithIndex
        (c, i) <- cw.zipWithIndex
      } yield (si, r + 1, i + 1, c)
      val spark = s
      import spark.implicits._
      flat.toDF("s", "cw_rank", "i", "c")
        .select(col("s"), col("cw_rank"), col("i"), round(col("c"), 6).as("c_r"))
        .orderBy("s", "cw_rank", "i")
    },
    Some("""WITH sl AS (
        SELECT DISTINCT s,
          list_transform(range(1, 9), i -> CAST(embedding[s*8+i] AS DOUBLE)) AS cw
        FROM embeddings CROSS JOIN (SELECT UNNEST(generate_series(0, 7)) AS s)
        WHERE vec_id < 4),
      r AS (SELECT s, cw,
          row_number() OVER (PARTITION BY s ORDER BY cw) AS cw_rank
        FROM sl)
      SELECT CAST(s AS INT) AS s, CAST(cw_rank AS INT) AS cw_rank,
        CAST(i AS INT) AS i, round(cw[i], 6) AS c_r
      FROM r, UNNEST(generate_series(1, 8)) AS u(i)
      ORDER BY s, cw_rank, i"""))
}
