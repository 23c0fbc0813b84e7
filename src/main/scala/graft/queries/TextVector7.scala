package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.core.Tables
import graft.functions.TextFns

/** Tenth coverage batch: the corpus OUTPUT-side moves — normalization-keyed
  * deduplication (CCNet's dedup normalizer) and the deterministic global
  * shuffle + sharding that lays a corpus out for training. */
object TextVector7 {

  def defs: Seq[QueryDef] = Seq(d51, d52, d53)

  /** CCNet normalization-keyed exact dedup: hash the NORMALIZED text
    * ([[TextFns.ccnetNormalize]] — lowercase, accent fold, digits→0,
    * punctuation strip, whitespace collapse) so trivially-variant docs
    * collide where d1's raw-byte hash would not. Scale shape = d1's: one
    * md5-key shuffle for cluster sizes, broadcast-free join back on the
    * hash. Judged per doc: normalized length, hash, cluster size, dup
    * flag. */
  val d51 = QueryDef("d51_ccnet_norm_dedup",
    (s, dir) => {
      val h = Tables.documents(s, dir)
        .select(col("doc_id"), TextFns.ccnetNormalize(col("text")).as("__norm"))
        .select(col("doc_id"),
          length(col("__norm")).cast(LongType).as("n_norm_chars"),
          md5(col("__norm")).as("norm_hash"))
      val clusters = h.groupBy("norm_hash").agg(count(lit(1)).as("n_same"))
      h.join(clusters, Seq("norm_hash"))
        .select(col("doc_id"), col("n_norm_chars"), col("norm_hash"),
          col("n_same"), (col("n_same") > 1).as("is_dup"))
        .orderBy("doc_id")
    },
    Some(s"""WITH n AS (SELECT doc_id,
        trim(regexp_replace(regexp_replace(regexp_replace(
          translate(lower(text), '${TextFns.accentFrom}', '${TextFns.accentTo}'),
          '[0-9]', '0', 'g'), '[^a-z0 \\t\\n\\r\\f]', '', 'g'),
          '[ \\t\\n\\r\\f]+', ' ', 'g')) AS norm
        FROM documents),
      h AS (SELECT doc_id, CAST(length(norm) AS BIGINT) AS n_norm_chars,
          md5(norm) AS norm_hash FROM n),
      c AS (SELECT norm_hash, count(*) AS n_same FROM h GROUP BY 1)
      SELECT doc_id, n_norm_chars, norm_hash, n_same, (n_same > 1) AS is_dup
      FROM h JOIN c USING (norm_hash) ORDER BY doc_id"""))

  /** Corpus datacard — the per-(source, lang) statistics rollup every
    * released dataset publishes (datasheets/data cards: size, token and
    * char mass, length distribution, duplication): doc/token/char counts,
    * exact median token count (the q10 percentile ↔ quantile_cont
    * parity), CORPUS-WIDE exact-dup incidence attributed per group
    * (md5(text) appearing >1 anywhere — d1's key), dup rate in exact
    * integer basis points, and the share of docs meeting Gopher's 50-word
    * floor. One tokenize scan (lazy checkpoint feeds both the dup-key
    * counts and the rollup); two shuffles (hash counts, group rollup) —
    * the whole card is one pass over the corpus at any scale. */
  val d53 = QueryDef("d53_corpus_datacard",
    (s, dir) => {
      val perDoc = Tables.documents(s, dir)
        .select(col("source"), col("lang"), col("n_chars"),
          size(TextFns.tokens(col("text"))).cast(LongType).as("n_toks"),
          md5(col("text")).as("h"))
        .localCheckpoint(false)
      val dupCounts = perDoc.groupBy("h").agg(count(lit(1)).as("n_same"))
      perDoc.join(dupCounts, Seq("h"))
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("n_tokens"),
          sum(col("n_chars")).as("sum_chars"),
          percentile(col("n_toks"), lit(0.5)).as("median_tokens"),
          count(when(col("n_same") > 1, 1)).as("n_dup_docs"),
          count(when(col("n_toks") >= 50, 1)).as("n_ge50_tokens"))
        .withColumn("dup_rate_bp", expr("n_dup_docs * 10000 DIV n_docs"))
        // explicit nulls-first on BOTH engines: Spark's asc default is
        // NULLS FIRST, DuckDB's is NULLS LAST — a NULL lang row (the
        // pathological-corpus class) would otherwise order differently
        .orderBy(col("source").asc_nulls_first, col("lang").asc_nulls_first)
    },
    Some("""WITH d AS (SELECT source, lang, n_chars,
          CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_toks,
          md5(text) AS h
        FROM documents),
      c AS (SELECT h, count(*) AS n_same FROM d GROUP BY 1)
      SELECT source, lang, count(*) AS n_docs,
        CAST(sum(n_toks) AS BIGINT) AS n_tokens,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        quantile_cont(n_toks, 0.5) AS median_tokens,
        count(CASE WHEN n_same > 1 THEN 1 END) AS n_dup_docs,
        count(CASE WHEN n_toks >= 50 THEN 1 END) AS n_ge50_tokens,
        count(CASE WHEN n_same > 1 THEN 1 END) * 10000
          // count(*) AS dup_rate_bp
      FROM d JOIN c USING (h)
      GROUP BY source, lang
      ORDER BY source NULLS FIRST, lang NULLS FIRST"""))

  /** Deterministic global shuffle + strided sharding — the "shuffle the
    * corpus, write N interleaved shards" layout step every training run
    * consumes. Shuffle order = md5 of the id (content-stable, never
    * rand()); the global position comes from the scale-safe
    * [[graft.core.Indexing.globalRowIds]] (bucketed two-pass, no
    * single-partition window — the q84 machinery on a new surface);
    * shard = position mod N interleaves the shuffled order so every
    * shard is an unbiased corpus sample of equal size ±1. The oracle
    * replays with the single-partition row_number it is proven
    * row-identical to. */
  val d52 = QueryDef("d52_shuffle_shards",
    (s, dir) => {
      val hkey = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast(LongType)
      val keyed = Tables.documents(s, dir)
        .select(col("doc_id"), hkey.as("hkey"))
      graft.core.Indexing.globalRowIds(keyed, "hkey", "position",
          tieBreak = Seq("doc_id"))
        .select(col("doc_id"), col("hkey"), col("position"),
          expr("position % 8").as("shard"),
          expr("position DIV 8").as("pos_in_shard"))
        .orderBy("doc_id")
    },
    Some("""WITH k AS (SELECT doc_id,
        CAST(CONCAT('0x', SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
          AS hkey
        FROM documents),
      p AS (SELECT doc_id, hkey,
          row_number() OVER (ORDER BY hkey ASC, doc_id ASC) - 1 AS position
        FROM k)
      SELECT doc_id, hkey, position, position % 8 AS shard,
        position // 8 AS pos_in_shard
      FROM p ORDER BY doc_id"""))
}
