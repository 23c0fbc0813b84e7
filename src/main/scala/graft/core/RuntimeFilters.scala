package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Runtime-filter joins: cut the big side of a selective join BEFORE its
  * shuffle with a Bloom filter built from the small side — the pattern
  * Spark's own InjectRuntimeFilter applies when statistics allow, made
  * explicit so pipelines can force it.
  *
  * At 100 TB the win is shuffle volume: a semi-join on a selective
  * dimension otherwise shuffles every big-side row to its hash partition
  * first and discards most of them after the join; the Bloom prefilter
  * discards them at the scan, paying only a broadcast of a few MB of filter
  * bits (shipped inside the task closure, torrent-broadcast by Spark).
  *
  * Exactness: Bloom filters have false positives but no false negatives,
  * so `prefilter` keeps a superset of the matching rows, and the exact
  * semi-join afterwards removes the stragglers — the result equals the
  * plain semi-join row-for-row (pinned by RuntimeFiltersSpec and the
  * d16 oracle).
  */
object RuntimeFilters {

  /** Bloom prefilter predicate for `bigKey`, built by scanning `smallKeys`
    * (one job; the small side should be the already-filtered dimension). */
  def bloomPredicate(small: DataFrame, smallKey: String, bigKey: Column,
                     expectedItems: Long = 4000000L,
                     fpp: Double = 0.03): Column = {
    val bf: BloomFilter = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bf.mightContainLong(k))
    mightContain(bigKey.cast("long"))
  }

  /** Exact semi-join of `big` against `small`'s key set, with the Bloom
    * prefilter applied to `big` before the join shuffle. */
  def bloomSemiJoin(big: DataFrame, bigKey: String,
                    small: DataFrame, smallKey: String,
                    expectedItems: Long = 4000000L,
                    fpp: Double = 0.03): DataFrame = {
    val pred = bloomPredicate(small, smallKey, col(bigKey), expectedItems, fpp)
    big.filter(col(bigKey).isNotNull && pred)
      .join(small.select(col(smallKey).as(bigKey)).distinct(),
        Seq(bigKey), "left_semi")
  }
}
