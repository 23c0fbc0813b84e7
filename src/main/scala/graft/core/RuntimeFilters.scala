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
    * (one job; the small side should be the already-filtered dimension).
    * Probe and build must hash the same representation: integral keys go
    * through the long path on both sides (Spark's bloomFilter inserts
    * integral columns with putLong), strings through the string path —
    * any other key type is rejected up front rather than silently
    * producing false NEGATIVES from a representation mismatch. */
  def bloomPredicate(small: DataFrame, smallKey: String, big: DataFrame,
                     bigKey: String, expectedItems: Long = 4000000L,
                     fpp: Double = 0.03): Column = {
    import org.apache.spark.sql.types._
    val bigType = big.schema(bigKey).dataType
    val smallType = small.schema(smallKey).dataType
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    (bigType, smallType) match {
      case (b, s) if integral(b) && integral(s) =>
        val smallLong = small.select(col(smallKey).cast("long").as(smallKey))
        val bf: BloomFilter = smallLong.stat.bloomFilter(smallKey, expectedItems, fpp)
        val mightContain = udf((k: java.lang.Long) =>
          k != null && bf.mightContainLong(k))
        mightContain(col(bigKey).cast("long"))
      case (StringType, StringType) =>
        val bf: BloomFilter = small.stat.bloomFilter(smallKey, expectedItems, fpp)
        val mightContain = udf((k: String) =>
          k != null && bf.mightContainString(k))
        mightContain(col(bigKey))
      case (b, s) => throw new IllegalArgumentException(
        s"bloomSemiJoin supports integral or string keys on both sides, " +
          s"got $bigKey: ${b.simpleString} vs $smallKey: ${s.simpleString}")
    }
  }

  /** Exact semi-join of `big` against `small`'s key set, with the Bloom
    * prefilter applied to `big` before the join shuffle. */
  def bloomSemiJoin(big: DataFrame, bigKey: String,
                    small: DataFrame, smallKey: String,
                    expectedItems: Long = 4000000L,
                    fpp: Double = 0.03): DataFrame = {
    val pred = bloomPredicate(small, smallKey, big, bigKey, expectedItems, fpp)
    big.filter(col(bigKey).isNotNull && pred)
      .join(small.select(col(smallKey).as(bigKey)).distinct(),
        Seq(bigKey), "left_semi")
  }
}
