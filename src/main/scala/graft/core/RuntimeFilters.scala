package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType
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
    * The probe is Spark's native `might_contain` expression — the same
    * `BloomFilterMightContain` that backs InjectRuntimeFilter, codegen'd
    * and fed the serialized filter as a foldable binary literal — NOT a
    * Scala udf, which would break whole-stage codegen exactly on the hot
    * scan stage the prefilter exists to keep cheap.
    *
    * Probe and build must hash the same representation:
    * `BloomFilterMightContain` probes with `mightContainLong`, so both
    * key types are funneled to longs — integral keys by cast (lossless),
    * strings by `xxhash64` applied identically at build and probe (a
    * deterministic hash on both sides preserves the no-false-negative
    * guarantee; it only stacks a second, negligible FP source). Any other
    * key type is rejected up front rather than silently producing false
    * NEGATIVES from a representation mismatch.
    *
    * `expectedItems <= 0` (the default) sizes the filter from an actual
    * count of the build side — one extra cheap pass over the (by
    * construction small, already-filtered) dimension. A fixed oversize
    * wastes broadcast bytes AND build time proportional to the capacity,
    * not the content: the old 4M default was a 3.6 MB task-binary rider
    * on a 30k-row build side. */
  def bloomPredicate(small: DataFrame, smallKey: String, big: DataFrame,
                     bigKey: String, expectedItems: Long = -1L,
                     fpp: Double = 0.03): Column = {
    import org.apache.spark.sql.types._
    val bigType = big.schema(bigKey).dataType
    val smallType = small.schema(smallKey).dataType
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    val (buildKey: Column, probeKey: Column) = (bigType, smallType) match {
      case (b, s) if integral(b) && integral(s) =>
        (col(smallKey).cast("long"), col(bigKey).cast("long"))
      case (StringType, StringType) =>
        // xxhash64(null) is the SEED (a real long), not null — probe must
        // map null keys to null explicitly or they'd pass the prefilter
        (xxhash64(col(smallKey)),
          when(col(bigKey).isNull, lit(null).cast("long"))
            .otherwise(xxhash64(col(bigKey))))
      case (b, s) => throw new IllegalArgumentException(
        s"bloomSemiJoin supports integral or string keys on both sides, " +
          s"got $bigKey: ${b.simpleString} vs $smallKey: ${s.simpleString}")
    }
    // Null build-side keys never match any probe (semi-join semantics), but
    // left in they would (a) insert xxhash64's seed value on the string path
    // and (b) inflate the auto-size count — both silent extra-FP sources.
    // Duplicates still count toward sizing: deduping costs a shuffle and an
    // oversized filter only lowers the FP rate.
    val build = small.filter(col(smallKey).isNotNull)
    val items =
      if (expectedItems > 0) expectedItems else math.max(build.count(), 64L)
    val bf: BloomFilter =
      build.select(buildKey.as("__k")).stat.bloomFilter("__k", items, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    // null probe → null → dropped by filter, matching semi-join semantics.
    // BloomFilterMightContain is not in the public FunctionRegistry, so the
    // expression is constructed directly and bridged back to a Column.
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bos.toByteArray, BinaryType),
      ColumnBridge.expression(probeKey)))
  }

  /** Exact semi-join of `big` against `small`'s key set, with the Bloom
    * prefilter applied to `big` before the join shuffle. */
  def bloomSemiJoin(big: DataFrame, bigKey: String,
                    small: DataFrame, smallKey: String,
                    expectedItems: Long = -1L,
                    fpp: Double = 0.03): DataFrame = {
    val pred = bloomPredicate(small, smallKey, big, bigKey, expectedItems, fpp)
    big.filter(col(bigKey).isNotNull && pred)
      .join(small.select(col(smallKey).as(bigKey)).distinct(),
        Seq(bigKey), "left_semi")
  }
}
