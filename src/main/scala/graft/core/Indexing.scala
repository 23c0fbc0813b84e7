package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Distributed global row numbering.
  *
  * The naive form — `row_number().over(Window.orderBy(key))` — plans an
  * empty-partition Window: EVERY row moves to one task, which is the
  * single most common accidental scale killer (fine at 60k rows, dead at
  * 100 TB). The scalable shape assigns ids in two distributed passes:
  *
  *   1. bucket each row by a MONOTONE function of the key (fixed-width
  *      ranges from a min/max pre-aggregate; null keys take a reserved
  *      bucket BELOW every real one, mirroring ASC NULLS FIRST);
  *   2. per-bucket local row_number (one shuffle, partitioned by bucket)
  *      plus the exclusive prefix sum of bucket counts (a BROADCAST of at
  *      most `nBuckets`+1 longs) — id = offset(bucket) + local - 1.
  *
  * Bucket boundaries affect only load balance, never the result: offsets
  * absorb any size skew, so ids are exactly `row_number over (order by
  * key asc nulls first, tieBreak) - 1` for every input row — none dropped,
  * none shifted. Equivalent to RDD zipWithIndex but staying in DataFrame
  * land (codegen, AQE, no lineage break).
  *
  * Input scans: one narrow scan for bounds, one narrow scan for the bucket
  * histogram (both prune to the key column on columnar sources), one full
  * scan producing the output. Deliberately NOT cached: at the scale this
  * exists for, two extra column-pruned scans are cheaper than materializing
  * the full input, and the function leaks no persisted state. */
object Indexing {

  /** Append a dense 0-based `idCol` ordered by (key ASC NULLS FIRST,
    * tieBreak...). The key must be numeric (monotone bucketing needs
    * arithmetic); tie-break columns make the ordering total when keys
    * repeat.
    *
    * `withinOrder`, when non-empty, replaces the within-bucket sort order.
    * Bucket assignment still follows `key`, so the override must agree with
    * the bucketing: any total order that refines the (possibly lossy)
    * double-cast bucket order is safe, because rows that the double cast
    * cannot distinguish land in the same bucket and the override alone
    * decides their relative ids. Used by globalNtile's descending path to
    * sort by the EXACT original key while bucketing by its negated double. */
  /** Monotone bucket expression for `key` over `df` — the shared first
    * pass of the two-pass builders below. Collects finite min/max (one
    * narrow scan: NaN would poison hi — Spark's max ranks NaN above any
    * double — and a single ±Infinity would drive width to Infinity,
    * collapsing every finite key into bucket 0, the single-task window
    * this module exists to avoid), then buckets monotone and clamped.
    * Reserved buckets mirror Spark's double ordering: null FIRST (-1),
    * then -Inf (edge of bucket 0 — within-bucket sort keeps it ahead of
    * the finite keys sharing the bucket), finite, +Inf (edge of the last
    * real bucket), NaN LAST (nBuckets). So double keys containing
    * NaN/±Inf keep the documented "none dropped, none shifted" contract
    * instead of vanishing on the bucket equi-join or degenerating to one
    * bucket. */
  private def monotoneBucket(df: DataFrame, key: String, nBuckets: Int,
                             knownBounds: Option[(Double, Double)]): Column = {
    val k = col(key).cast(DoubleType)
    val finite = !isnan(k) && k > Double.NegativeInfinity && k < Double.PositiveInfinity
    val (lo, hi) = knownBounds.getOrElse {
      val Array(bounds) = df.agg(
        min(when(finite, k)).as("lo"),
        max(when(finite, k)).as("hi")).collect()
      if (bounds.isNullAt(0)) (0.0, 0.0) // no finite keys: one real bucket, unused
      else (bounds.getDouble(0), bounds.getDouble(1))
    }
    val width = (hi - lo) / nBuckets.toDouble
    val realBucket = if (width == 0.0) lit(0)
      else least(floor((k - lit(lo)) / lit(width)).cast(IntegerType), lit(nBuckets - 1))
    when(col(key).isNull, lit(-1))
      .when(isnan(k), lit(nBuckets))
      .when(k === Double.NegativeInfinity, lit(0))
      .when(k === Double.PositiveInfinity, lit(nBuckets - 1))
      .otherwise(realBucket)
  }

  def globalRowIds(df: DataFrame, key: String, idCol: String,
                   nBuckets: Int = 1024, tieBreak: Seq[String] = Nil,
                   withinOrder: Seq[Column] = Nil,
                   knownBounds: Option[(Double, Double)] = None): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    // knownBounds skips the min/max pre-scan when the caller can bound the
    // finite key range a priori (e.g. rank values are counts in [1, N]).
    // Correctness only needs hi >= max and lo <= min — the least()/floor()
    // clamps keep out-of-range keys in real buckets; looser bounds cost
    // only balance. Callers with possible NaN/±Inf keys still get the
    // reserved buckets (those branch before the range math). An iterative
    // caller (the suffix-array build: one globalRowIds per doubling round)
    // saves a full input scan per round.
    val bucketCol = monotoneBucket(df, key, nBuckets, knownBounds)
    // narrow scan 2: the bucket histogram → exclusive prefix sum. The
    // window runs over ≤ nBuckets+1 rows (the REDUCED set), then ships to
    // every task as a broadcast.
    val counts = df.select(bucketCol.as("__bucket"))
      .groupBy("__bucket").agg(count(lit(1)).as("__n"))
    // the limit is a no-op (bucket values live in {-1, 0..nBuckets}, so the
    // grouped output holds <= nBuckets+2 rows) but it makes the bound
    // VISIBLE to PlanLint check 3: since r12 a grouped aggregate alone no
    // longer exempts the offset window below, and this window's input is
    // bounded by construction, not by reduction
    val offsets = counts.limit(nBuckets + 2)
      .withColumn("__offset",
        coalesce(sum(col("__n")).over(
          Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("__bucket", "__offset")
    // full scan: local row_number within each bucket + broadcast offset
    val order =
      if (withinOrder.nonEmpty) withinOrder
      else (col(key).asc_nulls_first +: tieBreak.map(col(_).asc))
    val local = row_number().over(
      Window.partitionBy("__bucket").orderBy(order: _*))
    df.withColumn("__bucket", bucketCol)
      .join(broadcast(offsets), Seq("__bucket"))
      .withColumn(idCol, col("__offset") + local - 1)
      .drop("__bucket", "__offset")
  }

  /** Append the EXCLUSIVE running sum of `weight` ordered by (key ASC
    * NULLS FIRST, tieBreak...) — the weighted generalization of
    * [[globalRowIds]] (weight ≡ 1 recovers id = exclusive prefix count).
    * Built for the training-layout step: global token offsets for
    * sequence packing (d62), byte offsets for shard manifests.
    *
    * Same two distributed passes: per-bucket weight totals → exclusive
    * bucket offsets (a window over ≤ nBuckets+1 rows, then a broadcast of
    * that many longs), plus a per-bucket exclusive window cumsum — the
    * naive `sum(w).over(Window.orderBy(key))` moves every row to one
    * task. The weight is cast to LONG (exact integer prefix sums — the
    * repo's DIV-not-`/` rule; doubles would silently lose exactness past
    * 2^53); null weights contribute 0 on both passes (SUM semantics).
    * (key, tieBreak) must totally order rows — globalRowIds' contract —
    * otherwise rows the order cannot separate would receive arbitrary
    * relative offsets. */
  def globalPrefixSum(df: DataFrame, key: String, weight: String, outCol: String,
                      nBuckets: Int = 1024, tieBreak: Seq[String] = Nil): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val w = col(weight).cast(LongType)
    val bucketCol = monotoneBucket(df, key, nBuckets, None)
    val sums = df.select(bucketCol.as("__bucket"), w.as("__w"))
      .groupBy("__bucket").agg(sum("__w").as("__bw"))
    // no-op limit for check-3 visibility — see globalRowIds
    val offsets = sums.limit(nBuckets + 2)
      .withColumn("__offset",
        coalesce(sum(col("__bw")).over(
          Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("__bucket", "__offset")
    val order = col(key).asc_nulls_first +: tieBreak.map(col(_).asc)
    val local = coalesce(sum(w).over(
      Window.partitionBy("__bucket").orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    df.withColumn("__bucket", bucketCol)
      .join(broadcast(offsets), Seq("__bucket"))
      .withColumn(outCol, col("__offset") + local)
      .drop("__bucket", "__offset")
  }

  /** Global SQL `rank()` over the total order (key ASC, order...) where
    * rows compare equal iff their `groupCols` tuple is equal — computed
    * with ONE bucket-partitioned sort instead of globalRowIds + a second
    * (group-partitioned) window. Built for iterative rank upgrades (the
    * suffix-array doubling round ranks (r, r2) pairs once per round; at
    * 40M positions the saved shuffle+sort per round is a third of the
    * build): rank = exclusive-bucket-offset + row_number of the FIRST row
    * of the row's group within its bucket, detected by a lag() over the
    * same window spec and propagated by a running max — all three window
    * functions share one (partition, order) so Catalyst plans a single
    * exchange + sort.
    *
    * Contract: `groupCols` must be a refinement constant within equal
    * (key, order) positions AND determine them (rows with equal
    * groupCols tuples must sort adjacently — true when `order` orders BY
    * the group columns), and every group must lie inside one bucket
    * (true when key is one of the group columns, since bucket = f(key)). */
  def globalGroupRank(df: DataFrame, key: String, order: Seq[Column],
                      groupCols: Seq[Column], outCol: String,
                      nBuckets: Int = 1024,
                      knownBounds: Option[(Double, Double)] = None): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val bucketCol = monotoneBucket(df, key, nBuckets, knownBounds)
    val counts = df.select(bucketCol.as("__bucket"))
      .groupBy("__bucket").agg(count(lit(1)).as("__n"))
    // no-op limit for check-3 visibility — see globalRowIds
    val offsets = counts.limit(nBuckets + 2)
      .withColumn("__offset",
        coalesce(sum(col("__n")).over(
          Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("__bucket", "__offset")
    val w = Window.partitionBy("__bucket").orderBy(order: _*)
    val g = struct(groupCols: _*)
    val rn = row_number().over(w)
    // first row of its group within the bucket: no predecessor, or the
    // predecessor belongs to a different group
    val isStart = coalesce(lag(g, 1).over(w) =!= g, lit(true))
    val startRn = max(when(isStart, rn)).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    df.withColumn("__bucket", bucketCol)
      .join(broadcast(offsets), Seq("__bucket"))
      .withColumn(outCol, col("__offset") + startRn)
      .drop("__bucket", "__offset")
  }

  /** Exact distributed ntile over (key, tieBreak) ordering — the scale-safe
    * form of `ntile(n).over(Window.orderBy(...))`, which moves EVERY row to
    * one task. Global row ids come from the bucketed two-pass above; the
    * tile is then pure arithmetic on the id, reproducing ntile's exact
    * fill rule (the first `total mod n` tiles hold one extra row), so the
    * result is row-identical to the single-partition window — pinned by
    * Coverage7Spec — while the plan's only windows are per-bucket.
    * Integral `div`, not `/`: double division would lose exactness past
    * 2^53 rows. One extra distributed count pass over the input. */
  def globalNtile(df: DataFrame, nTiles: Int, key: String, tileCol: String,
                  descending: Boolean = false, tieBreak: Seq[String] = Nil,
                  nBuckets: Int = 1024): DataFrame = {
    require(nTiles >= 1, s"nTiles must be >= 1, got $nTiles")
    val total = df.count()
    // Descending = ascending over a transformed BUCKETING key. Negation
    // alone is not enough: Window.orderBy(desc) is desc_nulls_last with NaN
    // greatest (first), while the bucketed ascending pass puts null first
    // and NaN last. Swapping null <-> NaN under the negation makes the
    // ascending reserved buckets land exactly where the desc window would:
    // NaN -> null -> bucket -1 (first), null -> NaN -> bucket nBuckets
    // (last). The negated DOUBLE decides only the bucket; the within-bucket
    // sort uses the EXACT original key descending, so integral/decimal keys
    // beyond 2^53 (where the double cast collides distinct values) still
    // order exactly — colliding keys share a bucket by construction and the
    // exact sort separates them there.
    val keyed =
      if (descending) {
        val kk = col(key).cast(DoubleType)
        df.withColumn("__negkey",
          when(isnan(kk), lit(null).cast(DoubleType))
            .when(kk.isNull, lit(Double.NaN))
            .otherwise(-kk))
      } else df
    val withId =
      if (descending)
        globalRowIds(keyed, "__negkey", "__rid", nBuckets, tieBreak,
          // reserved buckets isolate null/NaN rows, so plain .desc (which
          // is desc_nulls_last) never has to order them against finite keys
          withinOrder = col(key).desc +: tieBreak.map(col(_).asc))
      else globalRowIds(keyed, key, "__rid", nBuckets, tieBreak)
    val base = total / nTiles
    val rem = total % nTiles
    val tile =
      if (base == 0) col("__rid") + 1 // fewer rows than tiles: tile = rank
      else {
        val cut = rem * (base + 1)
        when(col("__rid") < cut, expr(s"__rid div ${base + 1}") + 1)
          .otherwise(lit(rem) + expr(s"(__rid - $cut) div $base") + 1)
      }
    withId.withColumn(tileCol, tile.cast(IntegerType))
      .drop("__rid", "__negkey")
  }

  /** Inner join on `cols` with null-safe (`<=>`) key equality — a plain
    * using-columns join silently drops null-keyed groups. */
  private def nullSafeJoin(l: DataFrame, r: DataFrame,
                           cols: Seq[String]): DataFrame = {
    val rr = cols.foldLeft(r)((d, c) => d.withColumnRenamed(c, s"__r_$c"))
    val cond = cols.map(c => l(c) <=> rr(s"__r_$c")).reduce(_ && _)
    cols.foldLeft(l.join(rr, cond))((d, c) => d.drop(s"__r_$c"))
  }

  /** Exact per-group continuous quantiles (Hyndman-Fan type 7, the
    * `percentile` / `quantile_cont` rule) as a distributed order-statistic
    * SELECT instead of an aggregation buffer.
    *
    * `percentile(v, q)` keeps a value→count map per group and merges the
    * partials single-threaded per group — at corpus scale that buffer is
    * group-sized and the merge is the bottleneck (measured 23×/decade on
    * the sf10 tiling). A quantile only needs TWO order statistics per q,
    * so the scale shape is selection, not aggregation:
    *
    *   1. per-group bounds + non-null count (narrow scan, group-bounded);
    *   2. per-(group, value-range-bucket) histogram — collected to the
    *      driver, ≤ groups×(nBuckets+1) longs (the same driver-bounded
    *      contract as globalRowIds' offset broadcast);
    *   3. on the driver: rank targets floor/ceil(q·(n−1)) → the bucket
    *      holding each rank + its local rank (exclusive prefix sums);
    *   4. one filtered pass over ONLY the targeted buckets (≈ n/nBuckets
    *      rows each), per-bucket row_number picks the order statistics;
    *      ties share a value so the pick is deterministic.
    *
    * Returns one row per (group, q): groupCols + `__q` + `__quantile`
    * (null when the group has no non-null values, matching `percentile`).
    * Group cardinality must be driver-bounded (it is the output row count);
    * values must be finite (NaN/±Inf would poison the range buckets).
    * Null GROUP KEYS are first-class (internal joins are null-safe), since
    * groupBy keeps a null group and the degenerate-corpus gate feeds one.
    * `df` must be DETERMINISTIC (globalRowIds' contract): the histogram
    * action and the pick action each re-evaluate it, and the driver-
    * resolved rank targets are only valid if both passes see the same
    * rows.
    *
    * `discrete = true` switches the rank rule to `percentile_disc` /
    * ordered-set semantics: the result is the ACTUAL data value at
    * 0-based order statistic max(ceil(q·n)−1, 0) — the smallest value
    * whose cume_dist ≥ q — with no interpolation, so it is
    * exact-comparable without rounding. Same three-pass selection shape;
    * one pick per (group, q) instead of a lo/hi pair. */
  def groupQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     qs: Seq[Double], nBuckets: Int = 1024,
                     discrete: Boolean = false): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be in [0,1], got $qs")
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    val gCols = groupCols.map(col)
    val v = col(valueCol).cast(DoubleType)
    val rows = df.filter(v.isNotNull)
      .select(gCols :+ v.as("__v"): _*)
    // narrow scan 1: per-group bounds + count (group-bounded result).
    // Checkpointed: it feeds the histogram action, the pick action and the
    // final nByGroup projection — without it the full-scan aggregate
    // re-runs once per consumer (the repo's multi-consumer rule; the
    // checkpoint itself is group-bounded, i.e. tiny)
    val bounds = rows.groupBy(gCols: _*)
      .agg(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"),
        count(lit(1)).as("__n"))
      .localCheckpoint(false)
    // bucket by per-group value range (broadcast of group-bounded bounds)
    val width = (col("__hi") - col("__lo")) / lit(nBuckets.toDouble)
    val bucket = when(col("__hi") === col("__lo"), lit(0))
      .otherwise(least(floor((col("__v") - col("__lo")) / width)
        .cast(IntegerType), lit(nBuckets - 1)))
    val bucketed = nullSafeJoin(rows, broadcast(bounds), groupCols)
      .withColumn("__bucket", bucket)
    // narrow scan 2: the (group, bucket) histogram → driver
    val hist = bucketed.groupBy(gCols :+ col("__bucket"): _*)
      .agg(count(lit(1)).as("__c"))
      .collect()
    val groupKey = (r: Row) => groupCols.map(c => r.getAs[Any](c)).toList
    val histByGroup = hist.groupBy(groupKey)
    // driver: rank targets → (group, bucket, localRank) select list
    case class Target(group: List[Any], q: Double, rank: Long,
                      bucket: Int, local: Long, isLow: Boolean)
    val targets = histByGroup.toSeq.flatMap { case (g, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("__bucket"))
      val n = sorted.map(_.getAs[Long]("__c")).sum
      qs.flatMap { q =>
        val lowHigh =
          if (discrete)
            Seq((math.max(math.ceil(q * n.toDouble).toLong - 1L, 0L), true))
          else {
            val pos = q * (n - 1).toDouble
            Seq((math.floor(pos).toLong, true),
              (math.ceil(pos).toLong, false))
          }
        lowHigh.map { case (rank, isLow) =>
          // walk the prefix sums to the bucket holding this rank
          var acc = 0L; var b = 0; var local = 0L
          val it = sorted.iterator
          var found = false
          while (it.hasNext && !found) {
            val r = it.next(); val c = r.getAs[Long]("__c")
            if (rank < acc + c) { b = r.getAs[Int]("__bucket"); local = rank - acc; found = true }
            else acc += c
          }
          Target(g, q, rank, b, local, isLow)
        }
      }
    }
    import scala.jdk.CollectionConverters._
    val gFields = groupCols.map(c => df.schema(c))
    val tSchema = StructType(gFields ++ Seq(
      StructField("__q", DoubleType, nullable = false),
      StructField("__bucket", IntegerType, nullable = false),
      StructField("__local", LongType, nullable = false),
      StructField("__isLow", BooleanType, nullable = false)))
    val tRows = targets.map(t =>
      Row.fromSeq(t.group ++ Seq(t.q, t.bucket, t.local, t.isLow)))
    val targetDf = spark.createDataFrame(tRows.asJava, tSchema)
    // pass 3: only the targeted buckets are scanned; per-bucket windows
    // hold ≈ n/nBuckets rows each and run in parallel across buckets
    val needed = targetDf.select(gCols :+ col("__bucket"): _*).distinct()
    val localRanked = nullSafeJoin(bucketed, broadcast(needed),
        groupCols :+ "__bucket")
      .withColumn("__local", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(gCols :+ col("__bucket"): _*)
          .orderBy(col("__v"))).cast(LongType) - 1)
    val picked = nullSafeJoin(localRanked, broadcast(targetDf),
        groupCols ++ Seq("__bucket", "__local"))
      .groupBy(gCols :+ col("__q"): _*)
      .agg(max(when(col("__isLow"), col("__v"))).as("__vlo"),
        max(when(!col("__isLow"), col("__v"))).as("__vhi"))
    // continuous: interpolate v_lo + frac·(v_hi − v_lo); discrete: the
    // single picked order statistic IS the answer (every target is isLow,
    // so __vhi is null — interpolating would null the result). Groups whose
    // values are all null never enter `rows`, so they are absent from the
    // result — callers needing percentile's null-for-empty row restore it
    // with a left join.
    val nByGroup = bounds.select(gCols :+ col("__n"): _*)
    val joined = nullSafeJoin(nByGroup, broadcast(picked), groupCols)
    val result =
      if (discrete) joined.withColumn("__quantile", col("__vlo"))
      else joined
        .withColumn("__pos", col("__q") * (col("__n") - 1).cast(DoubleType))
        .withColumn("__quantile",
          col("__vlo") + (col("__pos") - floor(col("__pos"))) *
            (col("__vhi") - col("__vlo")))
    result.select(gCols ++ Seq(col("__q"), col("__quantile")): _*)
  }
}
