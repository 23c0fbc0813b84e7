package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed tables for shuffle-free co-located joins — the storage-level
  * answer to repeated large-joins on the same key at 100 TB: both sides
  * bucketed (and sorted) by the join key into the same bucket count join
  * with NO Exchange, and bucket pruning serves point lookups.
  *
  * Spark only honors bucketing through the catalog (`saveAsTable`), not
  * plain parquet paths.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int): Unit = {
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .option("compression", "zstd")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — plans without a
    * shuffle when bucket specs line up. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   keys: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)

  /** Range-partitioned, sorted parquet layout: global range partitioning on
    * the sort key + a within-partition sort gives every output file a
    * DISJOINT key range, so a selective filter prunes to one file's row
    * groups via parquet min/max stats instead of scanning the dataset —
    * the data-layout lever (Z-order-lite for a single key) that makes
    * point/range reads on a 100 TB table touch megabytes. sortCols beyond
    * the first refine row-group locality within each file. */
  def writeRangePartitioned(df: DataFrame, path: String,
                            numFiles: Int, sortCols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.col
    writeSorted(df, path, numFiles, sortCols.map(col), dropCols = Nil)
  }

  /** The shared sorted-layout write recipe: range-partition on the leading
    * sort expression, sort within partitions, drop derived columns, write
    * zstd parquet. */
  private def writeSorted(df: DataFrame, path: String, numFiles: Int,
                          sortExprs: Seq[org.apache.spark.sql.Column],
                          dropCols: Seq[String]): Unit = {
    df.repartitionByRange(numFiles, sortExprs.head)
      .sortWithinPartitions(sortExprs: _*)
      .drop(dropCols: _*)
      .write.mode(SaveMode.Overwrite)
      .option("compression", "zstd")
      .parquet(path)
  }

  /** Morton/Z-order value of two pre-bucketed non-negative ints (each in
    * [0, 2^bits)): interleaves their bits so that sorting by the result
    * clusters rows that are close in BOTH dimensions. Pure bit arithmetic —
    * codegen'd, no UDF. An out-of-range input FAILS the job rather than
    * truncating: dropped high bits would silently collapse far-apart rows
    * into one file and degrade every read back to a full scan; null in →
    * null out. */
  def zOrderValue(x: org.apache.spark.sql.Column,
                  y: org.apache.spark.sql.Column, bits: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val lim = 1L << bits
    val z = (0 until bits).map { i =>
      (shiftleft(shiftright(x.cast("long"), i).bitwiseAND(1L), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(y.cast("long"), i).bitwiseAND(1L), 2 * i))
    }.reduce(_.bitwiseOR(_))
    when(x.isNull || y.isNull, lit(null).cast("long"))
      .when(x >= 0 && x < lim && y >= 0 && y < lim, z)
      .otherwise(raise_error(concat(
        lit(s"zOrderValue input outside [0, $lim): x="), x.cast("string"),
        lit(" y="), y.cast("string"))).cast("long"))
  }

  /** Z-ordered parquet layout over two dimensions: rows are range-
    * partitioned and sorted by the interleaved key, so every file's
    * (x, y) bounding box is compact in both dimensions and a 2-D box
    * filter prunes to few files via parquet footer min/max — where the
    * single-key range layout only prunes on its leading column. The
    * multi-dimension generalization of [[writeRangePartitioned]] (what
    * lakehouse OPTIMIZE ZORDER does). Caller pre-buckets each dimension
    * into [0, 2^bits) ints. */
  def writeZOrdered(df: DataFrame, path: String, numFiles: Int,
                    xCol: String, yCol: String, bits: Int): Unit = {
    import org.apache.spark.sql.functions.col
    val withZ = df.withColumn("__z", zOrderValue(col(xCol), col(yCol), bits))
    writeSorted(withZ, path, numFiles, Seq(col("__z")), dropCols = Seq("__z"))
  }
}
