package graft.core

import org.apache.spark.sql.DataFrame

/** Parallelism floor for compute-bound narrow stages (opt guide §2.2/§2.5:
  * partition sizing is BYTES-based everywhere in Spark — scan splits via
  * maxPartitionBytes, AQE coalescing via advisoryPartitionSizeInBytes — so a
  * relation whose per-row cost is CPU (shingle explosion, hash signatures,
  * set intersections, vector math) lands on a handful of tasks whenever its
  * bytes are small: the judged corpus is ONE parquet split, and every
  * pair-mining stage downstream of it ran single-threaded on a 32-core box.
  *
  * [[fanOut]] floors the partition count at the cluster's default
  * parallelism — scale-ADAPTIVE, not a local[32] constant: on a real
  * cluster `defaultParallelism` is the executor-core total, and a corpus
  * big enough to split past it already satisfies the floor, making this
  * the identity (no exchange is added — the plan is inspected, not
  * blindly repartitioned). The round-robin form is deterministic under
  * retries (sortBeforeRepartition, SPARK-23207 — guide §2.5).
  *
  * Only for plans upstream of their first exchange (scan+project+filter
  * shapes): `df.rdd` on such plans materializes no AQE stages, so the
  * partition-count probe runs zero jobs. */
object Par {
  def fanOut(df: DataFrame): DataFrame = {
    val dp = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < dp) df.repartition(dp) else df
  }
}
