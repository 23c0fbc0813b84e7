package graft

/** Driver-contract guard: `entry` must return rows on the smallest SF, and
  * the oracle map must stay a subset of the query registry (a rename on one
  * side silently downgrades a query to rows-only in the judged gate). */
class EntrySmokeSpec extends SparkSpec {
  test("driver contract: entry returns rows; registries align") {
    assert(SparkEntry.entry(spark).count() > 0)
    assert(SparkEntry.queries.size >= 155, "registry shrank unexpectedly")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet),
      "oracle entries without a matching query: " +
        (SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).mkString(", "))
  }
}
