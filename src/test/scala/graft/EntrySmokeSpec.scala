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

  test("q2's filters and projection reach the parquet scan (pushdown regression)") {
    // the README's manual Explain audit, pinned: a plan change that stops
    // pushing filters/columns into the scan multiplies the 100 TB read
    // the one-line plan toString truncates scan metadata — the formatted
    // mode prints PushedFilters/ReadSchema in full
    val plan = SparkEntry.queries("q2_filter_project")(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters:"), s"no pushed filters in:\n$plan")
    assert(plan.contains("GreaterThan(l_quantity,40.0"),
      "value predicate must push to the scan")
    assert(plan.contains("IsNotNull(l_shipdate)"),
      "null guard must push to the scan")
    val readSchema = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.nonEmpty && !readSchema.contains("l_tax") &&
      !readSchema.contains("l_returnflag"),
      s"unselected columns must be pruned from the scan: $readSchema")
  }
}
