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

  test("driver contract: no registered query emits array/map/struct columns") {
    // r3's only red rows were array-typed judged columns — the driver's
    // pandas harness cannot hash ndarray cells, EVEN for rows-only
    // queries (d34 erred despite having no oracle). Reading .schema only
    // needs analysis, but CONSTRUCTING some queries runs real jobs (p1
    // materializes its checkpoint, q50/d16 run sizing counts, q94
    // discovers pivot values) — a few seconds at sf0.001, accepted for
    // full-registry coverage; p1's store is released afterwards.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    try {
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        val bad = fn(spark, "/root/testdata/sf0.001").schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] => s"$name.${f.name}: ${f.dataType.simpleString}"
        }
        bad
      }
      assert(offenders.isEmpty,
        s"non-hashable judged columns (stringify or project scalars):\n${offenders.mkString("\n")}")
    } finally queries.Pipeline.clearMaterialized()
  }

  test("rows-only sandwich manifest (r12 task 6): every no-oracle query " +
    "declares oracle-gated twins; the manifest is machine-checked, not prose") {
    // allDefs itself enforces the invariants (non-empty twins on
    // no-oracle defs, twins resolve, twins carry oracles) — evaluating it
    // IS the check; these asserts pin the current manifest's shape so a
    // silent deletion of a twin declaration is caught by name.
    val m = SparkEntry.twinManifest
    assert(m.keySet == Set("d7_simhash_dedup", "d9_winnowing_pairs",
      "p1_ticker_pipeline", "p4_score_portfolio"),
      s"rows-only set changed: ${m.keySet} — new no-oracle queries need a " +
        "documented sandwich")
    m.foreach { case (name, twins) =>
      assert(twins.nonEmpty, s"$name declares no twins")
      twins.foreach { t =>
        assert(SparkEntry.oracleSql.contains(t),
          s"$name twin $t is not oracle-gated")
      }
    }
    // malformed registries are refused loudly by the PRODUCTION validator:
    // a no-oracle def without twins, a dangling twin, a rows-only twin
    val defs = SparkEntry.allDefs
    val orphan = graft.queries.QueryDef("zz_orphan", (_, _) => null, None)
    assert(intercept[IllegalArgumentException] {
      graft.queries.QueryDef.validate(defs :+ orphan)
    }.getMessage.contains("zz_orphan"))
    val dangling = graft.queries.QueryDef("zz_dangling", (_, _) => null, None,
      twins = Seq("zz_nonexistent"))
    assert(intercept[IllegalArgumentException] {
      graft.queries.QueryDef.validate(defs :+ dangling)
    }.getMessage.contains("zz_nonexistent"))
    val rowsOnlyTwin = graft.queries.QueryDef("zz_weak", (_, _) => null, None,
      twins = Seq("p1_ticker_pipeline")) // p1 itself has no oracle
    assert(intercept[IllegalArgumentException] {
      graft.queries.QueryDef.validate(defs :+ rowsOnlyTwin)
    }.getMessage.contains("no oracle"))
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
