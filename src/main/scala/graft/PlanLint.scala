package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{CollectLimitExec, FilterExec, GlobalLimitExec, RDDScanExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.types.StringType

/** Plan lint (dev tool, run per round): plans EVERY registered query and
  * flags physical join shapes that do not survive 100 TB —
  * CartesianProductExec (a true all-pairs shuffle join) and
  * BroadcastNestedLoopJoinExec (per-row scan of a broadcast side). Each
  * occurrence must be on the allowlist below with a scale justification;
  * anything else exits nonzero. AQE is disabled for the lint session so
  * the static plan is inspected (AQE can only IMPROVE these shapes at
  * runtime, never introduce them).
  *
  * Usage: runMain graft.PlanLint [sfDir]
  */
object PlanLint {

  /** query -> (allowed BNLJ count, justification). CartesianProductExec has
    * NO allowlist — a plain cartesian is never acceptable. A BNLJ is
    * acceptable ONLY when the broadcast side is bounded by construction
    * (a 1-row aggregate, a literal grid, a query sample, a centroid set)
    * — then "nested loop over the broadcast side" is a per-row loop over
    * a constant-size array, the intended shape. */
  val allowedBnlj: Map[String, (Int, String)] = Map(
    "e2_knn_brute" -> (1, "corpus x broadcast(query sample) - the documented exact-ANN baseline"),
    "e13_mips_transform" -> (1, "corpus x broadcast(query sample) - e2's exact-baseline shape; the transform itself is narrow"),
    "e14_binary_hamming_rerank" -> (1, "packed codes x broadcast(20-query code sample) - e2's shape over 8-byte rows; the rerank join is a hash join on neighbor_id"),
    "e17_int8_sq_topk" -> (1, "int8 codes x broadcast(20-query code sample) - e2's bounded-query-batch shape over 4x-compressed rows"),
    "e18_hard_negative_mining" -> (1, "corpus x broadcast(20-query sample) - e2's exact-baseline shape; the label split and positive-margin join above it are hash joins"),
    "e15_mrl_truncation_recall" -> (2, "two e2-shaped passes (full-dim and 16-dim-prefix search), each corpus x broadcast(30-query sample); deliberately two scans, not a materialized pair table - at scale column pruning lets the prefix pass read 16/64 of the bytes, which is the operator's point"),
    "e3_knn_ivf" -> (2, "assignCells + ivfTopK each cross corpus/queries with broadcast(centroids), k<=10"),
    // d41 needs no entry since r8 wave 5: NearestCells replaced the
    // assignment crossjoin, so its plan has zero BNLJ — an allowance
    // would let a crossjoin regression through the gate silently
    "d43_dsir_weights" -> (1, "bucket model x broadcast(1-row totals) for the smoothing denominators - the d26 IDF pattern"),
    "d81_doremi_step" -> (3, "source rollup x broadcast(1-row totals) twice (min-loss + weight-sum, then the normalizing unnorm sum) - the d26 pattern, moved off global windows by the r12 check-3 tightening; 3 plan occurrences because the second totals aggregate replays the first crossJoin over the un-materialized 20-row stepped relation"),
    "e7_ivf_recall_check" -> (5, "composes e2's baseline + e3's two + two 1-row count aggregates for the recall verdict"),
    "e19_ivf_recall_clustered" -> (4, "e7's composition on the clustered fixture: e2's brute baseline + ivfTopK's bounded-query-batch probe + two 1-row count aggregates for the recall verdict (the kmeans assignment path carries no BNLJ)"),
    "d26_tfidf" -> (1, "term counts x broadcast(1-row corpus doc-count) for the IDF denominator"),
    "d48_quality_pareto" -> (1, "bucket model x broadcast(1-row doc totals) for the NB smoothing denominators - the d26 pattern"),
    "d54_curation_pipeline" -> (1, "the composed classifier stage carries d48's 1-row doc-totals broadcast - same justification"),
    "e8_pq_adc_topk" -> (1, "encoded corpus x broadcast(query sample + per-query ADC lookup tables) - the PQ serving shape; the broadcast side is the bounded query set"),
    "q28_grid_asof_spend" -> (1, "customer keys x literal as-of date list - the B1 grid pattern"),
    "q29_relative_return" -> (1, "per-ticker rows x 1-row market aggregate"),
    "q98_psi_drift" -> (1, "bucket counts x broadcast(1-row totals) for proportions"),
    "m1_macro_pipeline" -> (1, "country series x literal year grid"),
    "d57_incremental_curation" -> (2, "the frozen classifier stage carries d48's 1-row doc-totals broadcast inside trainNbWeights; the lazy cls checkpoint usually truncates it from the visible plan, but the un-materialized form shows it once per cls consumer (<=2)"))
    // e11 likewise needs no entry: both meta searches and the exact twin
    // run through NearestCells; the candidate join is a broadcast HASH
    // join on meta_id

  /** query -> (allowed NAKED global-window count, justification). A
    * WindowExec with no partition spec moves ALL rows to one partition —
    * the single-partition trap at 100 TB. It is acceptable ONLY when its
    * input is already a bounded relation. The common bounded shape — an
    * aggregation or limit somewhere below the window — is auto-detected
    * (`boundedBelow`); what lands here is the remainder: windows whose
    * boundedness is structural (a checkpointed post-aggregation frame, a
    * sampled slice) but not visible in the physical plan. */
  val allowedGlobalWindow: Map[String, (Int, String)] = Map.empty

  /** query -> (allowed UNBOUNDED corpus-text broadcast count, justification).
    * A BroadcastExchange whose payload carries the `text` column with no
    * reducing operator below it (no filter/limit/aggregate) ships the
    * ENTIRE corpus text to every executor — corpus-BYTES-sized, a driver
    * OOM at 100 TB regardless of how clever the join above it is (the r9
    * verdict's one scale-killer class: suffixLcp's direct-compare tail,
    * since rewritten onto a position-relation hash join). Broadcasts of
    * FILTERED or SAMPLED text (a bounded eval set, a query batch) are
    * auto-exempt via the reduction check. */
  val allowedTextBroadcast: Map[String, (Int, String)] = Map.empty

  /** query -> (allowed multi-scanned UNPERSISTED RDD relations,
    * justification). An RDD-backed relation (createDataFrame(rdd) /
    * LogicalRDD) scanned more than once in ONE plan re-runs its whole
    * lineage per consumer — parquet scans get pushed-down re-reads from
    * Catalyst, but an RDD's lineage is opaque, so "read it twice" means
    * "compute it twice" (the round-10 m5 find: four consumers of the
    * un-checkpointed aHash frame = four full decode+resize+hash passes).
    * A persisted/checkpointed RDD (storage level set) scans from blocks
    * and is exempt. Allowlist exists for relations whose recompute is
    * genuinely cheaper than materialization (none currently). */
  val allowedRddRescan: Map[String, (Int, String)] = Map.empty

  /** Check 5's detector (package-visible so PlanLintSpec can prove it
    * fires — a vacuous gate is worse than none): count distinct
    * UNPERSISTED, un-checkpointed RDDs appearing under more than one scan
    * node of `p`. Each extra scan re-runs the RDD's opaque lineage. */
  private[graft] def rddRescanCount(p: SparkPlan): Int =
    p.collectWithSubqueries { case s: RDDScanExec => s.rdd }
      .groupBy(_.id)
      .count { case (_, scans) =>
        scans.size > 1 &&
          scans.head.getStorageLevel == org.apache.spark.storage.StorageLevel.NONE &&
          !scans.head.isCheckpointed
      }

  /** Check 3's detector (package-visible so PlanLintSpec can prove it
    * fires): WindowExec nodes with no partition spec whose input subtree
    * is not bounded by a LIMIT or a KEYLESS aggregate. Until r11 any
    * aggregate below exempted the window; the r11 verdict closed that
    * loophole — a GROUPED aggregate's output grows with the corpus (the
    * d77 vocabulary: Heaps-bounded, but 10⁸–10⁹ rows at web scale), so a
    * global window over it still plans a single-partition sort. Same
    * asymmetry check 6's size model applies to broadcasts: keyless
    * aggregates and limits bound a subtree by construction; grouped
    * aggregates, filters, and projections do not. */
  private[graft] def nakedGlobalWindows(p: SparkPlan): Int = {
    def boundedBelow(q: SparkPlan): Boolean =
      q.collectFirst {
        case a: HashAggregateExec if a.groupingExpressions.isEmpty => ()
        case a: ObjectHashAggregateExec if a.groupingExpressions.isEmpty => ()
        case a: SortAggregateExec if a.groupingExpressions.isEmpty => ()
        case _: GlobalLimitExec => ()
        case _: CollectLimitExec => ()
        case _: TakeOrderedAndProjectExec => ()
      }.nonEmpty
    p.collectWithSubqueries {
      case w: WindowExec if w.partitionSpec.isEmpty && !boundedBelow(w.child) => w
    }.size
  }

  /** Check 6's ceiling: any single broadcast payload above this is an
    * offender, NO allowlist (r10 verdict task 6). Checks 1–5 are
    * shape-based; none catches a bounded-BY-CONSTRUCTION broadcast whose
    * bound grows with the corpus (a "query sample" that is 10% of the
    * table broadcasts 10 TB at 100 TB). 64 MB is ~6× the default
    * autoBroadcastJoinThreshold — plenty for every legitimate dim /
    * batch / centroid table, far under executor budgets. */
  private[graft] val BroadcastBytesCeiling: Long = 64L << 20

  /** Check 6's size model (package-visible for PlanLintSpec): bottom-up
    * byte estimate of a broadcast payload subtree. Some(bytes) when
    * estimable, None when an opaque leaf (RDD scan, cached relation)
    * makes it unknowable — a stats-based check cannot speak about inputs
    * stats do not cover, and flagging garbage estimates would bury real
    * offenders.
    *
    * Deliberate asymmetry: keyless aggregates and limits BOUND the
    * subtree regardless of what sits below (1 row / `limit` rows by
    * construction — the e2-class 20-row query batch), while grouped
    * aggregates, filters, and projections do NOT reduce the estimate:
    * their output grows with the corpus, which is exactly the class this
    * check exists to catch. Joins below a broadcast sum their sides
    * (best-effort: the guarded shapes are scan→filter→project; a
    * blow-up join under an unbounded broadcast still reports ≥ its
    * inputs). */
  private[graft] def subtreeBytes(p: SparkPlan): Option[Long] = {
    def rowSize(q: SparkPlan): Long =
      q.output.map(_.dataType.defaultSize.toLong).sum + 8L
    p match {
      case a: HashAggregateExec if a.groupingExpressions.isEmpty =>
        Some(rowSize(a))
      case a: ObjectHashAggregateExec if a.groupingExpressions.isEmpty =>
        Some(rowSize(a))
      case a: SortAggregateExec if a.groupingExpressions.isEmpty =>
        Some(rowSize(a))
      case l: GlobalLimitExec => Some(l.limit.toLong * rowSize(l))
      case l: CollectLimitExec => Some(l.limit.toLong * rowSize(l))
      case t: TakeOrderedAndProjectExec => Some(t.limit.toLong * rowSize(t))
      case r: org.apache.spark.sql.execution.RangeExec =>
        Some(r.numElements.toLong * 8L)
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        // the logical relation's stats ARE the file bytes
        f.logicalLink.map(_.stats.sizeInBytes.min(BigInt(Long.MaxValue)).toLong)
      case leaf if leaf.children.isEmpty => None // RDD scan, cache, reuse…
      case other =>
        other.children.map(subtreeBytes).foldLeft(Option(0L)) {
          case (Some(a), Some(b)) => Some(a + b)
          case _ => None
        }
    }
  }

  /** Check 6's detector: BroadcastExchanges whose estimated payload
    * exceeds `ceiling`. */
  private[graft] def oversizedBroadcasts(p: SparkPlan,
                                         ceiling: Long = BroadcastBytesCeiling): Int =
    p.collectWithSubqueries {
      case b: BroadcastExchangeExec if subtreeBytes(b.child).exists(_ > ceiling) => b
    }.size

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false") // static plans
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // "reduced below": a filter, limit, or aggregate between the scan and
    // the broadcast bounds the payload — the broadcast ships a slice, not
    // the corpus.
    def reducedBelow(p: SparkPlan): Boolean =
      p.collectFirst {
        case _: FilterExec => ()
        case _: HashAggregateExec => ()
        case _: ObjectHashAggregateExec => ()
        case _: SortAggregateExec => ()
        case _: GlobalLimitExec => ()
        case _: CollectLimitExec => ()
        case _: TakeOrderedAndProjectExec => ()
      }.nonEmpty

    def offenders(p: SparkPlan): (Int, Int, Int, Int, Int, Int) = {
      val cart = p.collectWithSubqueries { case c: CartesianProductExec => c }.size
      val bnlj = p.collectWithSubqueries { case b: BroadcastNestedLoopJoinExec => b }.size
      val nakedWin = nakedGlobalWindows(p)
      val textBcast = p.collectWithSubqueries {
        case b: BroadcastExchangeExec
          if b.output.exists(a => a.name == "text" && a.dataType == StringType) &&
            !reducedBelow(b.child) => b
      }.size
      (cart, bnlj, nakedWin, textBcast, rddRescanCount(p), oversizedBroadcasts(p))
    }

    var bad = List.empty[String]
    var planned = 0
    SparkEntry.allDefs.sortBy(_.name).foreach { d =>
      try {
        val (cart, bnlj, nakedWin, textBcast, rddRescan, bigBcast) =
          offenders(d.fn(spark, sfDir).queryExecution.executedPlan)
        planned += 1
        if (cart > 0)
          bad ::= s"${d.name}: $cart CartesianProductExec (never allowed)"
        val allowed = allowedBnlj.get(d.name).map(_._1).getOrElse(0)
        if (bnlj > allowed)
          bad ::= s"${d.name}: $bnlj BroadcastNestedLoopJoinExec (allowed $allowed)"
        val allowedWin = allowedGlobalWindow.get(d.name).map(_._1).getOrElse(0)
        if (nakedWin > allowedWin)
          bad ::= s"${d.name}: $nakedWin naked global WindowExec (allowed $allowedWin)"
        val allowedTb = allowedTextBroadcast.get(d.name).map(_._1).getOrElse(0)
        if (textBcast > allowedTb)
          bad ::= s"${d.name}: $textBcast unbounded corpus-text broadcast (allowed $allowedTb)"
        val allowedRr = allowedRddRescan.get(d.name).map(_._1).getOrElse(0)
        if (rddRescan > allowedRr)
          bad ::= s"${d.name}: $rddRescan unpersisted RDD relation(s) scanned >1x (allowed $allowedRr)"
        if (bigBcast > 0)
          bad ::= s"${d.name}: $bigBcast BroadcastExchange(s) over the " +
            s"${BroadcastBytesCeiling >> 20} MB estimate ceiling (no allowlist)"
      } catch {
        // a query that cannot even plan is a verify problem, not a lint one
        case e: Throwable => println(s"[planlint] SKIP ${d.name}: ${e.getMessage}")
      }
    }
    println(s"""PLANLINT {"planned":$planned,"offenders":${bad.size},""" +
      s""""detail":[${bad.map("\"" + _ + "\"").mkString(",")}]}""")
    // The committed artifact is WRITTEN BY THIS RUN, never hand-edited —
    // the r9 verdict caught a stale hand-maintained PLANLINT.json
    // contradicting the commit message; a generated file cannot drift from
    // the claim. Per-round catch history lives in git blame + NOTES_r*.md.
    def jq(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def jmap(m: Map[String, (Int, String)]): String =
      m.toSeq.sortBy(_._1).map { case (k, (n, why)) =>
        s"${jq(k)}: {\"allowed\": $n, \"why\": ${jq(why)}}"
      }.mkString("{", ", ", "}")
    val artifact =
      s"""{
         | "what": "graft.PlanLint (dev tool, run per round; THIS FILE IS GENERATED by the run - do not hand-edit): plans every registered query with AQE off and flags (1) CartesianProductExec - never allowed; (2) BroadcastNestedLoopJoinExec beyond a per-query justified allowlist (broadcast side bounded by construction); (3) NAKED global windows - WindowExec with no partition spec over a subtree not bounded by a limit or KEYLESS aggregate (grouped aggregates deliberately do not exempt since r12 - their output grows with the corpus, the d77 vocabulary class); (4) UNBOUNDED corpus-text broadcasts - a BroadcastExchange shipping the text column with no filter/limit/aggregate below it (the r9 suffixLcp scale-killer class); (5) UNPERSISTED RDD relations scanned more than once in one plan - each scan re-runs the RDD's opaque lineage (the r10 m5 find: 4 consumers = 4 decode passes); (6) any BroadcastExchange whose bottom-up payload estimate exceeds 64 MB, NO allowlist - keyless aggregates and limits bound the estimate, grouped aggregates/filters/projections deliberately do not (their output grows with the corpus), opaque leaves (RDD scans, caches) make a subtree unknowable and are skipped. Allowlists for (3), (4), (5) are EMPTY - nothing needs one.",
         | "planned": $planned,
         | "offenders_total": ${bad.size},
         | "detail": [${bad.map(jq).mkString(", ")}],
         | "bnlj_allowlist": ${jmap(allowedBnlj)},
         | "global_window_allowlist": ${jmap(allowedGlobalWindow)},
         | "text_broadcast_allowlist": ${jmap(allowedTextBroadcast)},
         | "rdd_rescan_allowlist": ${jmap(allowedRddRescan)}
         |}""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get("PLANLINT.json"),
      artifact.getBytes("UTF-8"))
    spark.stop()
    if (bad.nonEmpty) sys.exit(1)
  }
}
