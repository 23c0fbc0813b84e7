package graft

import org.apache.spark.sql.functions._

/** Construction pins for GenScale's dup-heavy adversarial corpus mode
  * (r12 verdict task 1): the probes' conclusions about d23 rounds, d86
  * disk, and LSH occupancy are only as good as the corpus actually having
  * the claimed duplicate structure. */
class DupmixSpec extends SparkSpec {

  private val stride = 1000000L

  test("dupmix corpus: exact-copy classes span tiles, dup fraction is the " +
    "asked-for one, chain windows overlap adjacently and ONLY adjacently, " +
    "ids stay below the twin-injection band") {
    val tiles = 4; val fracPct = 40; val nTpl = 3; val maxDepth = 3
    val df = GenScale.dupmixDocuments(spark, "/root/testdata/sf0.001",
      tiles, fracPct, nTpl, maxDepth, stride).localCheckpoint(true)
    val baseN = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    // row conservation: replacement, not addition
    assert(df.count() == baseN * tiles, "dupmix must preserve per-tile row counts")
    // doc ids: unique, and far below the 1e9 judged-fixture band
    assert(df.select("doc_id").distinct().count() == baseN * tiles)
    val maxId = df.agg(max("doc_id")).head().getLong(0)
    assert(maxId < 1000000000L, s"doc_id $maxId reaches the twin-injection band")

    // dup fraction: hash-assigned per (doc, tile); binomial at n=200 —
    // allow a generous envelope around 40%
    val nDup = df.filter(col("source").startsWith("dupsrc")).count()
    val frac = nDup.toDouble / (baseN * tiles)
    assert(frac > 0.25 && frac < 0.55, s"dup fraction $frac far from 0.40")

    // exact-copy classes: every dup doc's text appears in SOME class of
    // size > 1 spanning > 1 tile (that is the removable mass), and the
    // number of distinct dup texts is bounded by the template pool
    val dupClasses = df.filter(col("source").startsWith("dupsrc"))
      .groupBy("text")
      .agg(count(lit(1)).as("n"),
        countDistinct(floor(col("doc_id") / stride)).as("n_tiles"))
      .collect()
    assert(dupClasses.length <= nTpl * (maxDepth + 1),
      s"${dupClasses.length} distinct dup texts > pool ${nTpl * (maxDepth + 1)}")
    assert(dupClasses.forall(_.getLong(1) > 1L),
      "every template-window class must have exact copies")
    assert(dupClasses.exists(_.getLong(2) > 1L),
      "exact copies must span tiles (cross-tile dup mass)")

    // non-dup background keeps the wide-mode dup-light structure: tile
    // tags make cross-tile texts distinct
    val normal = df.filter(!col("source").startsWith("dupsrc"))
    val normalDistinct = normal.select("text").distinct().count()
    assert(normalDistinct >= normal.count() * 9 / 10,
      "non-dup remainder must stay (mostly) distinct across tiles")
  }

  test("dupmix windows: adjacent depths share a large contiguous word " +
    "overlap (chain edges), depths >= 2 apart share no contiguous window " +
    "(no shortcut edges) — the d23 diameter construction") {
    val pool = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .orderBy("doc_id").limit(48)
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val wins = GenScale.dupWindows(pool, nTpl = 3, maxDepth = 3)
    assert(wins.size == 3 * 4)
    val byTpl = wins.groupBy(_._1)
    byTpl.foreach { case (t, ws) =>
      val sorted = ws.sortBy(_._2).map(_._3.split(" ").toSeq)
      for (j <- 0 until sorted.length - 1) {
        val a = sorted(j); val b = sorted(j + 1)
        // adjacent windows: the last (L - stride) words of j are the
        // first words of j+1 when no end-clamp hit; at minimum a long
        // contiguous run is shared
        val shared = a.toSet.intersect(b.toSet).size
        assert(shared >= (GenScale.WinLen - GenScale.WinStride) / 2,
          s"tpl $t windows $j,${j + 1} share only $shared words")
      }
      for (j <- 0 until sorted.length - 2) {
        val a = sorted(j); val c = sorted(j + 2)
        // stride > L/2: windows two apart cover disjoint template spans —
        // token-set overlap is only vocabulary noise, no contiguous run.
        // Check contiguity: no shared 5-gram.
        def grams(s: Seq[String]) = s.sliding(5).map(_.mkString(" ")).toSet
        val cl = grams(a).intersect(grams(c))
        assert(cl.isEmpty || sorted(j) == sorted(j + 2), // end-clamp collapse
          s"tpl $t windows $j,${j + 2} share contiguous 5-grams: ${cl.take(2)}")
      }
    }
  }
}
