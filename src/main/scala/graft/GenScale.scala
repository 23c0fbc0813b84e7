package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-rehearsal data generator: tiles an existing testdata directory N×
  * into a larger one (default: sf0.1 → ~sf1) so the heavy queries can be
  * measured one decade up. NOT a statistics-faithful TPC-H generator — a
  * key-shifted tiling that preserves per-entity series shapes while
  * multiplying entity counts, which is exactly what the scale questions
  * here are about (does cost grow linearly in entities?).
  *
  * Tiling rules (tile 0 = the original rows, untouched):
  *   - region/nation: fixed dimensions, copied once (they don't scale).
  *   - customer/supplier/part/orders/lineitem/events: entity keys get a
  *     per-tile offset far above the source key range; dates/amounts stay —
  *     so each tile is an independent population over the same time range
  *     (history LENGTH per entity is constant, matching how corpus growth
  *     adds entities, not years).
  *   - documents: doc_id offset; every token gets a per-tile prefix and
  *     `source` a per-tile suffix — each tile is an independent corpus with
  *     the same internal duplicate structure, so dedup workloads scale
  *     linearly in tiles (vocabulary and blocking keys grow with the corpus,
  *     as they do in reality; naive text copies would instead create
  *     10×-size near-dup clusters and quadratic blow-ups that a real 10×
  *     corpus does not have).
  *   - embeddings: vec_id offset; the vector is cyclically rotated by the
  *     tile index (norm-preserving, so within-tile cosine structure is
  *     identical and cross-tile vectors are distinct points).
  *
  * A second mode, `deep`, grows the OTHER axis: same entities, histories
  * N× longer (each tile shifts the fact-table dates by i×7 years and
  * offsets only the uniqueness keys — order/event ids). Wide growth is
  * how corpora scale; deep growth is how per-entity time series scale,
  * and it is the shape that flips `TickerFeatures.choosePriceForm` to
  * the replication-free series form.
  *
  * A fourth mode, `dupmix` (r12 verdict task 1 — the dup-HEAVY
  * adversarial axis): every prior scale corpus was key-shifted and
  * dup-LIGHT ("no mass to remove"), yet mass removal is what the dedup
  * family exists for. dupmix replaces a parameterized fraction (default
  * 45%) of each tile's documents with members of nTpl template families:
  * member (tpl, depth) is the depth-th SLIDING WINDOW (length L words,
  * stride S) of a long concatenated template text, so
  *   - all docs at the same (tpl, depth) are byte-identical EXACT copies
  *     across every tile (d1/d51 removal mass, LSH bucket occupancy,
  *     d86 dropped-set mass grow with the corpus), and
  *   - adjacent depths share L−S contiguous words (high Jaccard) while
  *     depths ≥ 2 apart share none (stride ≥ L/2) — a true CHAIN graph,
  *     so low-threshold clustering (d23) sees diameter ≈ maxDepth and
  *     its propagation-round scaling is actually exercised.
  * The non-dup remainder keeps the wide-mode tile prefixing (dup-light
  * background). Documents table only, like `docs`; judged verify corpora
  * are untouched and doc ids stay far below the 1e9 twin-injection band.
  *
  * Usage: runMain graft.GenScale [srcDir] [outDir] [tiles] [wide|deep|docs|dupmix]
  *        dupmix extra args: [fracPct=45] [nTpl=50] [maxDepth=8]
  * Defaults: /root/testdata/sf0.1 → target/testdata/sf1, 10 tiles, wide.
  */
object GenScale {

  /** Window geometry: 100-word windows at stride 55 — stride > L/2 makes
    * non-adjacent windows share zero contiguous words (the chain
    * property); adjacent windows share 45 words (J ≈ 0.28 on 3-shingles,
    * above d23's 0.02 threshold, below d5/d40's 0.5 — so LSH families
    * stay exact-copy cliques while cluster chains are real). */
  private[graft] val WinLen = 100
  private[graft] val WinStride = 55

  /** The (tpl, depth) → window-text pool, built driver-side from a
    * BOUNDED prefix of the base corpus (nTpl × 16 docs, ≲1 MB at any SF —
    * templates are a SMALL pool by design, that is what makes the corpus
    * duplicative). Deterministic: pure function of the base table. */
  private[graft] def dupWindows(base: Seq[(Long, String, String)], nTpl: Int,
                                maxDepth: Int): Seq[(Long, Int, String, String)] = {
    require(base.nonEmpty, "dupmix needs a non-empty base documents table")
    val sorted = base.sortBy(_._1)
    val groupDocs = 16
    for {
      t <- 0 until nTpl
      j <- 0 to maxDepth
    } yield {
      val docs = (0 until groupDocs)
        .map(g => sorted((t * groupDocs + g) % sorted.length))
      val words = docs.flatMap(_._2.split("\\s+")).toArray
      val start = math.min(j * WinStride, math.max(0, words.length - WinLen))
      val win = words.slice(start, math.min(start + WinLen, words.length))
      (t.toLong, j, win.mkString(" "), docs.head._3)
    }
  }

  /** The dupmix documents relation (extracted so the spec can pin the
    * construction without running main): `tiles` tiles of `src`'s
    * documents, `fracPct`% of each replaced by template-family members.
    * Assignment is a pure hash of (doc_id, tile) — fully deterministic. */
  private[graft] def dupmixDocuments(spark: SparkSession, src: String,
                                     tiles: Int, fracPct: Int, nTpl: Int,
                                     maxDepth: Int, tileStride: Long): DataFrame = {
    require(fracPct >= 0 && fracPct <= 90, s"dup fraction $fracPct% out of range")
    require(nTpl >= 1 && maxDepth >= 0, "need >=1 template, >=0 depth")
    val base = spark.read.parquet(s"$src/documents.parquet")
    val pool = base.orderBy("doc_id").limit(nTpl * 16)
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val winDf = broadcast(
      spark.createDataFrame(dupWindows(pool, nTpl, maxDepth))
        .toDF("__tpl", "__depth", "__wtext", "__wlang"))
    def tileTag(i: Int): String = {
      val ds = Seq((i >> 8) & 15, (i >> 4) & 15, i & 15)
      (ds :+ (ds.sum & 15)).map(Integer.toHexString).mkString
    }
    (0 until tiles).map { i =>
      val marked = base.withColumn("__isdup",
        pmod(xxhash64(lit("dupmix"), col("doc_id"), lit(i)), lit(100)) < lit(fracPct))
      val normalBase = marked.filter(!col("__isdup")).drop("__isdup")
      val normal = (if (i == 0) normalBase else normalBase
          .withColumn("text", array_join(transform(split(col("text"), "\\s+"),
            w => concat(lit(tileTag(i)), w)), " "))
          .withColumn("source", concat(col("source"), lit(s"_t$i")))
          .withColumn("n_chars", length(col("text")).cast("long")))
        .withColumn("doc_id", col("doc_id") + i * tileStride)
        .select("doc_id", "text", "lang", "source", "n_chars")
      val dup = marked.filter(col("__isdup"))
        .withColumn("__tpl",
          pmod(xxhash64(lit("tpl"), col("doc_id"), lit(i)), lit(nTpl.toLong)))
        .withColumn("__depth",
          pmod(xxhash64(lit("dep"), col("doc_id"), lit(i)), lit(maxDepth + 1L))
            .cast("int"))
        .join(winDf, Seq("__tpl", "__depth"))
        .select((col("doc_id") + i * tileStride).as("doc_id"),
          col("__wtext").as("text"), col("__wlang").as("lang"),
          concat(lit("dupsrc"), col("__tpl")).as("source"),
          length(col("__wtext")).cast("long").as("n_chars"))
      normal.unionByName(dup)
    }.reduce(_.unionByName(_))
  }

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("target/testdata/sf1")
    val tiles = args.lift(2).map(_.toInt).getOrElse(10)
    val deep = args.lift(3).contains("deep")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Verify.makeSession(cpus)

    val C = 100000000L   // customer/user key offset per tile
    val S = 10000000L    // supplier
    val P = 100000000L   // part
    val O = 1000000000L  // order
    val E = 10000000000L // event
    // document/vector stride: deliberately SMALL. Judged fixtures inject
    // twins at doc_id + 1e9..7e9; a 1e8 stride put tile >= 10 ids INTO
    // that band (at sf10, 250k real docs sat above 5e9), so twin
    // injections collided with real ids and every probe of a
    // twin-injecting query measured a polluted workload (caught round 9:
    // n_dropped > n_pos in the d86 stage profile — an impossibility).
    // 1e6 keeps 300 tiles below 3e8, an order of magnitude under the
    // smallest injection offset.
    val D = 1000000L     // document / vector
    require(tiles.toLong * D + 1000000L <= 1000000000L,
      s"$tiles tiles would push doc ids into the twin-injection band (>= 1e9)")
    // collision-freedom must not rest on an UNCHECKED assumption about the
    // base tables (advisor r9): a base parquet generated at a larger SF
    // could carry ids >= D, silently overlapping tile id ranges and
    // mass-producing artificial exact twins — the artifact class round 9
    // removed. One cheap agg per table pins it at tiling time.
    Seq("documents" -> "doc_id", "embeddings" -> "vec_id").foreach {
      case (t, k) =>
        val mx = spark.read.parquet(s"$src/$t.parquet")
          .agg(max(col(k))).head().getLong(0)
        require(mx < D, s"$t.$k max $mx >= tile stride $D - tiles would overlap")
    }

    def tiled(table: String, tile: (DataFrame, Int) => DataFrame): DataFrame = {
      val base = spark.read.parquet(s"$src/$table.parquet")
      (0 until tiles).map(i => if (i == 0) base else tile(base, i))
        .reduce(_.unionByName(_))
    }

    def write(df: DataFrame, table: String): Unit = {
      df.write.mode(SaveMode.Overwrite).parquet(s"$out/$table.parquet")
      println(s"[genscale] $table: ${spark.read.parquet(s"$out/$table.parquet").count()} rows")
    }

    // fixed dimensions
    Seq("region", "nation").foreach { t =>
      write(spark.read.parquet(s"$src/$t.parquet"), t)
    }
    if (args.lift(3).contains("dupmix")) {
      // dup-heavy adversarial documents corpus (docs-only — the dedup/
      // suffix probes read nothing else; a full-table generation would
      // write ~GBs the probes never touch)
      val fracPct = args.lift(4).map(_.toInt).getOrElse(45)
      val nTpl = args.lift(5).map(_.toInt).getOrElse(50)
      val maxDepth = args.lift(6).map(_.toInt).getOrElse(8)
      write(dupmixDocuments(spark, src, tiles, fracPct, nTpl, maxDepth, D),
        "documents")
      spark.stop()
      return
    }
    if (deep) {
      // same entities; each tile pushes the fact dates i*7 years out
      Seq("customer", "supplier", "part", "documents", "embeddings").foreach { t =>
        write(spark.read.parquet(s"$src/$t.parquet"), t)
      }
      write(tiled("orders", (d, i) => d
        .withColumn("o_orderkey", col("o_orderkey") + i * O)
        .withColumn("o_orderdate",
          add_months(col("o_orderdate"), i * 7 * 12))), "orders")
      write(tiled("lineitem", (d, i) => d
        .withColumn("l_orderkey", col("l_orderkey") + i * O)
        .withColumn("l_shipdate",
          add_months(col("l_shipdate"), i * 7 * 12))), "lineitem")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // events keep user_id (deep = per-user history growth); event_id keeps
      // rows unique, so the stride only needs to spread load, not stay
      // disjoint. The ts shift dispatches on the OBSERVED encoding like
      // Tables.events: raw nanos longs for the TIMESTAMP(NANOS) testdata
      // generation (61 days × tile in nanos fits a Long for any sane tile
      // count), timestampadd for the TIMESTAMP(MICROS) generation.
      write(tiled("events", (d, i) => {
        val shifted =
          if (d.schema("ts").dataType == org.apache.spark.sql.types.LongType)
            col("ts") + expr(s"${i}L * ${61L * 86400L} * 1000000000")
          else expr(s"timestampadd(DAY, ${i * 61}, ts)")
        d.withColumn("event_id", col("event_id") + i * E)
          .withColumn("ts", shifted)
      }), "events")
    } else {
      // "docs" mode (r11 — the sf100 suffix probe): tile ONLY the documents
      // table. A 999-tile full generation writes ~25 GB of TPC-H rows the
      // suffix probes never read; the corpus-positions axis is the one
      // under test.
      val docsOnly = args.lift(3).contains("docs")
      if (!docsOnly) {
      write(tiled("customer",
        (d, i) => d.withColumn("c_custkey", col("c_custkey") + i * C)), "customer")
      write(tiled("supplier",
        (d, i) => d.withColumn("s_suppkey", col("s_suppkey") + i * S)), "supplier")
      write(tiled("part",
        (d, i) => d.withColumn("p_partkey", col("p_partkey") + i * P)), "part")
      write(tiled("orders", (d, i) => d
        .withColumn("o_orderkey", col("o_orderkey") + i * O)
        .withColumn("o_custkey", col("o_custkey") + i * C)), "orders")
      write(tiled("lineitem", (d, i) => d
        .withColumn("l_orderkey", col("l_orderkey") + i * O)
        .withColumn("l_partkey", col("l_partkey") + i * P)
        .withColumn("l_suppkey", col("l_suppkey") + i * S)), "lineitem")
      // events.ts is TIMESTAMP(NANOS): read as raw nanos longs (the same
      // switch Tables.events uses) and write the long back — Tables.events'
      // `ts div 1000` conversion reads either encoding
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      write(tiled("events", (d, i) => d
        .withColumn("event_id", col("event_id") + i * E)
        .withColumn("user_id", col("user_id") + i * C)), "events")
      }
      // Tile token tag: 3 base-16 digits + 1 checksum digit, so ANY two
      // distinct tags differ in >= 2 chars (a single-digit change breaks
      // the checksum). The earlier sequential t$i tags made tiles t10/t11
      // differ by ONE char per token — with ~4 tokens in a 40-char prefix
      // that is edit distance 4, and EVERY doc gained ~dozens of
      // systematic cross-tile "near-duplicates": d28's sf10 output was
      // 3,700x sf0.1's for 100x data, 100% of sampled pairs cross-tile
      // artifacts. Real corpus growth adds entities, not 1-edit copies of
      // every doc; >= 2 chars per token x >= 4 tokens per prefix keeps
      // cross-tile prefixes past any sane edit threshold while each tile
      // keeps the SAME internal near-dup structure.
      def tileTag(i: Int): String = {
        val ds = Seq((i >> 8) & 15, (i >> 4) & 15, i & 15)
        (ds :+ (ds.sum & 15)).map(Integer.toHexString).mkString
      }
      write(tiled("documents", (d, i) => d
        .withColumn("doc_id", col("doc_id") + i * D)
        .withColumn("text", array_join(transform(split(col("text"), "\\s+"),
          w => concat(lit(tileTag(i)), w)), " "))
        .withColumn("source", concat(col("source"), lit(s"_t$i")))
        .withColumn("n_chars", length(col("text")).cast("long"))), "documents")
      if (!docsOnly)
      write(tiled("embeddings", (d, i) => d
        .withColumn("vec_id", col("vec_id") + i * D)
        .withColumn("embedding", concat(
          slice(col("embedding"), i + 1, 10000),
          slice(col("embedding"), 1, i)))), "embeddings")
    }
    spark.stop()
  }
}
