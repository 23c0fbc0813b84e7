package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{RangeJoin, RuntimeFilters, Tables}
import graft.operators.Chunking

/** Scale-machinery queries added in round 3: runtime-filtered joins,
  * binned range joins, chunking, PII masking, and the stream-dedup batch
  * twin — every one oracle-gated (the operators are deterministic
  * relational plans; only their EXECUTION strategy is scale-specific).
  */
object ScaleOps {

  def defs: Seq[QueryDef] = Seq(d16, d17, d18, d19, s3)

  /** Bloom-prefiltered semi-join: lineitem rows whose order is URGENT.
    * The oracle is the plain semi-join — the Bloom pass must be invisible
    * in the result (no false negatives; false positives removed by the
    * exact join). */
  val d16 = QueryDef("d16_bloom_semi_join",
    (s, dir) => {
      val urgent = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
      RuntimeFilters.bloomSemiJoin(Tables.lineitem(s, dir), "l_orderkey",
          urgent, "o_orderkey")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          QueryDef.moneySum(col("l_extendedprice")).as("sum_price"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, COUNT(*) AS n,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM lineitem
      WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        WHERE o_orderpriority = '1-URGENT')
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Point-in-interval range join, binned to a hash equi-join (DuckDB
    * answers the same BETWEEN join with its IEJoin): shipments falling in
    * 14-day windows anchored at a deterministic order subsample. */
  val d17 = QueryDef("d17_range_join",
    (s, dir) => {
      val iv = Tables.orders(s, dir)
        .filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey").as("interval_id"),
          col("o_orderdate").cast(DateType).as("win_start"),
          date_add(col("o_orderdate").cast(DateType), 14).as("win_end"))
      val pts = Tables.lineitem(s, dir)
        .select(col("l_shipdate").cast(DateType).as("ship"), col("l_quantity"))
      RangeJoin.pointInInterval(pts, iv, "ship", "win_start", "win_end",
          binDays = 16)
        .groupBy("interval_id")
        .agg(count(lit(1)).as("n_shipments"),
          sum(QueryDef.dec(col("l_quantity"))).cast(DoubleType).as("sum_qty"))
        .orderBy("interval_id")
    },
    Some("""WITH iv AS (SELECT o_orderkey AS interval_id,
        CAST(o_orderdate AS DATE) AS win_start,
        CAST(o_orderdate AS DATE) + 14 AS win_end
        FROM orders WHERE o_orderkey % 97 = 0)
      SELECT interval_id, COUNT(*) AS n_shipments,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM iv JOIN lineitem
        ON CAST(l_shipdate AS DATE) BETWEEN win_start AND win_end
      GROUP BY interval_id ORDER BY interval_id"""))

  /** Overlapping token-window chunking (window 50, stride 40) — the
    * context-window preparation stage before token packing (d14). */
  val d18 = QueryDef("d18_doc_chunking",
    (s, dir) => Chunking.chunkByTokens(Tables.documents(s, dir),
        "doc_id", "text", window = 50, stride = 40)
      .orderBy("doc_id", "chunk_idx"),
    Some("""WITH t AS (SELECT doc_id,
        regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
      st AS (SELECT doc_id, toks,
        unnest(generate_series(0, len(toks) - 1, 40)) AS s
        FROM t WHERE len(toks) >= 1)
      SELECT doc_id, s // 40 AS chunk_idx,
        array_to_string(list_slice(toks, s + 1, s + 50), ' ') AS chunk_text,
        LEAST(len(toks) - s, 50) AS n_chunk_tokens
      FROM st ORDER BY doc_id, chunk_idx"""))

  /** PII masking: emails then long digit runs replaced with typed mask
    * tokens (regex families RE2 and Java agree on). The PII is injected
    * deterministically on BOTH engines so the masking is actually
    * exercised — the raw corpus is synthetic lowercase prose. */
  val d19 = QueryDef("d19_pii_mask",
    (s, dir) => {
      val emailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val numPat = "[0-9]{7,}"
      val raw = concat(col("text"), lit(" contact user"), col("doc_id"),
        lit("@mail.example.com or call "),
        (lit(5550000000L) + col("doc_id")).cast(StringType))
      Tables.documents(s, dir)
        .withColumn("__raw", raw)
        .withColumn("__m1", regexp_replace(col("__raw"), emailPat, "<EMAIL>"))
        .select(col("doc_id"),
          regexp_replace(col("__m1"), numPat, "<NUM>").as("masked_text"),
          size(regexp_extract_all(col("__raw"), lit(emailPat), lit(0)))
            .cast(LongType).as("n_emails"),
          size(regexp_extract_all(col("__m1"), lit(numPat), lit(0)))
            .cast(LongType).as("n_numbers"))
        .orderBy("doc_id")
    },
    Some("""WITH raw AS (SELECT doc_id,
        text || ' contact user' || doc_id || '@mail.example.com or call '
          || CAST(5550000000 + doc_id AS VARCHAR) AS r
        FROM documents),
      m1 AS (SELECT doc_id, r,
        regexp_replace(r, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}',
          '<EMAIL>', 'g') AS e FROM raw)
      SELECT doc_id,
        regexp_replace(e, '[0-9]{7,}', '<NUM>', 'g') AS masked_text,
        len(regexp_extract_all(r,
          '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS n_emails,
        len(regexp_extract_all(e, '[0-9]{7,}')) AS n_numbers
      FROM m1 ORDER BY doc_id"""))

  /** Keep-first dedup per (user, event_type) — the batch twin of the
    * watermarked streaming dropDuplicates (EventStreams.firstPerKeyStream):
    * on an in-order feed the stream keeps the earliest arrival, which is
    * exactly this row_number plan. */
  val s3 = QueryDef("s3_stream_dedup",
    (s, dir) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy("ts", "event_id")
      Tables.events(s, dir)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("user_id"), col("event_type"),
          col("ts").as("first_ts"), col("event_id"), col("value"))
        .orderBy("user_id", "event_type")
    },
    Some("""SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS first_ts,
        event_id, value
      FROM events
      QUALIFY row_number() OVER (PARTITION BY user_id, event_type
        ORDER BY CAST(ts AS TIMESTAMP), event_id) = 1
      ORDER BY user_id, event_type"""))
}
