package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenization (Sennrich, Haddow & Birch
  * 2016, arXiv:1508.07909 — the tokenizer family behind GPT-2/RoBERTa
  * vocabularies): iteratively merge the most frequent adjacent symbol
  * pair, starting from characters.
  *
  * THE published scale shape: BPE never trains on the corpus — it trains
  * on the DISTINCT-WORD COUNT table (ibid. §3.2, learn_bpe.py's
  * vocabulary dict), which is Heaps-sublinear in corpus size. So the one
  * corpus-scale pass here is the word count (explode + one hash
  * shuffle); every merge iteration is a pair-count + argmax over the
  * bounded word table (TakeOrdered — distributed top-1, never a global
  * window), and the number of iterations is the requested vocabulary
  * delta, a constant. Each iteration's updated table is localCheckpointed:
  * the loop would otherwise re-derive iteration i's reps once per later
  * iteration (the repo's multi-consumer rule, O(k²) hidden work).
  *
  * Symbol-sequence representation — chosen so BOTH the merge apply and an
  * independent SQL engine's replay are exact: a word's symbols are stored
  * as one string, each symbol PREFIXED by the US separator (0x1F), plus a
  * trailing end-of-word marker symbol `</w>`:
  *
  *   "low"  →  ␟l␟o␟w␟</w>
  *
  * Merging pair (a,b) is then the literal string replace of ␟a␟b by ␟ab —
  * no regex. Because every ␟ starts a symbol and the pattern carries its
  * OWN leading ␟ (symbols are prefix-delimited, not space-separated),
  * matches anchor exactly at symbol starts, never overlap through a
  * shared separator, and left-to-right non-overlapping `replace` is
  * byte-identical to the canonical greedy pairwise merge fold (a merged
  * symbol is strictly longer than its left part, so it can never
  * re-trigger as the `a` of the same pair). The marker can never be
  * confused with a corpus character sequence `<`,`/`,`w`,`>` — those each
  * carry their own ␟ prefix.
  *
  * Corpus contract: words containing the 0x1F separator are EXCLUDED on
  * both engines (it is a C0 control code — outside every text corpus
  * contract in this repo); characters are BMP code points (the `(.)`
  * char-split regex matches per code point on Java and RE2 alike there —
  * astral symbols would need a grapheme-aware split). Determinism: the
  * argmax tie-breaks (count DESC, left ASC, right ASC) on binary string
  * order, identical in Spark and DuckDB. */
object Bpe {

  val US = "\u001F" // ASCII unit separator
  val EndOfWord = "</w>"

  /** One merge step's result: the chosen pair and its weighted count. */
  final case class Merge(step: Int, left: String, right: String, n: Long)

  /** Distinct-word counts with the initial character-level symbol rep —
    * the only corpus-scale pass (explode + one shuffle on the word). */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame = {
    val word = explode(graft.functions.TextFns.tokens(col(textCol))).as("word")
    docs.select(word)
      .filter(col("word") =!= "" && !col("word").contains(US))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("rep", initialRep(col("word")))
  }

  /** `␟c` per character plus the trailing `␟</w>` marker symbol. */
  def initialRep(word: Column): Column =
    concat(regexp_replace(word, "(.)", US + "$1"), lit(US + EndOfWord))

  /** Adjacent symbol pairs of every word, weighted by word count. `syms`
    * is bound to an attribute BEFORE the indexing lambda (HOF lambdas get
    * no common-subexpression elimination — the d55 lesson), so the split
    * runs once per word, not once per pair. */
  private def weightedPairs(words: DataFrame): DataFrame =
    words
      .withColumn("syms0", split(col("rep"), US))
      .withColumn("syms", expr("slice(syms0, 2, size(syms0))"))
      .select(col("cnt"), explode(expr(
        "transform(sequence(1, size(syms) - 1), " +
          "j -> struct(syms[j-1] AS a, syms[j] AS b))")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("cnt").as("n"))

  /** Learn `k` merges. Returns the ordered merge table and the word table
    * with its final symbol rep (the apply side — `size(split(rep, US)) - 1`
    * is the word's subword token count). Stops early if no pair remains
    * (every word fully merged — only on degenerate corpora). */
  def trainMerges(words0: DataFrame, k: Int): (Seq[Merge], DataFrame) = {
    require(k >= 1, s"k must be >= 1, got $k")
    var words = words0.localCheckpoint(false)
    val merges = Seq.newBuilder[Merge]
    var step = 1
    var exhausted = false
    while (step <= k && !exhausted) {
      val best = weightedPairs(words)
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, n) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(step, a, b, n)
        words = words
          .withColumn("rep", org.apache.spark.sql.functions.replace(
            col("rep"), lit(US + a + US + b), lit(US + a + b)))
          .localCheckpoint(false)
        step += 1
      }
    }
    (merges.result(), words)
  }

  /** The DuckDB replay of the same training loop, as `k` chained CTE
    * blocks over `fromSql` (a relation with columns word, cnt). Kept HERE,
    * next to the algorithm it mirrors, so the two cannot drift silently;
    * the queries interpolate it into their oracles. Returns the prefix up
    * to and including `w<k>` (the final rep table); `b1..bk` hold the
    * chosen merges. */
  def oracleMergeChain(fromSql: String, k: Int): String = {
    val init =
      s"""w0 AS (SELECT word, cnt,
         |    regexp_replace(word, '(.)', chr(31) || '\\1', 'g')
         |      || chr(31) || '</w>' AS rep FROM ($fromSql))""".stripMargin
    val steps = (1 to k).map { i =>
      val prev = s"w${i - 1}"
      s"""p$i AS (SELECT t.a, t.b, CAST(SUM(cnt) AS BIGINT) AS n FROM (
         |    SELECT cnt, syms[i] AS a, syms[i+1] AS b
         |    FROM (SELECT cnt, string_split(rep, chr(31))[2:] AS syms FROM $prev),
         |      UNNEST(generate_series(1, len(syms) - 1)) AS u(i)) t
         |  GROUP BY 1, 2),
         |b$i AS (SELECT a, b, n FROM p$i ORDER BY n DESC, a ASC, b ASC LIMIT 1),
         |w$i AS (SELECT word, cnt,
         |    replace(rep, chr(31) || a || chr(31) || b, chr(31) || a || b) AS rep
         |  FROM $prev CROSS JOIN b$i)""".stripMargin
    }
    (init +: steps).mkString(",\n")
  }
}
