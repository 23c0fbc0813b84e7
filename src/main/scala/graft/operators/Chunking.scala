package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Document chunking for context-window preparation: split each document
  * into overlapping token windows (window tokens long, advancing by
  * stride). The work is one narrow projection + explode — no shuffle at
  * all; chunk rows inherit the parent document's partition, which is
  * exactly what a 100 TB tokenize-and-pack stage wants before its own
  * repartition-by-size.
  *
  * Counterpart of the reference-era fixed-context packing (d14 packs chunks
  * into budgets; this produces the chunks). Overlap (window − stride) keeps
  * boundary context, the standard RAG/pretraining windowing.
  */
object Chunking {

  /** One output row per (doc, window start): `chunk_idx` (0-based),
    * `chunk_text` (space-joined tokens), `n_chunk_tokens` (≤ window; the
    * final chunk may be short). Documents whose text has at least one
    * token produce ≥ 1 chunk; `stride` must be ≥ 1. */
  def chunkByTokens(docs: DataFrame, idCol: String, textCol: String,
                    window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1, s"window=$window stride=$stride")
    docs
      .withColumn("__toks", TextFns.tokens(col(textCol)))
      .filter(size(col("__toks")) >= 1)
      // starts 0, stride, 2·stride, … strictly below the token count
      .withColumn("__start",
        explode(sequence(lit(0L), (size(col("__toks")) - 1).cast("long"),
          lit(stride.toLong))))
      .select(col(idCol),
        (col("__start") / stride).cast("long").as("chunk_idx"),
        concat_ws(" ", slice(col("__toks"), (col("__start") + 1).cast("int"),
          lit(window))).as("chunk_text"),
        least(size(col("__toks")) - col("__start"), lit(window.toLong))
          .cast("long").as("n_chunk_tokens"))
  }
}
