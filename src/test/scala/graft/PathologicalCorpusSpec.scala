package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Registry-wide robustness gate: every documents/embeddings query must
  * RUN (no exception, any row count) against a pathological corpus the
  * clean synthetic testdata never exercises — empty text, whitespace-only
  * text, byte-identical duplicates, a single-token doc, a NULL lang, a
  * punctuation-only doc, accents, a degenerate all-one-token doc, and
  * zero-norm embedding vectors. Wrong-answer coverage lives in the DuckDB
  * oracle gate; THIS spec pins the no-crash contract at the edges (the
  * failure mode oracles can't see because the driver corpus never
  * produces these rows). */
class PathologicalCorpusSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("pathological").toString
    // TPC-H side tables come from sf0.001 unchanged (some d-queries join
    // orders/lineitem); documents + embeddings are replaced wholesale
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events")) {
      Files.copy(Paths.get(s"/root/testdata/sf0.001/$t.parquet"),
        Paths.get(s"$d/$t.parquet"), StandardCopyOption.REPLACE_EXISTING)
    }
    val docs = Seq(
      (0L, "", "en", "src0", 0L),
      (1L, "   ", "en", "src1", 3L),
      (2L, "identical twin document body here", "en", "src2", 33L),
      (3L, "identical twin document body here", "de", "src3", 33L),
      (4L, "hello", "fr", "src4", 5L),
      (5L, "a doc with a null language tag", null, "src5", 30L),
      (6L, Seq.fill(200)("spam").mkString(" "), "en", "src6", 999L),
      (7L, "!!! ??? ... ,,, ;;;", "zh", "src7", 19L),
      (8L, "héllo wörld çédille ñoño", "es", "src8", 24L),
      (9L, (1 to 60).map(i => s"w$i").mkString(" ") + ". The be to of and that.",
        "en", "src9", 300L),
      (10L, null, "en", "src0", 0L) // NULL text: must be attributed, not crash
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val emb = (0L to 9L).map { i =>
      val v: Seq[Float] =
        if (i == 0L || i == 5L) Seq.fill(64)(0.0f) // zero-norm vectors
        else (0 until 64).map(j => ((i * 31 + j * 7) % 13 - 6).toFloat / 7f)
      (i, v, (i % 3).toInt)
    }.toDF("vec_id", "embedding", "label")
    emb.coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private val corpusQueries =
    SparkEntry.allDefs.filter(q => q.name.startsWith("d") ||
      q.name.startsWith("e") || q.name.startsWith("m"))
  // the m-family included since round 10: on this corpus every multimodal
  // fixture filters to ZERO assets (all docs short or non-ASCII), so the
  // sweep pins the empty-asset-relation path the clean testdata never takes

  test("every documents/embeddings query survives the pathological corpus") {
    assert(corpusQueries.nonEmpty)
    val failures = corpusQueries.flatMap { q =>
      try { q.fn(spark, dir).count(); None }
      catch { case e: Throwable =>
        Some(s"${q.name}: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries crashed on the pathological corpus:\n" +
        failures.mkString("\n"))
  }
}
