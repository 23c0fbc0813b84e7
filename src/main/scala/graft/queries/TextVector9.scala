package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Similarity

/** Twelfth coverage batch (round 8, continued): the IVFADC search
  * composition — [[graft.operators.Similarity.ivfAdcTopK]], Jégou, Douze
  * & Schmid 2011 §IV ("Product Quantization for Nearest Neighbor
  * Search", IEEE TPAMI 33(1)) — judged end to end. e8 judged the ADC
  * scan, e9 the codes, e11 the coarse (IVF) assignment; e12 judges what
  * the paper actually ships: coarse cells + RESIDUAL product codes +
  * per-probed-cell ADC, one query. */
object TextVector9 {

  def defs: Seq[QueryDef] = Seq(e12)

  /** Residual codebook stand-in for the judged query, derived exactly the
    * way e8/e9 derive their raw-space codebooks (anchor slices; the dense
    * multiples-of-31 contract, loudly required) — except in RESIDUAL
    * space: each codebook anchor is first assigned to its coarse cell
    * through the JUDGED assignment path ([[Similarity.assignCellsSim]] —
    * reusing it means the codebook cannot drift from the oracle's
    * replayed assignment), and the codeword is the anchor-minus-centroid
    * difference, sliced per subspace. All arithmetic is exact: float →
    * double widening then one IEEE subtraction per element, identical to
    * DuckDB's CAST(a[i] AS DOUBLE) − CAST(c[i] AS DOUBLE). The production
    * trainer is [[Similarity.pqTrain]] over the residual column (e10
    * gates its KMeans path); this stand-in keeps e12's judged surface
    * independently replayable. */
  private def residualCodebooks(emb: DataFrame,
                                coarse: DataFrame): Array[Array[Array[Double]]] = {
    val cbAnchors = emb.filter(col("vec_id") % 31 === 0 && col("vec_id") < 496)
    val rows = Similarity.assignCellsSim(cbAnchors, coarse, "vec_id", "embedding")
      .join(broadcast(coarse.select(col("centroid_id"),
        col("centroid_vec").as("__acv"))), Seq("centroid_id"))
      .select(col("id"), col("v"), col("__acv"))
      .orderBy("id").collect()
    require(rows.nonEmpty, "embeddings table has no codebook anchor vectors")
    val ids = rows.map(_.getLong(0)).toSeq
    require(ids == Seq.tabulate(ids.length)(_ * 31L),
      s"codebook anchor ids must be exactly 0,31,..,${(ids.length - 1) * 31} " +
        s"(dense multiples of 31 — the oracle labels codeword j = vec_id/31); got $ids")
    val res = rows.map { r =>
      val v = r.getSeq[Float](1)
      val c = r.getSeq[Float](2)
      require(v != null && c != null && v.length == 64 && c.length == 64,
        "codebook anchors must carry full 64-dim vectors")
      Array.tabulate(64)(i => v(i).toDouble - c(i).toDouble)
    }
    Array.tabulate(8)(s => res.map(_.slice(s * 8, s * 8 + 8)))
  }

  /** IVFADC top-10 over the embeddings table: coarse cells = the d41/e11
    * anchor lattice (vec_id % 50), corpus vectors exactly assigned and
    * residual-encoded into the inverted file (cell, id, codes); queries
    * (the e8 vec_id % 83 sample) probe their nProbe = 2 nearest cells and
    * ADC-scan ONLY those cells' codes through a per-(query, cell)
    * residual lookup table. Judged per returned neighbor: the probed cell
    * it came from, the rounded ADC distance, and the rank — the oracle
    * re-derives the assignment (e11's CTEs), the residual codebook, the
    * argmin encode, the probe selection, the per-cell LUT, and the
    * s-ordered ADC fold, so construction AND search are both judged.
    *
    * SCALE CONTRACT: the serving scan is n·nProbe/k_c codes per query
    * (~n/5 here) instead of n, each code 8 bytes instead of 256 — the
    * two multipliers (probe restriction, 32× compression) that make a
    * 100 TB embedding sweep an I/O problem instead of a FLOP problem.
    * Like e8, the judged FIXTURE grows its query set with the corpus
    * (n/83), so the judged pair mass is n²·nProbe/(83·k_c); production
    * query batches are bounded. Recall is nProbe-governed (e7's
    * measured-recall note); the paper's +R re-rank is exact-cosine over
    * the returned k·|q| pairs downstream. */
  val e12 = QueryDef("e12_ivfadc_topk",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val coarse = emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid_vec"))
      val cells = Similarity.assignCellsSim(emb, coarse, "vec_id", "embedding")
      val cb = residualCodebooks(emb, coarse)
      val queries = emb.filter(col("vec_id") % 83 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      Similarity.ivfAdcTopK(queries, cells, coarse, cb, k = 10, nProbe = 2)
        .select(col("query_id"), col("centroid_id").as("cell_id"),
          col("neighbor_id"), round(col("adc"), 6).as("adc_r"), col("rank"))
        // lazy checkpoint: the final global orderBy's range-sampling pass
        // would otherwise re-execute the whole assignment+encode+scan
        // subtree (the repo's multi-consumer rule); the checkpoint is
        // k·|queries| rows
        .localCheckpoint(false)
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH a AS (
        SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id % 50 = 0),
      exs AS (SELECT e.vec_id, a.cid, ${QueryDef.cosSql64("e.embedding", "a.cv")} AS sim
        FROM embeddings e CROSS JOIN a),
      asg AS (SELECT vec_id, cid, cv FROM (
          SELECT x.vec_id, x.cid, a.cv, row_number() OVER (PARTITION BY x.vec_id
            ORDER BY round(x.sim, 9) DESC, x.cid ASC) AS rn
          FROM exs x JOIN a ON a.cid = x.cid) t
        WHERE rn = 1),
      cb AS (SELECT CAST(g.vec_id // 31 AS INT) AS j, s,
          list_transform(range(1, 9), i ->
            CAST(e.embedding[s*8+i] AS DOUBLE) - CAST(g.cv[s*8+i] AS DOUBLE)) AS cw
        FROM (SELECT vec_id, cv FROM asg WHERE vec_id % 31 = 0 AND vec_id < 496) g
        JOIN embeddings e ON e.vec_id = g.vec_id
        CROSS JOIN (SELECT UNNEST(generate_series(0, 7)) AS s)),
      dists AS (SELECT e.vec_id, g.cid AS acid, c.s, c.j,
          list_sum(list_transform(range(1, 9), i ->
            ((CAST(e.embedding[c.s*8+i] AS DOUBLE) - CAST(g.cv[c.s*8+i] AS DOUBLE)) - c.cw[i])
            * ((CAST(e.embedding[c.s*8+i] AS DOUBLE) - CAST(g.cv[c.s*8+i] AS DOUBLE)) - c.cw[i]))) AS d
        FROM embeddings e JOIN asg g ON g.vec_id = e.vec_id CROSS JOIN cb c),
      codes AS (SELECT vec_id, acid, s, j FROM (
          SELECT vec_id, acid, s, j,
            row_number() OVER (PARTITION BY vec_id, s ORDER BY d, j) AS rn
          FROM dists) t
        WHERE rn = 1),
      qp AS (SELECT q.vec_id AS query_id, q.embedding AS qv, a.cid, a.cv,
          ${QueryDef.cosSql64("q.embedding", "a.cv")} AS sim
        FROM embeddings q CROSS JOIN a WHERE q.vec_id % 83 = 0),
      probe AS (SELECT query_id, qv, cid, cv FROM (
          SELECT query_id, qv, cid, cv, row_number() OVER (PARTITION BY query_id
            ORDER BY round(sim, 9) DESC, cid ASC) AS rn FROM qp) t
        WHERE rn <= 2),
      lut AS (SELECT p.query_id, p.cid, c.s, c.j,
          list_sum(list_transform(range(1, 9), i ->
            ((CAST(p.qv[c.s*8+i] AS DOUBLE) - CAST(p.cv[c.s*8+i] AS DOUBLE)) - c.cw[i])
            * ((CAST(p.qv[c.s*8+i] AS DOUBLE) - CAST(p.cv[c.s*8+i] AS DOUBLE)) - c.cw[i]))) AS d
        FROM probe p CROSS JOIN cb c),
      adc AS (SELECT l.query_id, x.acid AS cell_id, x.vec_id AS neighbor_id,
          list_sum(list(l.d ORDER BY l.s)) AS adc
        FROM codes x JOIN lut l ON l.cid = x.acid AND l.s = x.s AND l.j = x.j
        WHERE l.query_id <> x.vec_id
        GROUP BY 1, 2, 3)
      SELECT query_id, cell_id, neighbor_id, round(adc, 6) AS adc_r,
        CAST(rank AS INT) AS rank FROM (
        SELECT query_id, cell_id, neighbor_id, adc,
          row_number() OVER (PARTITION BY query_id
            ORDER BY round(adc, 9), neighbor_id) AS rank
        FROM adc) t
      WHERE rank <= 10 ORDER BY query_id, rank"""))
}
