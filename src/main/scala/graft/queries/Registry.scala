package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One judged query: a Spark plan over the testdata tables plus (when
  * SQL-expressible) the equivalent DuckDB oracle SQL. Column names MUST
  * match between the two — the driver sorts columns by name and hashes
  * values. Every query orders its output by a unique key so row order is
  * deterministic on both engines.
  */
/** `twins`: for a query with NO oracle (rows-only by design — sketch
  * hashes the oracle engine cannot replay, ML fits, the full-store build),
  * the names of the ORACLE-GATED queries that sandwich its construction
  * (an md5-basis twin of the same pipeline, or value-judges of its
  * output). Machine-checked (r12 verdict task 6): the registry refuses a
  * no-oracle query with no declared twins or a twin that is missing /
  * itself oracle-less, and the compare gate fails the rows-only query
  * when a declared twin fails — the sandwich argument stops living in
  * prose. */
final case class QueryDef(name: String,
                          fn: (SparkSession, String) => DataFrame,
                          oracle: Option[String],
                          twins: Seq[String] = Nil)

object QueryDef {
  /** Registry invariants, enforced on every SparkEntry.allDefs evaluation
    * (so Verify and every registry-touching spec fail loudly): unique
    * names; every no-oracle (rows-only) query declares ≥1 sandwich twin;
    * every declared twin exists and is itself oracle-gated (r12 verdict
    * task 6 — the sandwich argument is machine-checked, not prose). */
  def validate(defs: Seq[QueryDef]): Unit = {
    val dups = defs.groupBy(_.name).collect { case (n, ds) if ds.size > 1 => n }
    require(dups.isEmpty, s"duplicate query names would shadow registry entries: $dups")
    val byName = defs.map(d => d.name -> d).toMap
    defs.filter(_.oracle.isEmpty).foreach { d =>
      require(d.twins.nonEmpty,
        s"${d.name} has no oracle and declares no sandwich twins — " +
          "rows-only queries must name the oracle-gated queries that judge " +
          "their construction (QueryDef.twins)")
    }
    defs.filter(_.twins.nonEmpty).foreach { d =>
      d.twins.foreach { t =>
        val td = byName.getOrElse(t, throw new IllegalArgumentException(
          s"requirement failed: ${d.name} declares twin '$t' which is not " +
            "in the registry"))
        require(td.oracle.nonEmpty,
          s"${d.name} declares twin '$t' which has no oracle — a rows-only " +
            "twin cannot carry the sandwich")
      }
    }
  }

  /** Exact money arithmetic: decimal cast so sums are order-independent
    * (double sums vary with shuffle arrival order — parity hazard). */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact decimal sum rendered as double — bit-identical to DuckDB's
    * `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`. */
  def moneySum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  val ONE: Column = lit(1).cast(DecimalType(18, 2))

  /** 64-dim dot product as DuckDB SQL — the identical sequential left-fold
    * (in index order, doubles) as [[graft.functions.VectorExprs]], so both
    * engines produce the same bits (the e2-proven construction). Shared by
    * the embedding oracles so the formulation cannot fork. */
  def dotSql64(a: String, b: String): String =
    s"list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  /** Cosine with the zero-norm guard mirroring CosineSim's NULL: without
    * it DuckDB yields NaN, which is GREATER than everything in its
    * ordering and comparisons (NaN >= t is TRUE), while Spark's NULL
    * drops out of filters and sorts last under DESC — a zero vector would
    * silently diverge any gate built on the unguarded form. */
  def cosSql64(a: String, b: String): String =
    s"""CASE WHEN ${dotSql64(a, a)} > 0 AND ${dotSql64(b, b)} > 0
      THEN ${dotSql64(a, b)} / (sqrt(${dotSql64(a, a)}) * sqrt(${dotSql64(b, b)})) END"""
}
