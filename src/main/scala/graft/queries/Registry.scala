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
final case class QueryDef(name: String,
                          fn: (SparkSession, String) => DataFrame,
                          oracle: Option[String])

object QueryDef {
  /** Exact money arithmetic: decimal cast so sums are order-independent
    * (double sums vary with shuffle arrival order — parity hazard). */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact decimal sum rendered as double — bit-identical to DuckDB's
    * `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`. */
  def moneySum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  val ONE: Column = lit(1).cast(DecimalType(18, 2))
}
