package graft.features

import org.apache.spark.sql.{DataFrame, Dataset}

/** Typed view of the dynamic feature frame — the `Dataset[T]` surface for
  * downstream consumers that want compile-time field checks (the bulk of
  * the engine stays `DataFrame` because the store schema is dynamic,
  * SURVEY §1.4). Field names mirror the reference's EXPECTED_COLUMNS;
  * leading-digit columns get Scala-safe names via the explicit mapping. */
final case class FeatureRow(
    ticker: String,
    as_of: java.sql.Date,
    return_6m: Option[Double],
    return_12m: Option[Double],
    volatility: Option[Double],
    max_drawdown_1y: Option[Double],
    sector_relative_6m: Option[Double],
    sma_50_200_delta: Option[Double],
    net_debt_to_ebitda: Option[Double],
    ebit_interest_cover: Option[Double],
    ebit_interest_cover_capped: Option[Boolean],
    eps_cagr_3y: Option[Double],
    fcf_cagr_3y: Option[Double],
    dividend_yield: Option[Double],
    dividend_cagr_3y: Option[Double],
    dividend_cagr_5y: Option[Double],
    yield_vs_5y_median: Option[Double],
    pe_ratio: Option[Double],
    pfcf_ratio: Option[Double],
    payout_ratio: Option[Double],
    has_eps_cagr_3y: Int,
    has_fcf_cagr_3y: Int,
    has_dividend_yield: Int,
    has_dividend_cagr_3y: Int,
    has_dividend_cagr_5y: Int,
    has_ebit_interest_cover: Int)

object FeatureRow {
  /** `6m_return`/`12m_return` need backtick-free Scala names. */
  private val renames = Seq("6m_return" -> "return_6m", "12m_return" -> "return_12m")

  def toDataset(df: DataFrame): Dataset[FeatureRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    val renamed = renames.foldLeft(df) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }
    val doubled = renamed.schema.fields.foldLeft(renamed) { (d, f) =>
      // the normalized store is Float32; the typed row is Double
      if (f.dataType.typeName == "float")
        d.withColumn(f.name, d(f.name).cast("double"))
      else d
    }
    doubled.as[FeatureRow]
  }
}
