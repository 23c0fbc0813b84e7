package graft.analysis

import org.apache.spark.sql.DataFrame

/** Console feature report — the reference's
  * `src/dataprep/visualization/report.py:7-49`: groups feature columns by
  * prefix (`GROUP_PREFIXES`, constants.py:27-34), prints value + source
  * hint per group. Driver-side rendering over a 1-row-per-entity frame. */
object Report {

  val groupPrefixes: Seq[(String, Seq[String])] = Seq(
    "Price-Based Features" -> Seq("6m_", "12m_", "volatility", "max_drawdown_1y"),
    "Fundamentals" -> Seq("net_debt", "ebit_"),
    "Growth" -> Seq("eps_cagr", "fcf_cagr"),
    "Dividends" -> Seq("dividend_", "yield_"),
    "Valuation" -> Seq("pe_ratio", "pfcf_ratio"),
    "Sector Encoding" -> Seq("sector_"))

  val sourceHints: Map[String, String] = Map(
    "Price-Based Features" -> "prices",
    "Dividends" -> "dividends",
    "Valuation" -> "ratios",
    "Sector Encoding" -> "profile")

  /** Render the feature report for one entity row (first row of `df`). */
  def render(df: DataFrame): String = {
    val row = df.head
    val cols = df.columns
    val sb = new StringBuilder
    groupPrefixes.foreach { case (group, prefixes) =>
      val members = cols.filter(c => prefixes.exists(c.startsWith)).sorted
      if (members.nonEmpty) {
        val hint = sourceHints.get(group).map(h => s" (from $h)").getOrElse("")
        sb.append(s"== $group$hint ==\n")
        members.foreach { c =>
          val v = row.getAs[Any](c)
          sb.append(f"  $c%-28s ${if (v == null) "null" else v.toString}\n")
        }
      }
    }
    sb.result()
  }
}
