package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vocab-driven one-hot encoding with an `_other` fallback bucket —
  * the reference's `encode_sector`/`encode_country`
  * (`/root/reference/src/dataprep/features/engineering/static_features.py:12-31`).
  * Explicit `when` columns (not MLlib OneHotEncoder) so column naming matches
  * the reference and everything stays inside whole-stage codegen.
  */
object Encoding {

  /** Reference slug rule: non-alphanumeric runs -> "_", lowercased
    * (`static_features.py:6-10`). */
  def slugify(s: String): String =
    s.replaceAll("[^A-Za-z0-9]+", "_").toLowerCase

  /** Slug as a column expression (same rule, for dynamic values). */
  def slugCol(c: Column): Column = lower(regexp_replace(c, "[^A-Za-z0-9]+", "_"))

  /** One-hot columns `<prefix>_<slug(v)>` for each vocab value plus
    * `<prefix>_other` for anything else (including null). Appended to the
    * frame.
    *
    * Alias matching is CASE-INSENSITIVE, exactly like the reference's
    * `val.lower() in {...}` check — which means an alias whose target is
    * NOT in the vocab routes those values to `_other`. The reference does
    * precisely that for sectors: any case of "technology"/"it" becomes
    * "Information Technology", which is absent from ALL_SECTORS, so even
    * the exact vocab value "Technology" one-hots as `sector_other` (quirk
    * verified against `_encode_one_hot`, `static_features.py:12-25`; it is
    * contract, SURVEY §7.5). */
  def oneHot(df: DataFrame, valueCol: String, vocab: Seq[String],
             prefix: String, aliases: Map[String, String] = Map.empty): DataFrame = {
    val normalized = aliases.foldLeft(col(valueCol)) { case (c, (from, to)) =>
      when(lower(col(valueCol)) === from.toLowerCase, lit(to)).otherwise(c)
    }
    val withHots = vocab.foldLeft(df) { (d, v) =>
      d.withColumn(s"${prefix}_${slugify(v)}",
        when(normalized === v, lit(1)).otherwise(lit(0)))
    }
    withHots.withColumn(s"${prefix}_other",
      when(normalized.isNull || !normalized.isin(vocab.map(lit(_)): _*), lit(1))
        .otherwise(lit(0)))
  }
}
