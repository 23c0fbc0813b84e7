package graft

import org.apache.spark.sql.functions._
import graft.pipeline.TickerValidation

/** Validator behavior ported from the reference's
  * test_validate_dynamic_row.py / test_validate_soft.py. */
class TickerValidationSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("range check: dividend_yield 999 flags out-of-bounds") {
    val df = Seq(("T", d("2024-01-01"), 999.0)).toDF("ticker", "as_of", "dividend_yield")
    val out = TickerValidation.validate(df)
      .select("validation_status", "violations").collect()(0)
    assert(out.getString(0) == "flagged")
    assert(out.getString(1).contains("dividend_yield out-of-bounds"))
  }

  test("range check: in-bounds row is ok, empty violations") {
    val df = Seq(("T", d("2024-01-01"), 0.04)).toDF("ticker", "as_of", "dividend_yield")
    val out = TickerValidation.validate(df)
      .select("validation_status", "violations").collect()(0)
    assert(out.getString(0) == "ok")
    assert(out.getString(1) == "")
  }

  test("range check: NaN CAGR does not flag (allow-missing set)") {
    val df = Seq(("T", d("2024-01-01"), Double.NaN)).toDF("ticker", "as_of", "eps_cagr_3y")
    val out = TickerValidation.validate(df).select("validation_status").as[String].head()
    assert(out == "ok")
  }

  test("lower bound: volatility 0.0 is inside [0,3); 6m_return -1.0 is outside (-1,10)") {
    val df = Seq(("T", d("2024-01-01"), 0.0, -1.0))
      .toDF("ticker", "as_of", "volatility", "6m_return")
    val out = TickerValidation.validate(df)
      .select("validation_status", "violations").collect()(0)
    assert(out.getString(0) == "flagged")
    assert(out.getString(1).contains("6m_return out-of-bounds"))
    assert(!out.getString(1).contains("volatility"))
  }

  test("jump check: dividend_yield 0.01 -> 0.2 across as_of rows flags abnormal change") {
    val df = Seq(("T", d("2023-01-01"), 0.01), ("T", d("2024-01-01"), 0.2))
      .toDF("ticker", "as_of", "dividend_yield")
    val rows = TickerValidation.validate(df).orderBy("as_of")
      .select("validation_status", "violations").collect()
    assert(rows(0).getString(0) == "ok")
    assert(rows(1).getString(0) == "flagged")
    // byte-parity with validate_dynamic_row.py:133
    assert(rows(1).getString(1) ==
      "dividend_yield abnormal change: 0.0100 → 0.2000 (×20.00)")
  }

  test("jump check skipped when prev below floor") {
    // pe_ratio floor is 5.0; prev 4.0 -> 100.0 is a 25x jump but prev < floor
    val df = Seq(("T", d("2023-01-01"), 4.0), ("T", d("2024-01-01"), 100.0))
      .toDF("ticker", "as_of", "pe_ratio")
    val rows = TickerValidation.validate(df).orderBy("as_of")
      .select("validation_status").as[String].collect()
    assert(rows.forall(_ == "ok"))
  }

  test("nullification: inf ebit_interest_cover is nulled and tagged") {
    val df = Seq(("T", d("2024-01-01"), Double.PositiveInfinity, true))
      .toDF("ticker", "as_of", "ebit_interest_cover", "ebit_interest_cover_capped")
    val out = TickerValidation.validate(df)
      .select("ebit_interest_cover", "violations").collect()(0)
    assert(out.isNullAt(0))
    assert(out.getString(1).contains("eic_nullified_unstable_or_nonfinite"))
  }

  test("nullification: tiny ebitda nulls net_debt_to_ebitda") {
    val df = Seq(("T", d("2024-01-01"), 5.0, 0.5))
      .toDF("ticker", "as_of", "net_debt_to_ebitda", "ebitda")
    val out = TickerValidation.validate(df)
      .select("net_debt_to_ebitda", "violations").collect()(0)
    assert(out.isNullAt(0))
    assert(out.getString(1).contains("nde_nullified_tiny_ebitda"))
  }

  test("consistency: capped numerically above raw flags eic_capped_gt_raw") {
    val df = Seq(("T", d("2024-01-01"), 1.0, 5.0))
      .toDF("ticker", "as_of", "ebit_interest_cover", "ebit_interest_cover_capped_num")
      .withColumnRenamed("ebit_interest_cover_capped_num", "ebit_interest_cover_capped")
    val out = TickerValidation.validate(df).select("violations").as[String].head()
    assert(out.contains("eic_capped_gt_raw"))
  }

  test("soft flags: tiny fcf+ebitda nullify both ratios, jump checks skip nullified values (test_validate_soft)") {
    // current row would trip pfcf (5 -> 1000, x200) and nde (1 -> 50, x50)
    // jumps, but the nullification pass blanks both first.
    val df = Seq(
      ("XYZ", d("2023-12-31"), null.asInstanceOf[java.lang.Double],
        5.0: java.lang.Double, null.asInstanceOf[java.lang.Double], 1.0: java.lang.Double),
      ("XYZ", d("2024-12-31"), 0.2: java.lang.Double, 1000.0: java.lang.Double,
        0.4: java.lang.Double, 50.0: java.lang.Double))
      .toDF("ticker", "as_of", "free_cash_flow", "pfcf_ratio", "ebitda",
        "net_debt_to_ebitda")
    val rows = TickerValidation.validate(df).orderBy("as_of").collect()
    val cur = rows(1)
    assert(cur.getAs[String]("validation_status") == "flagged")
    val v = cur.getAs[String]("violations")
    assert(v.contains("pfcf_ratio_nullified_tiny_fcf"))
    assert(v.contains("nde_nullified_tiny_ebitda"))
    assert(!v.contains("abnormal change")) // jump skipped on nullified values
    assert(cur.isNullAt(cur.fieldIndex("pfcf_ratio")))
    assert(cur.isNullAt(cur.fieldIndex("net_debt_to_ebitda")))
  }

  test("multiple violations join with ';' and status flags once") {
    val df = Seq(("T", d("2024-01-01"), 999.0, 5000.0))
      .toDF("ticker", "as_of", "dividend_yield", "pe_ratio")
    val out = TickerValidation.validate(df)
      .select("validation_status", "violations").collect()(0)
    assert(out.getString(0) == "flagged")
    assert(out.getString(1).split(";").length == 2)
  }
}
