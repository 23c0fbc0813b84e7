package graft

import org.apache.spark.sql.functions._

/** DataSource V2 connector spec (SURVEY §2.1 S1): schema inference, typed
  * reads, file-level pruning on ticker filters, reader-level date bounds,
  * and column pruning — all observable through the plan's scan description.
  */
class FixtureJsonSourceSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("fixture_json").toFile
    d.deleteOnExit()
    def w(name: String, body: String): Unit = {
      val f = new java.io.File(d, name)
      val out = new java.io.PrintWriter(f)
      try out.write(body) finally out.close()
    }
    w("aapl.json",
      """[{"date":"2024-01-02","close":101.5,"volume":1000.0},
         {"date":"2024-01-03","close":102.25,"volume":1100.0},
         {"date":"2024-02-01","close":99.0,"volume":900.0}]""")
    w("msft.json",
      """[{"date":"2024-01-02","close":390.0,"volume":5000.0},
         {"date":"2024-01-04","close":395.5,"volume":5200.0}]""")
    d.getAbsolutePath
  }

  private def scanDesc(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("infers schema (ticker from filename, date typed, numerics double) and reads all files") {
    val df = spark.read.format("fixture-json").load(dir)
    assert(df.schema.fieldNames.toSeq == Seq("ticker", "date", "close", "volume"))
    assert(df.schema("date").dataType.typeName == "date")
    assert(df.schema("close").dataType.typeName == "double")
    assert(df.count() == 5)
    val tickers = df.select("ticker").distinct()
      .collect().map(_.getString(0)).toSet
    assert(tickers == Set("AAPL", "MSFT"))
  }

  test("ticker equality prunes whole files at planning time") {
    val df = spark.read.format("fixture-json").load(dir)
      .filter(col("ticker") === "AAPL")
    assert(scanDesc(df).contains("files=1/2"), scanDesc(df))
    assert(df.count() == 3)
    // IN-list prunes too, and results stay correct
    val in = spark.read.format("fixture-json").load(dir)
      .filter(col("ticker").isin("MSFT"))
    assert(scanDesc(in).contains("files=1/2"), scanDesc(in))
    assert(in.count() == 2)
  }

  test("date bounds reach the reader and the residual filter still re-checks") {
    val df = spark.read.format("fixture-json").load(dir)
      .filter(col("date") >= lit("2024-01-03") && col("date") < lit("2024-02-01"))
    assert(scanDesc(df).contains("dateBounds=[19725,19753]"), scanDesc(df))
    val rows = df.select("ticker", "close").orderBy("ticker")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(rows == Seq(("AAPL", 102.25), ("MSFT", 395.5)))
  }

  test("column pruning narrows the scan schema") {
    val df = spark.read.format("fixture-json").load(dir).select("close")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("[close#") && !scan.contains("volume"), scan)
    assert(df.as[Double](org.apache.spark.sql.Encoders.scalaDouble)
      .collect().sorted.toSeq == Seq(99.0, 101.5, 102.25, 390.0, 395.5))
  }

  test("user-supplied schema narrows parsing; missing fields read as null") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("ticker", StringType), StructField("date", DateType),
      StructField("close", DoubleType), StructField("dividend", DoubleType)))
    val df = spark.read.format("fixture-json").schema(schema).load(dir)
    assert(df.filter(col("dividend").isNull).count() == 5)
  }
}
