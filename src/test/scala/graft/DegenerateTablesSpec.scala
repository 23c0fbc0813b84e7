package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._

/** Full-registry robustness gate over degenerate RELATIONAL rows — the
  * TPC-H-side twin of PathologicalCorpusSpec: an orphan order (customer
  * unknown), an orphan lineitem (no parent order) with zero quantity/price
  * and 100% discount, a customer with no orders, and a single-event user
  * with NULL value/props at the exact epoch boundary. Every registered
  * query must RUN (wrong-answer coverage is the oracle gate's job; this
  * pins the no-crash contract at relational edges the driver data never
  * produces). */
class DegenerateTablesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("degenerate").toString
    for (t <- Seq("region", "nation", "supplier", "part",
        "documents", "embeddings")) {
      Files.copy(Paths.get(s"/root/testdata/sf0.001/$t.parquet"),
        Paths.get(s"$d/$t.parquet"), StandardCopyOption.REPLACE_EXISTING)
    }
    val base = "/root/testdata/sf0.001"
    def ts(s: String) = to_timestamp(lit(s))
    spark.read.parquet(s"$base/orders.parquet")
      .unionByName(Seq(1).toDF("x").select(
        lit(900001L).as("o_orderkey"), lit(90001L).as("o_custkey"),
        lit("F").as("o_orderstatus"), lit(0.0).as("o_totalprice"),
        ts("1990-01-01 00:00:00").as("o_orderdate"),
        lit("5-LOW").as("o_orderpriority")))
      .coalesce(1).write.parquet(s"$d/orders.parquet")
    spark.read.parquet(s"$base/lineitem.parquet")
      .unionByName(Seq(1).toDF("x").select(
        lit(900002L).as("l_orderkey"), lit(1L).as("l_partkey"),
        // cast: the base column is int32 — a long literal would silently
        // widen the whole rewritten column to int64 (a physical schema
        // the driver never produces)
        lit(1L).as("l_suppkey"), lit(1).cast("int").as("l_linenumber"),
        lit(0.0).as("l_quantity"), lit(0.0).as("l_extendedprice"),
        lit(1.0).as("l_discount"), lit(0.0).as("l_tax"),
        lit("N").as("l_returnflag"), lit("O").as("l_linestatus"),
        ts("1990-01-01 00:00:00").as("l_shipdate")))
      .coalesce(1).write.parquet(s"$d/lineitem.parquet")
    spark.read.parquet(s"$base/customer.parquet")
      .unionByName(Seq(1).toDF("x").select(
        lit(90002L).as("c_custkey"), lit("no-orders").as("c_name"),
        lit(0L).cast("int").as("c_nationkey"), lit(-999.99).as("c_acctbal"),
        lit("BUILDING").as("c_mktsegment")))
      .coalesce(1).write.parquet(s"$d/customer.parquet")
    graft.core.Tables.events(spark, base)
      .unionByName(Seq(1).toDF("x").select(
        lit(900003L).as("event_id"),
        ts("2024-01-01 00:00:00").as("ts"),
        lit(90003L).as("user_id"), lit("view").as("event_type"),
        lit(null).cast("double").as("value"),
        lit(null).cast("string").as("props")))
      .coalesce(1).write.parquet(s"$d/events.parquet")
    d
  }

  test("every registered query survives the degenerate relational rows") {
    val failures = SparkEntry.allDefs.flatMap { q =>
      try { q.fn(spark, dir).count(); None }
      catch { case e: Throwable =>
        Some(s"${q.name}: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries crashed on degenerate rows:\n" +
        failures.mkString("\n"))
  }
}
