package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{DynamicRow, FeatureBlocks, Pipeline, QueryDef, Relational, Relational2, Relational3, Relational4, Relational5, Relational6, Relational7, ScaleOps, TextVector, TextVector2, TextVector3, TextVector4, TextVector5, TextVector6, TextVector7, TextVector8, TextVector9, TextVector10, TextVector11, TextVector12, TextVector13, TextVector14, TextVector15, TextVector16, TextVector17, TextVector18}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator from SURVEY §2 plus
  * the LLM-data-pipeline layer; `oracleSql` the DuckDB-equivalent SQL for
  * every SQL-expressible query (hash-compared by the driver at sf0.01).
  */
object SparkEntry {

  def allDefs: Seq[QueryDef] = {
    val defs = Relational.defs ++ Relational2.defs ++ Relational3.defs ++
      Relational4.defs ++ Relational5.defs ++ Relational6.defs ++
      Relational7.defs ++ TextVector.defs ++
      TextVector2.defs ++ TextVector3.defs ++ TextVector4.defs ++
      TextVector5.defs ++ TextVector6.defs ++ TextVector7.defs ++
      TextVector8.defs ++ TextVector9.defs ++ TextVector10.defs ++ TextVector11.defs ++ TextVector12.defs ++ TextVector13.defs ++ TextVector14.defs ++ TextVector15.defs ++ TextVector16.defs ++ TextVector17.defs ++ TextVector18.defs ++
      Pipeline.defs ++ ScaleOps.defs ++ FeatureBlocks.defs ++ DynamicRow.defs
    QueryDef.validate(defs)
    defs
  }

  /** rows-only query → its declared oracle-gated sandwich twins. Dumped
    * by Verify as twins.json; the compare gate fails the rows-only query
    * when any twin fails. */
  def twinManifest: Map[String, Seq[String]] =
    allDefs.filter(_.oracle.isEmpty).map(d => d.name -> d.twins).toMap

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1.fn(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(o => d.name -> o)).toMap
}
