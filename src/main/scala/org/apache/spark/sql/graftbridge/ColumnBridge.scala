package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved Column<->Expression conversion behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). This bridge re-exports
  * the two conversions for graft's custom Catalyst expressions — the
  * sanctioned pattern for third-party Catalyst extensions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Reverse a sort specification: a bare column becomes .desc; a column
    * already carrying a sort order flips BOTH its direction and its null
    * placement (asc nulls-first -> desc nulls-last etc.). Lives in this
    * bridge because Spark 4 columns are NODE trees and the SortOrder node
    * companion is `private[sql]`; the rebuild goes through the PUBLIC
    * sort API — a naive c.desc on an already-sorted column nests
    * SortOrder inside SortOrder, which fails at evaluation (SortOrder is
    * Unevaluable inside a row comparator). */
  def reverseSort(c: Column): Column = {
    import org.apache.spark.sql.internal.{SortOrder => SONode}
    c.node match {
      case SONode(child, dir, nulls, _) =>
        val cc = new Column(child)
        (dir == SONode.Ascending, nulls == SONode.NullsFirst) match {
          case (true, true) => cc.desc_nulls_last
          case (true, false) => cc.desc_nulls_first
          case (false, true) => cc.asc_nulls_last
          case (false, false) => cc.asc_nulls_first
        }
      case _ => c.desc
    }
  }
}
