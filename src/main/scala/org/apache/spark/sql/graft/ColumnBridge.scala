package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Registry-free Column ⇄ catalyst Expression bridge.
  *
  * Spark 4 made `Column` expression-agnostic (ColumnNode); the classic
  * converters live in [[org.apache.spark.sql.classic.ExpressionUtils]],
  * which is `private[sql]` — so library code that wires a custom catalyst
  * aggregate straight into the DataFrame DSL (graft.functions.DecSum6,
  * used by Relational.dsum's 60+ call sites across sessions that never
  * touch the function registry) needs this one-file subpackage bridge.
  * JVM-public, Scala-package-restricted: the standard extension-library
  * access pattern, no reflection and no behavior override.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
