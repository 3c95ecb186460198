// Spark 4's unified Column API made the Expression-backed Column
// constructor `private[sql]` (classic-mode internals live in
// org.apache.spark.sql.classic). Custom Catalyst expressions still need a
// lift into the public Column API, so this one-file bridge lives inside the
// org.apache.spark.sql package hierarchy — the same technique Spark
// extension libraries use. Nothing else in the repo leaves the graft
// namespace.
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst Expression bridge for graft's native expressions. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
