package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** The one sanctioned crossing between graft code and Catalyst
  * expressions that have no public `functions._` wrapper (today: the
  * Bloom-filter pair Spark itself uses for runtime row filters, see
  * [[graft.text.TextOps.ingestDedupBloom]]). Lives under
  * `org.apache.spark.sql` because the Spark 4 Column↔Expression bridge
  * (`classic.ExpressionUtils`) is `private[sql]`; keeping the crossing in
  * ONE two-method object preserves the library-wide invariant that every
  * operator is built from codegen-capable expressions — anything routed
  * through here is still a native Catalyst expression, never a UDF. */
object CatalystBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
