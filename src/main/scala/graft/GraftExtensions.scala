package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.LongDotProduct

/** Session extensions registering the engine's custom expressions —
  * installed via `spark.sql.extensions=graft.GraftExtensions` (all
  * entry points set it) or `withExtensions` in code.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_ldot"),
      new ExpressionInfo(classOf[LongDotProduct].getName, "vec_ldot",
        "vec_ldot(a, b) - exact dot product of two BIGINT arrays (codegen)"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "vec_ldot takes exactly 2 arguments")
        LongDotProduct(children.head, children(1))
      }))
  }
}
