package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Bridge into the session's (private[sql]) function registry so the
  * engine's custom expressions work on ANY SparkSession — including
  * ones created without `spark.sql.extensions=graft.GraftExtensions`
  * (e.g. a caller's own session passed to `SparkEntry.entry`).
  * Registration is idempotent; [[graft.GraftExtensions]] remains the
  * front door when the config is available.
  */
object GraftFunctionRegistrar {
  def register(spark: SparkSession, name: String, info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(new FunctionIdentifier(name), info, builder)
}
