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
      builder: Seq[Expression] => Expression): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = new FunctionIdentifier(name)
    // skip when present: registerFunction would replace (same builder,
    // harmless) but logs a "replaced a previously registered function"
    // warning per call, and ensureRegistered runs once per query build
    if (!registry.functionExists(ident)) {
      registry.registerFunction(ident, info, builder)
    }
  }
}
