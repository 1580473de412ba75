package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Parquet loaders for the driver test tables plus the numeric parity
  * helpers shared by every oracle-checked query.
  *
  * Parity rule: any aggregated double goes through
  * `DECIMAL(28,6)` so Spark and the DuckDB oracle both do exact decimal
  * arithmetic (order-independent) and cast the *same* decimal back to
  * double — bit-identical results regardless of partitioning/merge
  * order. Plain double `SUM` would differ at ulp level between engines
  * (different add order) and break the driver's hash compare.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    // catalog queries may run on a caller-provided session that lacks
    // the extensions config — install the custom functions idempotently
    graft.GraftExtensions.ensureRegistered(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  private val Dec = DecimalType(28, 6)

  /** Exact (decimal-routed) sum of a double expression, as double. */
  def dsum(e: Column): Column = sum(e.cast(Dec)).cast("double")

  /** Exact average: decimal sum divided by count, as double. */
  def davg(e: Column): Column = sum(e.cast(Dec)).cast("double") / count(lit(1))

  /** Exact per-row decimal rounding of a double expression (6 dp). */
  def dcol(e: Column): Column = e.cast(Dec).cast("double")
}
