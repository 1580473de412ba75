package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The schema-adaptive `Tables.tsUs` contract — the helper that ended
  * the round-8 events.ts regression: the same epoch-micros come out
  * whether the driver ships `ts` as BIGINT epoch-nanos or as parquet
  * timestamp[us] (TIMESTAMP_NTZ), and any OTHER physical type fails
  * loudly at load instead of ten queries deep.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // positive epochs only — the data contract (nanos BIGINT would
  // overflow a Long for ancient dates anyway)
  private val usValues = Seq(0L, 1L, 1700000000123456L)

  test("BIGINT epoch-nanos and TIMESTAMP_NTZ micros land on the same ts_us") {
    val asLong = usValues.map(us => Tuple1(us * 1000L)).toDF("ts")
    val asNtz = usValues.map(Tuple1(_)).toDF("us")
      .select(timestamp_micros($"us").cast("timestamp_ntz").as("ts"))
    val fromLong = asLong.select(Tables.tsUs(asLong).as("ts_us"))
      .as[Long].collect().toSeq
    val fromNtz = asNtz.select(Tables.tsUs(asNtz).as("ts_us"))
      .as[Long].collect().toSeq
    assert(fromLong === usValues)
    assert(fromNtz === usValues) // session is pinned UTC in SparkSpec
  }

  test("nanos floor-divide: sub-microsecond precision truncates like the oracle") {
    val df = Seq(Tuple1(1999L), Tuple1(-1L)).toDF("ts")
    val got = df.select(Tables.tsUs(df).as("u")).as[Long].collect().toSeq
    // SQL `div` truncates toward zero on the positive value and DuckDB
    // epoch_us sees the already-truncated parquet micros; negatives
    // do not occur in the data contract but must not crash
    assert(got.head === 1L)
  }

  test("any other physical type for ts fails loudly at load") {
    val df = Seq(Tuple1("2024-01-01")).toDF("ts")
    val e = intercept[IllegalArgumentException] { Tables.tsUs(df) }
    assert(e.getMessage.contains("schema drift"), e.getMessage)
  }
}
