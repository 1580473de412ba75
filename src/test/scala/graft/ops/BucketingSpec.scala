package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing = the co-located join pattern for 100 TB (SURVEY §4.1
  * "vertex-cut partitioning" analog): both fact tables bucketed on the
  * join key join WITHOUT any shuffle exchange, while the plain parquet
  * join of the same data shuffles both sides. On a real cluster this is
  * the difference between a network-bound and a local join.
  */
class BucketingSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("bucketed orders⋈lineitem joins with no shuffle exchange") {
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val l = spark.read.parquet(s"$dir/lineitem.parquet")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    l.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")

    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    // sanity: same result as the plain-parquet join (also finalizes the
    // adaptive plan so the executed-plan string below is the real one)
    val plain = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    assert(joined.collect().toSet === plain.collect().toSet)

    // the join itself must be shuffle-free: no exchange on either join
    // key (the final agg's exchange is on o_orderpriority and is fine)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning(o_orderkey")
      && !plan.contains("hashpartitioning(l_orderkey"), plan)
    val plainPlan = plain.queryExecution.executedPlan.toString
    assert(plainPlan.contains("hashpartitioning(o_orderkey")
      || plainPlan.contains("hashpartitioning(l_orderkey")
      || plainPlan.contains("BroadcastHashJoin"), plainPlan)
  }

  test("hive-partitioned write prunes partitions at read time") {
    // the other physical-layout lever at 100 TB: partition the corpus
    // by a low-cardinality routing column and a filter on it must skip
    // whole directories (PartitionFilters), never scan-then-filter
    val out = java.nio.file.Files.createTempDirectory("docs-part").toString
    spark.read.parquet(s"$dir/documents.parquet")
      .write.mode("overwrite").partitionBy("lang").parquet(out)
    val read = spark.read.parquet(out).where(col("lang") === "en")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan.take(600))
    // correctness: pruned read equals the filtered plain read
    val expected = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("lang") === "en").count()
    assert(read.count() === expected)
    // evidence the pruning is real: files actually TOUCHED by the
    // filtered scan (input_file_name is assigned post-pruning) are a
    // strict subset of the layout's files — inputFiles would lie here,
    // it lists the relation's files before partition pruning
    def touched(df: org.apache.spark.sql.DataFrame) =
      df.select(input_file_name()).distinct().count()
    assert(touched(read) < touched(spark.read.parquet(out)),
      s"${touched(read)} vs ${touched(spark.read.parquet(out))}")
  }
}
