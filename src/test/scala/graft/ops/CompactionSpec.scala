package graft.ops

import graft.SparkSpec

/** q154 — the tombstone-compaction operator that executes what q135's
  * report recommends. The load-bearing pin is the lifecycle identity:
  * compacting the delete feed into the index and then searching with
  * NO mask returns exactly what serving-time masking (q144) returned
  * between refreshes — deletion is one function, executed at refresh
  * time vs query time.
  */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val work = Dedup.stageRoot(dir)

  test("q154 == q144 row-for-row: compaction and serving-time masking are the same function") {
    val masked = Similarity.q144TombstoneAnn(spark, dir)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val compacted = Similarity.q154CompactedSearch(spark, dir)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(compacted.nonEmpty)
    assert(compacted === masked)
  }

  test("the compacted assignment is exactly cells minus the delete feed, and the consumed feed is truncated") {
    Similarity.q154CompactedSearch(spark, dir).collect() // ensure staged
    val cells = spark.read.parquet(s"$work/cells")
      .select("vec_id").as[Long].collect().toSet
    val dels = spark.read.parquet(s"$work/deletes")
      .select("vec_id").as[Long].collect().toSet
    val compact = spark.read.parquet(s"$work/cells_compact")
      .select("vec_id").as[Long].collect().toSet
    assert(dels.nonEmpty, "the planted delete feed must not be empty")
    assert(compact === cells -- dels)
    // the truncated feed reads back as an EMPTY table with the schema
    // intact — the state a post-refresh serving tier starts from
    val remaining = spark.read.parquet(s"$work/deletes_compacted")
    assert(remaining.columns.toSeq === Seq("vec_id"))
    assert(remaining.count() === 0L)
  }

  test("a mask over the compacted index with the truncated feed is the identity: no row changes") {
    Similarity.q154CompactedSearch(spark, dir).collect() // ensure staged
    // q144's mask shape, pointed at the compacted assets: anti-joins
    // against an empty delete table must drop nothing
    import org.apache.spark.sql.functions._
    val empty = spark.read.parquet(s"$work/deletes_compacted")
    val iv = Similarity.scaledVectors(spark, dir)
      .join(spark.read.parquet(s"$work/cells_compact"), "vec_id")
      .join(broadcast(empty), Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cluster"), col("v"), col("nrm"))
    val probes = spark.read.parquet(s"$work/probes")
      .join(spark.read.parquet(s"$work/cells_compact")
        .select(col("vec_id").as("query_id")), Seq("query_id"), "left_semi")
      .join(broadcast(empty.withColumnRenamed("vec_id", "query_id")),
        Seq("query_id"), "left_anti")
      .join(Similarity.scaledVectors(spark, dir)
        .withColumnRenamed("vec_id", "query_id"), "query_id")
      .select(col("query_id"), col("cluster"),
        col("v").as("qv"), col("nrm").as("qn"))
    val maskedOverCompacted = Similarity.searchCells(probes, iv, topK = 5)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val plain = Similarity.q154CompactedSearch(spark, dir)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(maskedOverCompacted === plain)
  }
}
