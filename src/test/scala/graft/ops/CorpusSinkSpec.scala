package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSinkSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("partitioned corpus layout prunes directories, bounds files, and round-trips") {
    val out = java.nio.file.Files.createTempDirectory("corpus-sink").toString
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    CorpusSink.writePartitioned(docs, out, partCol = "lang",
      sortCol = "doc_id", maxRecordsPerFile = 10L)

    // layout: one directory per lang value, hive-style
    val langs = docs.select($"lang").distinct().as[String].collect().toSet
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs === langs.map(l => s"lang=$l"))

    // every data file respects the records bound
    val files = new java.io.File(out).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
    files.foreach { f =>
      val n = spark.read.parquet(f.getPath).count()
      assert(n <= 10, s"${f.getName} has $n rows")
    }

    // nothing lost or duplicated, and per-partition content matches
    val back = spark.read.parquet(out)
    assert(back.count() === docs.count())
    val origEn = docs.where($"lang" === "en").select($"doc_id")
      .as[Long].collect().sorted.toSeq
    val backEn = back.where($"lang" === "en").select($"doc_id")
      .as[Long].collect().sorted.toSeq
    assert(backEn === origEn)

    // a lang filter becomes a PartitionFilter — no data filter, no scan
    // of the other directories
    val plan = back.where($"lang" === "en")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan.take(600))
  }
}
