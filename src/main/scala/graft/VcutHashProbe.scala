package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic: band-key dispersion of the q191 planted table's
  * pHashes (hot-bucket risk at replica scale), over the 128-bit
  * containment hash's 4×32-bit bands (the round-16 widening). */
object VcutHashProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .appName("vcut-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val media = graft.ops.Multimodal.vcutAviTable(spark, dir)
    val hs = graft.ops.Multimodal.cutSampledFrameHashes(spark, media)
      .localCheckpoint()
    val n = hs.count()
    val distinctH = hs.select(col("h0"), col("h1")).distinct().count()
    val bands = hs.select(col("doc_id"),
      explode(expr("transform(sequence(0, 3), b -> struct(b AS band, " +
        "shiftrightunsigned(IF(b < 2, h0, h1), (b % 2) * 32) " +
        "& 4294967295 AS bkey))")).as("bk"))
      .select(col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val occ = bands.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("n"))
    occ.agg(max(col("n")).as("max_occ"),
        expr("percentile(n, 0.99)").as("p99"),
        count(lit(1)).as("n_buckets"),
        sum(when(col("n") > 50, 1).otherwise(0)).as("hot"))
      .show(false)
    println(s"rows=$n distinct_hashes=$distinctH")
    spark.stop()
  }
}
