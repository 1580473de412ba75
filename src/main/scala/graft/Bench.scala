package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (codegen, parquet footers) so the first timed
    // query doesn't absorb JVM/IO startup; not part of the measurement
    spark.range(1000000L).selectExpr("sum(id)").collect()
    graft.ops.Tables.names.foreach { n =>
      try spark.read.parquet(s"$sfDir/$n.parquet").limit(1).collect()
      catch { case _: Throwable => }
    }
    // deterministic name order for stable cross-round comparisons.
    // Queries whose first run is slow get a second run and report the
    // min — the first run can absorb multi-second codegen/JIT of that
    // query's shapes; fast queries skip the re-run to bound bench wall
    // time.
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // operators that cache intermediates (dedup shingle sets) would
      // otherwise accumulate blocks across all 48 queries
      spark.catalog.clearCache()
      dt
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val first = once(fn)
      name -> (if (first > 0.8) math.min(first, once(fn)) else first)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
