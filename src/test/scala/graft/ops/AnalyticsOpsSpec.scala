package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q103–q105 (histogram, triangles, retention): plain-Scala replays
  * plus the structurally known triangle count.
  */
class AnalyticsOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q103 equals a plain-Scala equi-width histogram replay") {
    val xs = spark.read.parquet(s"$dir/lineitem.parquet")
      .select($"l_extendedprice").as[Double].collect().toSeq
    val (mn, mx) = (xs.min, xs.max)
    def bucket(x: Double): Long =
      math.min(19L, math.floor(((x - mn) * 20.0) / (mx - mn)).toLong)
    val byB = xs.groupBy(bucket)
    val expect = byB.toSeq.map { case (b, vs) =>
      // decimal-routed sum, 6 dp — Tables.dsum's arithmetic
      val sum = vs.map(v => BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      (b, mn + (b.toDouble * (mx - mn)) / 20.0,
        mn + ((b + 1).toDouble * (mx - mn)) / 20.0, vs.size.toLong, sum)
    }.sortBy(_._1)
    val got = Relational.q103Histogram(spark, dir)
      .as[(Long, Double, Double, Long, Double)].collect().toSeq
    assert(got === expect)
    assert(got.map(_._4).sum === xs.size.toLong) // nothing dropped
  }

  test("q104 counts exactly two triangles per long-enough document") {
    val eligible = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
      .filter { case (_, t) =>
        t.toLowerCase.replaceAll("\\s+", " ").trim.length >= 130
      }.map(_._1).sorted
    val got = GenomicsCatalog.q104Triangles(spark, dir)
      .as[(Long, Long)].collect().toSeq
    assert(got === eligible.map(_ -> 2L))
  }

  test("q105 equals a plain-Scala cohort-retention replay") {
    val act = spark.read.parquet(s"$dir/events.parquet")
      .select($"user_id", expr("(ts div 1000) div 86400000000").as("day"))
      .as[(Long, Long)].collect().toSeq.distinct
    val cohort = act.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val cells = act.groupBy { case (u, d) => (cohort(u), d - cohort(u)) }
      .view.mapValues(_.size.toLong).toMap
    val expect = cells.toSeq.map { case ((c, o), n) =>
      (c, o, n, n.toDouble / cells((c, 0L)).toDouble)
    }.sortBy { case (c, o, _, _) => (c, o) }
    val got = Text.q105Retention(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === expect)
    // day-0 retention is exactly 1.0 for every cohort
    got.filter(_._2 == 0L).foreach(r => assert(r._4 === 1.0))
  }
}
