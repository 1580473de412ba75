package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q84 data mixing: quotas must be exactly water-filled from the
  * target weights (binding stratum fully consumed, nothing upsampled)
  * and selection must be the deterministic md5-ordered prefix of each
  * language — both recomputed here independently, in plain Scala, from
  * the raw table.
  */
class MixSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val weights = Map(
    "en" -> 0.25, "de" -> 0.25, "es" -> 0.25, "fr" -> 0.125, "zh" -> 0.125)

  private lazy val docs: Seq[(Long, String)] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"lang").as[(Long, String)].collect().toSeq

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private lazy val expectedQuotas: Map[String, Long] = {
    val n = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val scale = n.map { case (l, c) => c / weights(l) }.min
    weights.map { case (l, w) => l -> math.floor(w * scale).toLong }
  }

  private lazy val out: Seq[(Long, String, Int)] =
    Text.q84WeightedMix(spark, dir)
      .as[(Long, String, Int)].collect().toSeq

  test("per-language output counts are the water-filled quotas") {
    val got = out.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(got === expectedQuotas.filter(_._2 > 0), s"got $got")
  }

  test("the binding stratum is fully consumed; no stratum upsamples") {
    val n = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(expectedQuotas.exists { case (l, q) => q === n(l) },
      s"water-filling must exhaust one stratum: $expectedQuotas vs $n")
    expectedQuotas.foreach { case (l, q) => assert(q <= n(l), l) }
  }

  test("selection is the md5-ordered prefix of each language") {
    out.groupBy(_._2).foreach { case (lang, rows) =>
      val expect = docs.filter(_._2 == lang)
        .sortBy { case (id, _) => (md5hex(id.toString), id) }
        .take(expectedQuotas(lang).toInt).map(_._1).toSet
      assert(rows.map(_._1).toSet === expect, lang)
    }
  }

  test("achieved mix tracks the target proportions") {
    val total = out.size.toDouble
    out.groupBy(_._2).foreach { case (lang, rows) =>
      val share = rows.size / total
      // floor() can undershoot each stratum by <1 doc
      assert(math.abs(share - weights(lang)) < 0.02, s"$lang: $share")
    }
  }
}
