package graft.ops

import graft.SparkSpec

/** q184's temperature rebalance on a planted skew: the tiny language's
  * target share must EXCEED its natural share (the whole point of
  * τ < 1), its clamped accept rate must admit every doc
  * (deterministically — rate ≥ 1 ⇒ threshold ≥ 2⁶⁰ ⇒ no hash can
  * miss), the head language thins, and the realized total lands near
  * the target T = total div 4 (Bernoulli by hash, so bounded, not
  * exact).
  */
class TemperatureSampleSpec extends SparkSpec {
  import spark.implicits._

  test("small language up-weights to full acceptance; head thins toward T") {
    val dir = java.nio.file.Files.createTempDirectory("tempsample").toString
    val rows = (1L to 1000L).map(i => (i, "big", s"doc $i")) ++
      (2001L to 2010L).map(i => (i, "tiny", s"doc $i"))
    rows.toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Text.q184TemperatureSample(spark, dir)
      .as[(String, Long, Double, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    val (_, nBig, beforeBig, targetBig, rateBig, accBig) = out("big")
    val (_, nTiny, beforeTiny, targetTiny, rateTiny, accTiny) = out("tiny")
    assert(nBig === 1000L && nTiny === 10L)
    // τ=0.5 flattens: tiny's target share rises, big's falls
    assert(targetTiny > beforeTiny, s"$targetTiny vs $beforeTiny")
    assert(targetBig < beforeBig, s"$targetBig vs $beforeBig")
    // tiny's rate clamps at 1 ⇒ every doc accepted, deterministically
    assert(rateTiny === 1.0)
    assert(accTiny === 10L)
    // big thins: T = 1010 div 4 = 252; expected big acceptances =
    // rate·1000 ≈ 230; hash realization is deterministic but we pin
    // only the bounds so the spec doesn't encode one md5 draw
    assert(rateBig > 0.0 && rateBig < 1.0, rateBig.toString)
    assert(accBig > 100L && accBig < 400L, accBig.toString)
    assert(accBig + accTiny <= 1010L)
  }
}
