package graft.ops

import graft.SparkSpec

/** Corpus drift report (q150): a planted corpus whose four signals
  * are hand-computable, plus structural invariants on the real table.
  */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("planted corpus: every drift signal matches the hand computation") {
    val d = java.nio.file.Files.createTempDirectory("graft-drift").toString
    Seq(
      (1L, "hello world foo", "xx"),   // corpus
      (2L, "bar baz qux", "xx"),       // corpus
      (9L, "hello world foo", "xx"),   // batch: exact dup of doc 1
      (19L, "hello zzz", "xx"))        // batch: one unseen word
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val row = Text.q150CorpusDrift(spark, d)
      .as[(String, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().toSeq
    assert(row.size === 1)
    val (lang, cd, bd, cmt, bmt, dup, nw) = row.head
    assert(lang === "xx" && cd === 2L && bd === 2L)
    assert(cmt === Some(3.0))   // (3 + 3) / 2
    assert(bmt === Some(2.5))   // (3 + 2) / 2
    assert(dup === Some(0.5))   // doc 9 collides with doc 1
    assert(nw === Some(0.25))   // {hello, world, foo, zzz} -> only zzz new
  }

  test("real table: splits partition the corpus and every rate is a probability") {
    val dir = "/root/testdata/sf0.001"
    val total = Tables.t(spark, dir, "documents")
      .groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    val got = Text.q150CorpusDrift(spark, dir)
      .as[(String, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().toSeq
    assert(got.map(_._1).toSet === total.keySet)
    got.foreach { case (lang, cd, bd, cmt, bmt, dup, nw) =>
      assert(cd + bd === total(lang), s"$lang split sizes")
      (dup.toSeq ++ nw.toSeq).foreach(r =>
        assert(r >= 0.0 && r <= 1.0, s"$lang rate $r"))
      (cmt.toSeq ++ bmt.toSeq).foreach(m => assert(m > 0.0, s"$lang mean"))
    }
  }
}
