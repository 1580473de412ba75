package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE merge kernel + training loop.
  *
  * [[Text.bpeMergeStep]] is validated against a plain-Scala
  * token-domain scanner (merge leftmost pair, continue after the
  * merged token) on HOSTILE tokens — regex metacharacters, the '+'
  * bytes that iterated merges mint by construction — the exact inputs
  * that broke the retired regexp_replace form. [[Text.q116BpeTrain]]
  * is replayed end-to-end in plain Scala on a planted corpus whose
  * round-2 election is forced to contain a compound ('+'-bearing)
  * token, and its staged merge table is checked against the output.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference merge: left-to-right, non-overlapping, token domain. */
  private def refMerge(ts: Seq[String], w1: String, w2: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < ts.length) {
      if (i + 1 < ts.length && ts(i) == w1 && ts(i + 1) == w2) {
        out += s"$w1+$w2"; i += 2
      } else { out += ts(i); i += 1 }
    }
    out.toSeq
  }

  private def runStep(docs: Seq[String], w1: String, w2: String): Seq[String] =
    docs.toDF("norm")
      .select(Text.bpeMergeStep(col("norm"), lit(w1), lit(w2)).as("m"))
      .as[String].collect().toSeq

  test("bpeMergeStep is left-to-right non-overlapping") {
    assert(runStep(Seq("a a a"), "a", "a") === Seq("a+a a"))
    assert(runStep(Seq("a a a a"), "a", "a") === Seq("a+a a+a"))
    assert(runStep(Seq("a a a a a"), "a", "a") === Seq("a+a a+a a"))
    assert(runStep(Seq("b a b a b"), "a", "b") === Seq("b a+b a+b"))
  }

  test("bpeMergeStep matches only whole tokens") {
    // w2 a suffix/prefix of neighbors: substring matches must not fire
    assert(runStep(Seq("xa b a bx a b"), "a", "b") === Seq("xa b a bx a+b"))
    assert(runStep(Seq("aa aab aa aa"), "aa", "aa") === Seq("aa aab aa+aa"))
  }

  test("bpeMergeStep merges hostile (regex-metachar) tokens byte-exactly") {
    val pairs = Seq(
      ("a+b", "c"), (".", "."), ("(", ")"), ("x*", "y+"),
      ("\\b", "\\w"), ("[z]", "$"), ("a|b", "?"), ("^", "{2}"))
    for ((w1, w2) <- pairs) {
      val docs = Seq(
        s"$w1 $w2", s"$w1 $w2 $w1 $w2", s"k $w1 $w2 k",
        s"$w2 $w1", s"$w1 $w1 $w2 $w2", s"$w1", "plain text only")
      val expect = docs.map(d =>
        refMerge(d.split(" ", -1).toSeq, w1, w2).mkString(" "))
      assert(runStep(docs, w1, w2) === expect, s"pair ($w1, $w2)")
    }
  }

  // ---- q116: full training loop on a planted corpus ----

  /** Plain-Scala BPE trainer: same election (max count, ties by
    * (w1, w2)) and same merge as the engine, `rounds` times.
    * Returns (round, w1, w2, cnt, tokens_after) per round.
    */
  private def refTrain(docs0: Seq[Seq[String]], rounds: Int)
      : Seq[(Int, String, String, Long, Long)] = {
    var docs = docs0
    (1 to rounds).flatMap { r =>
      val counts = docs.flatMap(ts =>
        if (ts.size >= 2) ts.sliding(2).map(p => (p(0), p(1))) else Seq.empty)
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      if (counts.isEmpty) Seq.empty
      else {
        val ((w1, w2), cnt) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        docs = docs.map(refMerge(_, w1, w2))
        Seq((r, w1, w2, cnt, docs.map(_.size.toLong).sum))
      }
    }
  }

  test("q116 equals a plain-Scala iterated trainer; compound tokens re-elect") {
    // round 1 must elect (a, b); from round 2 every election carries a
    // previously-minted '+' token — the case the regex form could not
    // run. Pairs exhaust after round 8, so the tail rounds also cover
    // the degenerate empty-election path (no rows, not a crash).
    val texts = Seq(
      "a b c d a b c d a b c d",
      "a b c d a b c d",
      "a b x a b y")
    val dir = java.nio.file.Files.createTempDirectory("bpe_corpus").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "src0") }
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val expect = refTrain(texts.map(_.split(" ", -1).toSeq), Text.BpeRounds)
    val got = Text.q116BpeTrain(spark, dir)
      .select($"round", $"w1", $"w2", $"cnt", $"tokens_after")
      .as[(Int, String, String, Long, Long)].collect().toSeq
    assert(got === expect)
    assert(got.head._2 == "a" && got.head._3 == "b")
    assert(got.tail.forall(r => r._2.contains("+") || r._3.contains("+")),
      "rounds 2+ must elect compound tokens on this corpus")
    // the staged merge table is the same artifact the output reports
    val staged = spark.read.parquet(s"${Dedup.stageRoot(dir)}/bpe_merges")
      .select($"round", $"w1", $"w2", $"cnt")
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(staged === expect.map(r => (r._1, r._2, r._3, r._4)))

    // ---- q121: encoding with the staged merges == sequential replay
    val merges = staged.map(r => (r._2, r._3))
    val expectEnc = texts.zipWithIndex.map { case (t0, i) =>
      val enc = merges.foldLeft(t0.split(" ", -1).toSeq) {
        case (ts, (w1, w2)) => refMerge(ts, w1, w2)
      }
      (i.toLong, enc.size.toLong)
    }
    val gotEnc = Text.q121BpeEncode(spark, dir)
      .select($"doc_id", $"n_tokens")
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    assert(gotEnc === expectEnc)
    // fully-merged docs collapse to few tokens — the encode must have
    // actually applied the compound merges, not just round 1
    assert(gotEnc.map(_._2).sum < texts.map(_.split(" ").length).sum / 2,
      gotEnc.toString)
  }
}
