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

  test("q128 genuinely stops at the measured vocab target") {
    // layered corpus engineered so every round mints +1 vocab: round r
    // elects (xr, yr) with count 20-r+1 (all counts distinct — fully
    // deterministic), and one "xr z"/"yr z" keeper doc per pair keeps
    // both source tokens alive standalone, so the merge adds its
    // compound without consuming either source. v0 = 15 tokens
    // (x1..x7, y1..y7, z), target = v0 + BpeVocabBudget = 21, hit
    // after round 6 — the loop must stop there, 4 rounds early.
    val texts = (1 to 7).flatMap { r =>
      Seq.fill(21 - r)(s"x$r y$r") ++ Seq(s"x$r z", s"y$r z")
    }
    val dir = java.nio.file.Files.createTempDirectory("bpe_vocab").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "src0") }
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = Text.q128BpeVocabTrain(spark, dir)
      .select($"round", $"w1", $"w2", $"cnt", $"vocab_size")
      .as[(Int, String, String, Long, Long)].collect().toSeq
    assert(got.size === 6, got.toString)
    for ((r, i) <- got.zipWithIndex) {
      assert(r._1 === i + 1)
      assert(r._2 === s"x${i + 1}" && r._3 === s"y${i + 1}", r.toString)
      assert(r._4 === (20 - i).toLong)
      assert(r._5 === (15 + i + 1).toLong) // +1 vocab per round
    }
    assert(got.dropRight(1).forall(_._5 < 21L))
    assert(got.last._5 >= 21L)
    // the staged artifact holds exactly the executed rounds
    val staged = spark.read
      .parquet(s"${Dedup.stageRoot(dir)}/bpe_merges_vocab")
      .select($"round").as[Int].collect().toSeq.sorted
    assert(staged === (1 to 6))
  }

  test("q128 stops on pair exhaustion, not just the vocab target") {
    val dir = java.nio.file.Files.createTempDirectory("bpe_exh").toString
    Seq((1L, "x y", "en", "src0"), (2L, "x y", "en", "src0"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Text.q128BpeVocabTrain(spark, dir)
      .select($"round", $"w1", $"w2")
      .as[(Int, String, String)].collect().toSeq
    // round 1 merges the only pair; round 2 finds nothing and stops
    assert(got === Seq((1, "x", "y")))
  }

  test("q129 token ids equal a plain-Scala encode + vocab-join replay") {
    // "q" appears 5 times but only ever as a whole single-token
    // document: no pair ever contains it, so no merge round can
    // consume it, and its count clears the vocab cutoff — the
    // guaranteed in-vocab survivor (everything in the multi-token
    // docs is either merged into an OOV compound or too rare)
    val texts = Seq(
      "a b c d a b c d a b c d",
      "a b c d a b c d",
      "a b x a b y") ++ Seq.fill(5)("q")
    val dir = java.nio.file.Files.createTempDirectory("bpe_ids").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "src0") }
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = Text.q129BpeTokenIds(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)

    // replay: train (shared reference trainer), encode, then id-map
    // against q96's vocab law — rank by (count DESC, token ASC) over
    // pre-merge whitespace words with count >= 5; OOV (including every
    // minted compound) is 0
    val merges = refTrain(texts.map(_.split(" ", -1).toSeq), Text.BpeRounds)
      .map(r => (r._2, r._3))
    val wordCounts = texts.flatMap(_.split(" ", -1))
      .groupBy(identity).view.mapValues(_.size).toMap
    val vocab = wordCounts.filter(_._2 >= 5).toSeq
      .sortBy { case (t, c) => (-c, t) }
      .zipWithIndex.map { case ((t, _), i) => t -> (i + 1).toLong }.toMap
    val expect = texts.zipWithIndex.map { case (t0, i) =>
      val enc = merges.foldLeft(t0.split(" ", -1).toSeq) {
        case (ts, (w1, w2)) => refMerge(ts, w1, w2)
      }
      val ids = enc.map(tok => vocab.getOrElse(tok, 0L))
      val md5hex = java.security.MessageDigest.getInstance("MD5")
        .digest(ids.mkString(",").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (i.toLong, enc.size.toLong, ids.count(_ == 0L).toLong,
        java.lang.Long.parseLong(md5hex.substring(0, 15), 16))
    }
    assert(got === expect)
    // the corpus must exercise BOTH sides: some known ids, some OOV
    assert(got.map(_._3).sum > 0, "no OOV tokens exercised")
    assert(got.exists(r => r._3 < r._2), "no in-vocab tokens exercised")
  }
}
