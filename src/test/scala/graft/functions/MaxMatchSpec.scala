package graft.functions

import graft.SparkSpec
import graft.ops.{Dedup, Staged, Text}
import org.apache.spark.sql.functions._

/** The codegen'd `max_match` greedy segmentation
  * ([[MaxMatchSegment]]) — planted longest-match semantics, equality
  * with an independent plain-Scala greedy on randomized words, the
  * fail-by-name coverage guard, and the q182 catalog invariants
  * (pieces concatenate to the word; every piece is in the staged
  * vocab; every piece is the longest vocab match at its position).
  */
class MaxMatchSpec extends SparkSpec {
  import spark.implicits._

  private def seg(word: String, vocab: Seq[String]): Seq[String] =
    Seq(word).toDF("w")
      .select(call_function("max_match", col("w"),
        typedlit(vocab.toArray)).as("p"))
      .as[Seq[String]].collect().head

  /** Independent reference greedy — deliberately re-derived here, not
    * shared with the expression, so agreement is evidence.
    */
  private def refSeg(word: String, vocab: Set[String]): Seq[String] = {
    val maxLen = if (vocab.isEmpty) 0 else vocab.map(_.length).max
    def go(p: Int, acc: List[String]): List[String] =
      if (p >= word.length) acc.reverse
      else {
        val l = (math.min(maxLen, word.length - p) to 1 by -1)
          .find(k => vocab.contains(word.substring(p, p + k)))
          .getOrElse(sys.error(s"no cover at $p of $word"))
        go(p + l, word.substring(p, p + l) :: acc)
      }
    go(0, Nil)
  }

  test("greedy longest-match on planted vocabularies") {
    val v = Seq("a", "b", "c", "ab", "abc", "bc")
    assert(seg("abab", v) === Seq("ab", "ab"))
    assert(seg("abc", v) === Seq("abc"))
    // greedy takes abc at pos 0 even though ab+cb... does not exist:
    // after abc the rest is "b" — greedy never backtracks
    assert(seg("abcb", v) === Seq("abc", "b"))
    // longest-at-position beats more-pieces alternatives
    assert(seg("bca", v) === Seq("bc", "a"))
    assert(seg("cab", v) === Seq("c", "ab"))
  }

  test("matches an independent plain-Scala greedy on randomized words") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcd"
    val multi = Seq("ab", "bc", "cd", "abc", "bcd", "abcd", "dd", "ddd")
    val vocab = alpha.map(_.toString) ++ multi
    val words = (1 to 200).map { _ =>
      (1 to (1 + rnd.nextInt(14)))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }
    val got = words.toDF("w")
      .select(col("w"), call_function("max_match", col("w"),
        typedlit(vocab.toArray)).as("p"))
      .as[(String, Seq[String])].collect().toMap
    val vs = vocab.toSet
    words.foreach { w => assert(got(w) === refSeg(w, vs), s"word $w") }
  }

  test("uncovered position fails by name, not silently") {
    val e = intercept[Exception] {
      seg("axb", Seq("a", "b")) // 'x' not in vocab
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("max_match")),
      s"expected the max_match coverage error, got: $e")
  }

  test("q182 invariants: total cover, vocab membership, greedy-longest, fertility") {
    val dir = "/root/testdata/sf0.001"
    val out = Text.q182MaxmatchTokenize(spark, dir)
      .as[(String, Long, Int, String)].collect()
    assert(out.nonEmpty)
    val work = Dedup.stageRoot(dir)
    val vocab = spark.read.parquet(Staged.path(work, "mm_vocab"))
      .select("tok").as[String].collect().toSet
    // single-char totality: every corpus character is in the vocab
    out.foreach { case (word, occ, nPieces, pieces) =>
      assert(occ >= 1)
      val ps = if (pieces.isEmpty) Seq.empty else pieces.split('|').toSeq
      assert(ps.size === nPieces, s"word $word")
      assert(ps.mkString === word, s"pieces must concatenate to $word")
      ps.foreach(p => assert(vocab.contains(p), s"piece $p of $word"))
      assert(ps === refSeg(word, vocab), s"greedy mismatch on $word")
    }
    // multi-char tokens actually fire on this corpus (the vocabulary
    // is trained on it, so its top substrings MUST appear): some word
    // segments into fewer pieces than characters
    assert(out.exists { case (word, _, nPieces, _) =>
      word.length > 1 && nPieces < word.length
    }, "some word must segment into fewer pieces than characters")
  }
}
