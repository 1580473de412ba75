package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The unigram-LM tokenizer family: the `unigram_segment` Viterbi
  * expression against an independent plain-Scala DP (randomized +
  * planted tie cases), its fail-by-name coverage contract, and
  * [[Text.trainUnigramLm]]'s hard EM on a planted-lexicon corpus —
  * the generative tokens must dominate the final model, junk
  * candidates must be pruned, and the final segmentations must be the
  * generative ones.
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def seg(word: String, vocab: Seq[(String, Double)]): Seq[String] =
    Seq(word).toDF("w")
      .select(call_function("unigram_segment", col("w"),
        typedlit(vocab.map(_._1).toArray),
        typedlit(vocab.map(_._2).toArray)).as("p"))
      .as[Seq[String]].collect().head

  /** Independent reference Viterbi — re-derived, not shared. */
  private def refSeg(word: String, v: Map[String, Double]): Seq[String] = {
    val maxLen = v.keys.map(_.length).max
    val n = word.length
    val score = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1)
    score(0) = 0.0
    for (i <- 1 to n; l <- math.min(maxLen, i) to 1 by -1) {
      v.get(word.substring(i - l, i)).foreach { p =>
        if (score(i - l) + p > score(i) ||
            (score(i - l) + p == score(i) && l > back(i))) {
          score(i) = score(i - l) + p; back(i) = l
        }
      }
    }
    assert(score(n) != Double.NegativeInfinity, s"no cover: $word")
    var out = List.empty[String]; var p = n
    while (p > 0) { out = word.substring(p - back(p), p) :: out; p -= back(p) }
    out
  }

  test("Viterbi picks the max-probability segmentation, not the greedy one") {
    // greedy longest-match takes "abc" then pays for rare "d"; the
    // optimal path is "ab" + "cd"
    val v = Seq("a" -> -6.0, "b" -> -6.0, "c" -> -6.0, "d" -> -9.0,
      "ab" -> -1.0, "cd" -> -1.0, "abc" -> -1.5)
    assert(seg("abcd", v) === Seq("ab", "cd"))
    // equal-score tie breaks toward the LONGER final token
    val t = Seq("a" -> -1.0, "aa" -> -2.0)
    assert(seg("aa", t) === Seq("aa"))
  }

  test("matches an independent Viterbi on randomized words") {
    val rnd = new scala.util.Random(11)
    val alpha = "abcd"
    val vocab: Seq[(String, Double)] =
      alpha.map(c => c.toString -> -5.0) ++
        Seq("ab" -> -1.0, "bc" -> -1.2, "cd" -> -0.8, "abc" -> -2.0,
          "bcd" -> -1.9, "abcd" -> -3.1, "dd" -> -1.1)
    val vm = vocab.toMap
    val words = (1 to 150).map(_ => (1 to 1 + rnd.nextInt(12))
      .map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    val got = words.toDF("w")
      .select(col("w"), call_function("unigram_segment", col("w"),
        typedlit(vocab.map(_._1).toArray),
        typedlit(vocab.map(_._2).toArray)).as("p"))
      .as[(String, Seq[String])].collect().toMap
    words.foreach(w => assert(got(w) === refSeg(w, vm), s"word $w"))
  }

  test("uncovered word fails by name") {
    val e = intercept[Exception] { seg("axb", Seq("a" -> -1.0, "b" -> -1.0)) }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("unigram_segment")), e.toString)
  }

  test("hard EM recovers a planted lexicon and prunes junk candidates") {
    // generative lexicon of LENGTH-5 tokens: a token PAIR is 10 chars,
    // past the 8-char candidate cap, so no whole word or multi-token
    // span can enter the pool and the maximum-likelihood preference
    // for fewer factors lands exactly on the lexicon — the same
    // structural reason real unigram training caps candidate length.
    // Sub-tokens ("aaba") and straddles ("babcc") ARE candidates with
    // comparable initial frequency; EM must segment through them and
    // prune them to zero
    val lex = Seq("aabab", "ccdcd", "eefef")
    val corpusWords = Seq(
      ("aababccdcd", 40), ("ccdcdeefef", 35), ("aababeefef", 30),
      ("aababccdcdeefef", 25), ("eefefaabab", 20), ("ccdcdaabab", 15))
    val dir = java.nio.file.Files.createTempDirectory("unigram").toString
    corpusWords.zipWithIndex.map { case ((w, times), i) =>
      (i.toLong, (1 to times).map(_ => w).mkString(" "))
    }.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val model = Text.trainUnigramLm(spark, dir)
      .as[(String, Long, Long, Double)].collect()
    val probs = model.map(m => m._1 -> m._4).toMap
    // the lexicon tokens survive with dominant mass
    lex.foreach(t => assert(probs.contains(t), s"pruned $t: ${probs.keys}"))
    val lexMass = lex.map(probs).sum
    assert(lexMass > 0.9, s"lexicon mass $lexMass in $probs")
    // every sub-token and straddle candidate is pruned: the multi-char
    // survivors are EXACTLY the lexicon
    assert(model.filter(_._2 > 1).map(_._1).toSet === lex.toSet,
      model.map(_._1).mkString(","))
    // final segmentations are the generative ones
    val toks = model.map(_._1)
    val lps = model.map(m => math.log(m._4))
    corpusWords.foreach { case (w, _) =>
      val pieces = Seq(w).toDF("w")
        .select(call_function("unigram_segment", col("w"),
          typedlit(toks), typedlit(lps)).as("p"))
        .as[Seq[String]].collect().head
      assert(pieces === w.grouped(5).toSeq, s"$w -> $pieces")
    }
  }

  test("q190's staged-E-step M-step equals one imperative hard-EM round row-for-row") {
    // the declarative M-step (staged segmentations → piece counts →
    // coverage floor / pruning → renormalize, the oracle-certified
    // q190 path) must reproduce trainUnigramLm(rounds = 1) EXACTLY —
    // same survivors, same counts, same probabilities, same order
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q190_unigram_mstep")(spark, dir)
      .as[(String, Long, Long, Double)].collect().toSeq
    val want = Text.trainUnigramLm(spark, dir, rounds = 1)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got === want)
    assert(want.nonEmpty)
  }

  test("trains on the real corpus: normalized model, full char coverage") {
    val model = Text.trainUnigramLm(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Double)].collect()
    assert(model.nonEmpty)
    assert(math.abs(model.map(_._4).sum - 1.0) < 1e-9)
    val chars = Text.wordTypeCounts(spark, "/root/testdata/sf0.001")
      .as[(String, Long)].collect().flatMap(_._1.toSeq).toSet
    val kept = model.filter(_._2 == 1).map(_._1.head).toSet
    assert(chars.subsetOf(kept), (chars -- kept).toString) // coverage floor
    // multi-char tokens actually carry mass on real text
    assert(model.exists(m => m._2 > 1 && m._4 > 0.0))
  }
}
