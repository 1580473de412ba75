package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q87/q88/q89 — corpus statistics, PII scrubbing, bigram LM counts —
  * each pinned on a planted fixture where every output value is
  * hand-computable:
  *
  *   - q87: an exact linear relation y = 2x + 1 forces corr → 1,
  *     slope = 2, intercept = 1 (the latter two EXACTLY, since the
  *     sufficient statistics are integer and the ratios land on
  *     representable doubles); a singleton group must yield NULLs,
  *     not a divide-by-zero;
  *   - q88: plus-addressed/multi-dot emails, international phone runs,
  *     adjacent PII, and a clean doc — counts exact, residue_free
  *     uniformly true (the planted in-plan PII adds 1+1 per doc);
  *   - q89: a 2-doc corpus with a hand-counted bigram table, checking
  *     counts, conditional probabilities, deterministic tie order, and
  *     that sub-2-token docs contribute nothing.
  */
class StatsTextSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  // ---------------------------------------------------------------- q87

  private lazy val statsDir: String = {
    val d = tmp("stats")
    val linear = (1 to 5).map { x =>
      (x.toLong, Seq.fill(2 * x + 1)("w").mkString(" "), "li", x.toLong)
    }
    (linear :+ ((100L, "a b", "solo", 7L)))
      .toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q87: planted linear relation y=2x+1 → corr 1, slope 2, intercept 1") {
    val li = Text.q87CorrStats(spark, statsDir)
      .where($"lang" === "li").collect()(0)
    assert(li.getLong(1) === 5L)
    assert(math.abs(li.getDouble(2) - 1.0) < 1e-12, s"corr ${li.getDouble(2)}")
    assert(li.getDouble(3) === 2.0, s"slope ${li.getDouble(3)}")
    assert(li.getDouble(4) === 1.0, s"intercept ${li.getDouble(4)}")
  }

  test("q87: a zero-variance group yields NULL stats, not a divide-by-zero") {
    val solo = Text.q87CorrStats(spark, statsDir)
      .where($"lang" === "solo").collect()(0)
    assert(solo.isNullAt(2) && solo.isNullAt(3) && solo.isNullAt(4), solo.toString)
  }

  // ---------------------------------------------------------------- q88

  private lazy val piiDir: String = {
    val d = tmp("pii")
    Seq(
      (1L, "reach me at john.doe+spam@mail-host.co.uk thanks"),
      (2L, "call +1-800-555-0199 now"),
      (3L, "two mails a@b.io c.d@e-f.org and +49-30-1234567 tail"),
      (4L, "no pii here at all"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q88: exact email/phone counts (fixture + 1 planted each) and clean residue") {
    val out = Text.q88PiiScrub(spark, piiDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    // (n_emails, n_phones) per doc, planted in-plan PII included
    assert((out(1L).getInt(1), out(1L).getInt(2)) === ((2, 1)))
    assert((out(2L).getInt(1), out(2L).getInt(2)) === ((1, 2)))
    assert((out(3L).getInt(1), out(3L).getInt(2)) === ((3, 2)))
    assert((out(4L).getInt(1), out(4L).getInt(2)) === ((1, 1)))
    out.values.foreach(r => assert(r.getBoolean(4), s"residue in $r"))
  }

  test("q88: scrubbing is a pure map stage — no shuffle in the plan") {
    val p = Text.q88PiiScrub(spark, piiDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") || p.contains("rangepartitioning"),
      s"only the presentation sort may exchange:\n$p")
  }

  // ---------------------------------------------------------------- q89

  private lazy val bigramDir: String = {
    val d = tmp("bigram")
    Seq(
      (1L, "a b a b c", "en"),
      (2L, "a b x", "en"),
      (3L, "solo", "de"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q89: hand-counted bigram table — counts, cond_p, deterministic ties") {
    val rows = Text.q89BigramLm(spark, bigramDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getDouble(5)))
    // en bigrams: (a,b)×3, (b,a)×1, (b,c)×1, (b,x)×1
    // c(a,·)=3 → p(b|a)=1; c(b,·)=3 → p(·|b)=1/3; ties order by (w1,w2)
    assert(rows.toSeq === Seq(
      ("en", 1, "a", "b", 3L, 1.0),
      ("en", 2, "b", "a", 1L, 1.0 / 3),
      ("en", 3, "b", "c", 1L, 1.0 / 3)))
  }

  test("q89: a one-token doc contributes no bigrams (no de rows)") {
    assert(Text.q89BigramLm(spark, bigramDir)
      .where($"lang" === "de").count() === 0L)
  }
}
