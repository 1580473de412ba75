package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic checks for the LLM-pipeline operators on crafted inputs —
  * the driver tables contain no exact duplicates, so these prove the
  * detectors actually fire (and stay quiet on unrelated docs).
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-pipe").toString
    val base = "the quick brown fox jumps over the lazy dog and then runs far away home tonight"
    val docs = Seq(
      (0L, base, "en", "src0"),
      (1L, "  THE quick   brown fox jumps over the lazy dog and then runs far away home tonight ", "en", "src0"), // exact dup of 0 modulo case/whitespace
      (2L, base.replace("lazy", "sleepy"), "en", "src1"), // near dup of 0
      (3L, "completely different words about spark catalyst optimizer plans and shuffles everywhere", "en", "src2"),
      (4L, "der hund und die katze sind nicht mit dem vogel zu sehen heute abend", "de", "src3"),
      (5L, "tiny doc", "en", "src4"), // <3 words: shingles must be empty, not an ANSI error
      (6L, "one", "en", "src4"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text"))
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    val e0 = Array.tabulate(64)(i => if (i < 8) 1.0f else 0.0f)
    val e1 = e0.clone() // identical to e0
    val e2 = Array.tabulate(64)(i => if (i < 8) -1.0f else if (i < 16) 1.0f else 0.0f) // orthogonal, negative sign bucket
    val e3 = Array.tabulate(64)(i => (if (i < 8) 0.9f else 0.0f) + (if (i == 63) 0.1f else 0f)) // near e0
    Seq((0L, e0, 0), (1L, e1, 0), (2L, e2, 1), (3L, e3, 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("short documents (under 3 words) flow through every shingle-based op without error") {
    // q31/q33/q53 all build word-3-gram shingles; docs 5 and 6 have none
    assert(Dedup.q31MinhashPairs(spark, dir).count() >= 0)
    val fp = Text.q53Fingerprint(spark, dir)
      .where($"doc_id" >= 5L).select($"n_shingles").as[Int].collect()
    assert(fp.forall(_ === 0))
  }

  test("q30 exact dedup groups case/whitespace variants") {
    val out = Dedup.q30ExactDedup(spark, dir)
      .select($"canonical_id", $"n_copies").as[(Long, Long)].collect().toMap
    assert(out(0L) === 2L) // docs 0 and 1 collapse
    assert(out(2L) === 1L && out(3L) === 1L)
  }

  test("q31 minhash+LSH surfaces the near-dup pair and nothing unrelated") {
    val pairs = Dedup.q31MinhashPairs(spark, dir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L))) // exact dup always passes LSH + jaccard
    assert(pairs.forall { case (a, b) => Set(0L, 1L, 2L)(a) && Set(0L, 1L, 2L)(b) })
  }

  test("q32 simhash: identical docs hash identically; near-dups stay within small hamming distance") {
    val h = Dedup.q32Simhash(spark, dir)
      .as[(Long, String)].collect().toMap
    assert(h(0L) === h(1L))
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(ham(h(0L), h(2L)) <= 6) // one-word change flips few bits
    assert(ham(h(0L), h(3L)) > 6) // unrelated text flips many
  }

  test("q33 jaccard pairs scores the near-dup above threshold") {
    val rows = Dedup.q33JaccardPairs(spark, dir)
      .as[(Long, Long, Double)].collect()
    val m = rows.map { case (a, b, j) => (a, b) -> j }.toMap
    assert(m((0L, 1L)) === 1.0)
    assert(m.get((0L, 2L)).exists(j => j > 0.5 && j < 1.0))
    assert(!m.keySet.exists { case (a, b) => b == 3L || a == 3L })
  }

  test("q35/q36: dup cluster elects doc 0 canonical; survivors drop its members") {
    val cl = Dedup.q35DedupClusters(spark, dir)
      .select($"doc_id", $"cluster_id", $"is_canonical")
      .as[(Long, Long, Boolean)].collect()
    val byDoc = cl.map(r => r._1 -> r).toMap
    // docs 0,1 are exact dups (jaccard 1 ≥ 0.8): one cluster, min id wins.
    // doc 2's one-word edit sits at jaccard ≈ 0.65 — below q31's 0.8
    // verify bar, so it is NOT clustered (q33's 0.5 bar would catch it).
    assert(byDoc(0L) === ((0L, 0L, true)))
    assert(byDoc(1L) === ((1L, 0L, false)))
    assert(!byDoc.contains(2L))
    val survivors = Dedup.q36DedupSurvivors(spark, dir)
      .as[Long].collect().toSet
    assert(survivors === Set(0L, 2L, 3L, 4L, 5L, 6L))
  }

  test("q34 all-pairs guard refuses a corpus above the ceiling") {
    val iv = Similarity.scaledVectors(spark, dir)
    Similarity.requireAllPairsScale(iv, ceiling = 10L) // 4 vectors: fine
    val e = intercept[IllegalArgumentException] {
      Similarity.requireAllPairsScale(iv, ceiling = 3L)
    }
    assert(e.getMessage.contains("all-pairs baseline"))
  }

  test("q34/q40: identical vectors rank first with cosine 1") {
    val top = Similarity.q34EmbeddingTopPairs(spark, dir)
      .as[(Long, Long, Double)].collect()
    assert(top.head._1 === 0L && top.head._2 === 1L)
    assert(top.head._3 > 0.9999999) // 1.0 modulo sqrt rounding
    val knn = Similarity.q40CosineTopK(spark, dir)
      .select($"query_id", $"rank", $"neighbor_id").as[(Long, Int, Long)].collect()
    assert(knn.contains((0L, 1, 1L))) // e1 is e0's nearest neighbor
  }

  test("q41 ANN probes only the query's sign bucket") {
    val out = Similarity.q41AnnLsh(spark, dir)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    // e0,e1,e3 share bucket 11111111…; e2 (bucket 00000000) is alone
    assert(out.contains((0L, 1L)) && out.contains((0L, 3L)))
    assert(!out.exists { case (q, n) => n == 2L || q == 2L })
  }

  test("q60 multimodal stub decode features follow the documented formulas") {
    val f = Multimodal.q60MultimodalDecode(spark, dir)
      .where($"doc_id" === 0L)
      .as[Multimodal.MediaFeatures].head()
    val n = "the quick brown fox jumps over the lazy dog and then runs far away home tonight".length
    assert(f.n_bytes === n && f.width === n % 640 && f.height === (n * 7) % 480)
    assert(f.header_byte === 't'.toInt && f.n_frames === 't'.toInt % 30)
    assert(f.format === "png")
  }

  test("q50 language-ID separates the English and German samples") {
    val g = Text.q50LangProfile(spark, dir)
      .select($"doc_id", $"guess").as[(Long, String)].collect().toMap
    assert(g(0L) === "en" && g(4L) === "de")
  }

  test("q63 repetition: clean doc scores zero dup bigrams, exact top-word mass") {
    // doc 0: 16 words, 'the' twice, no repeated bigram
    val r = Text.q63RepetitionScore(spark, dir).where($"doc_id" === 0L)
      .select($"n_words", $"top_word_frac", $"dup_bigram_frac")
      .as[(Long, Double, Double)].head()
    assert(r === ((16L, 2.0 / 16, 0.0)))
  }

  test("null, empty, and whitespace-only texts flow through the text family without error") {
    // every real crawl contains these three degenerate rows; none may
    // throw (ANSI mode) or corrupt unrelated docs
    val d = java.nio.file.Files.createTempDirectory("graft-degenerate").toString
    Seq(
      (10L, null.asInstanceOf[String], "en", "s"),
      (11L, "", "en", "s"),
      (12L, "   ", "en", "s"),
      (13L, "normal words here for sanity checks today", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    // shingle-based ops must silently skip the degenerate docs
    assert(Dedup.q31MinhashPairs(spark, d).count() === 0)
    assert(Text.q53Fingerprint(spark, d)
      .where($"doc_id" <= 12L && $"n_shingles" =!= 0).count() === 0)
    // per-doc scorers must keep one row per doc, degenerate ones
    // included — MATERIALIZED (a bare count() prunes the projection and
    // masked the empty-norm ANSI divide-by-zero this test first caught)
    val quality = Text.q51QualityScore(spark, d)
      .select($"doc_id", $"quality").collect()
    assert(quality.length === 4)
    // degenerate docs score NULL (DuckDB x/0 semantics), never throw
    assert(quality.filter(_.getLong(0) <= 12L).forall(_.isNullAt(1)))
    assert(quality.filter(_.getLong(0) === 13L).forall(!_.isNullAt(1)))
    assert(Text.q52TokenStats(spark, d).collect().length === 4)
    // dedup election and the fused pipeline run end-to-end; only the
    // normal doc survives q68's quality gate to produce chunks
    assert(Dedup.q30ExactDedup(spark, d).count() >= 3)
    val packed = Text.q68CorpusPrep(spark, d)
    assert(packed.select($"doc_id").distinct().as[Long].collect().toSet
      .subsetOf(Set(13L)))
  }

  test("events with null timestamps flow through sessionize and attribution") {
    // sensor/clock bugs ship null event times; the window orderings and
    // interval arithmetic must not throw on them
    val d = java.nio.file.Files.createTempDirectory("graft-nullts").toString
    Seq(
      (0L, Some(0L), 1L, "click", 1.0, "{}"),
      (1L, None, 1L, "purchase", 2.0, "{}"), // null ts
      (2L, Some(300L * 1000000000L), 1L, "purchase", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    assert(Text.q54Sessionize(spark, d).collect().length >= 1)
    val attr = Text.q67ClickAttribution(spark, d).collect()
    // the 5-min purchase attributes to the minute-0 click; the null-ts
    // purchase matches nothing (NULL comparisons are never true)
    assert(attr.map(_.getLong(0)).toSet === Set(2L))
  }

  test("an all-zero embedding yields NULL cosine, not a divide-by-zero") {
    // failed encoders emit zero vectors; cosine against one is
    // undefined — the scorers must answer NULL (DuckDB x/0 semantics)
    // instead of killing the job under ANSI mode
    val d = java.nio.file.Files.createTempDirectory("graft-zerovec").toString
    val zero = Array.fill(64)(0.0f)
    val e1 = Array.tabulate(64)(i => if (i < 8) 1.0f else 0.0f)
    val e2 = Array.tabulate(64)(i => if (i < 16) 0.5f else 0.0f)
    Seq((0L, zero, 0), (1L, e1, 0), (2L, e2, 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val out = Similarity.q40CosineTopK(spark, d)
      .select($"query_id", $"neighbor_id", $"cosine").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val touchesZero = r.getLong(0) == 0L || r.getLong(1) == 0L
      assert(r.isNullAt(2) === touchesZero, r.toString)
    }
  }

  test("q47 centroids: a singleton label reproduces its vector exactly") {
    val c = Similarity.q47LabelCentroids(spark, dir)
    // label 1 has only e2: dims 1-8 = -1, 9-16 = +1, rest 0 — all exact
    // at the 2^16 scale, so the mean must reproduce them bit-for-bit
    val l1 = c.where($"label" === 1)
      .select($"dim", $"centroid").as[(Int, Double)].collect().toMap
    assert(l1(1) === -1.0 && l1(9) === 1.0 && l1(17) === 0.0)
    val n = c.select($"label", $"n_vectors").distinct()
      .as[(Int, Long)].collect().toMap
    assert(n(0) === 3L && n(1) === 1L)
  }
}
