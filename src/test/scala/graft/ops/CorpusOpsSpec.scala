package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q94–q98 (BM25, boilerplate removal, vocab build, importance
  * weights, SCD2 compaction): each recomputed independently in plain
  * Scala from the raw table, plus planted fixtures for the two ops
  * whose interesting cases (shared segments, state runs) the real
  * corpus only exercises incidentally.
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def norm(s: String): String =
    s.toLowerCase.replaceAll("\\s+", " ").trim
  private def toks(s: String): Seq[String] =
    norm(s).split(" ", -1).toSeq.filter(_.nonEmpty)

  private lazy val docs: Seq[(Long, String, String)] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text", $"lang")
      .as[(Long, String, String)].collect().toSeq

  // ---- q94 BM25: exact replay of the integer formula ----

  test("q94 equals a plain-Scala BM25 replay") {
    val tokenized = docs.map { case (id, text, _) => id -> toks(text) }
    val dl = tokenized.map { case (id, ts) => id -> ts.size.toLong }.toMap
    val tTotal = dl.values.sum
    val nDocs = dl.count(_._2 > 0).toLong
    val df = tokenized.flatMap { case (_, ts) => ts.distinct }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = tokenized.filter(_._2.nonEmpty).flatMap { case (id, ts) =>
      val d = dl(id)
      ts.groupBy(identity).toSeq.map { case (term, occ) =>
        val tf = occ.size.toLong
        val tfPart = (44L * tTotal * tf * 1000000L) /
          (20L * tTotal * tf + 6L * tTotal + 18L * d * nDocs)
        val score = (tfPart * (2 * nDocs - 2 * df(term) + 1)) /
          (2 * df(term) + 1)
        (id, term, tf, df(term), d, score)
      }.sortBy { case (_, term, _, _, _, score) => (-score, term) }
        .take(3).zipWithIndex
        .map { case ((i, t, tf, dfv, dv, sc), r) => (i, r + 1, t, tf, dfv, dv, sc) }
    }.sortBy { case (id, r, _, _, _, _, _) => (id, r) }
    val got = Text.q94Bm25(spark, dir)
      .as[(Long, Int, String, Long, Long, Long, Long)].collect().toSeq
    assert(got === expect)
  }

  // ---- q119 fluency filter: exact replay + planted gibberish ----

  test("q119 equals a plain-Scala bigram-LM replay; gibberish is dropped") {
    val tmp = java.nio.file.Files.createTempDirectory("q119").toString
    // fluent docs re-use the same bigrams 20× (high conditional p —
    // enough mass that the smoothed LM separates them from noise);
    // the gibberish doc's bigrams are all singletons; doc 99 has no
    // bigram at all
    val planted = (1L to 20L).map(id =>
      (id, "the cat sat on the mat", "en")) ++ Seq(
      (80L, "zq xv qj wk vn bz pq", "en"),
      (99L, "solo", "en"))
    planted.map { case (id, t0, l) => (id, t0, l, "src0") }
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    // plain-Scala replay of the add-one-smoothed linear-domain score
    val bg = planted.flatMap { case (id, t0, l) =>
      val ts = toks(t0)
      if (ts.size >= 2) ts.sliding(2).map(p => (id, l, p(0), p(1))).toSeq
      else Seq.empty
    }
    val cnt = bg.groupBy { case (_, l, a, b) => (l, a, b) }
      .view.mapValues(_.size.toLong).toMap
    val c1 = bg.groupBy { case (_, l, a, _) => (l, a) }
      .view.mapValues(_.size.toLong).toMap
    val v = c1.keys.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val scored = bg.groupBy(_._1).view.mapValues { rows =>
      val ps = rows.map { case (_, l, a, b) =>
        (cnt((l, a, b)) + 1L) * 1000000L / (c1((l, a)) + v(l)) }
      (rows.size.toLong, ps.sum / rows.size)
    }.toMap
    val corpusMean = scored.values.map(_._2).sum / scored.size
    val expect = planted.map { case (id, _, l) =>
      val s0 = scored.get(id)
      (id, l, s0.map(_._1).getOrElse(0L), s0.map(_._2),
        corpusMean, s0.exists(_._2 * 2 >= corpusMean))
    }.sortBy(_._1)
    val got = Text.q119PerplexityFilter(spark, tmp)
      .as[(Long, String, Long, Option[Long], Long, Boolean)]
      .collect().toSeq
    assert(got === expect)
    val keep = got.map(r => r._1 -> r._6).toMap
    // fluent docs pass, the all-singleton gibberish and the
    // bigram-less doc are dropped
    assert((1L to 20L).forall(keep), got.toString)
    assert(!keep(80L) && !keep(99L), got.toString)
  }

  // ---- q95 boilerplate: planted shared segment ----

  test("q95 drops exactly the cross-document segments (planted)") {
    val tmp = java.nio.file.Files.createTempDirectory("q95").toString
    Seq(
      (1L, "a b c d e f g h i j", "en", "src0", 19L),
      (2L, "a b c d e x y z w v", "en", "src0", 19L),
      (3L, "p q r s t u v w x y", "en", "src0", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Text.q95Boilerplate(spark, tmp)
      .as[(Long, Long, String, Long, Long)].collect().toSeq
    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // "a b c d e" occurs in docs 1 and 2 -> dropped from both
    assert(got === Seq(
      (1L, 1L, h("f g h i j"), 2L, 1L),
      (2L, 1L, h("x y z w v"), 2L, 1L),
      (3L, 0L, h("p q r s t"), 2L, 0L),
      (3L, 1L, h("u v w x y"), 2L, 0L)))
  }

  test("q95 keeps no segment that occurs in two documents (real corpus)") {
    val segsOf = docs.map { case (id, text, _) =>
      id -> toks(text).grouped(5).map(_.mkString(" ")).toSeq
    }
    val segDf = segsOf.flatMap { case (_, ss) => ss.distinct }
      .groupBy(identity).view.mapValues(_.size).toMap
    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val keptHashes = Text.q95Boilerplate(spark, dir)
      .select($"seg_hash").as[String].collect().toSet
    val boilerHashes = segDf.filter(_._2 >= 2).keySet.map(h)
    assert(keptHashes.intersect(boilerHashes).isEmpty)
    // and the survivors are exactly the df=1 segments
    val uniqueHashes = segDf.filter(_._2 == 1).keySet.map(h)
    assert(keptHashes === uniqueHashes)
  }

  // ---- q96 vocab: exact replay + coverage shape ----

  test("q96 equals a plain-Scala vocab replay; coverage is monotone") {
    val all = docs.flatMap { case (_, text, _) => toks(text) }
    val tTotal = all.size.toLong
    val expect = all.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .filter(_._2 >= 5L)
      .sortBy { case (tok, cnt) => (-cnt, tok) }
      .scanLeft(("", 0L, 0L)) { case ((_, _, cum), (tok, cnt)) =>
        (tok, cnt, cum + cnt)
      }.drop(1).zipWithIndex
      .map { case ((tok, cnt, cum), i) =>
        (i + 1L, tok, cnt, cum, cum.toDouble / tTotal.toDouble)
      }
    val got = Text.q96VocabBuild(spark, dir)
      .as[(Long, String, Long, Long, Double)].collect().toSeq
    assert(got === expect)
    assert(got.map(_._5) === got.map(_._5).sorted)
    assert(got.last._5 <= 1.0)
  }

  // ---- q97 importance: exact replay ----

  test("q97 equals a plain-Scala importance replay") {
    val tokenized = docs.map { case (id, text, lang) => (id, lang, toks(text)) }
    val cAll = tokenized.flatMap(_._3)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cTgt = tokenized.filter(_._2 == "en").flatMap(_._3)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = tokenized.filter(_._3.nonEmpty).map { case (id, lang, ts) =>
      val sum = ts.map(t =>
        ((cTgt.getOrElse(t, 0L) + 1) * 1000000L) / (cAll(t) + 1)).sum
      (id, lang, ts.size.toLong, sum / ts.size)
    }.sortBy(_._1)
    val got = Text.q97ImportanceWeights(spark, dir)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got === expect)
  }

  // ---- q113 BPE merge: exact replay ----

  test("q113 equals a plain-Scala BPE-merge replay") {
    val normed = docs.map { case (id, text, _) => (id, norm(text)) }
    val pairs = normed.flatMap { case (_, n) =>
      val ws = n.split(" ", -1).toSeq
      if (ws.size >= 2) ws.sliding(2).map(p => (p(0), p(1))).toSeq
      else Seq.empty
    }
    val ((w1, w2), cnt) = pairs.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.minBy { case ((a, b), n) => (-n, a, b) }
    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = normed.map { case (id, n) =>
      // Java replaceAll is left-to-right non-overlapping — BPE's order
      val merged = n.replaceAll(s"\\b$w1 $w2\\b", s"$w1+$w2")
      (id, w1, w2, cnt, n.split(" ", -1).length,
        merged.split(" ", -1).length, h(merged))
    }.sortBy(_._1)
    val got = Text.q113BpeMerge(spark, dir)
      .as[(Long, String, String, Long, Int, Int, String)].collect().toSeq
    assert(got === expect)
    // the merge must actually fire somewhere
    assert(got.exists { case (_, _, _, _, before, after, _) => after < before })
  }

  // ---- q115 source overlap: exact replay ----

  test("q115 equals a plain-Scala source-overlap replay") {
    val raw = spark.read.parquet(s"$dir/documents.parquet")
      .select($"source", $"text").as[(String, String)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.flatMap { case (_, t0) =>
        toks(t0).sliding(3).filter(_.size == 3).map(_.mkString(" "))
      }.toSet).toMap
    // the boilerplate guard: shingles in more than SourceDfCap sources
    // are counted once, excluded from sizes and intersections
    val sdf = raw.values.flatten.groupBy(identity).view.mapValues(_.size)
    val ubiq = sdf.count { case (_, df) => df > Dedup.SourceDfCap }.toLong
    val bySource = raw.view
      .mapValues(_.filter(sh => sdf(sh) <= Dedup.SourceDfCap)).toMap
    val srcs = bySource.keys.toSeq.sorted
    val expect = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.size
      (a, b) = (srcs(i), srcs(j))
      inter = bySource(a).intersect(bySource(b)).size.toLong
      if inter > 0
    } yield (a, b, bySource(a).size.toLong, bySource(b).size.toLong, inter,
      inter.toDouble / (bySource(a).size + bySource(b).size - inter).toDouble,
      ubiq))
      .sortBy { case (a, b, _, _, _, _, _) => (a, b) }
    val got = Dedup.q115SourceOverlap(spark, dir)
      .as[(String, String, Long, Long, Long, Double, Long)].collect().toSeq
    assert(got === expect)
    assert(got.nonEmpty)
  }

  // ---- q98 SCD2: planted runs + real-data invariants ----

  test("q98 compacts planted state runs into SCD2 intervals") {
    val tmp = java.nio.file.Files.createTempDirectory("q98").toString
    // ts written as epoch-nanos BIGINT, matching the nanosAsLong read
    Seq(
      (10L, 1L, "view", 1000000000L, 0.0, "{}"),
      (11L, 1L, "view", 2000000000L, 0.0, "{}"),
      (12L, 1L, "click", 3000000000L, 0.0, "{}"),
      (13L, 1L, "view", 4000000000L, 0.0, "{}"),
      // user 2: tie on ts breaks by event_id -> view(20) before click(21)
      (21L, 2L, "click", 5000000000L, 0.0, "{}"),
      (20L, 2L, "view", 5000000000L, 0.0, "{}"))
      .toDF("event_id", "user_id", "event_type", "ts", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Text.q98Scd2Compaction(spark, tmp)
      .as[(Long, Long, String, Long, Option[Long], Long, Boolean)]
      .collect().toSeq
    assert(got === Seq(
      (1L, 1L, "view", 1000000L, Some(3000000L), 2L, false),
      (1L, 2L, "click", 3000000L, Some(4000000L), 1L, false),
      (1L, 3L, "view", 4000000L, None, 1L, true),
      (2L, 1L, "view", 5000000L, Some(5000000L), 1L, false),
      (2L, 2L, "click", 5000000L, None, 1L, true)))
  }

  test("q98 real-data invariants: dense versions, one current row per user") {
    val got = Text.q98Scd2Compaction(spark, dir)
      .as[(Long, Long, String, Long, Option[Long], Long, Boolean)]
      .collect().toSeq
    got.groupBy(_._1).foreach { case (user, rows) =>
      assert(rows.map(_._2).sorted === (1L to rows.size).toSeq, s"user $user")
      assert(rows.count(_._7) === 1, s"user $user")
      rows.foreach { r =>
        r._5.foreach(to => assert(r._4 <= to, s"user $user v${r._2}"))
      }
      // runs really are maximal: consecutive versions change state
      rows.sortBy(_._2).sliding(2).foreach {
        case Seq(a, b) => assert(a._3 != b._3, s"user $user v${b._2}")
        case _ =>
      }
    }
  }
}
