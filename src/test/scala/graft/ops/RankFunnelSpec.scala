package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q99–q102 (semantic decon, PageRank, fuzzy join, funnel): each
  * replayed independently in plain Scala from the raw tables (and,
  * for q99, the engine-staged cell assignments), the CorpusOpsSpec
  * discipline.
  */
class RankFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  // ---- q99: in-cell decon replay over the staged cells ----

  test("q99 equals a plain-Scala in-cell decon replay") {
    val got = Similarity.q99SemanticDecon(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    // q99 stages cells before searching; read what it staged
    val cells = spark.read.parquet(s"${Dedup.stageRoot(dir)}/cells")
      .as[(Long, Int)].collect().toMap
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().toSeq
      .map { case (id, e) =>
        val v = e.map(x => math.floor(x.toDouble * 65536.0).toLong)
        (id, v, math.sqrt(v.map(x => x * x).sum.toDouble))
      }
      .filter { case (id, _, _) => cells.contains(id) }
    val byCell = vecs.groupBy { case (id, _, _) => cells(id) }
    val expect = byCell.values.toSeq.flatMap { vs =>
      val bench = vs.filter(_._1 % 10 == 7)
      vs.filter(_._1 % 10 != 7).flatMap { case (id, v, n) =>
        bench.flatMap { case (bid, bv, bn) =>
          val prod = n * bn
          if (prod > 0) {
            val cos = v.zip(bv).map { case (a, b) => a * b }.sum.toDouble / prod
            if (cos >= Similarity.DeconThreshold) Some((id, bid, cos)) else None
          } else None
        }
      }
    }.groupBy(_._1).toSeq.map { case (id, hits) =>
      val best = hits.minBy { case (_, bid, cos) => (-cos, bid) }
      (id, hits.size.toLong, best._2, best._3)
    }.sortBy(_._1)
    assert(got === expect)
    assert(got.nonEmpty) // the threshold must flag something at sf0.001 too
  }

  // ---- q106: kNN classify replay over the staged cells ----

  test("q106 equals a plain-Scala in-cell kNN majority-vote replay") {
    val got = Similarity.q106KnnClassify(spark, dir)
      .as[(Long, Int, Long, Int, Boolean)].collect().toSeq
    val cells = spark.read.parquet(s"${Dedup.stageRoot(dir)}/cells")
      .as[(Long, Int)].collect().toMap
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"label", $"embedding")
      .as[(Long, Int, Array[Float])].collect().toSeq
      .filter { case (id, _, _) => cells.contains(id) }
      .map { case (id, lbl, e) =>
        val v = e.map(x => math.floor(x.toDouble * 65536.0).toLong)
        (id, lbl, v, math.sqrt(v.map(x => x * x).sum.toDouble))
      }
    val byCell = vecs.groupBy { case (id, _, _, _) => cells(id) }
    val expect = vecs.filter(_._1 < 20).map { case (qid, qlbl, qv, qn) =>
      val topk = byCell(cells(qid))
        .filter(_._1 != qid)
        .flatMap { case (nid, nlbl, nv, nn) =>
          val prod = qn * nn
          if (prod > 0)
            Some((nid, nlbl, qv.zip(nv).map { case (a, b) => a * b }.sum.toDouble / prod))
          else None
        }
        .sortBy { case (nid, _, cos) => (-cos, nid) }.take(5)
      val (lbl, votes) = topk.groupBy(_._2).view.mapValues(_.size.toLong)
        .toSeq.minBy { case (l, n) => (-n, l) }
      (qid, lbl, votes, qlbl, lbl == qlbl)
    }.sortBy(_._1)
    assert(got === expect)
    assert(got.size === vecs.count(_._1 < 20))
  }

  // ---- q100: exact integer PageRank replay ----

  test("q100 equals a plain-Scala integer PageRank replay") {
    val Scale = 1000000000000L
    val base = 15L * Scale / 100L
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
      .filter { case (_, t) =>
        t.toLowerCase.replaceAll("\\s+", " ").trim.length >= 130
      }.map(_._1)
    val ids = docs.flatMap(d => (0 to 3).map(i => d * 10 + i))
    val edges = docs.flatMap(d => Seq((0, 1), (0, 2), (1, 2), (1, 3), (2, 3))
      .map { case (a, b) => (d * 10 + a, d * 10 + b) })
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = ids.map(_ -> Scale).toMap
    for (_ <- 1 to 5) {
      val inflow = edges.groupBy(_._2).view.mapValues(_.map { case (s0, _) =>
        85L * r(s0) / (100L * outdeg(s0))
      }.sum).toMap
      r = ids.map(id => id -> (base + inflow.getOrElse(id, 0L))).toMap
    }
    val expect = ids.sorted.map(id =>
      (id, r(id), outdeg.getOrElse(id, 0L)))
    val got = GenomicsCatalog.q100PageRank(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === expect)
    // sinks (window 3) have no out-edges; ranks are positive and bounded
    assert(got.filter(_._1 % 10 == 3).forall(_._3 == 0L))
    assert(got.forall { case (_, pr, _) => pr >= base && pr < 3 * Scale })
  }

  // ---- q101: planted-misspelling completeness + verify soundness ----

  test("q101 finds every planted misspelling; emits only dist<=1 pairs") {
    def lev(a: String, b: String): Int = {
      val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i * j == 0) i + j else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    val vocab = spark.read.parquet(s"$dir/documents.parquet")
      .select($"text").as[String].collect().toSeq
      .flatMap(t => t.toLowerCase.replaceAll("\\s+", " ").trim
        .split(" ", -1).filter(_.length >= 3))
      .distinct
    val got = Text.q101FuzzyJoin(spark, dir)
      .as[(String, String, Long)].collect().toSeq
    // soundness: every emitted pair is a true dist<=1 match
    got.foreach { case (q, t, d) =>
      assert(lev(q, t).toLong === d && d <= 1, s"($q, $t)")
    }
    // completeness on the planted set: each token's middle-dropped
    // mutation must match its source
    vocab.foreach { tok =>
      val mid = (tok.length + 1) / 2
      val q = tok.substring(0, mid - 1) + tok.substring(mid)
      assert(got.exists { case (g, t, _) => g == q && t == tok },
        s"missing $q -> $tok")
    }
  }

  // ---- q102: exact funnel replay ----

  test("q102 equals a plain-Scala ordered-funnel replay") {
    val events = graft.ops.Tables.eventsTsUs(spark, dir)
      .select($"user_id", $"event_type", $"ts_us")
      .as[(Long, String, Long)].collect().toSeq
    val expect = events.groupBy(_._1).toSeq.map { case (u, es) =>
      def first(tpe: String, atOrAfter: Option[Long]): Option[Long] =
        atOrAfter.flatMap(t0 => es.filter(e => e._2 == tpe && e._3 >= t0)
          .map(_._3).minOption)
      val tv = es.filter(_._2 == "view").map(_._3).minOption
      val tc = first("click", tv)
      val tp = first("purchase", tc)
      val stage = if (tp.isDefined) 3 else if (tc.isDefined) 2
        else if (tv.isDefined) 1 else 0
      (u, tv, tc, tp, stage)
    }.sortBy(_._1)
    val got = Text.q102Funnel(spark, dir)
      .as[(Long, Option[Long], Option[Long], Option[Long], Int)]
      .collect().toSeq
    assert(got === expect)
    // the corpus must reach at least one non-zero stage (at sf0.001
    // every user with events reaches stage 3 — the dense-event case)
    assert(got.map(_._5).exists(_ > 0))
  }
}
