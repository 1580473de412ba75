package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** q177 — the token-stream packing index. Pins the two-level prefix
  * sum against the naive global window it decomposes (on the real
  * sf0.001 table, which spans multiple [[Text.PackBlockDocs]] blocks),
  * and the stream-index invariants a sample loader relies on.
  */
class TokenPackSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("two-level prefix sum equals the naive global running sum") {
    val got = Text.q177TokenStreamPack(spark, sfDir)
      .select($"doc_id", $"global_start")
      .as[(Long, Long)].collect().toMap
    val naive = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(Text.words(col("text"))).cast("long").as("n"))
      .withColumn("gs",
        coalesce(sum(col("n")).over(
          Window.orderBy(col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"doc_id", $"gs").as[(Long, Long)].collect().toMap
    assert(got.size > Text.PackBlockDocs,
      "fixture must span multiple blocks or the decomposition is untested")
    assert(got === naive)
  }

  test("stream index invariants: dense concatenation, in-bin offsets") {
    val rows = Text.q177TokenStreamPack(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect()
    // first doc starts the stream
    assert(rows.head._3 === 0L)
    // each doc starts exactly where its predecessor ended — zero
    // padding is packing's whole point
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 === a._3 + a._2, s"gap between ${a._1} and ${b._1}")
    }
    // bin arithmetic is consistent with the global offset
    rows.foreach { r =>
      assert(r._4 === r._3 / Text.PackBinTokens)
      assert(r._5 === r._3 % Text.PackBinTokens)
    }
    // the corpus genuinely crosses bins (otherwise the law is untested)
    assert(rows.map(_._4).distinct.length > 1)
  }

  test("q178 manifest tiles every bin to exactly PackBinTokens and every doc exactly once") {
    val man = Text.q178BinManifest(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect() // (bin, doc, skip, take)
    val idx = Text.q177TokenStreamPack(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect()
    val totalTokens = idx.map(_._2).sum
    // every bin except the ragged last sums to exactly the bin size —
    // zero padding is the invariant the loader relies on
    val byBin = man.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val lastBin = byBin.keys.max
    byBin.foreach { case (b, tot) =>
      if (b < lastBin) assert(tot === Text.PackBinTokens, s"bin $b")
      else assert(tot === totalTokens - lastBin * Text.PackBinTokens)
    }
    // and bins are dense from 0
    assert(byBin.keys.toSeq.sorted === (0L to lastBin))
    // every doc's slices tile the doc: skips ascend contiguously from
    // 0 and takes sum to n_tokens
    val nByDoc = idx.map(r => r._1 -> r._2).toMap
    man.groupBy(_._2).foreach { case (doc, slices) =>
      val s = slices.sortBy(_._1)
      assert(s.head._3 === 0L, s"doc $doc first skip")
      s.sliding(2).foreach {
        case Array(a, b) => assert(b._3 === a._3 + a._4, s"doc $doc gap")
        case _ =>
      }
      assert(s.map(_._4).sum === nByDoc(doc), s"doc $doc total")
    }
    // the forward index agrees: each doc's first manifest row is the
    // bin q177 assigned its start to
    val firstBin = man.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    idx.foreach { r => assert(firstBin(r._1) === r._4, s"doc ${r._1}") }
  }

  test("q179 block-prefix rank equals the naive global hash rank; epochs decorrelate") {
    val got = Text.q179EpochShuffle(spark, sfDir)
      .as[(Long, Long, Long)].collect() // (epoch, bin, pos)
    val byEpoch = got.groupBy(_._1)
    assert(byEpoch.keySet === Set(0L, 1L))
    byEpoch.foreach { case (e, rows) =>
      // a permutation: every position 1..N exactly once
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length))
      // equals the naive rank recomputed locally (md5 order, bin tiebreak)
      val naive = rows.map(_._2).sorted
        .sortBy(b => (java.security.MessageDigest.getInstance("MD5")
          .digest(s"$b:$e".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString, b))
        .zipWithIndex.map { case (b, i) => b -> (i + 1).toLong }.toMap
      rows.foreach { case (_, b, p) => assert(p === naive(b), s"epoch $e bin $b") }
    }
    // the two epochs are genuinely different orders
    val p0 = byEpoch(0L).map(r => r._2 -> r._3).toMap
    val p1 = byEpoch(1L).map(r => r._2 -> r._3).toMap
    assert(p0 !== p1)
  }
}
