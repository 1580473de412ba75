package graft.ops

import graft.SparkSpec
import graft.functions.{CellStarReduce, Dsu}
import org.apache.spark.sql.functions._

/** The round-13 SemDeDup edge-set star reduction: `stageSemPairs`
  * stages one `(component-min, member)` star edge per dup-group
  * member instead of the raw C(g,2) in-cell pair list, via the
  * per-cell union-find Aggregator ([[graft.functions.CellStarReduce]]).
  * Pins, in order of what could silently break:
  *
  *  1. the reduction is EXACT — q92 over the star-staged edges is
  *     byte-identical to connected components over the raw all-pairs
  *     edge set it replaced, on the real sf0.001 corpus;
  *  2. it is NOT the lossy per-member min-neighbor shortcut: the
  *     bridge graph {1–10, 2–11, 10–11} (one component whose only
  *     bridge is between its two HIGH-id vertices) star-reduces to a
  *     single component — min-neighbor edges alone would split it;
  *  3. edge volume is linear: a planted g-clique stages exactly g−1
  *     edges;
  *  4. `merge` is a true partial-agg combiner: folding the edges in
  *     one buffer equals reducing disjoint slices and merging, in
  *     either merge order — what Spark's partial aggregation is free
  *     to do across tasks.
  */
class StarReduceSpec extends SparkSpec {
  import spark.implicits._

  private def stars(edges: Seq[(Long, Long)]): Set[(Long, Long)] = {
    val d = edges.foldLeft(CellStarReduce.zero)(CellStarReduce.reduce)
    CellStarReduce.finish(d).toSet
  }

  test("bridge between high-id vertices survives (min-neighbor shortcut would split it)") {
    // component {1,10,2,11}: minNbr(1)=10, minNbr(10)=1, minNbr(2)=11,
    // minNbr(11)=2 — per-member min edges drop the 10–11 bridge. The
    // union-find star must keep one component rooted at 1.
    assert(stars(Seq((1L, 10L), (2L, 11L), (10L, 11L))) ===
      Set((1L, 2L), (1L, 10L), (1L, 11L)))
  }

  test("chain reduces to a star at the component minimum") {
    assert(stars(Seq((7L, 9L), (3L, 9L), (3L, 5L), (1L, 5L))) ===
      Set((1L, 3L), (1L, 5L), (1L, 7L), (1L, 9L)))
    // two separate components stay separate
    assert(stars(Seq((4L, 8L), (2L, 6L))) === Set((2L, 6L), (4L, 8L)))
  }

  test("merge of disjoint partial buffers equals the single fold, both orders") {
    val all = Seq((1L, 10L), (2L, 11L), (10L, 11L), (20L, 21L), (21L, 22L))
    val whole = stars(all)
    val (s1, s2) = all.splitAt(2)
    val b1 = s1.foldLeft(CellStarReduce.zero)(CellStarReduce.reduce)
    val b2 = s2.foldLeft(CellStarReduce.zero)(CellStarReduce.reduce)
    assert(CellStarReduce.finish(CellStarReduce.merge(b1, b2)).toSet === whole)
    val c1 = s1.foldLeft(CellStarReduce.zero)(CellStarReduce.reduce)
    val c2 = s2.foldLeft(CellStarReduce.zero)(CellStarReduce.reduce)
    assert(CellStarReduce.finish(CellStarReduce.merge(c2, c1)).toSet === whole)
  }

  test("buffer survives the java-serialization boundary partial agg ships it across") {
    val b = Seq((5L, 9L), (3L, 9L)).foldLeft(CellStarReduce.zero)(CellStarReduce.reduce)
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos); oos.writeObject(b); oos.close()
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray)).readObject().asInstanceOf[Dsu]
    val merged = CellStarReduce.merge(CellStarReduce.zero, back)
    assert(CellStarReduce.finish(merged).toSet === Set((3L, 5L), (3L, 9L)))
  }

  test("a giant-cell buffer serializes flat: ~16 bytes per tracked node, round-trip exact") {
    // the partial-agg buffer crosses the shuffle java-serialized; the
    // custom writeObject must emit (count, key/parent longs) — ~16 B
    // per node — not a boxed HashMap graph (~45+ B/node), and the
    // round-trip must preserve connectivity exactly
    val g = 100000
    val d = (1 until g).foldLeft(CellStarReduce.zero)((b, j) =>
      CellStarReduce.reduce(b, (0L, j.toLong)))
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos); oos.writeObject(d); oos.close()
    val bytes = bos.toByteArray
    assert(bytes.length < g * 17 + 1024,
      s"buffer not flat: ${bytes.length} bytes for $g nodes")
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bytes)).readObject().asInstanceOf[Dsu]
    val merged = CellStarReduce.merge(CellStarReduce.zero, back)
    val out = CellStarReduce.finish(merged)
    assert(out.size === g - 1)
    assert(out.forall(_._1 == 0L))
    assert(out.map(_._2).toSet === (1 until g).map(_.toLong).toSet)
  }

  test("a planted g-clique stages exactly g-1 edges") {
    val d = java.nio.file.Files.createTempDirectory("graft-star-clique").toString
    val g = 12
    // bit-identical members: one dup group, guaranteed to share a cell
    // (argmin assignment of equal points is equal)
    val v: Seq[Float] =
      Array.tabulate(64)(dim => 10.0f + 0.001f * (dim % 3)).toSeq
    (0 until g).map(j => (j.toLong, v, 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    Similarity.q92SemanticDedup(spark, d).collect()
    val staged = spark.read.parquet(s"${Dedup.stageRoot(d)}/sem_pairs")
      .as[(Long, Long)].collect().toSet
    assert(staged === (1 until g).map(j => (0L, j.toLong)).toSet)
  }

  test("exact-dup pre-collapse: concentrated copy mass stays linear and closure-exact") {
    // the round-13 verdict's weak spot: g exact copies land in ONE cell
    // (k-means cannot split identical vectors) and used to price C(g,2)
    // cosines in the candidate join. Pre-collapsed, the staged edge set
    // must stay LINEAR (< n edges vs C(400,2) = 79,800 raw pairs) and
    // the q92 answer must equal CC over the raw all-pairs form on a
    // corpus mixing copy mass, distinct near-dups, and far vectors.
    val d = java.nio.file.Files.createTempDirectory("graft-star-copies").toString
    val g = 400
    val base: Seq[Float] =
      Array.tabulate(64)(dim => 10.0f + 0.001f * (dim % 3)).toSeq
    def nearDup(j: Int): Seq[Float] = // distinct bytes, cosine ≈ 1
      base.updated(j % 64, base(j % 64) + 0.01f + 0.001f * j)
    def far(j: Int): Seq[Float] =
      Array.tabulate(64) { dim =>
        (if (dim / 16 == j % 4) 8.0f else 0.0f) + 0.002f * ((j + dim) % 5)
      }.toSeq
    val rows = (0 until g).map(j => (j.toLong, base, 0)) ++
      (0 until 30).map(j => (10000L + j, nearDup(j), 1)) ++
      (0 until 20).map(j => (20000L + j, far(j), 2))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val got = Similarity.q92SemanticDedup(spark, d)
      .as[(Long, Long, Boolean)].collect().toSeq
    val work = Dedup.stageRoot(d)
    val staged = spark.read.parquet(s"$work/sem_pairs")
    assert(staged.count() < rows.size,
      s"staged edge set not linear: ${staged.count()} edges for ${rows.size} rows")
    // raw all-pairs form, inline (no pre-collapse, no star reduction)
    val iv = Similarity.scaledVectors(spark, d)
      .join(spark.read.parquet(Staged.path(work, "cells")), "vec_id")
      .select(col("vec_id"), col("cluster"), col("v"), col("nrm"))
      .localCheckpoint()
    val a = iv.select(col("cluster"), col("vec_id").as("doc_a"),
      col("v").as("va"), col("nrm").as("na"))
    val b = iv.select(col("cluster"), col("vec_id").as("doc_b"),
      col("v").as("vb"), col("nrm").as("nb"))
    val rawPairs = a.join(b, Seq("cluster"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        Similarity.cosine(Similarity.idot(col("va"), col("vb")),
          col("na"), col("nb")).as("cos"))
      .where(col("cos") >= Similarity.SemDedupThreshold)
      .select(col("doc_a"), col("doc_b"))
    val expected = Dedup.connectedComponents(rawPairs)
      .select(col("doc_id").as("vec_id"), col("cluster_id").as("rep_id"),
        (col("doc_id") === col("cluster_id")).as("is_survivor"))
      .orderBy(col("vec_id"))
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got === expected)
    // the copy mass is genuinely one component rooted at vec_id 0
    assert(got.count { case (_, rep, _) => rep == 0L } >= g)
  }

  test("q92 over star-staged edges is byte-identical to CC over the raw all-pairs set (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val got = Similarity.q92SemanticDedup(spark, dir)
      .as[(Long, Long, Boolean)].collect().toSeq
    // the raw all-pairs form stageSemPairs replaced, inline: same
    // cells, same cosine, same threshold — no star reduction
    val work = Dedup.stageRoot(dir)
    val iv = Similarity.scaledVectors(spark, dir)
      .join(spark.read.parquet(Staged.path(work, "cells")), "vec_id")
      .select(col("vec_id"), col("cluster"), col("v"), col("nrm"))
      .localCheckpoint()
    val a = iv.select(col("cluster"), col("vec_id").as("doc_a"),
      col("v").as("va"), col("nrm").as("na"))
    val b = iv.select(col("cluster"), col("vec_id").as("doc_b"),
      col("v").as("vb"), col("nrm").as("nb"))
    val rawPairs = a.join(b, Seq("cluster"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        Similarity.cosine(Similarity.idot(col("va"), col("vb")),
          col("na"), col("nb")).as("cos"))
      .where(col("cos") >= Similarity.SemDedupThreshold)
      .select(col("doc_a"), col("doc_b"))
    val expected = Dedup.connectedComponents(rawPairs)
      .select(col("doc_id").as("vec_id"), col("cluster_id").as("rep_id"),
        (col("doc_id") === col("cluster_id")).as("is_survivor"))
      .orderBy(col("vec_id"))
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got === expected)
    assert(got.nonEmpty, "sf0.001 must produce at least one semantic cluster")
  }
}
