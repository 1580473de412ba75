package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental IVF ingest (q81): the codebook trains on the corpus
  * split only, the new batch (vec_id % 10 == 9) is map-assigned to its
  * nearest trained cell, and the refreshed staged index must place and
  * serve the ingested vectors correctly. Planted geometry:
  *
  *   - four orthogonal corpus clusters (q81 trains k=4), 3 vectors
  *     each: A = ids 0..2 (dims 0–7), B = 30..32 (dims 16–23),
  *     C = 40..42 (dims 32–39), D = 50..52 (dims 48–55)
  *   - new batch: id 9 = A-like, id 19 = C-like
  *
  * Ingest must put 9 in A's cell and 19 in C's, and searching the
  * refreshed index must return each new vector's cluster-mates — with
  * no leakage across cells.
  */
class IvfIngestSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-ivf-ingest").toString
    // axis ∈ {0,2,4,6} → hot dim blocks 0–7, 16–23, 32–39, 48–55; the
    // `lean` weight tilts a vector toward a second axis without moving
    // it out of its cluster
    def bvec(axis: Int, leanAxis: Int, lean: Float, jitter: Float) =
      Array.tabulate(64) { i =>
        (if (i / 8 == axis) 1.0f else if (i / 8 == leanAxis) lean else 0.0f) +
          (if (i == 63) jitter else 0.0f)
      }
    Seq(
      (0L, bvec(0, 2, 0f, 0.00f), 0), (1L, bvec(0, 2, 0f, 0.02f), 0),
      (2L, bvec(0, 2, 0f, 0.04f), 0),
      (30L, bvec(2, 0, 0f, 0.00f), 0), (31L, bvec(2, 0, 0f, 0.02f), 0),
      (32L, bvec(2, 0, 0f, 0.04f), 0),
      (40L, bvec(4, 0, 0f, 0.00f), 0), (41L, bvec(4, 0, 0f, 0.02f), 0),
      (42L, bvec(4, 0, 0f, 0.04f), 0),
      (50L, bvec(6, 0, 0f, 0.00f), 0), (51L, bvec(6, 0, 0f, 0.02f), 0),
      (52L, bvec(6, 0, 0f, 0.04f), 0),
      (9L, bvec(0, 2, 0.1f, 0.01f), 0),
      (19L, bvec(4, 0, 0.1f, 0.01f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private lazy val result = Similarity.q81AnnIvfIngest(spark, dir)
    .select($"query_id", $"rank", $"neighbor_id")
    .as[(Long, Int, Long)].collect().toSeq

  test("ingested vectors land in the cell a retrained assignment implies") {
    result // force the staging write
    val cells = spark.read
      .parquet(s"${Dedup.stageRoot(dir)}/cells_ingest")
      .as[(Long, Int)].collect().toMap
    assert(cells.size === 14)
    assert(cells(9L) === cells(0L), s"A-like ingest: $cells")
    assert(cells(19L) === cells(40L), s"C-like ingest: $cells")
    assert(Set(cells(0L), cells(30L), cells(40L), cells(50L)).size === 4,
      s"planted clusters merged: $cells")
  }

  test("searching the refreshed index serves the new vectors their cluster-mates") {
    val byQuery = result.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3)).toMap
    assert(byQuery(9L).toSet === Set(0L, 1L, 2L), byQuery(9L).toString)
    assert(byQuery(19L).toSet === Set(40L, 41L, 42L), byQuery(19L).toString)
    // corpus queries now ALSO see the ingested vector in their cell
    assert(byQuery(0L).contains(9L), byQuery(0L).toString)
    assert(!byQuery(0L).exists(Set(30L, 31L, 32L, 19L)), byQuery(0L).toString)
  }
}
