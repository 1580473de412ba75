package graft.ops

import graft.SparkSpec

/** q135 refresh accounting on a planted drift scenario: the historical
  * corpus (vec_id % 10 ≠ 9) is three tight axis clusters (e0/e1/e2);
  * the "streamed" tail (vec_id % 10 = 9) is a fourth, FAR cluster on
  * e5 at 10× magnitude that stale centroids know nothing about —
  * assign-only ingest quantizes it badly, a retrain must both improve
  * the average quantization error and move assignments.
  */
class IndexCompactionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-compact").toString
    def v(axis: Int, mag: Float, jitter: Float) = {
      val a = Array.fill(64)(0.0f)
      a(axis) = mag
      a(60) = jitter
      a
    }
    val oldIds = (0L until 40L).filter(_ % 10 != 9)
    val olds = oldIds.zipWithIndex.map { case (id, i) =>
      (id, v(i % 3, 1.0f, (i / 3) * 0.01f), i % 3)
    }
    val news = Seq(9L, 19L, 29L, 39L).zipWithIndex.map { case (id, i) =>
      (id, v(5, 10.0f, i * 0.01f), 3)
    }
    (olds ++ news).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private lazy val rows: Map[String, (Long, Long, Long, Double, Double, Long)] =
    Similarity.q135IndexCompaction(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6)))).toMap

  test("both phases report the full corpus across k cells") {
    assert(rows.keySet === Set("before", "after"))
    for ((_, (nCells, nVectors, largest, skew, _, _)) <- rows) {
      assert(nCells === 4L)
      assert(nVectors === 40L)
      assert(largest >= 10L && largest <= 40L)
      assert(skew >= 1.0)
    }
  }

  test("retrain improves quantization error and moves assignments") {
    val (_, _, _, _, sqBefore, moved) = rows("before")
    val (_, _, _, _, sqAfter, movedA) = rows("after")
    assert(moved === movedA) // global scalar, identical on both rows
    assert(sqAfter < sqBefore,
      s"retrain should cut avg sq dist: before=$sqBefore after=$sqAfter")
    assert(moved > 0L)
  }

  test("the report is deterministic across reruns") {
    val again = Similarity.q135IndexCompaction(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6)))).toMap
    assert(again === rows)
  }
}
