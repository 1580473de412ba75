package graft.ops

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** The versioned atomic publish protocol behind every staged asset
  * ([[Staged]]) — the property set a 100 TB serving deployment needs
  * from its index store:
  *
  *   - SNAPSHOT ISOLATION: a reader that resolved the asset before a
  *     refresh keeps its complete old snapshot; a reader after the
  *     swap sees the complete new one — never a mix, never a partial.
  *   - CRASH SAFETY: a publisher dying at ANY point before the swap
  *     (filled version dir, no commit) leaves readers and freshness
  *     untouched; dying between swap and manifest reads as stale
  *     (re-stage), never as fresh-but-old.
  *   - CROSS-RUN REUSE, gated: a later JVM of the SAME build trusts
  *     the manifest and skips re-staging; an ephemeral (durable=false)
  *     publish is never trusted cross-run.
  *   - BOUNDED DISK: keep-2 GC — current + one predecessor.
  */
class StagedPublishSpec extends SparkSpec {
  import spark.implicits._

  private def freshWork(): String =
    Files.createTempDirectory("staged-pub").toString

  private def publish(work: String, name: String, xs: Seq[Long]): Unit =
    Staged.write(xs.toDF("x"), work, name)

  private def readAll(work: String, name: String): Set[Long] =
    spark.read.parquet(s"$work/$name").as[Long].collect().toSet

  test("publish resolves through the plain path; republish swaps it") {
    val work = freshWork()
    publish(work, "a", Seq(1L, 2L))
    assert(readAll(work, "a") === Set(1L, 2L))
    assert(Files.isSymbolicLink(Paths.get(work, "a")))
    publish(work, "a", Seq(7L))
    assert(readAll(work, "a") === Set(7L))
  }

  test("snapshot isolation: a pre-swap reader keeps the old complete version") {
    val work = freshWork()
    publish(work, "iso", Seq(1L, 2L, 3L))
    // resolve the asset the way every engine reader does (Staged.path
    // pins the concrete v=N dir), THEN let a refresh land
    val pinned = spark.read.parquet(Staged.path(work, "iso"))
    publish(work, "iso", Seq(9L))
    assert(pinned.as[Long].collect().toSet === Set(1L, 2L, 3L),
      "a refresh racing a resolved reader changed what the reader saw")
    assert(spark.read.parquet(Staged.path(work, "iso"))
        .as[Long].collect().toSet === Set(9L),
      "a post-swap reader must see the new version")
  }

  test("crash before commit: filled version dir, reader and freshness untouched") {
    val work = freshWork()
    publish(work, "c", Seq(1L))
    // simulate the publisher dying after writing, before the swap
    val orphan = Staged.publishDir(work, "c")
    Seq(666L).toDF("x").write.mode("overwrite").parquet(orphan)
    assert(readAll(work, "c") === Set(1L),
      "an uncommitted version leaked to readers")
    Staged.unmarkForTesting(work, "c")
    assert(Staged.isFresh(work, "c"),
      "the committed version must stay fresh across the crash")
  }

  test("crash between swap and manifest reads as stale, never fresh-but-old") {
    val work = freshWork()
    publish(work, "m", Seq(1L))
    // simulate: a new version swaps in but the manifest write is lost
    // (durable=false performs exactly the swap-without-manifest half)
    val v = Staged.publishDir(work, "m")
    Seq(2L).toDF("x").write.mode("overwrite").parquet(v)
    Staged.commit(work, "m", v, durable = false)
    Staged.unmarkForTesting(work, "m")
    assert(!Staged.isFresh(work, "m"),
      "symlink/manifest disagreement must read as stale")
    assert(readAll(work, "m") === Set(2L),
      "the swapped content itself still serves (complete snapshot)")
  }

  test("cross-run reuse: same build trusts the manifest, ephemeral is never trusted") {
    val work = freshWork()
    publish(work, "r", Seq(4L))
    Staged.unmarkForTesting(work, "r") // "new JVM", same build
    assert(Staged.isFresh(work, "r"))
    val v = Staged.publishDir(work, "e")
    Seq(5L).toDF("x").write.mode("overwrite").parquet(v)
    Staged.commit(work, "e", v, durable = false)
    Staged.unmarkForTesting(work, "e")
    assert(!Staged.isFresh(work, "e"))
  }

  test("keep-2 GC: three publishes leave current + one predecessor") {
    val work = freshWork()
    publish(work, "g", Seq(1L))
    publish(work, "g", Seq(2L))
    publish(work, "g", Seq(3L))
    val vs = Files.list(Paths.get(work, ".v", "g")).iterator()
    var names = List.empty[String]
    while (vs.hasNext) names ::= vs.next().getFileName.toString
    assert(names.count(_.startsWith("v=")) === 2)
    assert(readAll(work, "g") === Set(3L))
  }

  test("rollback: a bad refresh reverts to the retained predecessor atomically") {
    val work = freshWork()
    publish(work, "rb", Seq(1L, 2L))         // the good index
    publish(work, "rb", Seq(666L))           // the bad refresh
    assert(readAll(work, "rb") === Set(666L))
    Staged.rollback(work, "rb")
    assert(readAll(work, "rb") === Set(1L, 2L),
      "rollback must serve the previous complete snapshot")
    Staged.unmarkForTesting(work, "rb")
    assert(Staged.isFresh(work, "rb"),
      "a rolled-back asset must stay manifest-consistent (fresh)")
    // both snapshots stay retained: a second rollback TOGGLES back
    Staged.rollback(work, "rb")
    assert(readAll(work, "rb") === Set(666L))
    Staged.rollback(work, "rb")
    assert(readAll(work, "rb") === Set(1L, 2L))
    // the next forward publish claims a fresh version, retains the
    // rolled-back-to current as ITS predecessor, and drops the bad one
    publish(work, "rb", Seq(7L))
    assert(readAll(work, "rb") === Set(7L))
    val vs = java.nio.file.Files.list(Paths.get(work, ".v", "rb"))
      .iterator()
    var names = Set.empty[String]
    while (vs.hasNext) names += vs.next().getFileName.toString
    assert(names.filter(_.startsWith("v=")) === Set("v=1", "v=3"),
      s"GC must keep {new current, previous current}, got $names")
  }

  test("rollback without a retained predecessor fails by name") {
    val work = freshWork()
    val e = intercept[IllegalArgumentException](
      Staged.rollback(work, "ghost"))
    assert(e.getMessage.contains("no published version"))
    publish(work, "solo", Seq(5L)) // one version only
    intercept[IllegalStateException](Staged.rollback(work, "solo"))
    assert(readAll(work, "solo") === Set(5L), "failed rollback is a no-op")
  }

  test("a plain directory squatting the link path is replaced by the swap") {
    val work = freshWork()
    Seq(0L).toDF("x").write.mode("overwrite").parquet(s"$work/p")
    assert(!Files.isSymbolicLink(Paths.get(work, "p")))
    publish(work, "p", Seq(8L))
    assert(Files.isSymbolicLink(Paths.get(work, "p")))
    assert(readAll(work, "p") === Set(8L))
  }

  test("build fingerprint is stable in-JVM; input fingerprint tracks the data") {
    assert(Staged.buildFingerprint === Staged.buildFingerprint)
    assert(Staged.buildFingerprint.length >= 16)
    // the stage root is single-build: a different build lands in a
    // different root, so multi-asset refresh swaps can never be
    // half-read by a concurrent JVM of another build
    assert(Dedup.stageRoot("/root/testdata/sf0.001")
      .endsWith("-" + Staged.buildFingerprint.take(8)))
    val d = Files.createTempDirectory("fp-in")
    Files.writeString(d.resolve("t.parquet"), "aa")
    val f1 = Staged.inputFingerprint(d.toString)
    Files.writeString(d.resolve("t.parquet"), "aaaa") // size change
    val f2 = Staged.inputFingerprint(d.toString)
    assert(f1 !== f2, "regenerated data must move the stage root")
  }
}
