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
  *   - BOUNDED DISK: keep-2 GC — current + one predecessor — that
  *     never touches a concurrent publisher's HIGHER claimed version
  *     and honors the scan-TTL floor (`graft.staged.gc.ttlMs`).
  *   - HONEST RECOVERY: rollback only ever blesses a version that
  *     completed a commit (the COMMITTED sentinel), never a crashed
  *     publisher's orphan.
  *   - GROUP CONSISTENCY (opt-in): multi-asset refreshes stamped with
  *     a group id are observed all-or-nothing via resolveGroup.
  */
class StagedPublishSpec extends SparkSpec {
  import spark.implicits._

  private def freshWork(): String =
    Files.createTempDirectory("staged-pub").toString

  private def publish(work: String, name: String, xs: Seq[Long]): Unit =
    Staged.write(xs.toDF("x"), work, name)

  private def readAll(work: String, name: String): Set[Long] =
    spark.read.parquet(s"$work/$name").as[Long].collect().toSet

  test("a sentinel-write failure after a successful publish fails by name, never silently") {
    val work = freshWork()
    val vdir = Staged.publishDir(work, "sfail")
    Seq(1L).toDF("x").write.mode("overwrite").parquet(vdir)
    // occupy the sentinel path with a DIRECTORY: Files.writeString then
    // fails even as root — the one simulable filesystem fault here
    Files.createDirectory(Paths.get(vdir, "_GRAFT_COMMITTED"))
    val e = intercept[IllegalStateException](
      Staged.commit(work, "sfail", vdir))
    assert(e.getMessage.contains("sentinel"))
  }

  test("publish resolves through the plain path; republish swaps it") {
    val work = freshWork()
    publish(work, "a", Seq(1L, 2L))
    assert(readAll(work, "a") === Set(1L, 2L))
    assert(Files.isSymbolicLink(Paths.get(work, "a")))
    publish(work, "a", Seq(7L))
    assert(readAll(work, "a") === Set(7L))
  }

  test("a partitioned publish rides the identical protocol: versioned, swapped, stamped") {
    // writePartitioned is a LAYOUT choice inside one version (q197's
    // substrate) — versioning, swap, group stamp, and freshness must
    // behave byte-identically to a plain write
    val work = freshWork()
    val df = Seq((1L, 10L), (2L, 20L), (3L, 10L)).toDF("k", "nb")
    Staged.writePartitioned(df, work, "p", partitionCol = "nb",
      group = Some("g1"))
    assert(Files.isSymbolicLink(Paths.get(work, "p")))
    assert(Staged.isFresh(work, "p") &&
      Staged.groupOf(work, "p").contains("g1"))
    // physically partitioned inside the version dir
    val parts = Paths.get(work, "p").toRealPath().toFile.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("nb="))
    assert(parts.map(_.getName).sorted.toSeq === Seq("nb=10", "nb=20"))
    // content round-trips, partition column included
    assert(spark.read.parquet(s"$work/p").select("k", "nb")
      .as[(Long, Long)].collect().toSet ===
      Set((1L, 10L), (2L, 20L), (3L, 10L)))
    // republish swaps exactly like a plain asset; the old version
    // stays for pinned readers (keep-2)
    val pinned = Paths.get(work, "p").toRealPath().toString
    Staged.writePartitioned(Seq((9L, 30L)).toDF("k", "nb"), work, "p",
      partitionCol = "nb", group = Some("g2"))
    assert(spark.read.parquet(s"$work/p").select("k")
      .as[Long].collect().toSet === Set(9L))
    assert(Staged.groupOf(work, "p").contains("g2"))
    assert(spark.read.parquet(pinned).select("k")
      .as[Long].collect().toSet === Set(1L, 2L, 3L),
      "pre-swap reader keeps its complete partitioned snapshot")
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

  test("GC never deletes a concurrent publisher's HIGHER claimed version") {
    val work = freshWork()
    publish(work, "cc", Seq(1L))                 // v=1 current
    val loser = Staged.publishDir(work, "cc")    // v=2, this publisher
    val racer = Staged.publishDir(work, "cc")    // v=3, concurrent claim
    assert(racer.endsWith("v=3"))
    Seq(2L).toDF("x").write.mode("overwrite").parquet(loser)
    Staged.commit(work, "cc", loser)             // v=2 commits FIRST
    assert(Files.isDirectory(Paths.get(racer)),
      "the first committer's GC destroyed a concurrent higher claim mid-write")
    // the racer finishes normally; ITS commit's GC then applies keep-2
    Seq(3L).toDF("x").write.mode("overwrite").parquet(racer)
    Staged.commit(work, "cc", racer)
    assert(readAll(work, "cc") === Set(3L))
    assert(!Files.isDirectory(Paths.get(work, ".v", "cc", "v=1")),
      "the racer's own commit retires versions below it normally")
  }

  test("scan-TTL floor: a pinned version survives two publishes within the TTL") {
    val work = freshWork()
    sys.props("graft.staged.gc.ttlMs") = "600000"
    try {
      publish(work, "ttl", Seq(1L))
      val pinned = spark.read.parquet(Staged.path(work, "ttl"))
      publish(work, "ttl", Seq(2L))
      publish(work, "ttl", Seq(3L)) // keep-2 alone would drop v=1 here
      assert(pinned.as[Long].collect().toSet === Set(1L),
        "a reader that pinned v=1 lost its files inside the scan TTL")
      assert(Files.isDirectory(Paths.get(work, ".v", "ttl", "v=1")))
    } finally sys.props.remove("graft.staged.gc.ttlMs")
    // with the floor back at 0, the next publish applies plain keep-2
    publish(work, "ttl", Seq(4L))
    val left = Files.list(Paths.get(work, ".v", "ttl")).iterator()
    var names = Set.empty[String]
    while (left.hasNext) names += left.next().getFileName.toString
    assert(names.filter(_.startsWith("v=")) === Set("v=3", "v=4"))
  }

  test("rollback skips orphan uncommitted versions and fails by name if only orphans remain") {
    val work = freshWork()
    publish(work, "orb", Seq(1L))                // v=1, good
    publish(work, "orb", Seq(666L))              // v=2, bad current
    // a publisher crashed before commit: filled v=3, no sentinel
    val orphan = Staged.publishDir(work, "orb")
    Seq(13L).toDF("x").write.mode("overwrite").parquet(orphan)
    Staged.rollback(work, "orb")
    assert(readAll(work, "orb") === Set(1L),
      "rollback blessed a crashed publisher's uncommitted orphan")
    // an asset whose only non-current version is an orphan: refuse
    val work2 = freshWork()
    publish(work2, "solo", Seq(5L))
    val o2 = Staged.publishDir(work2, "solo")
    Seq(6L).toDF("x").write.mode("overwrite").parquet(o2)
    val e = intercept[IllegalStateException](Staged.rollback(work2, "solo"))
    assert(e.getMessage.contains("COMMITTED"))
    assert(readAll(work2, "solo") === Set(5L), "failed rollback is a no-op")
  }

  test("group stamp: a cells+probes pair swap is observed all-or-nothing") {
    val work = freshWork()
    Staged.write(Seq(1L).toDF("x"), work, "gc_cells", group = Some("gen1"))
    Staged.write(Seq(2L).toDF("x"), work, "gc_probes", group = Some("gen1"))
    val r1 = Staged.resolveGroup(work, Seq("gc_cells", "gc_probes"))
    assert(spark.read.parquet(r1("gc_cells")).as[Long].collect().toSet === Set(1L))
    assert(spark.read.parquet(r1("gc_probes")).as[Long].collect().toSet === Set(2L))
    // mid-swap: cells republished as gen2, probes still gen1 — a
    // group reader must never return the mixed pair
    Staged.write(Seq(10L).toDF("x"), work, "gc_cells", group = Some("gen2"))
    val e = intercept[IllegalStateException](
      Staged.resolveGroup(work, Seq("gc_cells", "gc_probes"), timeoutMs = 300))
    assert(e.getMessage.contains("group resolve timed out"))
    // swap completes: the reader sees gen2 for BOTH
    Staged.write(Seq(20L).toDF("x"), work, "gc_probes", group = Some("gen2"))
    val r2 = Staged.resolveGroup(work, Seq("gc_cells", "gc_probes"))
    assert(spark.read.parquet(r2("gc_cells")).as[Long].collect().toSet === Set(10L))
    assert(spark.read.parquet(r2("gc_probes")).as[Long].collect().toSet === Set(20L))
    // an unstamped asset made no consistency promise: group reads fail
    publish(work, "gc_plain", Seq(7L))
    intercept[IllegalStateException](
      Staged.resolveGroup(work, Seq("gc_plain"), timeoutMs = 200))
  }

  test("mid-swap detection on the real IVF serving family: q79/q172's read path") {
    // run the REAL staging + serving entry inside a redirected tmpdir
    // so the shared stage root for the driver's testdata is never
    // touched (suites run sequentially in the forked test JVM, so the
    // property mutation is safe under try/finally)
    val prevTmp = sys.props("java.io.tmpdir")
    val tmp = Files.createTempDirectory("staged-midswap").toString
    try {
      sys.props("java.io.tmpdir") = tmp
      val dir = "/root/testdata/sf0.001"
      val work = Dedup.stageRoot(dir)
      // the real serving entry: stages the family (one nonce across
      // cells/probes/probes_wide) and reads it group-consistently
      assert(Similarity.q79AnnIvfMultiprobe(spark, dir).count() > 0)
      val gCells = Staged.groupOf(work, "cells")
      val gProbes = Staged.groupOf(work, "probes")
      assert(gCells.isDefined && gCells === gProbes,
        s"one stageIvfIndex call must stamp the family with ONE nonce: $gCells vs $gProbes")
      assert(gCells === Staged.groupOf(work, "probes_wide"))
      // a refresh crashes mid-swap: cells republished under a NEW
      // generation nonce, probes still the old one. The group read
      // must refuse the mixed pair by name — this is real detection
      // (the static root-id stamp could never distinguish these)
      Staged.write(spark.read.parquet(Staged.path(work, "cells")),
        work, "cells", group = Some(Staged.newGroupId(work)))
      val e = intercept[IllegalStateException](
        Staged.resolveGroup(work, Seq("cells", "probes"), timeoutMs = 300))
      assert(e.getMessage.contains("group resolve timed out"))
      // the swap completes (next full staging call): serving resumes
      Similarity.stageIvfIndex(spark, dir, work)
      assert(Similarity.q79AnnIvfMultiprobe(spark, dir).count() > 0)
    } finally {
      sys.props("java.io.tmpdir") = prevTmp
    }
  }

  test("rollback restores the group stamp the target version was committed with") {
    // a bad refresh (unstamped or differently-stamped) lands on top of
    // a group-stamped generation; rolling back must restore BOTH the
    // bytes and the stamp — rollback re-commits through the normal
    // path, and before round 14 that republished the manifest with
    // group=None, silently stripping a family member of its stamp and
    // timing out every subsequent resolveGroup reader
    val work = freshWork()
    Staged.write(Seq(1L).toDF("x"), work, "rbg", group = Some("genA"))
    Staged.write(Seq(2L).toDF("x"), work, "rbg") // bad refresh, unstamped
    assert(Staged.groupOf(work, "rbg").isEmpty)
    Staged.rollback(work, "rbg")
    assert(readAll(work, "rbg") === Set(1L))
    assert(Staged.groupOf(work, "rbg") === Some("genA"),
      "rollback must restore the rolled-back-to version's group stamp")
  }

  test("every staged multi-asset family carries ONE nonce per staging call") {
    // the stamp-coverage contract behind the group-consistent reads:
    // whichever entry stages a family, all members of that family end
    // up with the SAME per-invocation nonce — so a resolveGroup reader
    // of ANY pair in the family gets the all-or-nothing view, and the
    // families q153/q136 read via the determinism argument are
    // verifiably single-generation too. Runs each family's real
    // staging at sf0.001 inside a redirected stage root.
    val prevTmp = sys.props("java.io.tmpdir")
    val tmp = Files.createTempDirectory("staged-families").toString
    try {
      sys.props("java.io.tmpdir") = tmp
      val dir = "/root/testdata/sf0.001"
      val work = Dedup.stageRoot(dir)
      def sameStamp(family: String*): Unit = {
        val stamps = family.map(n => n -> Staged.groupOf(work, n))
        assert(stamps.forall(_._2.isDefined),
          s"unstamped member in $stamps")
        assert(stamps.map(_._2).distinct.size === 1,
          s"family stamped across generations: $stamps")
      }
      Similarity.stageIvfIndex(spark, dir, work)
      sameStamp("cells", "probes", "probes_wide")
      Similarity.stageHierIndex(spark, dir, work)
      sameStamp("cells_hier", "probes_hier")
      Similarity.stageHier3Index(spark, dir, work)
      sameStamp("cells_hier3", "probes_hier3")
      Similarity.stageShardedIndex(spark, dir, work)
      sameStamp("cells_shard", "probes_shard")
      Similarity.stageShardedHierIndex(spark, dir, work)
      sameStamp("cells_shard_hier", "probes_shard_hier")
      Similarity.stagePq(spark, dir, work)
      sameStamp("pq_codes", "pq_codebook")
      Similarity.stageSq8(spark, dir, work)
      sameStamp("sq_params", "sq_codes")
      // and two different invocations mint two different generations
      val g1 = Staged.groupOf(work, "pq_codes")
      Similarity.stagePq(spark, dir, work)
      assert(Staged.groupOf(work, "pq_codes") !== g1,
        "a re-staging call must mint a NEW generation nonce")
      sameStamp("pq_codes", "pq_codebook")
    } finally {
      sys.props("java.io.tmpdir") = prevTmp
    }
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
    val r1 = Dedup.stageRoot(d.toString)
    Files.writeString(d.resolve("t.parquet"), "aaaa") // size change
    val f2 = Staged.inputFingerprint(d.toString)
    assert(f1 !== f2, "regenerated data must move the stage root")
    // stageRoot is uncached: the SAME JVM observes the move at once —
    // assets fingerprinted from the old data can never be trusted for
    // the new (round-12 advisor: no process-lifetime memo)
    assert(Dedup.stageRoot(d.toString) !== r1,
      "mid-JVM data regeneration must resolve to a fresh stage root")
  }
}
