package graft.ops

/** Run-scoped registry of staged index/pair assets — the guard behind
  * the production staged-input catalog entries (q138/q139/q140).
  *
  * The stage root ([[Dedup.stageRoot]]) lives under the JVM temp dir
  * and SURVIVES between runs, but a code change between rounds can
  * change what a staging function writes — so an asset found on disk
  * from a previous JVM must never be consumed as-is (the oracle would
  * replay this round's staging over last round's files). The rule:
  * an asset is trusted only if a query of THIS JVM staged it. Every
  * staging function [[mark]]s what it wrote; a staged-input entry
  * checks [[isFresh]] and re-stages (overwriting whatever /tmp held)
  * only when no query of the run has staged the asset yet. Within a
  * Bench/Verify run this gives exactly the production economics: the
  * first consumer pays the staging once, every later consumer pays
  * only its own model-sized joins.
  */
object Staged {
  private val fresh =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def mark(work: String, names: String*): Unit =
    names.foreach(n => fresh.add(s"$work/$n"))

  def isFresh(work: String, name: String): Boolean =
    fresh.contains(s"$work/$name")
}
