package graft.genomics

import graft.functions.{Span, StitchAggregator}

import scala.collection.mutable
import scala.io.Source

/** Small-input fast path: the same three assembly phases as
  * [[Assembly]], computed driver-side with zero Spark jobs.
  *
  * Rationale: the reference is a native binary that finishes its own
  * sample (3 reads, /root/reference/GraphLab_Input_short.txt) in
  * milliseconds; paying SparkSession startup + distributed scheduling
  * for kilobyte inputs loses that comparison for no benefit. The CLI
  * routes inputs under a size threshold here (the same idea as Spark's
  * own local-relation short-circuits); semantics are identical —
  * deterministic argmax ties (score desc, id asc), tag-only prune,
  * path-order right fold via [[StitchAggregator.step]] — and the spec
  * asserts local == Spark on random graphs.
  */
object LocalAssembly {

  final case class V(id: Long, length: Int, content: String, offset: Int, score: Double)

  /** Parse the GraphLab text format exactly like [[Reads.loadGraphTsv]]:
    * whitespace-tokenized, malformed lines skipped, 0..n successor ids.
    */
  def parse(path: String): (Vector[V], Vector[(Long, Long)]) = {
    val vs = Vector.newBuilder[V]
    val es = Vector.newBuilder[(Long, Long)]
    val src = Source.fromFile(path)
    try src.getLines().foreach { line =>
      val t = line.trim.split("\\s+").filter(_.nonEmpty)
      if (t.length >= 5) {
        try {
          val v = V(t(0).toLong, t(1).toInt, t(2), t(3).toInt, t(4).toDouble)
          vs += v
          // per-token safe parse of the successor tail: one malformed
          // successor drops only itself, matching Reads.loadGraphTsv's
          // try_cast + null filter (a whole-tail abort would keep the
          // edges before the bad token and lose the rest)
          t.drop(5).foreach(d =>
            scala.util.Try(d.toLong).toOption.foreach(x => es += (v.id -> x)))
        } catch { case _: NumberFormatException => () } // skip malformed line
      }
    }
    finally src.close()
    (vs.result(), es.result())
  }

  /** Phase 1 (tag-only) + phase 2 (argmax): per-vertex
    * `(valid, next_id)` with the engine's deterministic tie-break.
    */
  def phases12(vertices: Vector[V], edges: Vector[(Long, Long)],
      dest: Long): Map[Long, (Boolean, Long)] = {
    val byId = vertices.map(v => v.id -> v).toMap
    val out = edges.groupBy(_._1)
    vertices.map { v =>
      val succs = out.getOrElse(v.id, Vector.empty).map(_._2).flatMap(byId.get)
      val next = if (succs.isEmpty) -1L
        else succs.maxBy(s => (s.score, -s.id)).id // score desc, id asc
      val valid = succs.nonEmpty || v.id == dest
      v.id -> ((valid, next))
    }.toMap
  }

  /** Phase 3: walk the `next_id` chain from `source` (cycle-guarded) and
    * right-fold in path order — the converged reference fixpoint.
    */
  def assembleFrom(vertices: Vector[V], edges: Vector[(Long, Long)],
      source: Long, dest: Long): Option[Span] = {
    val byId = vertices.map(v => v.id -> v).toMap
    val next = phases12(vertices, edges, dest)
    if (!byId.contains(source)) return None
    val path = mutable.ArrayBuffer.empty[V]
    val seen = mutable.Set.empty[Long]
    var cur = source
    while (cur != -1L && !seen(cur) && byId.contains(cur)) {
      seen += cur
      path += byId(cur)
      cur = next(cur)._2
    }
    val spans = path.map(v => Span(v.offset, v.length, v.content)).toList
    Some(foldPath(spans))
  }

  /** See [[graft.functions.StitchFolds.foldPath]]. */
  def foldPath(path: List[Span]): Span = graft.functions.StitchFolds.foldPath(path)
}
