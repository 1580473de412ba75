package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Union-find over Long ids with path compression and union-by-min —
  * the in-cell connected-components state behind [[CellStarReduce]].
  * Roots are always the MINIMUM id of their component (union attaches
  * the larger root under the smaller), so the emitted star edges are
  * (min-of-component, member) with doc_a < doc_b by construction —
  * the same edge orientation the all-pairs form staged.
  *
  * Serialization is CUSTOM and flat — `writeObject` emits one int
  * count plus 16 bytes per tracked node ((key, parent) longs), and
  * `readObject` rebuilds the pre-sized map — because the partial-agg
  * buffers cross the shuffle through `Encoders.javaSerialization`
  * and default java-ser of a boxed HashMap costs ~45+ bytes/entry
  * (object headers, handles, rehash on read). A 10^5-member cell's
  * buffer is ~1.6 MB flat vs ~4.5+ MB boxed; the in-heap working
  * form stays the mutation-friendly HashMap. StarReduceSpec pins the
  * round-trip and the per-entry bound.
  */
final class Dsu extends Serializable {
  @transient var parent = new java.util.HashMap[java.lang.Long, java.lang.Long]()

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.writeInt(parent.size)
    val it = parent.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeLong(e.getKey.longValue)
      out.writeLong(e.getValue.longValue)
    }
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    val n = in.readInt()
    parent = new java.util.HashMap[java.lang.Long, java.lang.Long](
      math.max(16, (n / 0.75).toInt + 1))
    var i = 0
    while (i < n) { parent.put(in.readLong(), in.readLong()); i += 1 }
  }

  def find(x: Long): Long = {
    var r = x
    var p = parent.get(r)
    while (p != null && p.longValue != r) { r = p.longValue; p = parent.get(r) }
    // path compression: point every node on the walk straight at the
    // root (value updates of existing keys — never a structural map
    // change, so callers may iterate keys while finding)
    var c = x
    while (c != r) { val n = parent.get(c).longValue; parent.put(c, r); c = n }
    r
  }

  def union(a: Long, b: Long): Unit = {
    val ra = find(a); val rb = find(b)
    if (ra < rb) parent.put(rb, ra)
    else if (rb < ra) parent.put(ra, rb)
  }
}

/** Per-cell star reduction of a duplicate-pair edge set: aggregate the
  * above-threshold pairs of ONE cell into their exact connected
  * components (union-find) and emit one star edge per non-root member
  * — `(component-min, member)` — instead of the C(g,2) pairs a dup
  * group g emits raw. The star has IDENTICAL transitive closure to
  * the full in-cell edge set over the same vertex set, so any global
  * CC over the union of per-cell stars equals CC over the union of
  * the per-cell pair sets — the proof is per-cell graph replacement
  * under equal connectivity, not a property of the corpus.
  *
  * Deliberately NOT the "each member → its min-id above-threshold
  * neighbor" shortcut: that one is lossy. Counterexample (ids as
  * vertices): edges {1–10, 2–11, 10–11} are one component, but
  * minNbr(10)=1, minNbr(11)=2, minNbr(1)=10, minNbr(2)=11 keeps only
  * {1–10, 2–11} and splits it — per-vertex min-edges can drop the one
  * bridge between two low-id-anchored halves. Exactness here needs a
  * reducer that can UNION, which is what this Aggregator is.
  *
  * Scale shape: a TypedImperativeAggregate, so Spark runs it with
  * partial aggregation — each map task folds its local slice of a
  * cell's pairs into a DSU whose state is O(distinct members), and
  * only those star-shaped buffers cross the wire, 16 bytes per node
  * ([[Dsu]]'s flat custom serialization). A dup-saturated cell (the
  * CommonCrawl boilerplate case: 10^5 near-identical vectors in one
  * cell) emits g−1 edges downstream where the raw form emitted
  * ~5·10^9 — and since round 14's exact-dup pre-collapse, identical
  * copies never reach this aggregator at all (one representative per
  * distinct vector). The buffer bound: per map task it holds only
  * nodes seen in THAT task's slice of the pair stream, itself bounded
  * by the partition's edge count — a ~128 MB pair partition tops out
  * around ~8M edge endpoints ≈ 128 MB flat worst-case, in practice
  * node-bound far below it. A locallyContracted-style pass-through
  * cap does NOT transfer here: an Aggregator's reduce cannot emit
  * rows, so "pass-through" would mean buffering overflow EDGES — an
  * edge-bound buffer, strictly worse than the node-bound DSU it would
  * protect.
  *
  * `merge` replays the smaller buffer's (node → parent) links as
  * unions — each link was derived from real input edges, so replaying
  * them reproduces exactly that buffer's connectivity. `finish` sorts
  * the stars so the staged parquet is byte-stable under any partition
  * order (DeterminismSpec's discipline).
  */
object CellStarReduce extends Aggregator[(Long, Long), Dsu, Seq[(Long, Long)]] {
  override def zero: Dsu = new Dsu

  override def reduce(b: Dsu, e: (Long, Long)): Dsu = {
    b.union(e._1, e._2); b
  }

  override def merge(a: Dsu, b: Dsu): Dsu = {
    val it = b.parent.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      a.union(e.getKey.longValue, e.getValue.longValue)
    }
    a
  }

  override def finish(b: Dsu): Seq[(Long, Long)] = {
    val keys = b.parent.keySet().toArray(new Array[java.lang.Long](0))
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](keys.length)
    keys.foreach { k =>
      val r = b.find(k.longValue)
      if (r != k.longValue) out += ((r, k.longValue))
    }
    out.sortInPlace().toSeq
  }

  // the java-serialization envelope carries Dsu's flat custom form
  // (16 bytes/node), not a boxed HashMap graph — see Dsu's scaladoc
  override def bufferEncoder: Encoder[Dsu] = Encoders.javaSerialization[Dsu]
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}
