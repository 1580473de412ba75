package graft

import graft.ops.Similarity

/** Measured evidence for the two-level quantizer's scale claim
  * (SCALING.md round-7): flat adaptive-k training costs ~k·n per Lloyd
  * round because k grows with the corpus AND k is the width of the
  * literal-expression argmax every row evaluates; the hierarchy can
  * FIX k1 (bounding expression width) and grow capacity through k2,
  * whose per-round cost is a broadcast-join over a centroid TABLE —
  * corpus-linear, k2-independent work per row up to the join fan-out.
  *
  * Usage: `sbt 'runMain graft.HierBench [factor]'` (default 30×,
  * perturbed replica reused from ScaleProbe). Compares, at EQUAL cell
  * capacity (flat k = k1·k2):
  *   - flat:  trainCodebookOn at k = 30 (what adaptiveCellCount picks
  *     at this corpus size)
  *   - hier:  trainHier at k1 = 10 fixed, k2 = 3
  * Prints one line per arm; numbers land in SCALING.md.
  */
object HierBench {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(30)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val perturb = sys.env.get("SPARK_GRAFT_PERTURB").map(_.toInt)
    val spark = ScaleProbe.session(cpus)
    val replica = ScaleProbe.ensureReplica(spark, src, factor, perturb,
      cpus.toInt)
    val n = spark.read.parquet(s"$replica/embeddings.parquet").count()
    val kFlat = Similarity.adaptiveCellCount(n)
    println(s"HIERBENCH n=$n flat_k=$kFlat hier=(k1=10, k2=3)")

    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"HIERBENCH $label%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.catalog.clearCache()
      System.gc()
    }
    // warm: parquet footers + codegen of the scaled-vector scan
    spark.read.parquet(s"$replica/embeddings.parquet").limit(1).collect()

    if (kFlat != 30)
      println(s"HIERBENCH WARNING capacity differs: flat k=$kFlat vs hier 30" +
        " — equal-capacity comparison only holds at factor 30")
    time("flat_train") {
      Similarity.trainCodebook(spark, replica, kFlat)._2.count()
    }
    // iters = 5 matches the flat arm's level-2 round count, so the
    // comparison isolates expression-width k, not round count
    time("hier_train") {
      Similarity.trainHier(spark, replica, k1 = 10, k2 = 3, iters = 5)
        ._3.count()
    }
    spark.stop()
  }
}
