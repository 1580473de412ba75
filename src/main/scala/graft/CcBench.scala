package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Head-to-head benchmark of the two connected-components algorithms on
  * a scale-probe pair graph: min-label propagation (rounds = component
  * diameter) vs large/small-star contraction (rounds = O(log n),
  * diameter-independent). The pair graph is STAGED once (the q31
  * derivation is the expensive part and identical for both), then each
  * algorithm runs over the same parquet; rounds + seconds land in
  * SCALING.md and the label tables are asserted identical (both elect
  * the component minimum).
  *
  *   sbt 'runMain graft.CcBench <factor>'   # default 30
  *
  * Honors SPARK_GRAFT_PERTURB like ScaleProbe (perturbed replicas keep
  * the dup rate constant; byte-identical replicas are dup-heavy).
  */
object CcBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = ScaleProbe.session(cpus)

    // `chain <depth> <nChains>` mode: a synthetic deep-path graph — the
    // structural worst case for min-label (rounds = DIAMETER, the shape
    // templated near-dup chains produce at 100 TB) and the case star's
    // O(log n) rounds exist for. Deterministic, no staging needed.
    val pairs = if (args.headOption.contains("chain")) {
      val depth = args.lift(1).map(_.toInt).getOrElse(64)
      val chains = args.lift(2).map(_.toInt).getOrElse(1000)
      println(s"CCBENCH synthetic chains   depth=$depth chains=$chains")
      spark.range(chains.toLong * depth)
        .selectExpr(s"(id div $depth) * ${10L * depth} + (id % $depth) as doc_a",
          s"(id div $depth) * ${10L * depth} + (id % $depth) + 1 as doc_b")
        .localCheckpoint()
    } else {
      val factor = args.headOption.map(_.toInt).getOrElse(30)
      val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
      val perturb = sys.env.get("SPARK_GRAFT_PERTURB").map(_.toInt)
      val replica = ScaleProbe.ensureReplica(spark, src, factor, perturb, cpus.toInt)
      val tag = perturb.map(d => s"x${factor}p$d").getOrElse(s"x$factor")
      val work = s"${sys.props("java.io.tmpdir")}/graft_ccbench/$tag"
      if (!new java.io.File(s"$work/pairs").exists()) {
        val t0 = System.nanoTime()
        Dedup.stagePairs(spark, replica, work)
        println(f"CCBENCH stage_pairs        ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
      spark.read.parquet(graft.ops.Staged.path(work, "pairs"))
    }
    val nEdges = pairs.count()
    val nNodes = pairs.select(explode(array(col("doc_a"), col("doc_b")))
      .as("n")).distinct().count()
    println(f"CCBENCH graph              edges=$nEdges nodes=$nNodes")

    def time(f: => org.apache.spark.sql.DataFrame): (Double, Long, org.apache.spark.sql.DataFrame) = {
      val t0 = System.nanoTime()
      val df = f
      val n = df.count()
      ((System.nanoTime() - t0) / 1e9, n, df)
    }
    // generous caps: the point is to MEASURE rounds, not to throw
    val (tMin, nMin, dfMin) = time(Dedup.connectedComponents(pairs, maxIters = 100))
    val rMin = Dedup.lastMinLabelRounds
    println(f"CCBENCH min_label          $tMin%8.2f s  rounds=$rMin labels=$nMin")
    val (tStar, nStar, dfStar) = time(Dedup.connectedComponentsStar(pairs))
    val rStar = Dedup.lastStarRounds
    println(f"CCBENCH star_contraction   $tStar%8.2f s  rounds=$rStar labels=$nStar")

    // both elect the component minimum: labelings must be identical
    val agree = nMin == nStar && dfMin.except(dfStar).limit(1).count() == 0
    println(s"CCBENCH agreement          $agree")
    val mode = args.mkString(" ")
    println(s"""{"metric":"ccbench","mode":"$mode","edges":$nEdges,"nodes":$nNodes,""" +
      s""""min_label":{"sec":$tMin,"rounds":$rMin},""" +
      s""""star":{"sec":$tStar,"rounds":$rStar},"agree":$agree}""")
    spark.stop()
    if (!agree) sys.exit(1)
  }
}
