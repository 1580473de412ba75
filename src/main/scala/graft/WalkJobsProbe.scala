package graft

import org.apache.spark.scheduler._

/** Diagnostic main: run catalog entries WARM (staging paid by a first
  * untimed run) and report deterministic scheduler counts — jobs,
  * stages, tasks — plus wall time. The wall numbers at sf scale are
  * noise-bound (±1 s between identical runs); the counts are not,
  * which is what makes round-over-round claims about "fewer eager jobs
  * per walk round" checkable. Run as
  * `sbt 'runMain graft.WalkJobsProbe [sfDir] [q1,q2,...]'`.
  */
object WalkJobsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("q189_graph_walk")
    val spark = ScaleProbe.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val stages = new java.util.concurrent.atomic.AtomicInteger()
    val tasks = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(st: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(st.stageInfo.numTasks)
      }
    })
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, dir).count() // staging + JIT warmup, untimed
      spark.catalog.clearCache(); System.gc(); Thread.sleep(300)
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener drain
      println(f"PROBE $n%-28s jobs=${jobs.get}%4d stages=${stages.get}%4d " +
        f"tasks=${tasks.get}%6d wall=$dt%6.2f")
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
