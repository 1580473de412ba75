package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mega-cell selection probe — measures the two exact forms of
  * "keep each key's k(key) smallest rows" on the shape that breaks
  * window ranking: ONE key holding ~90% of the corpus with every
  * primary key TIED (byte-identical dup mass — selection decided
  * purely by the unique tiebreak), plus a spread of small keys.
  *
  *  - window form: `row_number` over (key) — Spark sorts the mega
  *    key's rows inside ONE partition (the skew exposure q164's
  *    scaladoc documents);
  *  - radix form: [[ops.Selection.headK]] — 8 partial-agg digit
  *    passes, windows bounded by the radix, fully parallel.
  *
  * Both must select the IDENTICAL set (asserted, not assumed).
  * Run: `sbt 'runMain graft.RadixProbe [nRows]'` (default 10M).
  */
object RadixProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = ScaleProbe.session(cpus)
    import spark.implicits._

    // 90% of rows in key 0 with ok1 all-tied; the rest across 1024
    // small keys with hashed ok1 — deterministic, no RNG
    val rows = spark.range(n)
      .select(
        when(pmod($"id", lit(10)) < 9, lit(0))
          .otherwise(pmod(xxhash64($"id"), lit(1024)).cast("int") + 1)
          .as("cluster"),
        when(pmod($"id", lit(10)) < 9, lit(0L))
          .otherwise(xxhash64($"id", lit(7))).as("ok1"),
        $"id".as("ok2"))
      .localCheckpoint()
    val ks = rows.groupBy($"cluster")
      .agg(floor(count(lit(1)) * 0.5).cast("long").as("kk"))
      .localCheckpoint()

    def timed[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[radixprobe] $what: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val windowHead = timed(s"window row_number over $n rows") {
      val w = Window.partitionBy($"cluster").orderBy($"ok1", $"ok2")
      val cw = Window.partitionBy($"cluster")
      rows.withColumn("rk", row_number().over(w))
        .withColumn("n_c", count(lit(1)).over(cw))
        .where($"rk" <= floor($"n_c" * 0.5))
        .select($"cluster", $"ok2")
        .localCheckpoint()
    }
    val radixHead = timed(s"Selection.headK over $n rows") {
      ops.Selection.headK(rows, ks).localCheckpoint()
    }
    val nw = windowHead.count(); val nr = radixHead.count()
    val diff = windowHead.union(radixHead)
      .groupBy($"cluster", $"ok2").count().where($"count" =!= 2).count()
    println(s"[radixprobe] window=$nw radix=$nr symmetric-diff=$diff")
    require(diff == 0 && nw == nr, "forms disagree")
    spark.stop()
  }
}
