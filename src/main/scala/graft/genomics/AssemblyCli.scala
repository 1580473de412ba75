package graft.genomics

import org.apache.spark.sql.SparkSession

/** CLI equivalent of the reference binary
  * (`./assembly --infile=… --outfile=… --source=N --destination=M`,
  * /root/reference/README:10, option parse assembly_final.cpp:663-679):
  * load the aligned-reads graph, assemble the contig reachable from
  * `source`, and save the per-vertex best-path projection
  * (assembly_final.cpp:631-645) plus the assembled contig.
  */
object AssemblyCli {
  def main(args: Array[String]): Unit = {
    val opts = args.flatMap { a =>
      a.stripPrefix("--").split("=", 2) match {
        case Array(k, v) => Some(k -> v)
        case _           => None
      }
    }.toMap
    val infile = opts.getOrElse("infile", sys.error("--infile=<path> required"))
    val outfile = opts.getOrElse("outfile", sys.error("--outfile=<path> required"))
    val source = opts.getOrElse("source", sys.error("--source=<id> required")).toLong
    val dest = opts.getOrElse("destination", sys.error("--destination=<id> required")).toLong

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-assembly")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (vertices, edges) = Reads.loadGraphTsv(spark, infile)
    // faithful tag-only prune (the reference never filters on `valid`,
    // assembly_final.cpp:175) ahead of the per-vertex sink
    val withNext = Assembly.bestSuccessor(
      Assembly.withValidFlag(vertices, edges, dest), edges)

    // per-vertex projection, the reference's vertex sink
    Reads.bestPathProjection(withNext)
      .write.mode("overwrite").option("sep", "\t").csv(s"$outfile.vertices")

    // collect the single contig row once; write + report from the same copy
    val rows = Assembly.assembleFrom(vertices, edges, source, dest).collect()
    val row = rows.headOption
      .filter(!_.isNullAt(0))
      .getOrElse(sys.error(s"source read $source not present in $infile — nothing to assemble"))
    import spark.implicits._
    Seq(row.getString(2)).toDF("contig")
      .write.mode("overwrite").text(s"$outfile.contig")
    println(s"assembled contig: offset=${row.getInt(0)} length=${row.getInt(1)}")
    spark.stop()
  }
}
