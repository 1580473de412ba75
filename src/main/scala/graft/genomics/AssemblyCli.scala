package graft.genomics

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** CLI equivalent of the reference binary
  * (`./assembly --infile=… --outfile=… --source=N --destination=M`,
  * /root/reference/README:10, option parse assembly_final.cpp:663-679):
  * load the aligned-reads graph, assemble the contig reachable from
  * `source`, and save the per-vertex best-path projection
  * (assembly_final.cpp:631-645) plus the assembled contig.
  *
  * Engine routing (`--engine=auto|local|spark`, default auto): inputs
  * under 64 MB run on [[LocalAssembly]] with zero Spark jobs — the
  * reference is a native binary that finishes its sample in
  * milliseconds, and JVM+cluster startup would lose that comparison
  * for no benefit. Bigger inputs take the distributed path.
  */
object AssemblyCli {
  private val LocalThresholdBytes = 64L << 20

  def main(args: Array[String]): Unit = {
    val opts = args.flatMap { a =>
      a.stripPrefix("--").split("=", 2) match {
        case Array(k, v) => Some(k -> v)
        case Array(k)    => Some(k -> "true") // bare flag, e.g. --save-edges
        case _           => None
      }
    }.toMap
    val infile = opts.getOrElse("infile", sys.error("--infile=<path> required"))
    val outfile = opts.getOrElse("outfile", sys.error("--outfile=<path> required"))
    // --source/--destination are OPTIONAL since round 17 — the
    // reference's own TODO (assembly_final.cpp:670 "should not be
    // inputed by user in the future"): an omitted source defaults to
    // the chain HEAD of the best-path graph (the unique read with a
    // best successor that no other read's best-successor pointer
    // targets — in-degree 0 on the next_id graph), an omitted
    // destination to that chain's END. Ambiguity (0 or 2+ heads —
    // disjoint contigs, or a single-read graph) is an error BY NAME
    // listing the candidates, never a silent guess.
    val sourceOpt = opts.get("source").map(_.toLong)
    val destOpt = opts.get("destination").map(_.toLong)
    val engine = opts.getOrElse("engine", "auto")
    // S4 edge sink: defined in v1/v2, disabled by the final reference
    // (assembly_final.cpp:743) — so opt-in, default off
    val saveEdges = opts.get("save-edges").contains("true")
    // sink compression, mirroring the reference's `graph.save(..,
    // gzip, ..)` flag (assembly_final.cpp:741 — the reference ships it
    // off, so default none): gzip/lz4 ride Spark's text/csv
    // `compression` option (zstd is not among Spark's text-sink
    // codecs — gzip/bzip2/deflate/lz4/snappy — so it is not offered
    // rather than silently remapped); the local engine supports gzip
    // via the JDK (lz4 has no JDK codec — it routes to Spark)
    val codec = opts.getOrElse("codec", "none")
    require(Set("none", "gzip", "lz4")(codec),
      s"--codec must be none|gzip|lz4, got $codec")

    val useLocal = engine match {
      case "local" => true
      case "spark" => false
      case _       => Files.size(Paths.get(infile)) < LocalThresholdBytes
    }
    if (useLocal && codec != "lz4")
      runLocal(infile, outfile, sourceOpt, destOpt, saveEdges, codec)
    else runSpark(infile, outfile, sourceOpt, destOpt, saveEdges, codec)
  }

  /** Spark-path source/destination defaulting over a best-successor
    * frame — factored for GoldenAssemblySpec (head election, chain-end
    * pointer doubling, the ambiguity error).
    */
  private[genomics] def autoSourceDest(nextOnly: org.apache.spark.sql.DataFrame,
      sourceOpt: Option[Long], destOpt: Option[Long]): (Long, Long) = {
    val source = sourceOpt.getOrElse {
      val heads = nextOnly.where(col("next_id") =!= -1L)
        .join(nextOnly.select(col("next_id").as("hid"))
            .where(col("hid") =!= -1L),
          col("id") === col("hid"), "left_anti")
        .select(col("id")).collect().map(_.getLong(0)).toSeq.sorted
      if (heads.size != 1) sys.error(headError(heads))
      heads.head
    }
    val dest = destOpt.getOrElse {
      // chain end by pointer doubling (Assembly.pathWithHops — the
      // O(log path) derivation, no driver-side corpus walk): the
      // chain member at maximum hop from the source
      Assembly.pathWithHops(nextOnly, source)
        .orderBy(col("hop").desc, col("id"))
        .select(col("id")).first().getLong(0)
    }
    (source, dest)
  }

  /** Local-engine twin of [[autoSourceDest]] over the parsed vectors —
    * same election, plain Scala.
    */
  private[genomics] def autoSourceDestLocal(
      vertices: Vector[LocalAssembly.V], edges: Vector[(Long, Long)],
      sourceOpt: Option[Long], destOpt: Option[Long]): (Long, Long) = {
    val next0 = LocalAssembly.phases12(vertices, edges, -1L)
    val source = sourceOpt.getOrElse {
      val pointed = next0.values.map(_._2).filter(_ != -1L).toSet
      val heads = vertices.map(_.id)
        .filter(id => next0(id)._2 != -1L && !pointed(id)).sorted
      if (heads.size != 1) sys.error(headError(heads))
      heads.head
    }
    val dest = destOpt.getOrElse {
      // chain end: follow next_id from source, cycle-guarded
      val seen = scala.collection.mutable.Set.empty[Long]
      var cur = source
      while (next0.contains(cur) && next0(cur)._2 != -1L &&
          !seen(next0(cur)._2)) {
        seen += cur
        cur = next0(cur)._2
      }
      cur
    }
    (source, dest)
  }

  /** Shared head-election error text, asserted by GoldenAssemblySpec. */
  private[genomics] def headError(heads: Seq[Long]): String =
    s"--source omitted and ${heads.size} chain heads found" +
      (if (heads.nonEmpty) heads.sorted.mkString(" (", ", ", ")")
       else "") +
      " - the best-path graph has no unique in-degree-0 read; pass" +
      " --source (and --destination) explicitly"

  private def runLocal(infile: String, outfile: String,
      sourceOpt: Option[Long], destOpt: Option[Long],
      saveEdges: Boolean = false, codec: String = "none"): Unit = {
    // single-file text write, gzip-compressed when asked — the local
    // twin of Spark's `compression` option (same .gz suffix, so either
    // engine's output reads back through spark.read/zcat unchanged)
    def writeText(path: String, body: String): Unit = {
      val p = Paths.get(if (codec == "gzip") s"$path.gz" else path)
      Files.createDirectories(p.getParent)
      if (codec == "gzip") {
        val out = new java.util.zip.GZIPOutputStream(
          Files.newOutputStream(p))
        try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
      } else Files.writeString(p, body)
    }
    val (vertices, edges) = LocalAssembly.parse(infile)
    // next_id is destination-independent (phases12's argmax reads only
    // edges + scores), so the derivation can run before dest is known
    val (source, dest) =
      autoSourceDestLocal(vertices, edges, sourceOpt, destOpt)
    if (saveEdges) {
      writeText(s"$outfile.edges/part-00000",
        edges.map { case (s, d) => s"($s\t$d)" }.mkString("", "\n", "\n"))
    }
    val phases = LocalAssembly.phases12(vertices, edges, dest)
    // per-vertex projection, the reference's vertex sink (single file —
    // the text twin of the Spark path's .vertices directory)
    val rows = vertices.sortBy(_.id).map { v =>
      val next = phases(v.id)._2
      s"${v.id}\t$next\t${v.offset}\t${v.length}\t${v.content.length}\t${v.content}"
    }
    writeText(s"$outfile.vertices/part-00000",
      rows.mkString("", "\n", "\n"))
    val span = LocalAssembly.assembleFrom(vertices, edges, source, dest)
      .getOrElse(sys.error(s"source read $source not present in $infile — nothing to assemble"))
    writeText(s"$outfile.contig/part-00000.txt", span.content + "\n")
    println(s"assembled contig: offset=${span.offset} length=${span.length}")
  }

  private def runSpark(infile: String, outfile: String,
      sourceOpt: Option[Long], destOpt: Option[Long],
      saveEdges: Boolean = false, codec: String = "none"): Unit = {
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
    // best successor first (destination-independent — the argmax reads
    // only edges + scores), so source/destination can default from it;
    // the valid tag joins on afterwards (tag-only prune — the
    // reference never filters on `valid`, assembly_final.cpp:175)
    val nextOnly = Assembly.bestSuccessor(vertices, edges)
    val (source, dest) = autoSourceDest(nextOnly, sourceOpt, destOpt)
    val withNext = Assembly.withValidFlag(nextOnly, edges, dest)

    // per-vertex projection, the reference's vertex sink; gzip/zstd
    // land as Hadoop-codec'd part files that spark.read auto-detects
    def comp[T](w: org.apache.spark.sql.DataFrameWriter[T]) =
      if (codec == "none") w else w.option("compression", codec)
    comp(Reads.bestPathProjection(withNext)
        .write.mode("overwrite").option("sep", "\t"))
      .csv(s"$outfile.vertices")

    if (saveEdges) {
      comp(Reads.edgeProjection(edges).write.mode("overwrite"))
        .text(s"$outfile.edges")
    }

    // collect the single contig row once; write + report from the same copy
    val rows = Assembly.assembleFrom(vertices, edges, source).collect()
    val row = rows.headOption
      .filter(!_.isNullAt(0))
      .getOrElse(sys.error(s"source read $source not present in $infile — nothing to assemble"))
    import spark.implicits._
    comp(Seq(row.getString(2)).toDF("contig")
      .write.mode("overwrite")).text(s"$outfile.contig")
    println(s"assembled contig: offset=${row.getInt(0)} length=${row.getInt(1)}")
    spark.stop()
  }
}
