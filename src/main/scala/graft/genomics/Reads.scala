package graft.genomics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A position-aligned sequencing read — the engine's vertex record.
  *
  * Mirrors the reference's `read_data` struct
  * (/root/reference/assembly_final.cpp:9-28): `length` in bases,
  * `content` over the alphabet {A,C,G,T,N} (`N` = unknown), `offset` =
  * alignment start on the reference genome, `score` = match quality in
  * (0,1]. `end` is the exclusive end (assembly_final.cpp:100); the stitch
  * algebra itself works on inclusive ends `offset+length-1`
  * (assembly_final.cpp:473 etc.) — see [[Intervals]].
  */
case class Read(
    id: Long,
    length: Int,
    content: String,
    offset: Int,
    score: Double)

/** One directed overlap edge `src → dst` ("dst is a candidate successor
  * of src"). The reference's graph is edge-unattributed
  * (/root/reference/assembly_final.cpp:37).
  */
case class OverlapEdge(src: Long, dst: Long)

/** Single home for the reference's two end conventions so off-by-ones
  * live in one audited place (SURVEY.md §7.3).
  */
object Intervals {
  import org.apache.spark.sql.Column

  /** Exclusive end, `offset + length` (assembly_final.cpp:100). */
  def endExclusive(offset: Column, length: Column): Column = offset + length

  /** Inclusive end, `offset + length - 1` — the convention the merge
    * case analysis uses throughout (assembly_final.cpp:473,:489,:520,:558).
    */
  def endInclusive(offset: Column, length: Column): Column = offset + length - 1

  /** Gap width between the current span and a disjoint-right child:
    * `offset_n - cur_offset - cur_length` (assembly_final.cpp:574).
    */
  def gapRight(curOffset: Column, curLength: Column, nextOffset: Column): Column =
    nextOffset - curOffset - curLength
}

/** Loaders/savers for the reference's aligned-reads graph text format.
  *
  * Format (/root/reference/assembly_final.cpp:41, parser :84-123): one
  * read per line, whitespace separated —
  * `id length content offset score succ_id*` with 0..n trailing
  * successor ids and tolerated trailing whitespace.
  */
object Reads {

  val vertexSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("length", IntegerType, nullable = false),
    StructField("content", StringType, nullable = false),
    StructField("offset", IntegerType, nullable = false),
    StructField("score", DoubleType, nullable = false)))

  val edgeSchema: StructType = StructType(Seq(
    StructField("src", LongType, nullable = false),
    StructField("dst", LongType, nullable = false)))

  /** Distributed scan of the GraphLab text format → (vertices, edges).
    *
    * Replaces the reference's serial driver-side loop
    * (/root/reference/assembly_final.cpp:73-145) with a parallel text
    * scan: each line is split once; the fixed head becomes the vertex
    * row and the variable-length tail explodes into the edge list.
    */
  def loadGraphTsv(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    // split on whitespace runs, dropping the empty tokens that leading /
    // trailing tabs produce (the reference tolerates trailing tabs,
    // assembly_final.cpp:119-120); try_cast + null-filter skips whole
    // malformed lines (deviation: the reference's strm.fail() break would
    // keep a half-parsed record)
    val toks = filter(split(col("value"), "\\s+"), t => t =!= lit(""))
    val parsed = spark.read.text(path)
      .select(toks.as("t"))
      .select(
        expr("try_cast(get(t, 0) AS BIGINT)").as("id"),
        expr("try_cast(get(t, 1) AS INT)").as("length"),
        expr("get(t, 2)").as("content"),
        expr("try_cast(get(t, 3) AS INT)").as("offset"),
        expr("try_cast(get(t, 4) AS DOUBLE)").as("score"),
        when(size(col("t")) > 5, slice(col("t"), lit(6), size(col("t")) - 5))
          .otherwise(array().cast(ArrayType(StringType))).as("succ"))
      .where(col("id").isNotNull && col("length").isNotNull &&
        col("content").isNotNull && col("offset").isNotNull &&
        col("score").isNotNull)

    val vertices = parsed.drop("succ")
    val edges = parsed
      .select(col("id").as("src"), explode(col("succ")).as("d"))
      .select(col("src"), expr("try_cast(d AS BIGINT)").as("dst"))
      .where(col("dst").isNotNull)
    (vertices, edges)
  }

  /** Vertex sink matching `best_path_writer`
    * (/root/reference/assembly_final.cpp:631-645): per-vertex projection
    * `(id, next_id, offset, length, content_size, content)`.
    */
  def bestPathProjection(vertices: DataFrame): DataFrame =
    vertices.select(
      col("id"), col("next_id"), col("offset"), col("length"),
      length(col("content")).as("content_size"), col("content"))

  /** Edge sink matching the v1/v2 `save_edge`
    * (/root/reference/assembly_1.cpp:377-381, assembly_2.cpp:332-336):
    * one `(src\tdst)` line per edge. The final reference defines but
    * disables this sink (assembly_final.cpp:743), so the CLI keeps it
    * behind `--save-edges`, default off.
    */
  def edgeProjection(edges: DataFrame): DataFrame =
    edges.select(
      concat(lit("("), col("src"), lit("\t"), col("dst"), lit(")")).as("value"))

  /** Parse the [[edgeProjection]] text format back into (src, dst) —
    * the sink's round-trip inverse, used by the loader robustness spec.
    */
  def parseEdgeLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(regexp_extract(col("value"), "^\\((\\d+)\\t(\\d+)\\)$", 1)
        .cast(LongType).as("src"),
        regexp_extract(col("value"), "^\\((\\d+)\\t(\\d+)\\)$", 2)
          .cast(LongType).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
}
