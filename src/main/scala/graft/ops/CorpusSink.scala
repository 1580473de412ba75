package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Output-layout control for a prepared corpus — the write side of the
  * pipeline, where 100 TB jobs are most often lost: an unmanaged
  * `df.write.parquet` produces one unsorted file per shuffle partition
  * in one flat directory, so every downstream reader scans everything.
  *
  * This sink lays the corpus out for its readers:
  *   - `partitionBy(partCol)` → directory-level partition PRUNING: a
  *     reader filtering on the partition column never opens the other
  *     directories (asserted on the plan in CorpusSinkSpec);
  *   - `repartition(partCol)` first → each partition value is written
  *     by as few tasks as hold it, not one near-empty file per value
  *     per task (the small-files explosion: tasks × values files);
  *   - `sortWithinPartitions(sortCol)` → parquet row-group min/max
  *     stats become range-prunable for point/range reads on the sort
  *     key;
  *   - `maxRecordsPerFile` → bounds the largest file so a skewed
  *     partition value splits instead of producing one giant file.
  */
object CorpusSink {
  def writePartitioned(df: DataFrame, path: String,
      partCol: String = "lang", sortCol: String = "doc_id",
      maxRecordsPerFile: Long = 100000L): Unit =
    df.repartition(col(partCol))
      .sortWithinPartitions(col(partCol), col(sortCol))
      .write
      .partitionBy(partCol)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode(SaveMode.Overwrite)
      .parquet(path)

  /** Morton (Z-order) interleave of two small bucket ids: bit i of
    * `b1` lands at output bit 2i+1, bit i of `b2` at bit 2i, so a
    * range sort on the key clusters BOTH dimensions at once — the
    * multi-dimensional answer to [[writePartitioned]]'s one partition
    * column + one sort column. Pure long arithmetic (shift/mask/add
    * over disjoint bit positions), so it stays inside whole-stage
    * codegen and has an exact DuckDB twin (q162's oracle spells the
    * identical terms). `bits` bounds each input to [0, 2^bits).
    */
  def zorderKey(b1: Column, b2: Column, bits: Int = 8): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(b1, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(b2, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)

  /** Write `df` clustered by a Z-order key: range-repartition on the
    * key (each output file owns one contiguous key range) and sort
    * within, so parquet row-group min/max stats prune on EITHER of the
    * interleaved dimensions — a filter on one dimension touches only
    * the files whose z-range intersects its bit pattern, never the
    * whole corpus. At 100 TB this is the layout lever for a corpus
    * read by both language-sliced and length-sliced consumers;
    * ZorderSpec measures the locality on a planted grid (a one-lang
    * scan touches a strict subset of files) and pins the round-trip.
    */
  def writeZOrdered(df: DataFrame, path: String, zkey: Column,
      files: Int = 64): Unit =
    df.withColumn("zkey", zkey)
      .repartitionByRange(files, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .write.mode(SaveMode.Overwrite).parquet(path)
}
