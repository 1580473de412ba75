package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}
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
}
