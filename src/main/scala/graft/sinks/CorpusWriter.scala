package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus publication — the pipeline's OUTPUT stage: land a curated /
  * packed training corpus as a partitioned, shard-size-bounded dataset a
  * downstream trainer (or the next pipeline stage) consumes directly.
  *
  * Layout contract:
  *  - Hive-style directory partitioning on low-cardinality routing columns
  *    (lang, split, source tier) — readers prune whole directories, and a
  *    `WHERE split = 'train'` never touches val/test bytes.
  *  - `sortWithinPartitions` on the caller's locality key (doc_id, pack
  *    bin) — consumers that read shard-sequentially see ordered rows, and
  *    min/max column statistics in the parquet footers stay tight, so
  *    range predicates prune row groups, not just directories.
  *  - `maxRecordsPerFile` bounds shard size: one skewed partition value
  *    (the "en" directory IS most of a web corpus) still lands as many
  *    bounded files, not one giant shard — the file count scales with the
  *    partition's row count, and a trainer's data loader can schedule
  *    uniform work units.
  *
  * A repartition on the partition columns BEFORE the write would put each
  * directory's rows in one task (one writer per directory, fewer files) —
  * deliberately NOT done here: that is exactly the giant-partition
  * serialization this codebase avoids everywhere else, and maxRecordsPerFile
  * already bounds the file inventory. With the natural task parallelism,
  * each task writes one file per partition value it holds; callers that
  * want fewer files per directory pre-bucket by a salted key instead.
  */
object CorpusWriter {

  /** Write `df` under `path` partitioned by `partitionCols`, rows sorted
    * within each task by `sortCols`, at most `maxRecordsPerFile` rows per
    * shard file. Formats: parquet (default) or orc — the columnar formats
    * with pushdown; json for wire-format interchange. */
  def publish(df: DataFrame, path: String, partitionCols: Seq[String],
              sortCols: Seq[Column], maxRecordsPerFile: Long = 1000000L,
              format: String = "parquet"): Unit = {
    require(Seq("parquet", "orc", "json").contains(format),
      s"unsupported corpus format: $format")
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    val missing = partitionCols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"partition columns absent from frame: $missing")
    df.sortWithinPartitions(partitionCols.map(col) ++ sortCols: _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .format(format)
      .save(path)
  }
}
