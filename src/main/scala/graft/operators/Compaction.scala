package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the maintenance operator every long-running
  * ingest pipeline needs: streaming micro-batches and per-file ETL loads
  * accumulate thousands of KB-sized parquet files, and at 100 TB the
  * resulting task-per-file scheduling and footer overhead dominate scans.
  *
  * Sizing comes from the source's actual on-disk footprint (filesystem
  * listing, no data read): output files target `targetBytes` each. When
  * shrinking the file count, `coalesce` merges partitions WITHOUT a
  * shuffle (each output task reads several input files sequentially);
  * only growing the count — a rare resplit — pays a round-robin shuffle.
  */
object Compaction {

  /** Total byte size under `dir` (recursive, driver-side listing only). */
  def dirBytes(spark: SparkSession, dir: String): Long = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.getContentSummary(path).getLength
  }

  /** Rewrites the parquet dir `src` into `dst` with ~`targetBytes` files.
    * Returns the TARGET file count (empty partitions write no file, so the
    * on-disk count can be lower). */
  def compact(spark: SparkSession, src: String, dst: String,
              targetBytes: Long): Int = {
    val n = math.max(1L, (dirBytes(spark, src) + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(src)
    val resized =
      if (n <= df.rdd.getNumPartitions) df.coalesce(n) else df.repartition(n)
    resized.write.mode("overwrite").parquet(dst)
    n
  }
}
