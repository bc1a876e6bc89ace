package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Set operations + the upsert (MERGE/ON CONFLICT) semantics
  * (reference §2.8 U1–U3, §2.2 K4–K7).
  */
object SetOps {

  /** U1 (`binance_analysis.py:99-145`): union of per-source frames aligned
    * by column NAME (pandas concat semantics), tolerating missing columns. */
  def unionAligned(frames: Seq[DataFrame]): DataFrame =
    frames.reduce(_.unionByName(_, allowMissingColumns = true))

  /** K4–K7 (`src/etl/load_postgres.py:63-103`, `load_all.py:20-34`):
    * idempotent last-write-wins upsert — `INSERT … ON CONFLICT (keys) DO
    * UPDATE` re-expressed relationally: tag base with recency 0 and updates
    * with recency 1, union, keep rank-1 row per key by (recency desc,
    * tiebreak). Re-running with the same updates is a no-op ⇒ idempotent.
    *
    * Scale: one shuffle on the key columns. For a parquet-table sink wrap
    * this in partition-overwrite (dynamic partitionOverwriteMode) so only
    * partitions containing updated keys rewrite.
    */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val tagged = base.withColumn("__recency", lit(0))
      .unionByName(updates.withColumn("__recency", lit(1)), allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__recency").desc)
    tagged.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__recency", "__rn")
  }
}
