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

  /** Corpus snapshot diff — the audit step between two pipeline runs: each
    * id is classified `added` (new only), `removed` (old only), `changed`
    * (both, content differs) or `unchanged`.
    *
    * Content equality travels as a (xxhash64, 32-bit hash) signature pair —
    * the full-outer join shuffles (id, 12-byte sig) rows, never the
    * document text, so the diff of two 100 TB snapshots moves only ids and
    * hashes. A `changed` doc is misread as `unchanged` only if BOTH hashes
    * collide (~2⁻⁹⁶ per changed id). Contract: `idCol` is unique per
    * snapshot (a duplicated id would multiply through the join) and
    * non-null (null ids never match a join key, so each such row would
    * surface as a spurious added+removed pair).
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                   contentCols: Seq[String]): DataFrame = {
    def keyed(df: DataFrame, sig: String) = {
      val ks = contentCols.map(col)
      df.select(col(idCol).as("id"),
        struct(xxhash64(ks: _*), hash(ks: _*)).as(sig))
    }
    keyed(oldDf, "__osig").join(keyed(newDf, "__nsig"), Seq("id"), "full_outer")
      .select(col("id"),
        when(col("__osig").isNull, lit("added"))
          .when(col("__nsig").isNull, lit("removed"))
          .when(col("__osig") === col("__nsig"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }
}
