package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min Sketch over keyed counts (Cormode & Muthukrishnan 2005) —
  * the mergeable fixed-size frequency summary a 100 TB pipeline ships
  * between stages instead of a vocabulary-sized count table.
  *
  * Built FROM an already-aggregated (key, cnt) frame, not raw occurrences:
  * the exact per-key aggregate is map-side combined by Spark anyway, and
  * summing counts into depth×width counters afterwards touches vocab-size
  * rows once instead of corpus-size rows depth times. The sketch itself is
  * tiny (depth×width rows ≤ a few thousand) — it broadcasts to every probe
  * and merges across shards by plain `groupBy(seed, bucket).sum` (the CMS
  * merge IS counter addition, which is why it pipelines).
  *
  * Hashing is the engine's portable md5 idiom ([[Draws.md5Draw]] seeded per
  * row of the sketch): bucket(seed, key) = first-8-hex of md5("seed:key")
  * mod width. Integer-only and engine-neutral, so a DuckDB oracle rebuilds
  * the identical sketch and the estimates compare EXACTLY — the estimate’s
  * defining guarantee (exact ≤ est ≤ exact + ε·N with prob 1−δ) is
  * therefore itself oracle-checkable, q116-style.
  */
object Sketches {

  /** Portable bucket hash: md5("seed:key") first 8 hex → long, mod width.
    * Same shape as [[Draws.md5Draw]] with the seed prefixed into the key so
    * the depth rows are pairwise-independent in practice. */
  def cmsBucket(key: Column, seed: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"$seed:"), key.cast("string"))), 1, 8),
      16, 10).cast("long") % width

  /** The sketch table: (seed, bucket, total) from an exact (key, cnt)
    * frame. ≤ depth×width rows; each input row contributes to `depth`
    * counters via a small explode — vocab×depth intermediate rows, combined
    * map-side by the (seed, bucket) hash aggregate. */
  def cmsTable(counts: DataFrame, keyCol: String, cntCol: String,
               depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"degenerate CMS $depth x $width")
    val rows = counts.select(
      posexplode(array((0 until depth).map(s =>
        cmsBucket(col(keyCol), s, width)): _*)).as(Seq("seed", "bucket")),
      col(cntCol).as("__c"))
    rows.groupBy(col("seed"), col("bucket"))
      .agg(sum(col("__c")).as("total"))
  }

  /** Point estimates for `probes(keyCol)`: min over the depth counters each
    * key hashes into. The sketch side is broadcast (≤ depth×width rows);
    * the probe side explodes ×depth then re-groups by key — both shuffles
    * are keyed by the probe key, never by anything corpus-sized.
    *
    * A probe key absent from the corpus can hash into buckets no corpus key
    * touched; those counter cells simply don't exist in the sketch table.
    * The CMS estimate is min over ALL depth cells, and an untouched cell is
    * an implicit 0 — so any probe matching fewer than `depth` present cells
    * estimates 0 (the same `count == depth` guard
    * [[graft.streaming.StreamSketch.windowedEstimates]] applies). Without
    * the guard, min-over-present-only silently inflates absent probes.
    *
    * Probes are deduplicated up front: the cell-count guard counts joined
    * rows per key, so a key appearing twice in `probes` would join
    * 2×depth cells and trip the `=== depth` check into a spurious 0. One
    * estimate per distinct key is also the only sensible contract. */
  def cmsEstimate(cms: DataFrame, probes: DataFrame, keyCol: String,
                  depth: Int, width: Int): DataFrame = {
    val pb = probes.select(col(keyCol)).distinct().select(col(keyCol),
      posexplode(array((0 until depth).map(s =>
        cmsBucket(col(keyCol), s, width)): _*)).as(Seq("seed", "bucket")))
    pb.join(broadcast(cms), Seq("seed", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(col("total")).as("__minPresent"),
        count(col("total")).as("__cells"))
      .select(col(keyCol),
        when(col("__cells") === depth, col("__minPresent")).otherwise(lit(0L))
          .as("est"))
  }
}
