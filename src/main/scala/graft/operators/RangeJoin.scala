package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TimeOps

/** Banded (bucketed) batch range join.
  *
  * Spark plans a bare `a.ts BETWEEN b.ts - x AND b.ts` join as a
  * broadcast-nested-loop or sort-merge over the EQUALITY keys only, with the
  * range as a post-filter — at 100 TB the hot keys degrade to per-key
  * quadratic scans. Banding restores a pure hash equi-join: bucket time into
  * windows of width w = upper − lower; a right row lands in exactly one
  * bucket, a left row's query window spans at most two adjacent buckets, so
  * the left side explodes ×2 and the exact range predicate filters after
  * the join. Shuffle is keyed by (keys, bucket) — AQE's skew split applies
  * to it like any other hash join.
  */
object RangeJoin {

  /** Inner-join rows of `right` whose `rTimeCol` falls in
    * [`lTimeCol` + lowerSec, `lTimeCol` + upperSec) for matching `keyCols` —
    * or the closed interval [... , lTimeCol + upperSec] with
    * `inclusiveUpper` (a window of width w can still only span two adjacent
    * w-wide buckets, so the ×2 left explode stays sufficient).
    * Output: left columns + right's non-key columns. Each qualifying pair
    * appears exactly once (a right row is in one bucket; the two left
    * probes hit distinct buckets).
    */
  def banded(left: DataFrame, right: DataFrame, keyCols: Seq[String],
             lTimeCol: String, rTimeCol: String,
             lowerSec: Long, upperSec: Long,
             inclusiveUpper: Boolean = false): DataFrame = {
    require(upperSec > lowerSec,
      "range window must have positive width (for an exact-timestamp match, " +
        "use a plain equi-join on the timestamp instead of a point interval)")
    require(!left.columns.exists(_.startsWith("__r_")) &&
        !right.columns.exists(_.startsWith("__r_")),
      "column names starting with __r_ are reserved by the range join")
    require(!left.columns.contains("__bucket") &&
        !right.columns.contains("__bucket"),
      "column name __bucket is reserved by the range join (the left " +
        "withColumn would overwrite it; the renamed right one would collide)")
    val w = upperSec - lowerSec
    // Bucket arithmetic is internal to the join (the exact predicate decides
    // membership), so double division is fine: epoch/w magnitudes are far
    // below 2^53 and both sides use the identical expression.
    def bucket(epochSec: org.apache.spark.sql.Column) =
      floor(epochSec.cast("double") / w).cast("long")
    // TimeOps.epochSeconds, NOT .cast("long"): the bare cast is illegal on
    // TIMESTAMP_NTZ inputs (the round-7 q64/q68 regression).
    val lo = TimeOps.epochSeconds(col(lTimeCol)) + lowerSec
    val l = left.withColumn("__bucket",
      explode(array(bucket(lo), bucket(lo) + 1)))
    // The right side is renamed wholesale before the join: when both inputs
    // derive from one source (self-join — q64/q68 split the same events
    // scan), dataset-qualified references resolve only through the
    // analyzer's self-join disambiguation; explicit unique names make the
    // condition unambiguous by construction.
    def rn(c: String) = s"__r_$c"
    val r = right.select(right.columns.map(c => col(c).as(rn(c))): _*)
      .withColumn(rn("__bucket"), bucket(TimeOps.epochSeconds(col(rn(rTimeCol)))))
    // Exact predicate in epoch-µs space, not timestamp-interval space: µs
    // keeps full parquet precision, and epoch longs compare identically
    // whether each side arrived as LTZ or NTZ (interval arithmetic would
    // reject a mixed-type comparison).
    val rUs = TimeOps.epochMicros(col(rn(rTimeCol)))
    val lUs = TimeOps.epochMicros(l(lTimeCol))
    val upperBound =
      if (inclusiveUpper) rUs <= lUs + upperSec * 1000000L
      else rUs < lUs + upperSec * 1000000L
    val cond = keyCols.map(k => l(k) === col(rn(k))).reduce(_ && _) &&
      l("__bucket") === col(rn("__bucket")) &&
      rUs >= lUs + lowerSec * 1000000L &&
      upperBound
    val rightKeep = right.columns.filterNot(keyCols.contains)
      .map(c => col(rn(c)).as(c))
    l.join(r, cond).select(left.columns.map(l(_)) ++ rightKeep: _*)
  }
}
