package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quantile-bucket calibration over BOUNDED-cardinality scores — the
  * curriculum/mixture-design step that turns a raw per-doc score (quality
  * ‰, language-model NLL band, length class) into a per-group decile (or
  * any `buckets`-quantile) label.
  *
  * The standard spelling — `ntile(10) OVER (PARTITION BY group ORDER BY
  * score)` — is a per-GROUP window: with a handful of language groups over
  * a 100 TB corpus, each group is one unsplittable sort task. This operator
  * exploits what holds for every calibration score in the engine (they are
  * integers on a bounded scale, e.g. quality_milli ∈ [0, 1000]): the rank
  * of a row is fully determined by the VALUE HISTOGRAM, which has at most
  * `groups × |scale|` rows. So:
  *
  *  1. histogram: map-side-combined `groupBy(group, value).count` —
  *     corpus-sized scan, tiny result;
  *  2. `cum_lt` (rows strictly below each value) via a window over the
  *     histogram — bounded by |scale| rows per group, NOT corpus size;
  *  3. rows join the (broadcast-sized) bucket dim back on (group, value).
  *
  * Bucket formula: `least(buckets−1, (buckets · cum_lt) div n_group)` —
  * all ties share a bucket (value-deterministic, unlike ntile's arbitrary
  * tie splitting, which no independent engine could reproduce). Integer
  * `div`, so the assignment is bit-exact cross-engine.
  */
object Calibrate {

  /** Attach `bucketOut` (0-based quantile bucket of `valueCol` within each
    * `groupCols` group) to every row of `df`. `valueCol` must be integral
    * and non-null with bounded cardinality (the histogram materializes one
    * row per distinct (group, value)). */
  def histogramBuckets(df: DataFrame, groupCols: Seq[String], valueCol: String,
                       buckets: Int, bucketOut: String = "bucket"): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    require(!df.columns.contains(bucketOut),
      s"output column '$bucketOut' already exists on the input")
    val gs = groupCols.map(col)
    val hist = df.groupBy(gs :+ col(valueCol): _*).agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(gs: _*).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val dim = hist
      .withColumn("__cum_lt", coalesce(sum(col("__n")).over(w), lit(0L)))
      .withColumn("__ng", sum(col("__n")).over(Window.partitionBy(gs: _*)))
      .select(gs :+ col(valueCol) :+
        least(lit(buckets - 1),
          expr(s"(${buckets}L * __cum_lt) div __ng")).as(bucketOut): _*)
    df.join(broadcast(dim), groupCols :+ valueCol)
  }

  /** Per-group nearest-rank percentile cut values over the same bounded
    * value histogram: cut(p) = the smallest value whose ≤-cumulative count
    * reaches ⌈p·n/100⌉ — the classic nearest-rank definition, integer-only
    * and value-deterministic, so an independent engine reproduces it
    * bit-for-bit (interpolated percentiles would put a float between two
    * scale points and re-open the rounding-boundary hazard). Output: one
    * row per group with a `p<P>` LongType column per requested percent.
    * Same scale shape as [[histogramBuckets]]: the corpus collapses to the
    * histogram before any window; the window runs over ≤ |scale| rows per
    * group. */
  def nearestRankCuts(df: DataFrame, groupCols: Seq[String], valueCol: String,
                      percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      s"percents must be within [1, 100], got $percents")
    val gs = groupCols.map(col)
    val hist = df.groupBy(gs :+ col(valueCol): _*).agg(count(lit(1)).as("__n"))
    val wLe = Window.partitionBy(gs: _*).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val c = hist
      .withColumn("__cum_le", sum(col("__n")).over(wLe))
      .withColumn("__ng", sum(col("__n")).over(Window.partitionBy(gs: _*)))
    val aggs = percents.map { p =>
      min(when(col("__cum_le") >= expr(s"(${p}L * __ng + 99) div 100"),
        col(valueCol))).cast("long").as(s"p$p")
    }
    c.groupBy(gs: _*).agg(aggs.head, aggs.tail: _*)
  }
}
