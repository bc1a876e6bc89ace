package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Live distribution-drift monitoring — the streaming counterpart of the
  * batch KS/χ²/PSI queries (q94–q96): score each event-time window of a
  * metric stream against a FIXED reference histogram (the training-set or
  * last-accepted-snapshot distribution) and alert when PSI crosses the
  * conventional 0.2 "significant shift" bar.
  *
  * Shape: one watermarked tumbling-window aggregation builds the live
  * per-(window, key, bucket) histogram — partial-merged map-side like any
  * hash aggregate — then the tiny reference histogram (one row per (key,
  * bucket), computed ONCE offline) joins in broadcast. PSI's per-bucket
  * terms sum in a second aggregation keyed by (window, key), which reuses
  * the first aggregation's partitioning. State is O(open windows × keys ×
  * buckets), watermark-evicted; the corpus-sized stream never shuffles
  * anywhere except into the windowed histogram.
  *
  * Zero-handling matches the batch q96 exactly: the DENOMINATORS (live
  * window total, reference total) cover the FULL distribution — including
  * live mass in buckets the reference has never seen — while only
  * both-sides-positive buckets contribute log TERMS (PSI's log is
  * undefined at zero; pre-smoothed reference histograms are the caller's
  * choice). Novel-bucket mass therefore still drags every matched bucket's
  * p_live down and scores as drift; renormalizing over matched buckets
  * only would silently score a 98%-novel-traffic window as PSI 0
  * (regression-tested in StreamDriftSpec).
  */
object StreamDrift {

  /** Reference histogram of `valueCol` per `keyCol`, bucketed by
    * `bucketWidth` — run this on the BATCH reference frame and broadcast
    * the (small) result into [[windowedPsi]]. */
  def referenceHistogram(ref: DataFrame, keyCol: String, valueCol: String,
                         bucketWidth: Double): DataFrame =
    ref.withColumn("__bucket",
        floor(col(valueCol) / lit(bucketWidth)).cast("long"))
      .groupBy(col(keyCol), col("__bucket"))
      .agg(count(lit(1)).as("__rc"))

  /** Per-(event-time window, key) PSI of the live stream vs `refHist`
    * (a [[referenceHistogram]] result). Append mode: each window's score
    * emits once, when the watermark closes it. */
  def windowedPsi(stream: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String, refHist: DataFrame, bucketWidth: Double,
                  windowDur: String, watermark: String): DataFrame = {
    // Reference totals per key, pre-joined onto the histogram rows so the
    // streaming side needs no second pass over the reference.
    val refTot = refHist.groupBy(col(keyCol)).agg(sum(col("__rc")).as("__rn"))
    val refFull = refHist.join(refTot, Seq(keyCol))
    val live = stream
      .withWatermark(tsCol, watermark)
      .withColumn("__bucket",
        floor(col(valueCol) / lit(bucketWidth)).cast("long"))
      .groupBy(window(col(tsCol), windowDur), col(keyCol), col("__bucket"))
      .agg(count(lit(1)).as("__lc"))

    // Second streaming aggregate keyed on the SAME event-time window —
    // the chained-window-aggregation shape Structured Streaming supports
    // in append mode (each stateful operator groups on the window). Rows
    // per (window, key) are bounded by the bucket count, so the
    // collect_list below is a tiny fixed-size array, not a corpus spill.
    // LEFT join: live buckets unknown to the reference must stay in the
    // window total (full-distribution denominator, the q96 convention) —
    // collect_list drops the null entry the `when` leaves for them, so
    // they contribute mass but no log term.
    live
      .join(broadcast(refFull), Seq(keyCol, "__bucket"), "left")
      .groupBy(col("window"), col(keyCol))
      .agg(sum(col("__lc")).as("__ln"),
        count(col("__rc")).as("n_buckets"),
        // Σ (p_live − p_ref)·ln(p_live/p_ref); per-bucket proportions need
        // the window total, which is itself Σ __lc of this group — fold
        // both into one aggregate via the sum-of-terms-with-late-division
        // trick: collect the per-bucket pieces first.
        collect_list(when(col("__rc").isNotNull,
          struct(col("__lc"), col("__rc"), col("__rn")))).as("__terms"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col(keyCol), col("n_buckets"),
        round(aggregate(col("__terms"), lit(0.0d), (acc, t) => {
          val pLive = t.getField("__lc").cast("double") / col("__ln")
          val pRef = t.getField("__rc").cast("double") / t.getField("__rn")
          acc + (pLive - pRef) * log(pLive / pRef)
        }), 6).as("psi"))
      .withColumn("drift_alert", col("psi") >= lit(0.2d))
  }
}
