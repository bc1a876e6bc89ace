package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the streaming enrichment pattern the
  * reference approximates with repeated batch merges (aligning trades with
  * the order-book state around them, `binance_analysis.py` §joined views):
  * each left row pairs with right rows of the SAME key whose timestamp
  * falls within a bounded lookback window ending at the left timestamp.
  *
  * Batch and streaming share one plan shape: an equi-join on the key plus a
  * time-range predicate. In streaming, BOTH sides carry watermarks and the
  * range predicate is exactly what Spark's state-cleanup analysis needs to
  * purge buffered rows once the watermark passes `leftTs - lookback` —
  * state stays bounded by (watermark delay + lookback) × arrival rate, not
  * by stream length.
  *
  * Scale: the join shuffles both sides by the key once; there is no
  * per-row driver work and no unbounded state. Skewed keys hit the same
  * AQE skew-split path as any shuffle join.
  */
object StreamJoin {

  /** Left rows joined to same-`key` right rows with
    * `rightTs ∈ [leftTs - lookback, leftTs]`. `lookback` is a SQL interval
    * body (e.g. "10 minutes"). Pass `watermark` for streaming inputs (both
    * sides get it); leave it None for batch frames. Output columns are the
    * left columns then the right columns minus its `key` (deduplicated the
    * way `join(_, Seq(key))` would).
    *
    * `joinType` additionally supports "left_outer": unmatched left rows
    * emit with null right columns — in streaming, ONLY once the watermark
    * proves no in-range right row can still arrive (the null row is
    * delayed, not withheld; Spark's outer stream-stream contract), which is
    * why the outer form REQUIRES a watermark on both sides. State stays
    * bounded exactly as for inner: purge at watermark − lookback. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String, lookback: String,
                   watermark: Option[String] = None,
                   joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left_outer",
      s"unsupported interval-join type '$joinType'")
    // Fail fast on the outer stream-stream contract documented above:
    // without watermarks Spark cannot ever prove "no match will arrive",
    // and the analysis error it raises at start() names neither this
    // operator nor the missing knob.
    require(joinType == "inner" || watermark.nonEmpty ||
        !(left.isStreaming || right.isStreaming),
      "streaming left_outer interval join requires a watermark on both " +
        "sides (pass watermark=Some(...)): unmatched rows can only emit " +
        "once the watermark proves no in-range match can still arrive")
    require(leftTs != rightTs,
      s"leftTs and rightTs must be distinct column names, both are '$leftTs'")
    // The join condition references columns unqualified, so any cross-side
    // name overlap beyond `key` resolves ambiguously at analysis time —
    // reject it here with an actionable message instead.
    val rightCols = right.columns.toSet
    require(!rightCols.contains(leftTs) && !right.columns.contains(s"__r_$key"),
      s"right frame must not carry columns '$leftTs' or '__r_$key'")
    require(!left.columns.contains(rightTs) && !left.columns.contains(s"__r_$key"),
      s"left frame must not carry columns '$rightTs' or '__r_$key'")
    require(left.columns.contains(key) && rightCols.contains(key),
      s"both frames must carry the join key '$key'")
    val l = watermark.fold(left)(w => left.withWatermark(leftTs, w))
    val r0 = watermark.fold(right)(w => right.withWatermark(rightTs, w))
    val rKey = s"__r_$key"
    val r = r0.withColumnRenamed(key, rKey)
    l.join(r,
        col(rKey) === col(key) &&
          col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lookback") &&
          col(rightTs) <= col(leftTs),
        joinType)
      .drop(rKey)
  }
}
