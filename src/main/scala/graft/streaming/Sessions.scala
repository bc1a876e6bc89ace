package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization — the live counterpart of
  * `operators.Sessionize` (q101): roll an event stream into gap-bounded
  * visit episodes as they CLOSE, using Spark's native `session_window`
  * aggregation rather than hand-rolled `flatMapGroupsWithState` state.
  *
  * Why native: `session_window` + watermark gives merge-on-overlap session
  * state with watermark-driven finalization and eviction for free, in the
  * incremental-aggregation engine (partial merges, no per-key user code) —
  * exactly the Catalyst-first preference this engine follows everywhere.
  * Custom state (`flatMapGroupsWithState`) is reserved for shapes the
  * built-ins cannot express (see `StatefulOps` for stateful EWMA, which
  * needs ordered per-key folding); session windows are not one of them.
  *
  * Semantics match the batch operator: consecutive events merge when
  * separated by AT MOST `gap` (exactly `gap` still merges; only strictly
  * greater splits — the native merge rule, pinned by the batch-parity
  * test). The batch operator additionally emits a per-key session ORDINAL
  * — inherently retrospective, so the streaming shape emits session BOUNDS
  * instead (`session_start`/`session_end` are the member events' min/max,
  * the join key back to the batch view).
  *
  * Scale: state is O(open sessions), bounded by the watermark horizon —
  * closed sessions are finalized (emitted once, Append mode) and evicted.
  * The aggregation partial-merges map-side like any hash aggregate; a hot
  * key (bot user) holds ONE merged session row per gap period, not one row
  * per event.
  */
object Sessions {

  /** Watermarked session aggregation over a STREAMING (or batch — the
    * parity path) events frame. Append-mode emits each session exactly
    * once, when the watermark passes its close.
    *
    * @param gap       inactivity that closes a session, e.g. "30 minutes"
    * @param watermark allowed event lateness, e.g. "10 minutes"
    */
  def sessionAggregate(events: DataFrame, keyCol: String, tsCol: String,
                       gap: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
      .select(col(keyCol), col("session_start"), col("session_end"),
        col("n_events"),
        (graft.functions.TimeOps.epochSeconds(col("session_end")) -
          graft.functions.TimeOps.epochSeconds(col("session_start")))
          .as("duration_sec"))
}
