package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming ingest deduplication — the stream-side guard of a
  * training-data pipeline (at-least-once collectors re-deliver; the corpus
  * must not double-count a document).
  *
  * `dropDuplicatesWithinWatermark` keeps per-key state only for the
  * watermark horizon, so state is bounded by (arrival rate × horizon)
  * rather than growing with the full stream history — the property that
  * keeps this runnable forever on a real cluster. Exact batch dedup over
  * an existing corpus is [[graft.dedup.Dedup.exactDedup]]; this is its
  * unbounded-input counterpart.
  */
object StreamDedup {

  /** Drops re-deliveries of the same `keys` arriving within `horizon` of
    * the first copy (event-time watermark on `eventTime`). */
  def dedupWithinWatermark(stream: DataFrame, eventTime: String,
                           horizon: String, keys: Seq[String]): DataFrame =
    stream.withWatermark(eventTime, horizon)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
}
