package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.dedup.Dedup

/** Streaming NEAR-duplicate detection — the stream-side counterpart of
  * [[graft.dedup.Dedup.simhashVerifiedEdgesFromHashes]]: incoming documents
  * are flagged when a document with simhash Hamming distance ≤ `maxHamming`
  * was already seen within the event-time horizon.
  *
  * Shape: simhash (one codegen'd projection) → explode the same
  * combination-bucket keys the batch path uses (every (blocks − maxHamming)-
  * block combination — pigeonhole-complete recall) → per-bucket
  * `flatMapGroupsWithState` holding the recent distinct hashes of that
  * bucket. A match in ANY bucket emits an alert, so one near-dup pair can
  * alert once per agreeing bucket — downstream consumers dedupe per
  * (id, matched_id) or simply drop flagged ids.
  *
  * State is bounded two ways, which is what keeps this runnable forever:
  *  - event-time TIMEOUT: a bucket with no arrivals for the horizon clears
  *    itself, so live state covers only buckets active inside the horizon;
  *  - `maxPerBucket` FIFO cap on hashes per bucket (a degenerate stream of
  *    one repeated template cannot grow a bucket without bound; the oldest
  *    hashes age out first and remain represented by newer near-identical
  *    entries in the common case).
  */
object StreamNearDedup {

  /** One exploded bucket posting of one incoming document. */
  private[streaming] case class Posting(id: Long, ts: java.sql.Timestamp,
                                        simhash: Long, ci: Int, ck: Long)

  /** `id` matched `matched_id` (seen earlier) at Hamming `hamming`. */
  case class Alert(id: Long, matched_id: Long, hamming: Int)

  /** (simhash, first doc id seen with it) entries of one bucket. */
  private[streaming] case class BucketState(entries: List[(Long, Long)],
                                            maxTsMs: Long)

  /** @param stream     streaming DataFrame with `idCol` (castable to long),
    *                    `textCol`, and event-time column `eventTime`
    * @param horizonMs  how long a seen document can still match arrivals
    *                    (drives both the watermark and the state timeout)
    * @return append-mode alert stream; emission order within a micro-batch
    *         follows ascending id, so the EARLIER document of an intra-batch
    *         pair is the `matched_id`. */
  def nearDupAlerts(stream: DataFrame, idCol: String, textCol: String,
                    eventTime: String, horizonMs: Long,
                    maxHamming: Int = 3, blocks: Int = 6,
                    maxPerBucket: Int = 64): Dataset[Alert] = {
    require(maxHamming < blocks, "pigeonhole recall needs maxHamming < blocks")
    val spark = stream.sparkSession
    import spark.implicits._
    val posted = Dedup.withSimhash(stream, textCol)
      .withWatermark(eventTime, s"$horizonMs milliseconds")
      .select(col(idCol).cast("long").as("id"), col(eventTime).as("ts"),
        col("simhash"),
        explode(Dedup.simhashComboKeys(blocks, maxHamming)).as("c"))
      .select(col("id"), col("ts"), col("simhash"),
        col("c.ci").as("ci"), col("c.ck").as("ck"))
      .as[Posting]
    posted.groupByKey(p => (p.ci, p.ck))
      .flatMapGroupsWithState[BucketState, Alert](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, rows, state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prior = state.getOption.getOrElse(BucketState(Nil, 0L))
            var entries = prior.entries
            var maxTs = prior.maxTsMs
            val out = List.newBuilder[Alert]
            // Ascending id: deterministic matched_id for intra-batch pairs.
            rows.toSeq.sortBy(_.id).foreach { p =>
              entries.find { case (h, mid) =>
                mid != p.id &&
                  java.lang.Long.bitCount(h ^ p.simhash) <= maxHamming
              }.foreach { case (h, mid) =>
                out += Alert(p.id, mid, java.lang.Long.bitCount(h ^ p.simhash))
              }
              entries = ((p.simhash, p.id) :: entries).take(maxPerBucket)
              maxTs = math.max(maxTs, p.ts.getTime)
            }
            state.update(BucketState(entries, maxTs))
            // Expire once nothing inside the horizon can match anymore;
            // must be beyond the current watermark or Spark rejects it.
            state.setTimeoutTimestamp(
              math.max(maxTs + horizonMs, state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }
}
