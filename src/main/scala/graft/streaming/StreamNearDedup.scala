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
  * A match requires |arrival − seen| ≤ horizon in EVENT time — an entry
  * kept alive by unrelated bucket traffic cannot match beyond the horizon.
  *
  * State is bounded three ways, which is what keeps this runnable forever:
  *  - event-time TIMEOUT: a bucket with no arrivals for the horizon clears
  *    itself entirely;
  *  - per-entry EVICTION below the watermark: entries too old to match any
  *    future arrival are dropped on every update, so a continuously-active
  *    bucket does not accumulate history;
  *  - `maxPerBucket` LRU cap on DISTINCT hashes per bucket — a repeated
  *    template REFRESHES its existing entry (keeping the earliest doc id)
  *    instead of appending, so a high-volume duplicate cannot evict other
  *    in-horizon hashes.
  *
  * Rows with a null event time, a non-castable id, or a null text (e.g.
  * unparseable upstream records) are dropped before the stateful operator
  * — a poison record must not take the query down.
  */
object StreamNearDedup {

  /** One exploded bucket posting of one incoming document. */
  private[streaming] case class Posting(id: Long, ts: java.sql.Timestamp,
                                        simhash: Long, ci: Int, ck: Long)

  /** `id` matched `matched_id` (seen earlier) at Hamming `hamming`. */
  case class Alert(id: Long, matched_id: Long, hamming: Int)

  /** (simhash, earliest doc id seen with it, last-seen event-time ms)
    * entries of one bucket, most-recently-seen first. */
  private[streaming] case class BucketState(entries: List[(Long, Long, Long)])

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
      // Poison-record guards: a null event time, an id that does not cast
      // to long, or a null text (null simhash) must be DROPPED, not allowed
      // to kill the query at the non-nullable Posting encoder.
      .where(col(eventTime).isNotNull &&
        col(idCol).cast("long").isNotNull && col("simhash").isNotNull)
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
            val wm = state.getCurrentWatermarkMs()
            val (entries, alerts, maxTs) = processBucket(
              rows.toSeq, state.getOption.map(_.entries).getOrElse(Nil),
              wm, horizonMs, maxHamming, maxPerBucket)
            state.update(BucketState(entries))
            // Expire once nothing inside the horizon can match anymore;
            // must be beyond the current watermark or Spark rejects it.
            state.setTimeoutTimestamp(math.max(maxTs + horizonMs, wm + 1))
            alerts.iterator
          }
      }
  }

  /** Pure per-bucket transition (unit-tested directly): given a batch's
    * postings for one bucket and the prior entries, produce the updated
    * entries, the alerts, and the newest entry timestamp. */
  private[streaming] def processBucket(rows: Seq[Posting],
                                       prior: List[(Long, Long, Long)],
                                       wm: Long, horizonMs: Long,
                                       maxHamming: Int, maxPerBucket: Int)
      : (List[(Long, Long, Long)], List[Alert], Long) = {
    // A late arrival the watermark still admits can carry event time as
    // low as wm, so entries down to wm − horizon can still legitimately
    // match — evict strictly below that. Live state spans ≤ 2×horizon of
    // event time per bucket even under constant unrelated traffic.
    var entries = prior.filter(_._3 >= wm - horizonMs)
    val out = List.newBuilder[Alert]
    // Ascending id: deterministic matched_id for intra-batch pairs.
    rows.sortBy(_.id).foreach { p =>
      val tsMs = p.ts.getTime
      entries.find { case (h, mid, seenMs) =>
        mid != p.id &&
          java.lang.Long.bitCount(h ^ p.simhash) <= maxHamming &&
          math.abs(tsMs - seenMs) <= horizonMs
      }.foreach { case (h, mid, _) =>
        out += Alert(p.id, mid, java.lang.Long.bitCount(h ^ p.simhash))
      }
      // LRU upsert keyed by hash: a repeat refreshes last-seen and keeps
      // the EARLIEST doc id; only distinct hashes count against the cap.
      entries = entries.find(_._1 == p.simhash) match {
        case Some((h, mid, seenMs)) =>
          (h, math.min(mid, p.id), math.max(seenMs, tsMs)) ::
            entries.filterNot(_._1 == p.simhash)
        case None =>
          ((p.simhash, p.id, tsMs) :: entries).take(maxPerBucket)
      }
    }
    val maxTs = if (entries.isEmpty) wm else entries.map(_._3).max
    (entries, out.result(), maxTs)
  }
}
