package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class StreamNearDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("near-dup arrivals alert across micro-batches; distinct docs do not") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val stream = mem.toDF().toDF("doc_id", "t", "text")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
    val alerts = StreamNearDedup.nearDupAlerts(stream, "doc_id", "text",
      "ts", horizonMs = 10 * 60 * 1000L)
    val q = alerts.writeStream.format("memory").queryName("near_out")
      .outputMode("append").start()
    try {
      val base = "the quick brown fox jumps over the lazy dog tonight"
      val other = "completely different content about spark query engines"
      mem.addData((1L, "2024-01-01 00:00:00", base))
      mem.addData((2L, "2024-01-01 00:00:05", other))
      q.processAllAvailable()
      assert(spark.table("near_out").count() == 0) // nothing matches yet
      // Batch 2: an exact re-post (Hamming 0 vs doc 1), plus an intra-batch
      // identical pair (5, 6), plus a fresh distinct doc.
      mem.addData((5L, "2024-01-01 00:01:00", base))
      mem.addData((6L, "2024-01-01 00:01:10", base))
      mem.addData((7L, "2024-01-01 00:01:20",
        "yet another unrelated document body entirely"))
      q.processAllAvailable()
      val got = spark.table("near_out")
        .select("id", "matched_id", "hamming")
        .as[(Long, Long, Int)].collect().toSet
      // One alert per (id, matched) pair after bucket-level dedupe.
      val pairs = got.map(a => (a._1, a._2))
      assert(pairs.contains((5L, 1L)), s"5 should match 1: $got")
      assert(pairs.contains((6L, 1L)) || pairs.contains((6L, 5L)),
        s"6 should match an earlier copy: $got")
      assert(!pairs.exists(p => p._1 == 7L || p._1 == 2L),
        s"distinct docs must not alert: $got")
      assert(got.forall(_._3 == 0)) // identical text → Hamming 0
    } finally q.stop()
  }

  test("bucket transition: repeated template cannot evict distinct in-horizon hashes") {
    import StreamNearDedup.{processBucket, Posting}
    def p(id: Long, tsMs: Long, h: Long) =
      Posting(id, new java.sql.Timestamp(tsMs), h, 0, 0L)
    val hB = 0x1111L
    val hT = 0xFFFF0000L // far from hB: no cross-matching
    // Seed: B at t=0; then the template floods 4 arrivals with cap 2.
    val (e1, a1, _) = processBucket(Seq(p(1, 0, hB)), Nil,
      wm = -1, horizonMs = 1000, maxHamming = 3, maxPerBucket = 2)
    assert(a1.isEmpty)
    val flood = (2 to 5).map(i => p(i.toLong, i * 10L, hT))
    val (e2, _, _) = processBucket(flood, e1,
      wm = -1, horizonMs = 1000, maxHamming = 3, maxPerBucket = 2)
    // B's entry must survive: the template refreshed ONE entry, not four.
    assert(e2.exists(_._1 == hB), s"distinct hash evicted: $e2")
    assert(e2.count(_._1 == hT) == 1)
    assert(e2.find(_._1 == hT).get._2 == 2L) // earliest template id kept
    // A true near-dup of B still alerts.
    val (_, a3, _) = processBucket(Seq(p(9, 100, hB ^ 1L)), e2,
      wm = -1, horizonMs = 1000, maxHamming = 3, maxPerBucket = 2)
    assert(a3.map(a => (a.id, a.matched_id, a.hamming)) == List((9L, 1L, 1)))
  }

  test("bucket transition: a live bucket still refuses beyond-horizon matches") {
    import StreamNearDedup.{processBucket, Posting}
    def p(id: Long, tsMs: Long, h: Long) =
      Posting(id, new java.sql.Timestamp(tsMs), h, 0, 0L)
    val hB = 0x2222L
    val hK = 0x7777000000L // keeps the bucket busy, never matches hB
    var entries = processBucket(Seq(p(1, 0, hB)), Nil, -1, 1000, 3, 64)._1
    // Unrelated traffic every 500ms keeps the bucket alive far past B's
    // horizon (wm stays below B's ts so watermark eviction never fires).
    (1 to 10).foreach { i =>
      entries = processBucket(Seq(p(100 + i.toLong, i * 500L, hK + i)),
        entries, -1, 1000, 3, 64)._1
    }
    // t=5000: B (seen at t=0, horizon 1000) must NOT match anymore.
    val (_, alerts, _) = processBucket(Seq(p(200, 5000, hB)), entries,
      -1, 1000, 3, 64)
    assert(!alerts.exists(_.matched_id == 1L),
      s"beyond-horizon entry matched: $alerts")
    // And watermark-based eviction drops it outright once wm passes it.
    val (e2, _, _) = processBucket(Seq(p(201, 5001, hK)), entries,
      wm = 4000, horizonMs = 1000, maxHamming = 3, maxPerBucket = 64)
    assert(!e2.exists(_._1 == hB))
  }

  test("a doc seen only beyond the horizon no longer matches (state expires)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val stream = mem.toDF().toDF("doc_id", "t", "text")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
    val alerts = StreamNearDedup.nearDupAlerts(stream, "doc_id", "text",
      "ts", horizonMs = 60 * 1000L) // 1 minute
    val q = alerts.writeStream.format("memory").queryName("near_exp")
      .outputMode("append").start()
    try {
      val base = "the quick brown fox jumps over the lazy dog tonight"
      mem.addData((1L, "2024-01-01 00:00:00", base))
      q.processAllAvailable()
      // Push the watermark far past the horizon so bucket state times out.
      mem.addData((2L, "2024-01-01 01:00:00",
        "completely different content about spark query engines"))
      q.processAllAvailable()
      mem.addData((3L, "2024-01-01 01:00:30", base)) // same text, hour later
      q.processAllAvailable()
      val pairs = spark.table("near_exp").select("id", "matched_id")
        .as[(Long, Long)].collect().toSet
      assert(!pairs.contains((3L, 1L)),
        s"doc 1 aged out of the horizon and must not match: $pairs")
    } finally q.stop()
  }
}
