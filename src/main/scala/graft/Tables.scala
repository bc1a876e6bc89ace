package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (see TESTDATA.md). All operators in this library are generic over
  * DataFrames; these helpers just bind them to a scale-factor dir.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Reads a table, normalizing `events.ts` to session-TZ TimestampType
    * whatever physical shape the parquet carries. Observed shapes across
    * driver testdata generations:
    *   - TIMESTAMP(NANOS) → nanosecond LONG (under spark.sql.legacy.parquet.
    *     nanosAsLong=true — set in Verify/Bench/tests); values are
    *     µs-resolution, so DIV 1000 → timestamp_micros is lossless. Integer
    *     DIV, not `/`: a double round-trip loses precision on 1.7e18 nanos.
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false) → TIMESTAMP_NTZ; the cast
    *     to TimestampType re-interprets the wall-clock fields in the session
    *     TZ — lossless under the UTC session every entrypoint pins.
    * Normalizing HERE (not per query) keeps every downstream epoch
    * extraction (`unix_micros`, interval arithmetic) on the one type they
    * all accept; SchemaDriftSpec pins the post-normalization schema so the
    * next silent testdata type change fails one named test, not N queries. */
  // Deliberately NOT .cache()d: measured slower at bench scale — building
  // the in-memory columnar cache costs more than re-running the (OS-page-
  // cached, vectorized) parquet scans these queries do once each. The
  // shared-frame cache pattern lives where it pays: Analyze.run caches the
  // feature frame that ~10 artifact queries fan out from (SURVEY §4).
  // Table-HANDLE memo (NOT a data cache): `spark.read.parquet` runs a
  // schema-inference job against the file footer on every call, and the
  // registry pays it once per t() per query — ~30-100 ms of pure metadata
  // IO per query that a real application amortizes by holding its table
  // handles. DataFrames are immutable plans, so sharing the handle is
  // side-effect-free. Weak keys would NOT make stopped test sessions
  // collectable here — the memoized DataFrames strongly reference their
  // session via df.sparkSession, pinning the key alive — so eviction is
  // explicit instead: every load() first drops entries whose SparkContext
  // has stopped (the map holds a handful of sessions at most, so the sweep
  // is O(sessions), not O(tables)).
  // (Data caching stays deliberately off — see above.)
  // Contract: files under a (dir, name) don't change schema mid-session.
  private val handles =
    new java.util.HashMap[SparkSession,
      scala.collection.concurrent.TrieMap[(String, String), DataFrame]]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val per = handles.synchronized {
      val it = handles.entrySet().iterator()
      while (it.hasNext) if (it.next().getKey.sparkContext.isStopped) it.remove()
      var m = handles.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]
        handles.put(spark, m)
      }
      m
    }
    per.getOrElseUpdate((sfDir, name), {
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      if (name == "events") df.schema("ts").dataType match {
        case LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        case TimestampNTZType =>
          df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      } else df
    })
  }

  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  def events(spark: SparkSession, d: String): DataFrame = load(spark, d, "events")
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
