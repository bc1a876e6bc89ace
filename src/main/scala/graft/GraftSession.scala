package graft

import org.apache.spark.sql.SparkSession

/** The ONE place session defaults live. Every entry point (`Main`,
  * `Analyze`, `Verify`, `Bench`, `Explain`, `ScaleUp`, `UpsertBench`)
  * builds its session here, so a conf a bench A/B proved out (the 64 kB
  * AQE coalesce floor) reaches production entry points instead of living
  * only in `Bench` — the r13 verdict's consistency gap. RegistryDocSpec
  * pins "no `SparkSession.builder()` outside this file" at the source
  * level, so the next entry point cannot quietly re-diverge.
  */
object GraftSession {

  /** Confs every graft session carries, with the measurement or contract
    * behind each:
    *
    *  - `timeZone=UTC`: the oracle contract — every calendar-part and
    *    epoch function must agree with DuckDB's UTC arithmetic.
    *  - `nanosAsLong=true`: `events.ts` has shipped as TIMESTAMP(NANOS)
    *    in some testdata generations; without the flag the scan throws.
    *    `Tables.load` normalizes the resulting long back to a timestamp.
    *  - `ui.enabled=false`: headless mains; the UI thread pool and its
    *    event-log retention are pure overhead here.
    *  - `adaptive.enabled=true`: explicit (it is the Spark default) so a
    *    future default flip cannot silently change every plan.
    *  - `coalescePartitions.minPartitionSize=64k`: AQE's byte-based
    *    coalescing assumes byte-proportional CPU; text scoring violates
    *    that (a 5k-doc post-window exchange coalesced to ONE task
    *    serialized q79's CPU-heavy cache fill behind a single thread).
    *    64 kB keeps those stages at core-count parallelism; at production
    *    shuffle sizes partitions are MBs+ and the floor is inert.
    *    Measured A/B over the CPU-heavy family: −7 % total, no query
    *    regressed (advisoryPartitionSizeInBytes=1m tried and rejected:
    *    −1.6 % only, and it also retargets skew-join splitting).
    *  - `locality.wait=0`: all these mains run `local[n]` where every
    *    block is PROCESS_LOCAL, so the wait can only ever stall; on a
    *    real cluster deployment this is the one knob to revisit.
    */
  val sharedConfs: Seq[(String, String)] = Seq(
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.ui.enabled" -> "false",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "64k",
    "spark.locality.wait" -> "0",
    // Kryo for RDD shuffle/broadcast payloads (SQL exchanges use the
    // UnsafeRow serializer regardless — this only reaches the RDD round
    // loops). Measured on the CC contraction at 1M edges (r18): the
    // RDD rounds' (Long, Long) shuffles under the default JavaSerializer
    // ran ~25% SLOWER than the old Catalyst rounds; under Kryo they run
    // ~30% FASTER (warm A/B 22.7 s vs 32.8 s), which is what lets the
    // planning-free RDD rounds win at EVERY scale instead of only on
    // small graphs. Takes effect at SparkContext creation, so it must
    // ride the builder, not a post-hoc conf.set.
    "spark.serializer" -> "org.apache.spark.serializer.KryoSerializer")

  /** Thread count: `SPARK_GRAFT_CPUS` env, else the caller's default
    * (mains differ — Bench wants many, Analyze is modest). */
  def cpus(default: String): String =
    sys.env.getOrElse("SPARK_GRAFT_CPUS", default)

  /** Build-or-get the session: `local[cpus]`, `shuffle.partitions=cpus`
    * (local mode — one shuffle task per core; a cluster deployment sizes
    * this to data volume instead), [[sharedConfs]], log level, then the
    * `SPARK_GRAFT_CONF_a_b=c` env passthrough (underscores become dots —
    * the A/B knob for conf-gated behaviors, now uniform across mains). */
  def create(defaultCpus: String, logLevel: String = "WARN"): SparkSession = {
    val c = cpus(defaultCpus)
    val b = SparkSession.builder()
      .master(s"local[$c]")
      .config("spark.sql.shuffle.partitions", c)
    val spark = sharedConfs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel(logLevel)
    applyEnvConfs(spark)
    spark
  }

  /** Apply `SPARK_GRAFT_CONF_*` env overrides to an existing session. */
  def applyEnvConfs(spark: SparkSession): Unit =
    sys.env.foreach {
      case (k, v) if k.startsWith("SPARK_GRAFT_CONF_") =>
        spark.conf.set(k.stripPrefix("SPARK_GRAFT_CONF_").replace("_", "."), v)
      case _ => ()
    }
}
