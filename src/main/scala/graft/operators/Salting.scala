package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe two-phase aggregation (salting).
  *
  * A hot grouping key funnels its entire row volume through one reducer
  * task; salting spreads it: phase 1 aggregates on (key, salt) — map-side
  * partial aggregation plus `buckets`-way fan-out of each hot key — and
  * phase 2 merges the ≤buckets partials per key. Results are identical to
  * a direct groupBy for any algebraic aggregate (sum/count/min/max).
  *
  * AQE's skew-join handling covers JOIN skew at runtime; aggregation skew
  * on a pathological key distribution is still the pipeline author's call —
  * this operator is that dial. Salt derives from a hash of the whole row
  * (not RNG), so the operator stays deterministic task-retry-safe.
  */
object Salting {

  /** The group-size histogram collapsed to the three numbers the salting
    * decision needs — the q155 key-skew profiler's reading as a value:
    * group count, total rows, and the largest single group. */
  case class SkewProfile(nGroups: Long, nRows: Long, maxGroup: Long)

  /** One map-side-combined pass: per-group counts collapse to the
    * three-scalar profile (the per-group frame never leaves the executors
    * beyond |groups| partial rows; the final agg is one row). Column
    * pruning reduces the scan to the `part` columns only. */
  def profileGroups(df: DataFrame, part: Seq[Column]): SkewProfile = {
    val r = df.groupBy(part: _*).agg(count(lit(1)).as("__n"))
      .agg(count(lit(1)), coalesce(sum(col("__n")), lit(0L)),
        coalesce(max(col("__n")), lit(0L)))
      .head()
    SkewProfile(r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** Salt factor for a per-group sort/rank given the measured skew: 1 =
    * plain window (no group exceeds a fair per-task share), otherwise the
    * number of sub-partitions needed to bring the HOTTEST group down to
    * roughly one task's share, capped at the parallelism (salting finer
    * than the task count buys nothing and pays survivor-set growth —
    * phase 2 re-ranks salts·k rows per group).
    *
    * The rule is pure arithmetic on the profile: salts =
    * ceil(maxGroup · parallelism / nRows), i.e. "how many fair shares does
    * the hottest group span". A uniform many-group frame yields ≤ 1
    * (plain); the 90 %-hot-key fixture yields ≈ 0.9·parallelism. */
  def adviseSalts(p: SkewProfile, parallelism: Int): Int = {
    require(parallelism >= 1, s"parallelism must be >= 1, got $parallelism")
    if (p.nRows <= 0 || p.maxGroup <= 0) 1
    else {
      val spans = (p.maxGroup * parallelism + p.nRows - 1) / p.nRows
      math.min(math.max(spans, 1L), parallelism.toLong).toInt
    }
  }

  case class AlgebraicAgg(partial: Column => Column, merge: Column => Column,
                          valueCol: String, out: String)

  def sumOf(valueCol: String, out: String): AlgebraicAgg =
    AlgebraicAgg(sum, sum, valueCol, out)
  def countRows(out: String): AlgebraicAgg =
    AlgebraicAgg(_ => count(lit(1)), sum, "*", out)
  def minOf(valueCol: String, out: String): AlgebraicAgg =
    AlgebraicAgg(min, min, valueCol, out)
  def maxOf(valueCol: String, out: String): AlgebraicAgg =
    AlgebraicAgg(max, max, valueCol, out)

  /** Aggregate `aggs` grouped by `keys`, spreading each key across
    * `buckets` salt partitions first. */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int,
                aggs: Seq[AlgebraicAgg]): DataFrame = {
    val salt = pmod(xxhash64(df.columns.map(col): _*), lit(buckets)).as("__salt")
    val phase1 = df.withColumn("__salt", salt)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head.partial(col(aggs.head.valueCol)).as(s"__p0"),
        aggs.tail.zipWithIndex.map { case (a, i) =>
          a.partial(col(a.valueCol)).as(s"__p${i + 1}")
        }: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(aggs.head.merge(col("__p0")).as(aggs.head.out),
        aggs.tail.zipWithIndex.map { case (a, i) =>
          a.merge(col(s"__p${i + 1}")).as(a.out)
        }: _*)
  }
}
