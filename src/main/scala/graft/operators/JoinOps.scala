package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators (reference §2.4 J1–J3 + the joins Spark gives us free).
  *
  * Scale notes: equi-joins shuffle both sides on the key unless one side is
  * broadcast — callers pass `broadcast(dim)` for dimension tables. The
  * as-of join below deliberately avoids the naive range-join (which
  * explodes to |L|·|R| per key) by reformulating as union + last-value
  * window: one shuffle by key, linear state.
  */
object JoinOps {

  /** J1 (`binance_analysis.py:392-415`): bucket-alignment equi-join — the
    * reference floors trade timestamps to the minute and dict-looks-up the
    * candle at that minute. Here: a plain equi-join on (key, bucket). */
  def bucketAlignJoin(facts: DataFrame, buckets: DataFrame,
                      factKeys: Seq[String], joinType: String = "left"): DataFrame =
    facts.join(buckets, factKeys, joinType)

  /** Left-semi: rows of `left` with ≥1 match (EXISTS). */
  def semiJoin(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_semi")

  /** Left-anti: rows of `left` with no match (NOT EXISTS). */
  def antiJoin(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_anti")

  /** As-of join (beyond-reference; the closest reference shape is J1): for
    * each left row, attach the LATEST right row with right.ts <= left.ts
    * within the same key.
    *
    * Implementation: tag both sides, union, single window per key ordered by
    * (ts, side) with right rows sorting before left rows on timestamp ties,
    * then `last(value, ignoreNulls)` over the unbounded-preceding frame.
    * Cost: ONE shuffle on the key — never the quadratic range-join.
    * The right side must be unique per (key, ts); pre-aggregate it if not.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               payload: Seq[String]): DataFrame = {
    val lTagged = left.withColumn("__side", lit(1))
    val rTagged = right.select((key +: ts +: payload).map(col): _*)
      .withColumn("__side", lit(0))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = payload.foldLeft(unioned) { (d, p) =>
      d.withColumn(s"asof_$p", last(col(p), ignoreNulls = true).over(w))
    }
    filled.where(col("__side") === 1)
      .drop("__side").drop(payload: _*)
  }

  /** J2 (`binance_analysis.py:539-541`): cross-group time alignment — the
    * pandas pivot_table(index=time, columns=group, values=v) with fillna(0).
    * One hash aggregate; explicit `values` avoids the domain-discovery job.
    * `exactCenti=true` (centi-grid values) computes each cell mean from
    * exact long sums — floor(v·100+0.5) is lossless on the grid and the
    * milli-of-centi integer mean is partition-order-free (the q108/q149
    * cross-engine hazard of round(avg(double), 6)) — then pivots the small
    * (bucket, group) cell frame with a deterministic `first`. */
  def pivotAlign(df: DataFrame, timeKey: Column, group: String,
                 groupValues: Seq[String], value: Column,
                 exactCenti: Boolean = false): DataFrame = {
    val p =
      if (!exactCenti)
        df.groupBy(timeKey.as("bucket"))
          .pivot(group, groupValues)
          .agg(round(avg(value), 6))
      else
        df.groupBy(timeKey.as("bucket"), col(group).as("__g"))
          .agg(sum(floor(value * 100 + lit(0.5))).as("__sv"),
            count(lit(1)).as("__n"))
          .withColumn("__m", expr("(__sv * 1000 div __n) / 100000.0d"))
          .groupBy(col("bucket"))
          .pivot(col("__g"), groupValues)
          .agg(first(col("__m")))
    p.na.fill(0.0, groupValues).orderBy(col("bucket"))
  }
}
