package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust (median / MAD) z-score + anomaly score.
  *
  * Reference: helper `robust_z` (`src/analytics/binance_analysis.py:62-68`)
  * applied COLUMN-GLOBAL — all groups pooled, not per-group —
  * at `:242-244`:  z = 0.6745 * (x − median) / MAD with
  * MAD = median(|x − median|); degenerate MAD == 0 ⇒ z = x − median.
  *
  * Scale design: the two median passes reduce to ONE scalar row each, which
  * we `broadcast` and cross-join back — the big table is never shuffled, so
  * this costs two extra scans (or one, if the input is cached) and zero
  * wide exchanges regardless of input size.
  */
object RobustZ {

  private val K = 0.6745

  /** Adds column `out` = robust z-score of column `c`, computed globally. */
  def withRobustZ(df: DataFrame, c: String, out: String): DataFrame = {
    val stats = globalStats(df, c)
    df.crossJoin(broadcast(stats))
      .withColumn(out, zExpr(col(c), col("__med"), col("__mad")))
      .drop("__med", "__mad")
  }

  /** Adds robust z-scores for several columns plus `anomaly_score` =
    * greatest(|z_1|, …, |z_n|) (binance_analysis.py:244).
    *
    * All medians are computed in ONE aggregation job and all MADs in a
    * second (medians of |x − med| need the medians first — two passes is
    * the information-theoretic floor for exact MAD). An earlier per-column
    * fold re-scanned the accumulated crossJoin plan once per column,
    * making column n recompute all earlier medians — quadratic scans. */
  def withAnomalyScore(df: DataFrame, cols: Seq[String], scoreCol: String): DataFrame = {
    val meds = df.agg(
      median(col(cols.head)).as(s"__med_${cols.head}"),
      cols.tail.map(c => median(col(c)).as(s"__med_$c")): _*)
    val stats = df.crossJoin(broadcast(meds)).agg(
      first(col(s"__med_${cols.head}")).as(s"__med_${cols.head}"),
      (cols.tail.map(c => first(col(s"__med_$c")).as(s"__med_$c")) ++
        cols.map(c =>
          median(abs(col(c) - col(s"__med_$c"))).as(s"__mad_$c"))): _*)
    val zd = cols.foldLeft(df.crossJoin(broadcast(stats))) { (d, c) =>
      d.withColumn(s"z_$c", zExpr(col(c), col(s"__med_$c"), col(s"__mad_$c")))
    }
    zd.drop(cols.flatMap(c => Seq(s"__med_$c", s"__mad_$c")): _*)
      .withColumn(scoreCol, greatest(cols.map(c => abs(col(s"z_$c"))): _*))
  }

  /** One-row frame (__med, __mad) for column `c`. Exact medians
    * (Spark `median` = exact percentile 0.5, linear interpolation — the
    * same definition pandas and DuckDB use). */
  def globalStats(df: DataFrame, c: String): DataFrame = {
    val med = df.agg(median(col(c)).as("__med"))
    df.crossJoin(broadcast(med))
      .agg(first(col("__med")).as("__med"),
           median(abs(col(c) - col("__med"))).as("__mad"))
  }

  /** The z expression itself, preserving the degenerate-MAD branch. */
  def zExpr(x: Column, med: Column, mad: Column): Column =
    when(mad === 0.0, x - med).otherwise(lit(K) * (x - med) / mad)
}
