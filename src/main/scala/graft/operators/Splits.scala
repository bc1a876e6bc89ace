package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines: every row gets a
  * stable train/val/test label derived from a hash of its id — no RNG, no
  * seed file, reproducible across engines, runs, and cluster sizes.
  *
  * The draw is the first 8 hex chars of md5(id) mod 100, the same
  * cross-engine-reproducible construction as
  * [[WindowOps.importanceSample]] — DuckDB, Spark, and any engine with md5
  * agree bit-for-bit, so split membership is auditable downstream.
  *
  * Scale shape: a pure narrow projection — no shuffle, no state, no join.
  * At 100 TB this is the only acceptable shape for a split: any
  * sample/except formulation shuffles the corpus; a hash label streams
  * through the scan and costs nothing.
  */
object Splits {

  /** Add `splitCol` labeling each row by its md5 percentile.
    *
    * `cuts` is a sequence of (label, cumulative-upper-percent) with the
    * last entry at 100, e.g. `Seq(("train", 90), ("val", 95),
    * ("test", 100))`: draws in [0,90) → train, [90,95) → val,
    * [95,100) → test. Boundaries are exact integer comparisons on the
    * integer draw — no float thresholds to disagree across engines.
    */
  def assignSplit(df: DataFrame, idExpr: Column, cuts: Seq[(String, Int)],
                  splitCol: String = "split"): DataFrame = {
    require(cuts.nonEmpty && cuts.last._2 == 100,
      s"cuts must end at 100, got ${cuts.map(_._2).mkString(",")}")
    val pcts = cuts.map(_._2)
    require(pcts.zip(pcts.tail).forall { case (a, b) => a < b } && pcts.head > 0,
      s"cuts must be strictly increasing and positive, got ${pcts.mkString(",")}")
    require(!df.columns.contains(splitCol),
      s"assignSplit: input already has a '$splitCol' column")
    val draw = graft.functions.Draws.md5Draw(idExpr, 100L)
    // Null-id tripwire: md5(null) is null, every `draw < pct` is null, and
    // the otherwise() branch would silently dump ALL null-id rows into the
    // last cut — correlated rows flooding the smallest (test) split. Fail
    // loudly instead; zero cost on the non-null path.
    val chained = cuts.init.foldLeft(
      when(idExpr.isNull, raise_error(
        lit("assignSplit: null id — the id must be a non-null row identifier")))) {
      case (acc, (name, pct)) => acc.when(draw < pct, lit(name))
    }
    df.withColumn(splitCol, chained.otherwise(lit(cuts.last._1)))
  }

  /** Add `shardCol` ∈ [0, numShards) — deterministic output sharding for
    * corpus publication: the same md5 draw as [[assignSplit]], so shard
    * membership is engine-independent and a re-run (or a different engine
    * reading the same ids) routes every row identically. Same scale shape:
    * a pure narrow projection, no shuffle — the WRITE repartitions by the
    * shard label, the assignment itself costs nothing. Same null-id
    * tripwire: a null draw would silently route correlated rows nowhere. */
  def assignShard(df: DataFrame, idExpr: Column, numShards: Int,
                  shardCol: String = "shard"): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    require(!df.columns.contains(shardCol),
      s"assignShard: input already has a '$shardCol' column")
    df.withColumn(shardCol,
      when(idExpr.isNull, raise_error(
        lit("assignShard: null id — the id must be a non-null row identifier")))
        .otherwise(graft.functions.Draws.md5Draw(idExpr, numShards.toLong)))
  }
}
