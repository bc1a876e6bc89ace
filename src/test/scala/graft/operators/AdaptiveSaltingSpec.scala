package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The measured-skew salting loop: Salting.profileGroups →
  * Salting.adviseSalts → WindowOps.topKPerGroupAdaptive. Load-bearing
  * properties: (1) the 90 %-hot-key fixture advises a salt factor > 1 and
  * the uniform many-group fixture advises plain (1); (2) the adaptive rank
  * is output-identical to the plain window on BOTH fixtures (salting is a
  * plan decision, never a semantics decision); (3) the advice arithmetic
  * is exact on its edges (empty input, single group, cap at parallelism).
  */
class AdaptiveSaltingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** 90 % of rows on one key, the rest spread over 10 cold keys. */
  private lazy val hotSkew = spark.range(10000).select(
    when(col("id") < 9000, lit("hot")).otherwise(concat(lit("cold"), col("id") % 10)).as("k"),
    (xxhash64(col("id")) % 100000).as("v"),
    col("id"))

  /** 64 groups of ~identical size — no group exceeds a task share. */
  private lazy val uniform = spark.range(10000).select(
    (col("id") % 64).cast("string").as("k"),
    (xxhash64(col("id")) % 100000).as("v"),
    col("id"))

  test("profile + advice: hot-key fixture salts, uniform fixture stays plain") {
    val par = spark.sparkContext.defaultParallelism
    val hotProfile = Salting.profileGroups(hotSkew, Seq(col("k")))
    assert(hotProfile == Salting.SkewProfile(11L, 10000L, 9000L))
    val hotSalts = Salting.adviseSalts(hotProfile, par)
    assert(hotSalts > 1 && hotSalts <= par,
      s"90%-hot-key fixture must salt (advised $hotSalts of $par)")
    val uniProfile = Salting.profileGroups(uniform, Seq(col("k")))
    assert(uniProfile.nGroups == 64L && uniProfile.nRows == 10000L)
    assert(Salting.adviseSalts(uniProfile, par) == 1,
      "uniform many-group fixture must rank plain")
  }

  test("adviseSalts edges: empty, one-group-is-everything, parallelism cap") {
    assert(Salting.adviseSalts(Salting.SkewProfile(0, 0, 0), 32) == 1)
    // One group holding every row spans all fair shares -> full parallelism.
    assert(Salting.adviseSalts(Salting.SkewProfile(1, 1000, 1000), 32) == 32)
    // Advice never exceeds the parallelism even for absurd profiles.
    assert(Salting.adviseSalts(Salting.SkewProfile(1, 10, 10), 4) == 4)
    intercept[IllegalArgumentException](
      Salting.adviseSalts(Salting.SkewProfile(1, 1, 1), 0))
  }

  test("adaptive rank output-identical to the plain window on both fixtures") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k", "rank").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    Seq(hotSkew, uniform).foreach { fx =>
      val order = Seq(col("v").desc, col("id")) // unique tiebreak: total order
      val plain = canon(WindowOps.topKPerGroup(fx, Seq(col("k")), order, 7)
        .select(col("k"), col("v"), col("id"), col("rank")))
      val adaptive = canon(WindowOps.topKPerGroupAdaptive(fx, Seq(col("k")), order, 7)
        .select(col("k"), col("v"), col("id"), col("rank")))
      assert(adaptive == plain)
      assert(plain.nonEmpty)
    }
  }
}
