package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** ScanOps — per-key and global EWMA scans vs a single-threaded reference
  * fold. The per-key path must be BIT-exact (it is the oracle currency);
  * the global segmented scan is allowed ~1e-12 relative drift from its
  * driver-side affine composition.
  */
class ScanOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference fold: y_0 = x_0; y_i = (1-a)*y_{i-1} + a*x_i. */
  private def refEwma(xs: Seq[Double], alpha: Double): Seq[Double] = {
    val c = 1.0 - alpha
    xs.scanLeft(Double.NaN) {
      case (y, x) if y.isNaN => x
      case (y, x)            => c * y + alpha * x
    }.drop(1)
  }

  /** Deterministic pseudo-series: keyed, shuffled insertion order. */
  private def mkRows(n: Int, keys: Int): Seq[(String, Long, Double)] =
    (0 until n).map { i =>
      val k = s"k${i % keys}"
      // reversed-ish order so the operator's sort is actually exercised
      (k, ((i * 7919) % n).toLong * 10 + (i % keys), math.sin(i) * 100 + i % 13)
    }

  test("ewmaPerKey is bit-exact vs the reference fold, per key") {
    val rows = mkRows(600, 5)
    val df = rows.toDF("k", "seq", "x")
    val got = ScanOps.ewmaPerKey(df, Seq("k"), Seq("seq"), col("x"), 0.3, "x", "ewma")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .groupBy(_._1)

    val want = rows.groupBy(_._1).map { case (k, rs) =>
      val sorted = rs.sortBy(_._2)
      k -> (sorted.map(_._2), refEwma(sorted.map(_._3), 0.3))
    }

    assert(got.keySet == want.keySet)
    for ((k, g) <- got) {
      val gs = g.sortBy(_._2)
      val (wantSeq, wantEwma) = want(k)
      assert(gs.map(_._2).toSeq == wantSeq, s"order mismatch for $k")
      // bit-exact: same sequential fold, same doubles
      assert(gs.map(_._4).toSeq == wantEwma, s"ewma mismatch for $k")
    }
  }

  test("ewmaPerKey handles a single-row series and preserves row count") {
    val df = Seq(("a", 1L, 5.0), ("b", 1L, 7.0), ("b", 2L, 9.0)).toDF("k", "seq", "x")
    val got = ScanOps.ewmaPerKey(df, Seq("k"), Seq("seq"), col("x"), 0.5, "x", "e")
      .orderBy("k", "seq").collect()
    assert(got.length == 3)
    assert(got(0).getDouble(3) == 5.0)          // y_0 = x_0
    assert(got(1).getDouble(3) == 7.0)
    assert(got(2).getDouble(3) == 0.5 * 7.0 + 0.5 * 9.0)
  }

  test("ewmaGlobal matches the reference fold within 1e-12 relative across partitions") {
    val n = 50000
    val xs = (0 until n).map(i => math.cos(i * 0.01) * 50 + (i % 97))
    val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("seq", "x")
    // 8 partitions so the driver-side composition actually chains state
    val got = ScanOps.ewmaGlobal(df, Seq("seq"), col("x"), 0.1, "x", "ewma",
        numPartitions = 8)
      .orderBy("seq").collect().map(_.getDouble(2))
    val want = refEwma(xs, 0.1)
    assert(got.length == n)
    var i = 0
    while (i < n) {
      val denom = math.max(1.0, math.abs(want(i)))
      assert(math.abs(got(i) - want(i)) / denom < 1e-12,
        s"row $i: got ${got(i)}, want ${want(i)}")
      i += 1
    }
  }

  test("ewmaGlobal on an empty frame returns an empty frame") {
    val df = Seq.empty[(Long, Double)].toDF("seq", "x")
    assert(ScanOps.ewmaGlobal(df, Seq("seq"), col("x"), 0.2, "x", "e", 4).count() == 0)
  }

  test("ewmaPerKey and ewmaGlobal agree on a single-key series") {
    // Cross-path check: the in-row fold and the segmented scan are
    // independent implementations of the same recurrence; on one key they
    // must agree to float tolerance (the segmented scan's driver-side
    // affine composition reorders ops, so not bitwise).
    val n = 5000
    val rows = (0 until n).map(i => (1L, i.toLong, math.sin(i * 0.1) * 10 + i % 7))
    val df = rows.toDF("k", "seq", "x")
    val perKey = ScanOps.ewmaPerKey(df, Seq("k"), Seq("seq"), col("x"), 0.2, "x", "e")
      .orderBy("seq").collect().map(_.getDouble(3))
    val global = ScanOps.ewmaGlobal(df.select(col("seq"), col("x")),
        Seq("seq"), col("x"), 0.2, "x", "e", numPartitions = 6)
      .orderBy("seq").collect().map(_.getDouble(2))
    assert(perKey.length == n && global.length == n)
    perKey.zip(global).zipWithIndex.foreach { case ((a, b), i) =>
      assert(math.abs(a - b) / math.max(1.0, math.abs(a)) < 1e-12,
        s"row $i: perKey $a vs global $b")
    }
  }

  test("alpha is validated") {
    val df = Seq((1L, 1.0)).toDF("seq", "x")
    intercept[IllegalArgumentException] {
      ScanOps.ewmaPerKey(df, Seq("seq"), Seq("seq"), col("x"), 0.0, "x", "e")
    }
    intercept[IllegalArgumentException] {
      ScanOps.ewmaGlobal(df, Seq("seq"), col("x"), 1.5, "x", "e")
    }
  }
}
