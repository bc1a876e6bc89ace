package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-Min Sketch: the one-sided error guarantee, the merge law, and the
  * collision behaviour that motivates the width parameter. */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def counts(rows: (String, Long)*): DataFrame =
    rows.toDF("k", "cnt")

  private val vocab: Seq[(String, Long)] =
    (1 to 200).map(i => s"tok$i" -> i.toLong)

  test("estimate is never below the exact count (one-sided error)") {
    val c = counts(vocab: _*)
    val cms = Sketches.cmsTable(c, "k", "cnt", depth = 4, width = 64)
    val est = Sketches.cmsEstimate(cms, c, "k", depth = 4, width = 64)
    val joined = est.join(c, Seq("k"))
      .select($"k", $"est", $"cnt").as[(String, Long, Long)].collect()
    assert(joined.length == 200)
    joined.foreach { case (k, est, exact) =>
      assert(est >= exact, s"$k: est $est < exact $exact")
    }
  }

  test("wide sketch (no collisions) is exact; narrow sketch overcounts") {
    val c = counts(vocab: _*)
    // width 1<<20 over 200 keys: collision probability per seed ~2e-5 per
    // pair; with 4 seeds the min-counter is exact with overwhelming margin.
    val wide = Sketches.cmsEstimate(
      Sketches.cmsTable(c, "k", "cnt", 4, 1 << 20), c, "k", 4, 1 << 20)
    val wideErr = wide.join(c, Seq("k")).where($"est" =!= $"cnt").count()
    assert(wideErr == 0, s"wide sketch had $wideErr inexact estimates")
    // width 8 over 200 keys: every counter is shared ~25 ways — some key
    // MUST overcount (pigeonhole on the totals).
    val narrow = Sketches.cmsEstimate(
      Sketches.cmsTable(c, "k", "cnt", 4, 8), c, "k", 4, 8)
    val over = narrow.join(c, Seq("k")).where($"est" > $"cnt").count()
    assert(over > 0, "narrow sketch produced no overcounts — hashing broken?")
  }

  test("sketches merge by counter addition: sum of shard sketches equals the whole-corpus sketch") {
    val (left, right) = vocab.splitAt(100)
    val whole = Sketches.cmsTable(counts(vocab: _*), "k", "cnt", 3, 32)
    val merged = Sketches.cmsTable(counts(left: _*), "k", "cnt", 3, 32)
      .unionByName(Sketches.cmsTable(counts(right: _*), "k", "cnt", 3, 32))
      .groupBy($"seed", $"bucket").agg(sum($"total").as("total"))
    val diff = whole.join(merged, Seq("seed", "bucket"), "full")
      .where(whole("total") =!= merged("total") ||
        whole("total").isNull || merged("total").isNull)
      .count()
    assert(diff == 0, s"$diff (seed,bucket) counters differ after merge")
  }

  test("bucket hash is deterministic and in range") {
    val b = counts(vocab: _*)
      .select(Sketches.cmsBucket($"k", seed = 7, width = 1024).as("b"))
      .as[Long].collect()
    assert(b.forall(x => x >= 0 && x < 1024))
    val again = counts(vocab: _*)
      .select(Sketches.cmsBucket($"k", seed = 7, width = 1024).as("b"))
      .as[Long].collect()
    assert(b.toSeq == again.toSeq)
  }

  test("probe key absent from the corpus estimates 0, not min-over-present") {
    val c = counts(vocab: _*)
    val cms = Sketches.cmsTable(c, "k", "cnt", depth = 4, width = 1 << 20)
    // At width 2^20 with 200 keys, an absent probe's 4 cells are untouched
    // with overwhelming probability — the estimate must be the implicit-0
    // cells' 0, not the min over whatever cells happen to exist.
    val absent = counts("never-seen-token" -> 0L).select($"k")
    val est = Sketches.cmsEstimate(cms, absent, "k", depth = 4, width = 1 << 20)
      .select($"est").as[Long].collect()
    assert(est.toSeq == Seq(0L), s"absent probe estimated ${est.toSeq}")
    // Present keys are unaffected by the guard (all depth cells exist).
    val present = Sketches.cmsEstimate(cms, c, "k", 4, 1 << 20)
      .join(c, Seq("k")).where($"est" =!= $"cnt").count()
    assert(present == 0)
  }

  test("duplicate probe keys are deduplicated, not poisoned to 0") {
    val c = counts(vocab: _*)
    val cms = Sketches.cmsTable(c, "k", "cnt", depth = 4, width = 1 << 20)
    // A key probed twice used to join 2*depth cells and trip the
    // cells==depth guard into a spurious 0 estimate. The estimate must be
    // the key's true count, reported once.
    val dup = counts("tok42" -> 0L, "tok42" -> 0L).select($"k")
    val est = Sketches.cmsEstimate(cms, dup, "k", depth = 4, width = 1 << 20)
      .select($"k", $"est").as[(String, Long)].collect()
    assert(est.toSeq == Seq(("tok42", 42L)), s"got ${est.toSeq}")
  }

  test("degenerate dimensions are rejected") {
    val c = counts("a" -> 1L)
    intercept[IllegalArgumentException] {
      Sketches.cmsTable(c, "k", "cnt", depth = 0, width = 64)
    }
    intercept[IllegalArgumentException] {
      Sketches.cmsTable(c, "k", "cnt", depth = 4, width = 1)
    }
  }
}
