package graft.operators

import java.nio.file.Files
import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The regime dispatch contract: new-table batches route by the measured
  * key-cardinality law (bulk → full rewrite, trickle → bucketed), an
  * existing table's layout is sticky whatever later batches look like,
  * and the merged data is identical through either route. */
class UpsertRouterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val N = 32

  test("regime law: E[touched] ≤ N/3 routes bucketed, beyond routes full") {
    // k = 1 key touches 1 bucket; k = N·ln(3)/1 ≈ 0.4N is the ~N/3 knee.
    assert(UpsertRouter.decideByKeys(1, N) == UpsertRouter.Bucketed)
    assert(UpsertRouter.decideByKeys(5, N) == UpsertRouter.Bucketed)
    assert(UpsertRouter.decideByKeys(N * 10L, N) == UpsertRouter.FullRewrite)
    assert(UpsertRouter.decideByKeys(30000, N) == UpsertRouter.FullRewrite)
    // Monotone: once a k routes full, every larger k does too.
    val knee = (1L to 200L).span(k => UpsertRouter.decideByKeys(k, N) ==
      UpsertRouter.Bucketed)
    assert(knee._2.forall(k =>
      UpsertRouter.decideByKeys(k, N) == UpsertRouter.FullRewrite))
  }

  test("bulk first batch routes full-rewrite; trickle routes bucketed") {
    val bulkDir = Files.createTempDirectory("router-bulk").toString
    val bulk = (1L to 30000L).map(k => (k, k * 2.0)).toDF("k", "v")
    assert(UpsertRouter.upsertAuto(spark, bulk, bulkDir, Seq("k"), N) ==
      UpsertRouter.FullRewrite)
    assert(UpsertRouter.existingRoute(bulkDir).contains(UpsertRouter.FullRewrite))
    assert(UpsertRouter.read(spark, bulkDir).get.count() == 30000L)

    val trickleDir = Files.createTempDirectory("router-trickle").toString
    val trickle = Seq((7L, 1.0), (8L, 2.0)).toDF("k", "v")
    assert(UpsertRouter.upsertAuto(spark, trickle, trickleDir, Seq("k"), N) ==
      UpsertRouter.Bucketed)
    assert(UpsertRouter.existingRoute(trickleDir).contains(UpsertRouter.Bucketed))
    assert(UpsertRouter.read(spark, trickleDir).get.count() == 2L)
  }

  test("layout is sticky: a bulk batch into a bucketed table stays bucketed") {
    val dir = Files.createTempDirectory("router-sticky").toString
    val seed = Seq((1L, 1.0)).toDF("k", "v")
    assert(UpsertRouter.upsertAuto(spark, seed, dir, Seq("k"), N) ==
      UpsertRouter.Bucketed)
    // A bulk batch would route FullRewrite on a fresh table — but this
    // table is already bucketed, so the dispatch must follow the layout.
    val bulk = (1L to 5000L).map(k => (k, k * 3.0)).toDF("k", "v")
    assert(UpsertRouter.upsertAuto(spark, bulk, dir, Seq("k"), N) ==
      UpsertRouter.Bucketed)
    val got = UpsertRouter.read(spark, dir).get
    assert(got.count() == 5000L)
    assert(got.where($"k" === 1L).select("v").as[Double].head() == 3.0)
  }

  test("layoutHint pins a new table's layout against the first batch's shape") {
    val dir = Files.createTempDirectory("router-hint").toString
    // Classic warehouse shape: bulk seed, then a trickle stream. The hint
    // keeps the seed from baking in the full-rewrite layout.
    val seed = (1L to 30000L).map(k => (k, k * 1.0)).toDF("k", "v")
    assert(UpsertRouter.upsertAuto(spark, seed, dir, Seq("k"), N,
      layoutHint = Some(UpsertRouter.Bucketed)) == UpsertRouter.Bucketed)
    val trickle = Seq((42L, -1.0)).toDF("k", "v")
    assert(UpsertRouter.upsertAuto(spark, trickle, dir, Seq("k"), N) ==
      UpsertRouter.Bucketed)
    val got = UpsertRouter.read(spark, dir).get
    assert(got.count() == 30000L)
    assert(got.where($"k" === 42L).select("v").as[Double].head() == -1.0)
  }

  test("identical merge semantics through either route (last-write-wins, idempotent)") {
    val dirs = Seq(UpsertRouter.Bucketed, UpsertRouter.FullRewrite).map { r =>
      val d = Files.createTempDirectory(s"router-sem-$r").toString
      val b1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      val b2 = Seq((2L, "B"), (3L, "c")).toDF("k", "v")
      UpsertRouter.upsertAuto(spark, b1, d, Seq("k"), N, layoutHint = Some(r))
      UpsertRouter.upsertAuto(spark, b2, d, Seq("k"), N)
      UpsertRouter.upsertAuto(spark, b2, d, Seq("k"), N) // replay: idempotent
      r -> UpsertRouter.read(spark, d).get
        .orderBy("k").as[(Long, String)].collect().toSeq
    }
    val want = Seq((1L, "a"), (2L, "B"), (3L, "c"))
    dirs.foreach { case (r, got) => assert(got == want, s"route $r diverged") }
  }
}
