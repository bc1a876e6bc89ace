package graft.dedup

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** pairCountsByBitmask — the tiny-id-space (≤63 values) pair core whose
  * corpus exchange carries 8-byte bit_or masks instead of posting arrays.
  * Load-bearing properties: (1) output identical to boundedPairCounts on
  * the same postings (same df band, same in-aggregate (id, key) dedupe,
  * same id_a < id_b orientation); (2) keys outside [2, maxDocFreq]
  * distinct ids contribute nothing; (3) an id missing from the caller's
  * list RAISES instead of silently skewing counts. */
class PairCountsBitmaskSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val ids = Seq("web", "code", "books", "wiki", "forums")

  /** Postings over 5 sources: key k is shared by sources with index
    * i <= k % 6 (so df ranges 1..5), plus duplicate postings and a hot key
    * shared by everyone repeated many times. */
  private lazy val postings = {
    val base = for (k <- 0L until 300L; i <- ids.indices if i <= k % 6)
      yield (ids(i.toInt), k)
    val dups = base.take(50) // duplicate (id, key) postings must not double-count
    val hot = for (i <- ids.indices; r <- 0 until 4) yield (ids(i), 9999L)
    (base ++ dups ++ hot).toDF("id", "sh")
  }

  test("identical to boundedPairCounts across df caps") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id_a", "id_b").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    Seq(2L, 3L, 5L).foreach { cap =>
      val want = canon(Dedup.boundedPairCounts(postings, "sh", "id", cap))
      val got = canon(Dedup.pairCountsByBitmask(postings, "sh", "id", ids, cap))
      assert(got == want, s"maxDocFreq=$cap")
      assert(got.nonEmpty, s"degenerate fixture at maxDocFreq=$cap")
    }
  }

  test("id order follows the sorted id list (id_a < id_b)") {
    val got = Dedup.pairCountsByBitmask(postings, "sh", "id", ids, 5L).collect()
    got.foreach(r => assert(r.getString(0) < r.getString(1), r.toString))
  }

  test("an id outside the provided list raises") {
    val bad = postings.unionByName(Seq(("martian", 1L)).toDF("id", "sh"))
    val e = intercept[Exception] {
      Dedup.pairCountsByBitmask(bad, "sh", "id", ids, 5L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => String.valueOf(x.getMessage) +: messages(x.getCause))
    assert(e.isInstanceOf[SparkException] || e.isInstanceOf[RuntimeException])
    assert(messages(e).exists(_.contains("pairCountsByBitmask")), messages(e).toString)
  }

  test("rejects oversized or duplicate id lists") {
    intercept[IllegalArgumentException] {
      Dedup.pairCountsByBitmask(postings, "sh", "id", (1 to 64).map("s" + _), 5L)
    }
    intercept[IllegalArgumentException] {
      Dedup.pairCountsByBitmask(postings, "sh", "id", Seq("a", "a"), 5L)
    }
  }
}
