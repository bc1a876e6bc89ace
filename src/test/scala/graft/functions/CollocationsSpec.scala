package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Collocations — hand-computed pair/unigram counts and integer lift. */
class CollocationsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Corpus: "new york new york", "new day", "san francisco"
  //   pairs: (new,york)=2, (york,new)=1, (new,day)=1, (san,francisco)=1
  //   unigrams: new=3, york=2, day=1, san=1, francisco=1
  private lazy val docs =
    Seq("new york new york", "new day", "san francisco").toDF("text")

  test("pair and unigram counts match hand computation") {
    val pc = Collocations.pairCounts(docs, "text")
      .as[(String, String, Long)].collect()
      .map { case (a, b, n) => ((a, b), n) }.toMap
    assert(pc == Map(
      ("new", "york") -> 2L, ("york", "new") -> 1L,
      ("new", "day") -> 1L, ("san", "francisco") -> 1L))
    val uni = Collocations.unigramCounts(docs, "text")
      .as[(String, Long)].collect().toMap
    assert(uni == Map("new" -> 3L, "york" -> 2L, "day" -> 1L,
      "san" -> 1L, "francisco" -> 1L))
  }

  test("lift is the exact integer floor and ranking is deterministic") {
    val top = Collocations.topCollocations(docs, "text", minCount = 1L, k = 10)
      .as[(String, String, Long, Long)].collect().toSeq
    // lift(san,francisco) = 1e9 // (1*1) = 1e9
    // lift(new,day)       = 1e9 // (3*1) = 333333333
    // lift(new,york)      = 2e9 // (3*2) = 333333333  (tie with new,day)
    // lift(york,new)      = 1e9 // (2*3) = 166666666
    assert(top == Seq(
      ("san", "francisco", 1L, 1000000000L),
      ("new", "day", 1L, 333333333L),
      ("new", "york", 2L, 333333333L),
      ("york", "new", 1L, 166666666L)))
  }

  test("minCount gates rare pairs; one-token docs feed unigrams only") {
    val d2 = Seq("alpha", "beta beta").toDF("text")
    val top = Collocations.topCollocations(d2, "text", minCount = 2L, k = 10)
    assert(top.count() == 0) // (beta,beta) occurs once, below minCount
    val uni = Collocations.unigramCounts(d2, "text").as[(String, Long)].collect().toMap
    assert(uni == Map("alpha" -> 1L, "beta" -> 2L))
  }
}
