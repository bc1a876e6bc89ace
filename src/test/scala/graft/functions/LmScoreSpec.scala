package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class LmScoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hand-computed tiny model: smoothed probabilities exact") {
    // Corpus "x y x": bigrams (x,y), (y,x); c12 = 1 each; history counts
    // c(x·)=1, c(y·)=1; V=2. P = (1+1)/(1+2) = 2/3 for both bigrams, so
    // avg_nll_micro = floor(-ln(2/3)·1e6) (both per-bigram terms equal).
    val docs = Seq((0L, "x y x")).toDF("doc_id", "text")
    val out = LmScore.bigramNll(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect()
    assert(out.length == 1)
    val (_, n, nll) = out.head
    assert(n == 2)
    assert(nll == math.floor(-math.log(2.0 / 3.0) * 1e6).toLong, nll)
  }

  test("fluent repetition scores lower NLL than unique-bigram gibberish") {
    val docs = Seq(
      (0L, "a b a b a b a b a b a b a b a b"),
      (1L, "q w e r t y u i o p z x c v m n")
    ).toDF("doc_id", "text")
    val nll = LmScore.bigramNll(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(nll(0L) < nll(1L), nll)
  }

  test("documents with fewer than two tokens are absent from the output") {
    val docs = Seq((0L, "single"), (1L, ""), (2L, "two tokens"))
      .toDF("doc_id", "text")
    val ids = LmScore.bigramNll(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(2L))
  }
}
