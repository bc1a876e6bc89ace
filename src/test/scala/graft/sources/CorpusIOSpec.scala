package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestSession, Tables}

class CorpusIOSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("jsonl ingest: explicit schema, corrupt lines quarantined not dropped") {
    val dir = Files.createTempDirectory("jsonl")
    val f = dir.resolve("docs.jsonl")
    Files.writeString(f,
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11}
        |{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "web", "n_chars": 7}
        |{not valid json at all
        |{"doc_id": 3, "text": "ok", "lang": "en", "source": "book", "n_chars": 2}
        |""".stripMargin)
    val docs = CorpusIO.readJsonlDocs(spark, f.toString).cache()
    val clean = CorpusIO.cleanDocs(docs)
    assert(clean.count() == 3)
    assert(clean.columns.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    assert(clean.where($"doc_id" === 1).select("text").as[String].head() == "hello world")
    val bad = CorpusIO.corruptLines(docs)
      .as[(String, Option[Long])].collect()
    assert(bad.map(_._1).toSeq == Seq("{not valid json at all"))
  }

  test("orc round-trip preserves rows and pushes predicates to the scan") {
    val docs = Tables.load(spark, SparkTestSession.sf, "documents")
    val out = Files.createTempDirectory("orc").toString + "/docs"
    CorpusIO.writeOrc(docs, out)
    val back = CorpusIO.readOrc(spark, out)
    assert(back.count() == docs.count())
    val filtered = back.where($"doc_id" < 10).select("doc_id", "lang")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("doc_id"), plan)
    assert(filtered.count() == docs.where($"doc_id" < 10).count())
  }
}
