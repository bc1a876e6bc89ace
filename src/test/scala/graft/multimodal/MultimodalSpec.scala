package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.functions.TextOps

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("payload plumbing: binary column + byte length") {
    val df = Multimodal.withPayload(Seq((1L, "abc"), (2L, "ab€")).toDF("id", "src"), "src")
    val rows = df.select("id", "byte_len").as[(Long, Int)].collect().toMap
    assert(rows(1L) == 3 && rows(2L) == 5) // € is 3 bytes in UTF-8
    assert(df.schema("payload").dataType.typeName == "binary")
  }

  test("decodeMeta: partition-wise stub decode is deterministic and schema-stable") {
    val df = Multimodal.withPayload(
      Seq((1L, "hello world"), (2L, "another payload")).toDF("id", "src"), "src")
    val out = Multimodal.decodeMeta(spark, df)
    assert(Seq("width", "height", "channels", "n_frames")
      .forall(out.columns.contains))
    val a = out.orderBy("id").select("width", "height", "channels", "n_frames")
      .as[(Int, Int, Int, Int)].collect().toSeq
    val b = Multimodal.decodeMeta(spark, df).orderBy("id")
      .select("width", "height", "channels", "n_frames")
      .as[(Int, Int, Int, Int)].collect().toSeq
    assert(a == b)                      // deterministic fake codec
    assert(a.forall(r => r._1 >= 64 && r._2 >= 64 && r._3 == 3 && r._4 >= 1))
    // identical payloads decode identically; different payloads may differ
    val same = Multimodal.decodeMeta(spark,
      Multimodal.withPayload(Seq((1L, "x"), (2L, "x")).toDF("id", "src"), "src"))
      .select("width").as[Int].collect().toSet
    assert(same.size == 1)
  }

  test("langId picks the language whose markers dominate") {
    val df = Seq(
      (1L, "the cat sat on a mat full of the best wool"),
      (2L, "der hund und die katze und der vogel"),
      (3L, "el perro que ladra y los gatos que corren")
    ).toDF("id", "text")
    val preds = df.select(col("id"), TextOps.langId(col("text")).as("p"))
      .as[(Long, String)].collect().toMap
    assert(preds(1L) == "en")
    assert(preds(2L) == "de")
    assert(preds(3L) == "es")
  }
}
