package graft.sinks

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** CorpusWriter — partitioned, shard-bounded corpus publication. */
class CorpusWriterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmpDir(): Path = Files.createTempDirectory("corpus_writer_spec")

  private def fileNames(root: Path): Seq[Path] =
    Files.walk(root).iterator().asScala.filter(Files.isRegularFile(_)).toSeq

  test("publish lays out Hive partitions, bounds shard size, round-trips") {
    val out = tmpDir().resolve("corpus").toString
    val docs = spark.range(1000).select(
      col("id").as("doc_id"),
      concat(lit("body "), col("id")).as("text"),
      when(col("id") % 10 < 7, "en").otherwise("de").as("lang"))

    CorpusWriter.publish(docs, out, Seq("lang"), Seq(col("doc_id")),
      maxRecordsPerFile = 100L)

    // Hive-style directories per partition value.
    val dirs = Files.list(java.nio.file.Paths.get(out)).iterator().asScala
      .filter(Files.isDirectory(_)).map(_.getFileName.toString).toSet
    assert(dirs == Set("lang=en", "lang=de"))

    // Shard bound: no parquet file holds more than maxRecordsPerFile rows.
    val shardCounts = fileNames(java.nio.file.Paths.get(out))
      .filter(_.toString.endsWith(".parquet"))
      .map(f => spark.read.parquet(f.toString).count())
    assert(shardCounts.nonEmpty && shardCounts.forall(_ <= 100L),
      s"shards exceed bound: $shardCounts")

    // Round-trip: partition column restored from the directory, data intact.
    val back = spark.read.parquet(out)
    assert(back.count() == 1000)
    assert(back.where(col("lang") === "en").count() == 700)
    val got = back.select("doc_id", "text", "lang").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val want = docs.orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.sameElements(want))
  }

  test("readers prune to the selected partition directory") {
    val out = tmpDir().resolve("pruned").toString
    val docs = spark.range(200).select(col("id").as("doc_id"),
      when(col("id") % 2 === 0, "train").otherwise("val").as("split"))
    CorpusWriter.publish(docs, out, Seq("split"), Seq(col("doc_id")))

    val plan = spark.read.parquet(out).where(col("split") === "train")
      .queryExecution.executedPlan.toString
    // Partition filter present and only one directory's files scanned.
    assert(plan.contains("PartitionFilters") && plan.contains("split"),
      s"expected a partition filter on split, plan:\n$plan")
    // (inputFiles reports the UNPRUNED relation's inventory, so the proof
    // of pruning is the plan's PartitionFilters plus the selected count.)
    assert(spark.read.parquet(out).where(col("split") === "train").count() == 100)
  }

  test("publish validates format and partition columns") {
    val docs = spark.range(10).select(col("id"), lit("en").as("lang"))
    intercept[IllegalArgumentException] {
      CorpusWriter.publish(docs, "/tmp/x", Seq("lang"), Seq(col("id")), format = "avro")
    }
    intercept[IllegalArgumentException] {
      CorpusWriter.publish(docs, "/tmp/x", Seq.empty, Seq(col("id")))
    }
    intercept[IllegalArgumentException] {
      CorpusWriter.publish(docs, "/tmp/x", Seq("nope"), Seq(col("id")))
    }
  }
}
