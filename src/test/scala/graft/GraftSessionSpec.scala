package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Session defaults live in exactly one place. The r13 verdict found the
  * measured AQE coalesce floor only in Bench's hand-rolled builder — the
  * other five mains silently ran without a conf the bench proved out.
  * These pins make that class of drift impossible to reintroduce. */
class GraftSessionSpec extends AnyFunSuite {

  private def mainSources: Seq[java.nio.file.Path] =
    Files.walk(Paths.get("src/main/scala")).iterator().asScala
      .filter(_.toString.endsWith(".scala")).toSeq

  test("no SparkSession.builder() outside GraftSession in main source") {
    val offenders = mainSources.filter { p =>
      !p.endsWith("GraftSession.scala") &&
        Files.readString(p).contains("SparkSession.builder")
    }
    assert(offenders.isEmpty,
      s"entry points must build sessions via GraftSession.create: $offenders")
  }

  test("sharedConfs carries the full measured/contractual set") {
    val m = GraftSession.sharedConfs.toMap
    assert(m("spark.sql.session.timeZone") == "UTC")
    assert(m("spark.sql.legacy.parquet.nanosAsLong") == "true")
    assert(m("spark.ui.enabled") == "false")
    assert(m("spark.sql.adaptive.enabled") == "true")
    assert(m("spark.sql.adaptive.coalescePartitions.minPartitionSize") == "64k")
    assert(m("spark.locality.wait") == "0")
    assert(m("spark.serializer") ==
      "org.apache.spark.serializer.KryoSerializer")
    // r19: tiny-R non-agg shuffles take the single-file serialized-sort
    // writer, not the R-files-per-map-task bypass writer (measured 2×
    // on the 32-thread shingle cluster; inert at production R > 200).
    assert(m("spark.shuffle.sort.bypassMergeThreshold") == "0")
    // No duplicate keys hiding a lost value.
    assert(GraftSession.sharedConfs.size == m.size)
  }

  test("the shared test session itself runs with the shared confs") {
    val s = SparkTestSession.spark
    GraftSession.sharedConfs.foreach { case (k, v) =>
      assert(s.conf.get(k) == v, s"test session missing shared conf $k=$v")
    }
  }

  test("SPARK_GRAFT_CONF_ env passthrough translates underscores to dots") {
    // applyEnvConfs reads the real environment (can't be injected without
    // widening the API for tests only); assert the translation contract on
    // whatever is present — and that nothing throws on a plain session.
    GraftSession.applyEnvConfs(SparkTestSession.spark)
    sys.env.collect { case (k, v) if k.startsWith("SPARK_GRAFT_CONF_") =>
      val key = k.stripPrefix("SPARK_GRAFT_CONF_").replace("_", ".")
      assert(SparkTestSession.spark.conf.get(key) == v)
    }
  }
}
