package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":…,"queries":{…}}.
  *
  * A warmup pass over the smallest scale factor runs first (untimed): a
  * single shared JVM otherwise charges all JIT/codegen warmup to whichever
  * query happens to run first, making per-query numbers meaningless.
  * Queries are timed in sorted name order, one action (count) each.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // Tiny-SF bench hygiene: don't wait on locality for 32 threads of
      // local data, and let AQE coalesce the post-shuffle partitions that
      // a fixed count would over-split at this scale.
      .config("spark.locality.wait", "0")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    // ERROR, not WARN: the function-replaced warning from idempotent
    // expression re-registration otherwise lands next to the JSON line and
    // breaks line-oriented parsers.
    spark.sparkContext.setLogLevel("ERROR")

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val warmDir = {
      val d = "/root/testdata/sf0.001"
      if (new java.io.File(d).isDirectory && d != sfDir) d else sfDir
    }
    ordered.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }

    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val total = results.map(_._2).sum
    // The driver captures only the LAST 2000 chars of stdout; a JSON line
    // longer than that loses its head and fails to parse (observed in
    // BENCH_r03.json: tail len 2000, line len 2055). Millisecond precision
    // is plenty for per-query seconds; drop to 2 dp if the line still
    // wouldn't fit.
    def render(dp: Int): String = {
      val qs = results.map { case (k, v) => "\"" + k + "\":" + s"%.${dp}f".formatLocal(java.util.Locale.ROOT, v) }
        .mkString("{", ",", "}")
      val t = s"%.${dp}f".formatLocal(java.util.Locale.ROOT, total)
      s"""{"metric":"total","value":$t,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    }
    val json = { val j3 = render(3); if (j3.length <= 1900) j3 else render(2) }
    // The JSON goes BOTH to stdout (last line, machine-clean — sbt is
    // configured with StdoutOutput so no [info] prefix) and to a known
    // file, so a parser that sees interleaved launcher noise still has an
    // uncontaminated copy.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
    catch { case _: Throwable => () }
    println(json)
    spark.stop()
  }
}
