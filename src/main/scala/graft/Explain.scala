package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: prints the formatted physical plan (and optionally runs)
  * named SparkEntry queries. Usage: Explain <sfDir> [--run] [query ...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val run = args.contains("--run")
    val names = args.drop(1).filterNot(_ == "--run")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Pure plan inspection: keep the queries fully lazy so shared-stage
    // materialization (localCheckpoint in q42/q69/q70) neither runs a job
    // at construction time nor collapses its subtree to an ExistingRDD
    // scan. With --run the queries execute with their production shape.
    if (!run) spark.conf.set("graft.materialize", "false")
    val targets = if (names.nonEmpty) names.toSeq else SparkEntry.queries.keys.toSeq.sorted
    targets.foreach { name =>
      println(s"\n========== $name ==========")
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.explain("formatted")
      if (run) {
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
