package graft

import org.apache.spark.scheduler._
import scala.collection.mutable.ArrayBuffer

/** Throwaway diagnostic: prints per-job descriptions for named queries. */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(defaultCpus = "32", logLevel = "ERROR")
    val buf = ArrayBuffer[(Int, String, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = buf.synchronized {
        buf += ((j.jobId,
          String.valueOf(j.properties.getProperty("spark.job.description")).take(110),
          j.stageInfos.length))
      }
    })
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if (args.headOption.contains("cc")) {
      import org.apache.spark.sql.functions._
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val sim = graft.Materialize(dedup.Dedup.simhashHashes(docs, "doc_id", "text"))
      val edges = dedup.Dedup.simhashVerifiedEdgesFromHashes(sim, maxHamming = 3)
        .cache()
      edges.count()
      for (pass <- 1 to 2) {
        buf.synchronized(buf.clear())
        val t0 = System.nanoTime()
        val (labeled, rounds) = operators.Graph.connectedComponentsWithRounds(
          docs.select(col("doc_id")), "doc_id", edges, "id_a", "id_b")
        labeled.count()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(800)
        println(f"=== cc pass=$pass rounds=$rounds jobs=${buf.length} sec=$sec%.2f")
      }
      spark.stop(); return
    }
    for (name <- args; pass <- 1 to 2) {
      buf.synchronized(buf.clear())
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sf).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(800)
      if (pass == 2) {
        println(f"=== $name jobs=${buf.length} sec=$sec%.2f")
        buf.foreach { case (id, d, st) => println(f"job $id%3d stages=$st%2d  $d") }
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
