package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Counts Spark jobs started by a block, robust to the async listener bus:
  * events already queued by EARLIER work are dispatched to listeners present
  * at dispatch time, so the counter first drains to quiet and resets before
  * running the block, then waits for quiet again before reading the total. */
object JobCounter {
  def jobsDuring(spark: SparkSession)(body: => Unit): Int = {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      quiesce(jobs) // stale pre-registration events drain into this listener
      jobs.set(0)
      body
      quiesce(jobs)
      jobs.get
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  private def quiesce(jobs: java.util.concurrent.atomic.AtomicInteger): Unit = {
    var last = -1; var same = 0; var guard = 0
    while (same < 3 && guard < 100) {
      Thread.sleep(100)
      if (jobs.get == last) same += 1 else { same = 0; last = jobs.get }
      guard += 1
    }
  }
}
