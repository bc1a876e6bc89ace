package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def comps(nodes: Seq[Long], edges: Seq[(Long, Long)],
                    maxIters: Int = 30): Map[Long, Long] = {
    val n = nodes.toDF("id")
    val e = edges.toDF("src", "dst")
    Graph.connectedComponents(n, "id", e, "src", "dst", maxIters)
      .as[(Long, Long)].collect().toMap
  }

  /** Driver-side union-find oracle over the same fixture. */
  private def unionFind(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) => parent(find(a)) = find(b) }
    nodes.map(n => n -> nodes.filter(m => find(m) == find(n)).min).toMap
  }

  test("chain graph collapses to one component labeled by its min id") {
    // 1-2, 2-3, 3-4: diameter 3 forces several contraction rounds.
    val m = comps(Seq(1L, 2L, 3L, 4L), Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("disjoint components and isolated nodes keep separate labels") {
    val m = comps(Seq(1L, 2L, 3L, 4L, 5L, 9L), Seq((2L, 1L), (4L, 5L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 4L, 9L -> 9L))
  }

  test("edge direction is ignored and edge-only endpoints join the node set") {
    // node list omits 7; the (7,2) edge must still pull it into 1's component
    val m = comps(Seq(1L, 2L), Seq((7L, 2L), (2L, 1L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 7L -> 1L))
  }

  test("matches brute-force union-find on random-ish fixtures") {
    // Several deterministic pseudo-random shapes: sparse, dense, self-loops,
    // duplicate edges — each checked against the driver-side oracle.
    for (seed <- 1 to 4) {
      val n = 20 + seed * 7
      val nodes = (0L until n.toLong).toSeq
      val edges = (0 until n + seed * 9).map { i =>
        val a = (i * 7L + seed) % n; val b = (i * 13L + 5L * seed) % n; (a, b)
      }.filter { case (a, b) => a != b } ++ Seq((3L, 3L), (1L, 2L), (2L, 1L))
      assert(comps(nodes, edges) == unionFind(nodes, edges), s"seed=$seed")
    }
  }

  test("adversarial contraction shapes match union-find") {
    // Shapes that stress large-star vs small-star differently: two stars
    // merged at the roots, two stars merged at leaves, complete bipartite,
    // heavy parallel/duplicate edges.
    val rootJoin = (1L to 10L).map((0L, _)) ++ (21L to 30L).map((20L, _)) :+ (0L, 20L)
    val leafJoin = (1L to 10L).map((0L, _)) ++ (21L to 30L).map((20L, _)) :+ (10L, 30L)
    val bipartite = for (a <- 0L to 4L; b <- 10L to 14L) yield (a, b)
    val dup = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (2L, 3L), (3L, 1L))
    for ((edges, name) <- Seq((rootJoin, "rootJoin"), (leafJoin, "leafJoin"),
        (bipartite.toSeq, "bipartite"), (dup, "dup"))) {
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      assert(comps(nodes, edges) == unionFind(nodes, edges), name)
    }
  }

  test("non-contiguous 40-bit ids resolve correctly") {
    val big = 1L << 40
    val nodes = Seq(0L, 7L, big, big + 3, big * 2)
    val edges = Seq((big, 7L), (big + 3, big), (0L, big * 2))
    val m = comps(nodes, edges)
    assert(m == Map(0L -> 0L, (big * 2) -> 0L,
      7L -> 7L, big -> 7L, (big + 3) -> 7L))
  }

  test("matches union-find on a larger mixed-shape graph") {
    // One fixture mixing the hard shapes: a long path (deep diameter), a
    // star (high degree), dense cliquish clusters, isolated nodes, and
    // cross-links — against the driver-side union-find oracle.
    val n = 400
    val nodes = (0L until n.toLong).toSeq
    val path = (0L until 120L).map(i => (i, i + 1))
    val star = (200L until 260L).map(i => (150L, i))
    val dense = for (i <- 300 until 330; j <- i + 1 to (i + 3).min(329))
      yield (i.toLong, j.toLong)
    val cross = (0 until 40).map { i =>
      val a = (i * 97L + 13L) % n; val b = (i * 31L + 7L) % n; (a, b)
    }.filter { case (a, b) => a != b }
    val edges = path ++ star ++ dense ++ cross
    assert(comps(nodes, edges) == unionFind(nodes, edges))
  }

  test("2000-node random graph matches union-find") {
    // Sparse-ish random graph (below the giant-component threshold, so many
    // mid-sized components of varying shape survive) — the closest the spec
    // gets to production structure.
    val n = 2000
    val nodes = (0L until n.toLong).toSeq
    val edges = (0 until 2200).map { i =>
      val a = (i * 1103515245L + 12345L) % n
      val b = (i * 69069L + 1L) % n
      (a, b)
    }.filter { case (a, b) => a != b }
    assert(comps(nodes, edges) == unionFind(nodes, edges))
  }

  test("long chain converges in O(log n) contraction rounds") {
    // A 64-node path has diameter 63: per-diameter min-label propagation
    // would need 63 rounds; star contraction needs ~log₂ 64. Asserted on
    // the ROUND count the loop itself reports — Spark job counts per round
    // are an AQE staging detail that shifts across versions.
    val nodes = (0L until 64L).toDF("id")
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("src", "dst")
    val (labels, rounds) = Graph.connectedComponentsWithRounds(
      nodes, "id", edges, "src", "dst")
    assert(labels.as[(Long, Long)].collect().toMap.values.toSet == Set(0L))
    assert(rounds <= 10,
      s"expected O(log n) contraction rounds for a 64-chain, ran $rounds")
  }

  test("giant-degree node: no single task streams the whole hot neighborhood") {
    // The dedup degeneracy: one root adjacent to half the edge set (a star
    // of identical documents). A window-based neighborhood min would pull
    // every hot-node edge into ONE unsplittable task; the hot/cold min join
    // must instead resolve the hub via broadcast so its edges never
    // concentrate on a reducer. hotDegree is lowered to make the 40k-degree
    // hub "hot" at test scale.
    val hub = 40000
    val nodes = (0L until (hub + 100).toLong).toDF("id")
    val star = (1 to hub).map(i => (0L, i.toLong))
    val tail = (0 until 99).map(i => (hub + 1 + i.toLong, hub + 2 + i.toLong))
    val edges = (star ++ tail).toDF("src", "dst")
    val maxTask = new java.util.concurrent.atomic.AtomicLong
    val perStage = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val stageNames = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val rec = Option(t.taskMetrics).map(_.shuffleReadMetrics.recordsRead).getOrElse(0L)
        perStage.merge(t.stageId, rec, (a: Long, b: Long) => math.max(a, b))
        maxTask.getAndUpdate(m => math.max(m, rec)); ()
      }
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stageNames.put(s.stageInfo.stageId, s.stageInfo.name); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // The input distinct and the final label derivation run on the CALLER
    // session; lower its coalescing floors too, for the same test-scale
    // reason (their keys — (src,dst) pairs and node ids — are hash-spread,
    // so any big task there would be a coalescing artifact, not skew).
    val callerConfs = Seq(
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB")
    val prev = callerConfs.map { case (k, _) => k -> spark.conf.getOption(k) }
    callerConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val (labels, _) = Graph.connectedComponentsWithRounds(
        nodes, "id", edges, "src", "dst", maxIters = 30,
        loopConfs = Map(
          "spark.sql.shuffle.partitions" -> "16",
          // Keep the loop's manual round-sizing from folding the tiny
          // fixture into one partition (which would read as a giant task
          // without any hot key being at fault).
          "spark.graft.cc.rowsPerPartition" -> "4000"),
        hotDegree = 1000L)
      val m = labels.as[(Long, Long)].collect().toMap
      assert((0 to hub).forall(i => m(i.toLong) == 0L))
      assert((hub + 1 to hub + 100).forall(i => m(i.toLong) == hub + 1L))
      // Hot neighborhood is ~2×hub rows once symmetrized; a window-min (or
      // unsplit shuffle-join) implementation reads all of them in one task.
      // With the hub resolved by broadcast, no reducer task should come
      // close to hub-sized reads.
      import scala.jdk.CollectionConverters._
      val breakdown = perStage.asScala.toSeq.sortBy(-_._2).take(8)
        .map { case (sid, rec) => s"stage $sid (${stageNames.getOrDefault(sid, "?")}): $rec" }
        .mkString("\n  ")
      assert(maxTask.get < hub,
        s"one task shuffle-read ${maxTask.get} rows — hot neighborhood " +
          s"(~${2 * hub} rows symmetrized) was not split; top stages:\n  $breakdown")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("contraction never mutates the caller session's SQL confs") {
    // The loop plans on an isolated child session; a concurrent query on
    // the CALLER's session must see unchanged confs and keep planning
    // adaptively while the loop iterates.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val partsBefore = spark.conf.get("spark.sql.shuffle.partitions")
    val nodes = (0L until 4096L).toDF("id")
    val edges = (0L until 4095L).map(i => (i, i + 1)).toDF("src", "dst")
    val fut = Future {
      Graph.connectedComponents(nodes, "id", edges, "src", "dst")
        .agg(min(col("comp"))).first().getLong(0)
    }
    var polls = 0
    while (!fut.isCompleted && polls < 200) {
      assert(spark.conf.get("spark.sql.adaptive.enabled", "true") == aqeBefore)
      assert(spark.conf.get("spark.sql.shuffle.partitions") == partsBefore)
      polls += 1
      Thread.sleep(10)
    }
    // A caller-session aggregation planned mid-loop still uses AQE and the
    // caller's partition count.
    val concurrent = spark.range(1000).groupBy((col("id") % 7).as("k")).count()
    assert(concurrent.queryExecution.executedPlan.toString
      .contains("AdaptiveSparkPlan"))
    assert(Await.result(fut, 4.minutes) == 0L)
    assert(spark.conf.get("spark.sql.adaptive.enabled", "true") == aqeBefore)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == partsBefore)
  }

  test("rounds reliably checkpoint when a checkpoint dir is configured") {
    // Cluster fault-tolerance path: with sparkContext.setCheckpointDir set,
    // each contraction round writes a recoverable checkpoint (from cache,
    // no recompute) — results identical, checkpoint files present.
    val dir = java.nio.file.Files.createTempDirectory("cc-ckpt").toString
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty, "test expects no prior checkpoint dir")
    sc.setCheckpointDir(dir)
    try {
      val m = comps(Seq(1L, 2L, 3L, 4L), Seq((1L, 2L), (2L, 3L), (3L, 4L)))
      assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(files > 0, s"expected checkpoint files under $dir")
    } finally {
      // SparkContext has no public unset — clear the private[spark] var via
      // its generated setter so later suites keep the persist-only path
      // (their job-count assertions budget no checkpoint jobs).
      sc.getClass.getMethod("checkpointDir_$eq", classOf[Option[_]])
        .invoke(sc, None)
      assert(sc.getCheckpointDir.isEmpty)
    }
  }

  test("catalyst-round engine (forced via threshold 0) matches union-find") {
    // The dispatcher picks the Catalyst rounds above
    // spark.graft.cc.catalystRoundsMinEdges (measured initial edge count);
    // forcing the threshold to 0 runs the large-regime engine on the spec
    // fixtures so both engines stay pinned to the same algebra.
    val force = Map("spark.graft.cc.catalystRoundsMinEdges" -> "0")
    for (seed <- 1 to 3) {
      val n = 20 + seed * 7
      val nodes = (0L until n.toLong).toSeq
      val edges = (0 until n + seed * 9).map { i =>
        val a = (i * 7L + seed) % n; val b = (i * 13L + 5L * seed) % n; (a, b)
      }.filter { case (a, b) => a != b } ++ Seq((1L, 2L), (2L, 1L))
      val got = Graph.connectedComponentsWithRounds(
          nodes.toDF("id"), "id", edges.toDF("src", "dst"), "src", "dst",
          loopConfs = force)._1
        .as[(Long, Long)].collect().toMap
      assert(got == unionFind(nodes, edges), s"seed=$seed")
    }
    // A long chain exercises multi-pair convergence through the Catalyst
    // engine specifically (rounds > 2).
    val nodes = (0L until 64L).toSeq
    val edges = (0L until 63L).map(i => (i, i + 1))
    val (labels, rounds) = Graph.connectedComponentsWithRounds(
      nodes.toDF("id"), "id", edges.toDF("src", "dst"), "src", "dst",
      loopConfs = force)
    assert(labels.as[(Long, Long)].collect().toMap.values.toSet == Set(0L))
    assert(rounds > 2 && rounds <= 10)
  }

  test("iteration exhaustion throws instead of returning wrong labels") {
    // A 40-node path cannot converge in 1 round; the old implementation
    // silently returned non-component labels here.
    val nodes = (0L until 40L).toSeq
    val edges = (0L until 39L).map(i => (i, i + 1))
    val ex = intercept[IllegalStateException] {
      comps(nodes, edges, maxIters = 1)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("already-star input converges immediately") {
    val m = comps(Seq(1L, 2L, 3L, 4L), Seq((1L, 2L), (1L, 3L), (1L, 4L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  // ------------------------------------------------------------ pageRank

  private def ranks(nodes: Seq[Long], edges: Seq[(Long, Long)],
                    iters: Int): Map[Long, Long] = {
    val n = nodes.toDF("id")
    val e = edges.toDF("src", "dst")
    Graph.pageRankPpm(n, "id", e, "src", "dst", iters)
      .as[(Long, Long)].collect().toMap
  }

  /** Driver-side reference: the identical floored integer-ppm recurrence,
    * computed sequentially. */
  private def prRef(nodes: Seq[Long], edges: Seq[(Long, Long)],
                    iters: Int): Map[Long, Long] = {
    val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (a, b) => a != b }.distinct
    val deg = sym.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val nN = nodes.size.toLong
    var r = nodes.map(_ -> 1000000L / nN).toMap
    for (_ <- 1 to iters) {
      val inflow = sym.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / deg(src) }.sum }
      r = nodes.map(v =>
        v -> (150000L / nN + inflow.getOrElse(v, 0L) * 85 / 100)).toMap
    }
    r
  }

  test("pageRank: one round on a path graph matches the hand computation") {
    // 1-2-3 path + isolated 4. N=4: r0=250000 each, teleport=37500.
    // Round 1 inflows: 1←125000, 2←500000, 3←125000, 4←0.
    val m = ranks(Seq(1L, 2L, 3L, 4L), Seq((1L, 2L), (2L, 3L)), iters = 1)
    assert(m == Map(1L -> 143750L, 2L -> 462500L, 3L -> 143750L, 4L -> 37500L))
  }

  test("pageRank: three rounds match the sequential integer reference") {
    val nodes = (1L to 30L).toSeq
    // Hub 1 touching 2-10, a 11-15 ring, random extra edges, dangling 21-30.
    val edges = (2L to 10L).map(v => (1L, v)) ++
      (11L to 14L).map(v => (v, v + 1)) :+ (15L, 11L) :+
      (3L, 12L) :+ (7L, 20L) :+ (16L, 17L) :+ (18L, 19L)
    assert(ranks(nodes, edges, iters = 3) == prRef(nodes, edges, iters = 3))
  }

  test("pageRank: edge direction is ignored and hubs outrank leaves") {
    val nodes = (1L to 10L).toSeq
    val star = (2L to 10L).map(v => (v, 1L)) // all edges INTO 1
    val m = ranks(nodes, star, iters = 3)
    assert(m(1L) > m(2L), "hub must outrank a leaf")
    assert((2L to 10L).map(m).toSet.size == 1, "leaves are symmetric")
    assert(m == prRef(nodes, star, iters = 3))
  }
}
