package graft.operators

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

  test("long chain converges in O(log n) rounds — bounded Spark job count") {
    // A 64-node path has diameter 63: per-diameter min-label propagation
    // would need 63 rounds (≥126 jobs); star contraction needs ~log₂ 64.
    val nodes = (0L until 64L).toSeq
    val edges = (0L until 63L).map(i => (i, i + 1))
    val jobs = graft.JobCounter.jobsDuring(spark) {
      val m = comps(nodes, edges)
      assert(m.values.toSet == Set(0L))
    }
    assert(jobs <= 16,
      s"expected O(log n) contraction rounds, saw $jobs jobs for a 64-chain")
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
}
