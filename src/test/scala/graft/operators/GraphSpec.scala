package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def comps(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val n = nodes.toDF("id")
    val e = edges.toDF("src", "dst")
    Graph.connectedComponents(n, "id", e, "src", "dst")
      .as[(Long, Long)].collect().toMap
  }

  test("chain graph collapses to one component labeled by its min id") {
    // 1-2, 2-3, 3-4: diameter 3 forces several propagation rounds.
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

  test("matches brute-force union-find on a random-ish fixture") {
    val nodes = (0L until 30L).toSeq
    // deterministic pseudo-random edges
    val edges = (0 until 25).map { i =>
      val a = (i * 7L) % 30L; val b = (i * 13L + 5L) % 30L; (a, b)
    }.filter { case (a, b) => a != b }
    // driver-side union-find oracle
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) => parent(find(a)) = find(b) }
    val expected = nodes.map(n => n -> nodes.filter(m => find(m) == find(n)).min).toMap
    assert(comps(nodes, edges) == expected)
  }
}
