package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation —
  * the dedup-cluster resolver: near-dup candidate PAIRS (MinHash/SimHash/
  * Jaccard output) become duplicate GROUPS, each labeled by its smallest
  * member id (the canonical "keeper").
  *
  * Scale design: one hash-join + one aggregation per round, each keyed by a
  * node id — no driver-side graph, nothing collected. Rounds needed =
  * component diameter (near-dup clusters are shallow: a handful of rounds).
  * Every round's result is localCheckpoint'ed: label propagation re-reads
  * its own output, and without truncation the lineage — and Catalyst
  * planning time — grows by one join per round. On a real cluster swap
  * localCheckpoint for a reliable `checkpoint` dir so executor loss cannot
  * force a from-scratch replay.
  *
  * Convergence is detected by the label-sum: labels only ever decrease
  * (each round takes a min that includes the previous label), so the sum is
  * strictly decreasing until the fixpoint and one scalar aggregate per
  * round doubles as both the materialization action and the stop test.
  */
object Graph {

  /** @param nodes  one column `idCol`; isolated nodes keep their own label
    * @param edges  undirected pairs (`srcCol`, `dstCol`); direction ignored
    * @return (id, comp) — comp = min node id reachable from id
    */
  def connectedComponents(nodes: DataFrame, idCol: String, edges: DataFrame,
                          srcCol: String, dstCol: String,
                          maxIters: Int = 25): DataFrame = {
    val sym = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .union(edges.select(col(dstCol).cast("long").as("src"),
                          col(srcCol).cast("long").as("dst")))
      .distinct()
      .persist()
    var labels = nodes.select(col(idCol).cast("long").as("id")).distinct()
      .union(sym.select(col("src").as("id")).distinct())
      .distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var prevSum = labels.agg(sum(col("comp"))).first().getLong(0)
    var it = 0
    var done = false
    while (!done && it < maxIters) {
      val msgs = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("comp"))
      val next = labels.select(col("id"), col("comp")).union(msgs)
        .groupBy(col("id")).agg(min(col("comp")).as("comp"))
        .localCheckpoint(true)
      val nextSum = next.agg(sum(col("comp"))).first().getLong(0)
      done = nextSum == prevSum
      prevSum = nextSum
      labels = next
      it += 1
    }
    sym.unpersist(blocking = false)
    labels
  }
}
