package graft.operators

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components — the dedup-cluster resolver: near-dup
  * candidate PAIRS (MinHash/SimHash/Jaccard output) become duplicate GROUPS,
  * each labeled by its smallest member id (the canonical "keeper").
  *
  * Algorithm: alternating large-star/small-star contraction (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014) — O(log n)
  * rounds on any graph, vs O(diameter) for plain min-label propagation.
  *
  *  - large-star: every node connects its strictly-larger neighbors to the
  *    minimum of its neighborhood (incl. itself).
  *  - small-star: every node connects its smaller-or-equal neighbors (and
  *    itself) to the minimum of those.
  *
  * The fixpoint is a forest of stars rooted at each component's min id.
  *
  * The ROUND LOOP runs on raw RDDs of (Long, Long) edges, not DataFrames
  * (r18 optimization). Rationale, measured: a DataFrame round re-enters
  * Catalyst on every iteration — `df.rdd` alone cost 0.25-0.45 s per round
  * plan at any data size (driver-side RDD-DAG construction dominated by
  * ClosureCleaner serializing each operator closure's captured plan state,
  * plus a second `rddQueryExecution` planning pass and a Row-deserialization
  * stage) — ~1-1.5 s of pure driver time per CC query, O(rounds) at every
  * scale, and the Row objects it persisted cost boxed-object memory. The
  * RDD rounds plan NOTHING per iteration (the lambdas are tiny, cleaned in
  * ~1 ms), persist compact primitive tuples, and run the identical
  * contraction algebra: A/B on the q65 graph read 4.9-6.2 s (SQL rounds)
  * vs 1.2-2.4 s (RDD rounds) for bit-identical labels, and the 2M-doc
  * LargeScaleSpec drill holds its ~linear scaling (the per-round transforms
  * are min/compare/swap on primitive longs — no expression complex enough
  * for codegen to matter, while every shuffle stays map-side-combined).
  *
  * Scale design, per round (unchanged from the SQL rounds, same shapes):
  *  - The per-node neighborhood minimum is a map-side-combined
  *    `aggregateByKey` (min, degree) JOINED back to the edges — never a
  *    whole-partition window min. A window partition is one unsplittable
  *    task, and the root of a giant duplicate cluster (the common dedup
  *    degeneracy) has degree ≈ cluster size, so a window would serialize
  *    one cluster-sized task per round. The aggregate reduces each map
  *    partition to one row per node before its shuffle, so the agg itself
  *    never concentrates a hot key.
  *  - The join back is HOT/COLD split: the degree of every node comes out
  *    of the SAME aggregate for free; nodes above `hotDegree` resolve
  *    map-side via a broadcast of the (few) hot mins — their edge rows
  *    never shuffle, so a 10⁸-degree cluster root costs zero reducer-side
  *    concentration. At most 2·|E|/hotDegree hot nodes can exist, so the
  *    broadcast is small by construction; cold srcs take the ordinary
  *    shuffle join, whose per-key row count is ≤ hotDegree by construction.
  *    The cold join re-reads the aggregate's shuffle output (skipped
  *    stage), not a recompute.
  *  - ONE blocking action per fused round pair: both halves' edge sets
  *    materialize inside the same job that computes the convergence signal
  *    (edge count + mixed-64-bit checksum) — no separate
  *    checkpoint-then-count pair.
  *  - The superseded round's RDD is unpersisted DETERMINISTICALLY as soon as
  *    its successor is materialized — memory use is 2 edge sets, not
  *    O(rounds). If `sparkContext.setCheckpointDir` is configured, each
  *    round additionally checkpoints RELIABLY (one extra cache-fed job per
  *    round), so executor loss recovers from storage instead of replaying
  *    the contraction from scratch.
  *  - Shuffle partition counts are re-sized each round from the previous
  *    round's exact edge count (contraction shrinks the set every round),
  *    capped at the caller's `spark.sql.shuffle.partitions` — cluster-scale
  *    inputs keep full parallelism, tail rounds stop paying empty-task
  *    overhead. The caller's session confs are never touched.
  *
  * Non-convergence is an ERROR: if `maxIters` rounds don't reach the
  * fixpoint the call throws instead of silently returning labels that are
  * not connected components. (log₂-style contraction makes the default
  * bound generous: 30 rounds cover any graph a 64-bit id space can hold.)
  */
object Graph {

  private type Edge = (Long, Long)

  /** splitmix64 finalizer — the convergence checksum's 64-bit mixer.
    * Internal to the loop (never compared against an engine), so any
    * well-mixed deterministic hash works; XOR across rows makes the
    * aggregate order-independent, pair-mixing makes (a,b) ≠ (b,a). */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** One partition's convergence contribution: (row count, XORed pair
    * checksum). */
  private def statPart(it: Iterator[Edge]): (Long, Long) = {
    var n = 0L; var x = 0L
    while (it.hasNext) { val p = it.next(); n += 1; x ^= mix64(mix64(p._1) ^ p._2) }
    (n, x)
  }

  /** Per-src (min(dst), degree) — one map-side-combined pass. */
  private def srcMinDeg(edges: RDD[Edge], p: HashPartitioner)
      : RDD[(Long, (Long, Long))] =
    edges.aggregateByKey((Long.MaxValue, 0L), p)(
      (acc, v) => (math.min(acc._1, v), acc._2 + 1L),
      (a, b) => (math.min(a._1, b._1), a._2 + b._2))

  /** Attach each row's per-src neighborhood min, hot/cold split on
    * `hotDegree` (see the object scaladoc). Returns (src, (dst, nmin)).
    *
    * `hotDegree = None` selects the plain single shuffle join — the loop
    * passes it whenever the round's TOTAL edge count is ≤ hotDegree, which
    * PROVES no node can be hot: the hot branch would then cost one extra
    * driver job per star per round for a knowably-empty map. */
  private def minJoin(rows: RDD[Edge], mins: RDD[(Long, (Long, Long))],
                      hotDegree: Option[Long], p: HashPartitioner)
      : RDD[(Long, (Long, Long))] = hotDegree match {
    case None =>
      rows.join(mins.mapValues(_._1), p)
    case Some(t) =>
      // collectAsMap is bounded by 2·|E|/hotDegree entries (see scaladoc);
      // the job it runs also materializes the aggregate's shuffle output,
      // which the cold join below then reuses as a skipped stage.
      val hotMap = mins.filter(_._2._2 > t).mapValues(_._1)
        .collectAsMap()
      val bc = rows.sparkContext.broadcast(
        scala.collection.immutable.Map(hotMap.toSeq: _*))
      val viaHot = rows.mapPartitions({ it =>
        val m = bc.value
        it.flatMap { case (s, d) => m.get(s).map(nm => (s, (d, nm))) }
      }, preservesPartitioning = true)
      val coldRows = rows.mapPartitions({ it =>
        val m = bc.value
        it.filter { case (s, _) => !m.contains(s) }
      }, preservesPartitioning = true)
      viaHot.union(coldRows.join(
        mins.filter(_._2._2 <= t).mapValues(_._1), p))
  }

  /** large-star(E): for each node u over symmetric neighbors Γ(u), with
    * m = min(Γ(u) ∪ {u}): emit (v, m) for every v ∈ Γ(u), v > u.
    *
    * No distinct here: each undirected edge contributes exactly one output
    * row (from its smaller endpoint's perspective), so row count stays |E|
    * and the small-star that always follows dedups once for both phases.
    * The min aggregates over the FULL symmetric neighborhood; only the
    * dst > src rows (the emitted side) need the value joined on. */
  private def largeStar(e: RDD[Edge], hotDegree: Option[Long],
                        p: HashPartitioner): RDD[Edge] = {
    val sym = e.flatMap { case (s, d) => Iterator((s, d), (d, s)) }
    minJoin(sym.filter { case (s, d) => d > s }, srcMinDeg(sym, p),
        hotDegree, p)
      .map { case (u, (v, m)) => (v, math.min(m, u)) }
  }

  /** small-star(E): orient edges so src > dst; for each node u with
    * m = min(Γ≤(u)): emit (v, m) for every v ∈ Γ≤(u) ∪ {u}, minus
    * self-loops. The (u, m) self rows come straight from the aggregate —
    * one row per node, not one per edge. */
  private def smallStar(e: RDD[Edge], hotDegree: Option[Long],
                        p: HashPartitioner): RDD[Edge] = {
    val or = e.map { case (s, d) => if (s >= d) (s, d) else (d, s) }
    val mins = srcMinDeg(or, p)
    minJoin(or, mins, hotDegree, p)
      .map { case (_, (v, m)) => (v, m) }
      .union(mins.map { case (u, (m, _)) => (u, m) })
      .filter { case (s, d) => s != d }
      .distinct(p.numPartitions)
  }

  /** @param nodes  one column `idCol`; isolated nodes keep their own label
    * @param edges  undirected pairs (`srcCol`, `dstCol`); direction ignored
    * @return (id, comp) — comp = min node id reachable from id
    * @throws IllegalStateException if `maxIters` rounds don't converge
    */
  def connectedComponents(nodes: DataFrame, idCol: String, edges: DataFrame,
                          srcCol: String, dstCol: String,
                          maxIters: Int = 30,
                          loopConfs: Map[String, String] = Map.empty,
                          hotDegree: Long = 1000000L): DataFrame =
    connectedComponentsWithRounds(nodes, idCol, edges, srcCol, dstCol,
      maxIters, loopConfs, hotDegree)._1

  /** [[connectedComponents]] plus the number of contraction rounds actually
    * run — the scale-relevant diagnostic (rounds ≈ log₂ of the largest
    * component's star depth).
    *
    * @param loopConfs loop sizing overrides. The RDD rounds read
    *                  `spark.sql.shuffle.partitions` (parallelism cap) and
    *                  `spark.graft.cc.rowsPerPartition` (per-partition row
    *                  budget for the manual round re-sizing) from here
    *                  first, then from the caller's session conf; other
    *                  keys are ignored (the rounds plan no SQL). The
    *                  caller's session is never mutated.
    * @param hotDegree nodes with more than this many incident edge rows in
    *                  a round resolve their neighborhood min via broadcast
    *                  instead of the shuffle join (see [[minJoin]]); at most
    *                  2·|E|/hotDegree such nodes can exist, so the default
    *                  bounds the broadcast at a few MB even for trillion-edge
    *                  inputs while capping any one join key at ~10⁶ rows.
    */
  def connectedComponentsWithRounds(nodes: DataFrame, idCol: String,
                                    edges: DataFrame, srcCol: String,
                                    dstCol: String, maxIters: Int = 30,
                                    loopConfs: Map[String, String] = Map.empty,
                                    hotDegree: Long = 1000000L)
      : (DataFrame, Int) = {
    val spark = nodes.sparkSession
    val sc = spark.sparkContext
    val cleaned = edges
      .select(col(srcCol).cast("long").as("_1"), col(dstCol).cast("long").as("_2"))
      .where(col("_1") =!= col("_2"))
      .distinct()
    val basePartsN = loopConfs.getOrElse("spark.sql.shuffle.partitions",
      spark.conf.get("spark.sql.shuffle.partitions", "200")).toInt
    val rowsPerPart = loopConfs.getOrElse("spark.graft.cc.rowsPerPartition",
      spark.conf.get("spark.graft.cc.rowsPerPartition", "100000")).toLong
    // ONE Catalyst plan enters the loop: the cleaned edge derivation,
    // decoded straight to primitive tuples by the typed deserializer (no
    // Row boxing). Everything after this line is RDD-only until the final
    // label derivation.
    var cur: RDD[Edge] = cleaned
      .as[Edge](Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)).rdd
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (sc.getCheckpointDir.isDefined) cur.checkpoint()
    var midKeep: RDD[Edge] = null
    var converged = false
    var it = 0
    try {
      // One job: populates the persist and returns the convergence stats.
      var curStats = cur.mapPartitions(it0 => Iterator.single(statPart(it0)))
        .fold((0L, 0L)) { case ((a, b), (c, d)) => (a + c, b ^ d) }
      converged = curStats._1 == 0L // no edges: already a (trivial) fixpoint
      while (!converged && it < maxIters) {
        // Manual adaptive coalescing: size the round's shuffles from the
        // PREVIOUS action's exact edge count — contraction shrinks the set
        // every round, and a tiny round on the caller's full partition
        // count is pure task overhead. Never exceeds the caller's setting,
        // so cluster-scale inputs keep full parallelism.
        val parts = math.max(1L,
          math.min(basePartsN.toLong, curStats._1 / rowsPerPart + 1L)).toInt
        val p = new HashPartitioner(parts)
        // Engage the hot/cold join only when this round COULD contain a
        // hot node (total edges > hotDegree); otherwise the plain join is
        // provably skew-safe and saves the hot-map collect jobs. Decided
        // from the fused pair's INPUT edge count — conservative, since
        // contraction never mints a hot node the input's total-edge bound
        // didn't already cover.
        val hd = if (curStats._1 > hotDegree) Some(hotDegree) else None
        // TWO large/small-star alternations per driver action: the action
        // (scheduling + the convergence stats) is the per-round fixed
        // bill, and contraction needs O(log n) rounds either way, so
        // fusing halves the job count. The intermediate round persists and
        // is read back by the second pair from cache (the one job's stages
        // run in dependency order, so the first stage to touch it
        // computes-and-caches and the union's re-read hits cache); the
        // convergence stats read BOTH halves in the same action (a tagged
        // union), so the fixpoint is detected at the exact round it
        // happens.
        val mid = smallStar(largeStar(cur, hd, p), hd, p)
          .persist(StorageLevel.MEMORY_AND_DISK)
        midKeep = mid
        val next = smallStar(largeStar(mid, hd, p), hd, p)
          .persist(StorageLevel.MEMORY_AND_DISK)
        if (sc.getCheckpointDir.isDefined) next.checkpoint()
        val statRows = next
          .mapPartitions(it0 => Iterator.single((1, statPart(it0))))
          .union(mid.mapPartitions(it0 => Iterator.single((0, statPart(it0)))))
          .collect()
        def statsOf(h: Int): (Long, Long) =
          statRows.iterator.filter(_._1 == h).map(_._2)
            .foldLeft((0L, 0L)) { case ((a, b), (c, d)) => (a + c, b ^ d) }
        val midStats = statsOf(0)
        val nextStats = statsOf(1)
        // midStats == curStats ⇒ cur was already the fixpoint (the pair
        // was the detection overshoot); nextStats == midStats ⇒ the
        // fixpoint landed mid-pair. Either way next carries the fixpoint
        // content — contraction's potential strictly decreases until the
        // fixpoint, so content equality across one or two rounds can
        // never be a cycle.
        converged = nextStats == midStats || midStats == curStats
        cur.unpersist(blocking = false)
        mid.unpersist(blocking = false)
        midKeep = null
        cur = next; curStats = nextStats
        it += 2
      }
      if (!converged) {
        val n = curStats._1
        cur.unpersist(blocking = false)
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxIters rounds " +
            s"($n edges at round $it) — labels would NOT be " +
            "connected components; raise maxIters")
      }
    } catch {
      // On any failure, release this round's caches — nothing downstream
      // can use them.
      case e: Throwable =>
        if (cur != null) cur.unpersist(blocking = false)
        if (midKeep != null) midKeep.unpersist(blocking = false)
        throw e
    }
    // At the star fixpoint each node's symmetric neighborhood contains its
    // component root (the root's neighbors are all larger), so
    // comp = min(neighbors ∪ self). `least` skips the null an unmatched
    // left join leaves for isolated nodes. Built as ONE Catalyst plan on
    // the caller session over the final persisted RDD (the last round's
    // cache is reclaimed by the ContextCleaner once the returned plan is
    // unreachable).
    val fin = spark.createDataset(cur)(
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .toDF("src", "dst")
    val symF = fin.union(fin.select(col("dst").as("src"), col("src").as("dst")))
    val nbrMin = symF.groupBy(col("src")).agg(min(col("dst")).as("nmin"))
      .select(col("src").as("id"), col("nmin"))
    val allNodes = nodes.select(col(idCol).cast("long").as("id"))
      .union(symF.select(col("src").as("id")))
      .distinct()
    (allNodes.join(nbrMin, Seq("id"), "left")
      .select(col("id"), least(col("nmin"), col("id")).as("comp")), it)
  }

  /** Fixed-iteration PageRank over an undirected graph, in exact integer
    * parts-per-million arithmetic — the centrality ranking over a near-dup
    * candidate graph that surfaces the "template hub" documents every
    * cluster touches (a dup graph's highest-rank nodes are the boilerplate
    * carriers worth human review before mass deletion).
    *
    * Shapes, per iteration: ONE shuffle join (current ranks ⋈ the static
    * degree-annotated edge list, keyed by src) and ONE map-side-combined
    * aggregate on dst — the canonical distributed PageRank round; nothing
    * is ever collected. The degree-annotated symmetric edge list is derived
    * once and materialized (localCheckpoint, unless `graft.materialize` is
    * `false`) so the `iters` rounds and the degree computation re-read one
    * frame instead of re-deriving the candidate pairs each round. A fixed
    * small `iters` keeps the lineage depth bounded, so no per-round RDD
    * re-wrapping is needed (contrast [[connectedComponents]], whose round
    * count is data-dependent).
    *
    * All arithmetic is integral and floored (`div`), so ranks are
    * bit-identical across engines, partitionings and merge orders:
    *   r₀ = scale div N;  contribution = rank div deg;
    *   rₖ₊₁ = (scale·(100−dampingPct) div 100) div N
    *           + (inflow · dampingPct) div 100.
    * Dangling (degree-0) mass is dropped — the standard simplification —
    * so ranks need not sum to `scale`. The single driver-side action is
    * the node count (one scalar, same class as the IVF centroid collects).
    *
    * `scale` is the total integer mass and sets the RESOLUTION: per-node
    * quantities are ~scale/N, and floored division eats ~one unit per
    * round, so keep scale ≳ 10⁴·N or ranks quantize to zero (measured: at
    * N = 250 000 the 10⁶ default underflows by round 2 — LargeScaleSpec
    * runs 10¹²). The 10⁶ default stays for corpus-sized dup graphs where
    * the ppm reading is the convenient one.
    *
    * @return (id, rank_ppm) for every node in `nodes`, in parts-per-`scale`
    */
  def pageRankPpm(nodes: DataFrame, idCol: String, edges: DataFrame,
                  srcCol: String, dstCol: String, iters: Int = 3,
                  dampingPct: Int = 85, scale: Long = 1000000L): DataFrame = {
    val spark = nodes.sparkSession
    val ids = nodes.select(col(idCol).cast("long").as("id"))
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .where(col("src") =!= col("dst")).distinct()
    val withDeg = {
      val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      graft.Materialize(sym.join(deg, "src"))
    }
    val n = math.max(ids.count(), 1L)
    val teleport = scale * (100L - dampingPct) / 100L / n
    var ranks = ids.withColumn("rank_ppm", lit(scale / n))
    for (_ <- 1 to iters) {
      val inflow = withDeg.join(ranks, withDeg("src") === ranks("id"))
        .select(col("dst"), expr("rank_ppm div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inflow"))
      ranks = ids.join(inflow, ids("id") === inflow("dst"), "left")
        .select(col("id"), (lit(teleport) +
          expr(s"coalesce(inflow, 0L) * $dampingPct div 100")).as("rank_ppm"))
    }
    ranks
  }
}
