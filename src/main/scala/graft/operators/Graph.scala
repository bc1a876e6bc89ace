package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
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
  * Scale design, per round:
  *  - ONE blocking action: the round's edge set materializes inside the same
  *    aggregate job that computes the convergence signal (edge count +
  *    xxhash64 checksum) — no separate checkpoint-then-count pair, so a
  *    degraded scheduler is paid once per round, not twice.
  *  - Lineage truncation via an explicitly persisted RDD (re-wrapped with
  *    `createDataFrame`), so Catalyst plans one round, not the whole history.
  *  - The superseded round's RDD is unpersisted DETERMINISTICALLY as soon as
  *    its successor is materialized — memory use is 2 edge sets, not
  *    O(rounds). On a real cluster swap the local persist for a reliable
  *    checkpoint dir so executor loss cannot replay from scratch.
  *  - The neighborhood minimum is a whole-partition window min (one shuffle
  *    of the edge set, no join back); a groupBy+join alternative would
  *    shuffle the edges twice for the same answer.
  *
  * Non-convergence is an ERROR: if `maxIters` rounds don't reach the
  * fixpoint the call throws instead of silently returning labels that are
  * not connected components. (log₂-style contraction makes the default
  * bound generous: 30 rounds cover any graph a 64-bit id space can hold.)
  *
  * CONCURRENCY: the loop temporarily rewrites two session-level SQL confs
  * (AQE off, right-sized shuffle partitions) and restores them on exit —
  * do not run it concurrently with other query planning on the SAME
  * SparkSession (e.g. an active streaming query); use a separate session
  * (`spark.newSession()`) for concurrent workloads.
  */
object Graph {

  private val edgeSchema = StructType(Seq(
    StructField("src", LongType, nullable = false),
    StructField("dst", LongType, nullable = false)))

  /** large-star(E): for each node u over symmetric neighbors Γ(u), with
    * m = min(Γ(u) ∪ {u}): emit (v, m) for every v ∈ Γ(u), v > u.
    *
    * No distinct here: each undirected edge contributes exactly one output
    * row (from its smaller endpoint's perspective), so row count stays |E|
    * and the small-star that always follows dedups once for both phases. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val w = Window.partitionBy(col("src"))
    sym.withColumn("m", least(min(col("dst")).over(w), col("src")))
      .where(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
  }

  /** small-star(E): orient edges so src > dst; for each node u with
    * m = min(Γ≤(u)): emit (v, m) for every v ∈ Γ≤(u) ∪ {u}, minus
    * self-loops. */
  private def smallStar(e: DataFrame): DataFrame = {
    val or = e.select(greatest(col("src"), col("dst")).as("src"),
      least(col("src"), col("dst")).as("dst"))
    val w = Window.partitionBy(col("src"))
    val withMin = or.withColumn("m", min(col("dst")).over(w))
    withMin.select(col("dst").as("src"), col("m").as("dst"))
      .union(withMin.select(col("src"), col("m").as("dst")))
      .where(col("src") =!= col("dst"))
      .distinct()
  }

  /** Materialize `df` with truncated lineage and return it together with its
    * convergence stats — (row count, xxhash64 checksum) — computed in the
    * SAME job that populates the persisted RDD. */
  private def materialize(spark: SparkSession, df: DataFrame)
      : (DataFrame, org.apache.spark.rdd.RDD[Row], (Long, Long)) = {
    val rdd = df.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    val out = spark.createDataFrame(rdd, edgeSchema)
    // bit_xor, not sum: order-independent, and cannot overflow under ANSI.
    val r = out.agg(count(lit(1)),
      coalesce(expr("bit_xor(xxhash64(src, dst))"), lit(0L))).first()
    (out, rdd, (r.getLong(0), r.getLong(1)))
  }

  /** @param nodes  one column `idCol`; isolated nodes keep their own label
    * @param edges  undirected pairs (`srcCol`, `dstCol`); direction ignored
    * @return (id, comp) — comp = min node id reachable from id
    * @throws IllegalStateException if `maxIters` rounds don't converge
    */
  def connectedComponents(nodes: DataFrame, idCol: String, edges: DataFrame,
                          srcCol: String, dstCol: String,
                          maxIters: Int = 30): DataFrame = {
    val spark = nodes.sparkSession
    val cleaned = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
    // AQE off for the inner loop: on an adaptive plan every shuffle stage
    // runs as its own job (and `.rdd` pre-executes them), turning one round
    // into ~4 sequential driver round-trips. The loop's frames are tiny,
    // fixed-schema 2-column edges — AQE has nothing to re-plan, and window
    // partitions (per-node neighborhoods) are outside its skew handling
    // anyway. Restored in `finally`; the RETURNED label plan is lazy and
    // evaluates under the caller's settings.
    val aqeKey = "spark.sql.adaptive.enabled"
    val partKey = "spark.sql.shuffle.partitions"
    val aqePrev = spark.conf.getOption(aqeKey)
    val partPrev = spark.conf.getOption(partKey)
    val baseParts = spark.conf.get(partKey, "200").toInt
    spark.conf.set(aqeKey, "false")
    var (cur, curRdd, curStats) = (null: DataFrame, null: org.apache.spark.rdd.RDD[Row], (0L, 0L))
    var converged = false
    var it = 0
    try {
      val m0 = materialize(spark, cleaned)
      cur = m0._1; curRdd = m0._2; curStats = m0._3
      converged = curStats._1 == 0L // no edges: already a (trivial) fixpoint
      while (!converged && it < maxIters) {
        // On any failure below, release this round's cache before the
        // conf-restoring finally — nothing downstream can use it.
        // Manual adaptive coalescing (AQE is off here): size the round's
        // shuffles from the PREVIOUS round's exact edge count — contraction
        // shrinks the set every round, and a tiny round on the caller's
        // full partition count is pure task overhead. Never exceeds the
        // caller's setting, so cluster-scale inputs keep full parallelism.
        val parts = math.max(1L, math.min(baseParts.toLong, curStats._1 / 100000L + 1L))
        spark.conf.set(partKey, parts.toString)
        val (next, nextRdd, nextStats) = materialize(spark, smallStar(largeStar(cur)))
        converged = nextStats == curStats
        curRdd.unpersist(blocking = false)
        cur = next; curRdd = nextRdd; curStats = nextStats
        it += 1
      }
    } catch {
      case e: Throwable =>
        if (curRdd != null) curRdd.unpersist(blocking = false)
        throw e
    } finally {
      aqePrev match {
        case Some(v) => spark.conf.set(aqeKey, v)
        case None => spark.conf.unset(aqeKey)
      }
      partPrev match {
        case Some(v) => spark.conf.set(partKey, v)
        case None => spark.conf.unset(partKey)
      }
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters rounds " +
          s"(${curStats._1} edges at round $it) — labels would NOT be " +
          "connected components; raise maxIters")
    // At the star fixpoint each node's symmetric neighborhood contains its
    // component root (the root's neighbors are all larger), so
    // comp = min(neighbors ∪ self). `least` skips the null an unmatched
    // left join leaves for isolated nodes.
    val symF = cur.union(cur.select(col("dst").as("src"), col("src").as("dst")))
    val nbrMin = symF.groupBy(col("src")).agg(min(col("dst")).as("nmin"))
      .select(col("src").as("id"), col("nmin"))
    val allNodes = nodes.select(col(idCol).cast("long").as("id"))
      .union(symF.select(col("src").as("id")))
      .distinct()
    allNodes.join(nbrMin, Seq("id"), "left")
      .select(col("id"), least(col("nmin"), col("id")).as("comp"))
  }
}
