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
    * 2k-job bill); for machine-sized selections use a one-shot proxy
    * (top-k by distinct-key count) or a partition-local greedy instead. */
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
}
