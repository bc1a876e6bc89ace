package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical language-model quality scoring (the CCNet shape: score
  * every document by a cheap LM and filter the tail): an add-one-smoothed
  * bigram
  * model trained on the corpus itself, scoring each document's average
  * negative log-likelihood. High NLL = improbable token transitions =
  * boilerplate/gibberish candidates; low NLL = fluent, predictable text.
  *
  * Everything derives from integer counts, so the model is deterministic
  * and cross-engine reproducible; only the final per-doc average of logs
  * is order-dependent and is rounded (6 dp) like every other accumulated
  * double in the oracle contract.
  *
  * Scale shape: bigram instances form SCAN-LOCALLY — one per-doc
  * `transform(sequence(1, n−1), i → struct(tok[i], tok[i+1]))` + `explode`
  * projection, the [[Collocations.pairCounts]] shape — so no token
  * position ever shuffles just to meet its neighbor (the previous
  * positional (id, pos+1) self-join exchanged every token position twice
  * and was the registry's weak-list head). The count tables are map-side-
  * combined groupBys (hot bigrams reduce partition-locally); instances
  * join the counts on short string keys with AQE handling hot-key skew.
  * Nothing holds a corpus-wide partition.
  */
object LmScore {

  /** Per-document bigram NLL under the corpus-trained model.
    *
    * Output: (idCol, n_bigrams, avg_nll) — `avg_nll` = round(avg over the
    * doc's bigrams of −ln((c(w1,w2) + 1) / (c(w1·) + V)), 6) where c(w1·)
    * counts bigrams STARTING with w1 and V is the corpus distinct-token
    * count. Documents with fewer than two tokens have no bigrams and are
    * absent from the output (score of nothing is nothing — callers decide
    * their fate). */
  def bigramNll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Spread: tokenize + pair-explode is the CPU-heavy per-row producer
    // (same regime as shinglePostings — see the sf1 starvation fix); an
    // under-split corpus would run it on one thread. Identity at
    // production splits.
    //
    // Empty tokens: `split(trim(text), "\s+")` can emit "" only at the
    // ENDS of the array — leading (position 0) when the doc starts with
    // non-space whitespace trim doesn't strip (tab/newline), trailing
    // likewise (Spark's split keeps trailing empties, limit -1), or as the
    // sole element of an empty doc. Never mid-array (the regex collapses
    // runs), so dropping them from the ARRAY before pairing preserves
    // exactly the adjacencies the oracle's post-explode
    // `WHERE tok <> ''` keeps.
    val base = graft.operators.Spread(docs).select(col(idCol).as("__id"),
      filter(TextOps.tokens(col(textCol)), t => t =!= "").as("__tk"))
    val big = base.where(size(col("__tk")) >= 2)
      .select(col("__id"),
        explode(transform(sequence(lit(1), size(col("__tk")) - 1),
          i => struct(element_at(col("__tk"), i).as("__w1"),
            element_at(col("__tk"), i + 1).as("__w2")))).as("p"))
      .select(col("__id"), col("p.__w1").as("__w1"), col("p.__w2").as("__w2"))
    val c12 = big.groupBy(col("__w1"), col("__w2"))
      .agg(count(lit(1)).as("__c12"))
    // c(w1·) = Σ_w2 c(w1,w2): a SUM WINDOW over the c12 table's w1
    // partition (the q57 dfreq trick), not a groupBy-then-rejoin. The
    // aggregate spelling re-plans c12's whole upstream chain inside c1's
    // subtree — tokenize, explode, and the instance-sized (w1,w2)
    // exchange all appear TWICE in the static plan, with only
    // ReuseExchange between them at runtime — and then pays a join to
    // attach c1 back. The window attaches the sum in place: one
    // vocab-sized exchange on w1, zero joins, and the instance-sized
    // chain exists exactly once in the plan. Skew bound: a hot w1
    // (stop word) partitions by its DISTINCT successor count, orders of
    // magnitude below its instance count.
    // V is one scalar: computed distributed, joined as a 1-row broadcast
    // (a literal would force an eager action at plan-construction time).
    // It counts EVERY non-empty token — including one-token docs, which
    // contribute no bigrams — so it derives from `base`, not `big`.
    val v = base.select(explode(col("__tk")).as("__tok"))
      .select(countDistinct(col("__tok")).as("__v"))
    // Score each DISTINCT bigram once on the vocabulary-sized table —
    // c12 + its c1 window + the V broadcast — then join the instance
    // frame against the scored table a single time. Joining instances
    // against c12 and c1 separately would shuffle the INSTANCE frame
    // twice (once on (w1,w2), then again on w1); this shape pays the
    // instance-sized exchange once.
    //
    // Per-bigram NLL floored to exact micro-nats BEFORE the per-doc
    // mean: round(avg(double), 6) sums in partition order — the
    // q108/q149 cross-engine hazard. -ln((c12+1)/(c1+V)) ≥ 0 because
    // c12 ≤ c1 and V ≥ 1, so the truncating div matches DuckDB's //.
    val scored = c12
      .withColumn("__c1", sum(col("__c12"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("__w1"))))
      .crossJoin(broadcast(v))
      .select(col("__w1"), col("__w2"),
        floor(-log((col("__c12") + 1.0) / (col("__c1") + col("__v")))
          * lit(1000000d)).as("__nllq"))
    big.join(scored, Seq("__w1", "__w2"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(__nllq) div count(*)").as("avg_nll_micro"))
      .select(col("__id").as(idCol), col("n_bigrams"), col("avg_nll_micro"))
  }
}
