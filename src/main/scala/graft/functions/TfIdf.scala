package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term scoring over a document corpus — the classic relevance /
  * keyword-extraction primitive of a training-data pipeline (domain
  * filtering, topic tagging, dedup blocking keys).
  *
  * Shape at scale: term frequencies shuffle once on (doc, term) with
  * map-side combine; document frequencies come from a COUNT WINDOW over
  * the token partition of that same tf table — one shuffle of tf on token,
  * in place of the r14 groupBy-then-rejoin that paid the same token
  * shuffle PLUS a separate vocabulary aggregate and a sort-merge join
  * (identical values: rows-per-token in tf IS the document frequency,
  * since tf is one row per (doc, token)). Skew exposure is unchanged — a
  * stop-token's rows met one reducer in the join's shuffle too. The corpus
  * row count joins back as a broadcast one-row frame. No collect, no cross
  * join of corpus-sized inputs.
  */
object TfIdf {

  /** Per-document top-k terms by tf·idf (idf = ln(N/df), ties broken by
    * term). Tokenization matches [[TextOps.tokens]] over lowercased text so
    * an external SQL engine scores bit-identically. */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
               k: Int): DataFrame = {
    // Spread on the tokenize+explode producer only (the N count below
    // stays on the raw scan — it is metadata-cheap): the shinglePostings
    // regime, identity at production split counts. Keyed by doc_id so the
    // spread's exchange doubles as the tf aggregate's distribution — the
    // (doc_id, token) groupBy below plans partition-local on top of it
    // (see [[graft.operators.Spread.byKey]]).
    val tf = graft.operators.Spread.byKey(docs, col(idCol))
      .select(col(idCol).as("doc_id"),
        explode(TextOps.tokens(lower(col(textCol)))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val dfreqW = Window.partitionBy(col("token"))
    val scored = tf
      .withColumn("dfreq", count(lit(1)).over(dfreqW))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("token"),
        round(col("tf") * log(col("n_docs").cast("double") / col("dfreq")), 6)
          .as("tfidf"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("token"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select(col("doc_id"), col("token"), col("tfidf"), col("rnk"))
  }
}
