package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Collocation extraction — adjacent-token-pair lift scoring, the
  * statistics behind tokenizer merge-candidate selection (a BPE-style
  * vocabulary learner ranks exactly these counts) and multi-word-expression
  * mining over a training corpus.
  *
  * The score is integer-exact so an independent engine reproduces the
  * ranking bit-for-bit: `lift_ppb = ⌊n_pair · 10⁹ / (n_a · n_b)⌋` — the
  * PMI numerator/denominator ratio without the corpus-size constant (which
  * is fixed for a given corpus and so preserves the ranking). The division
  * runs on DECIMAL(38) operands: a long/long division would pass through
  * DOUBLE and can mis-floor at ~10¹⁵ magnitudes.
  *
  * Scale shape: pairs come from one per-doc `transform` + `explode` (scan
  * local, no self-join); pair and unigram counts are map-side-combined
  * `groupBy.agg(count)` — a viral pair reduces partition-locally before its
  * shuffle. The unigram table joins back twice on the token; the final
  * top-k is a `TakeOrderedAndProject`, never a global sort.
  */
object Collocations {

  /** Adjacent (tok_a, tok_b) pair counts over whitespace tokens — one row
    * per distinct pair with its corpus frequency. */
  def pairCounts(df: DataFrame, textCol: String): DataFrame =
    // Spread on both token producers: the per-row tokenize + adjacent-pair
    // explode is the expensive stage (the shinglePostings regime — sf1
    // starvation fix); identity at production split counts.
    graft.operators.Spread(df).select(TextOps.tokens(col(textCol)).as("__tk"))
      .where(size(col("__tk")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("__tk")) - 1),
        i => struct(element_at(col("__tk"), i).as("tok_a"),
          element_at(col("__tk"), i + 1).as("tok_b")))).as("p"))
      .select(col("p.tok_a").as("tok_a"), col("p.tok_b").as("tok_b"))
      .groupBy(col("tok_a"), col("tok_b"))
      .agg(count(lit(1)).as("n_pair"))

  /** Corpus unigram counts (every token position, including one-token
    * docs — the pair score's marginals). */
  def unigramCounts(df: DataFrame, textCol: String): DataFrame =
    graft.operators.Spread(df)
      .select(explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n_tok"))

  /** ⌊n_pair · 10⁹ / (n_a · n_b)⌋ on DECIMAL(38) operands — exact floor
    * division (the decimal quotient carries ≥ 21 fractional digits and the
    * true remainder fraction is ≥ 1/(n_a·n_b) ≫ 10⁻²¹ away from 1, so the
    * pre-floor rounding can never cross an integer boundary). */
  private def liftPpb(nPair: Column, nA: Column, nB: Column): Column =
    floor((nPair * lit(1000000000L)).cast("decimal(38,0)") /
      (nA.cast("decimal(38,0)") * nB.cast("decimal(38,0)"))).cast("long")

  /** Top-`k` collocations with pair frequency ≥ `minCount`, ranked by
    * descending lift then pair text (fully deterministic order). */
  def topCollocations(df: DataFrame, textCol: String, minCount: Long,
                      k: Int): DataFrame = {
    val pc = pairCounts(df, textCol).where(col("n_pair") >= minCount)
    val uni = unigramCounts(df, textCol)
    pc.join(uni.select(col("tok").as("tok_a"), col("n_tok").as("__na")), Seq("tok_a"))
      .join(uni.select(col("tok").as("tok_b"), col("n_tok").as("__nb")), Seq("tok_b"))
      .select(col("tok_a"), col("tok_b"), col("n_pair"),
        liftPpb(col("n_pair"), col("__na"), col("__nb")).as("lift_ppb"))
      .orderBy(col("lift_ppb").desc, col("tok_a"), col("tok_b"))
      .limit(k)
  }
}
