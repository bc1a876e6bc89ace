package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact cosine top-k: broadcast the (small) query
  *    set against the corpus; one scan, no corpus shuffle. The baseline and
  *    the verifier for the approximate path.
  *  - [[lshTopK]] — random-hyperplane LSH: corpus is bucketed by a b-bit
  *    sign signature (deterministic hyperplanes), queries probe only their
  *    own bucket; exact cosine rerank within the bucket. At 100 TB the
  *    bucketed join touches ~corpus/2^b per query instead of the full scan.
  */
object Ann {

  /** Cast float vector to double + L2 norm, computed once. */
  private def prepared(df: DataFrame, idCol: String, vecCol: String,
                       idOut: String, vecOut: String, normOut: String): DataFrame =
    df.select(col(idCol).as(idOut),
        transform(col(vecCol), x => x.cast("double")).as(vecOut))
      .withColumn(normOut,
        sqrt(aggregate(col(vecOut), lit(0.0d), (acc, x) => acc + x * x)))

  def cosine(vecA: Column, normA: Column, vecB: Column, normB: Column): Column =
    aggregate(zip_with(vecA, vecB, (x, y) => x * y), lit(0.0d),
      (acc, x) => acc + x) / (normA * normB)

  /** Exact top-k neighbors per query (self-matches excluded). The per-query
    * rank orders by ROUNDED similarity with the corpus id as tiebreak, so
    * results are stable across engines and runs. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = prepared(queries, idCol, vecCol, "query_id", "qv", "qn")
    val c = prepared(corpus, idCol, vecCol, "corpus_id", "cv", "cn")
    val sims = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine", round(cosine(col("qv"), col("qn"), col("cv"), col("cn")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    sims.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"), col("rank"))
  }

  /** Deterministic pseudo-random ±1 hyperplanes: component (p, d) is the
    * parity of a byte of md5("p:d") — stable across runs/JVMs, no RNG. */
  def hyperplanes(numPlanes: Int, dim: Int): Array[Array[Double]] = {
    val mdf = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(numPlanes, dim) { (p, d) =>
      val h = mdf.digest(s"$p:$d".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1.0 else -1.0
    }
  }

  /** b-bit sign signature of a (double) vector under the fixed hyperplanes:
    * bit p = sign(v · h_p). Pure Column expression — codegen'd, no UDF. */
  def signature(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (plane, p) =>
      val dot = plane.zipWithIndex.map { case (s, d) =>
        element_at(vec, d + 1) * lit(s)
      }.reduce(_ + _)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Approximate top-k: bucket corpus and queries by signature, exact rerank
    * inside the bucket. `multiProbe` = Hamming radius probed on the QUERY
    * side (0 ⇒ own bucket only; 1 ⇒ also every bucket one bit-flip away) —
    * the standard recall/scan-fraction dial: probing radius 1 scans
    * (numPlanes+1)/2^numPlanes of the corpus in expectation. Recall < 1 by
    * construction; measured against [[bruteForceTopK]] in AnnSpec. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, numPlanes: Int, dim: Int,
              multiProbe: Int = 1): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val probeOffsets: Seq[Long] =
      0L +: (if (multiProbe >= 1) (0 until numPlanes).map(p => 1L << p) else Seq.empty)
    val q = prepared(queries, idCol, vecCol, "query_id", "qv", "qn")
      .withColumn("sig", signature(col("qv"), planes))
      .withColumn("bucket", explode(array(probeOffsets.map(o =>
        col("sig").bitwiseXOR(lit(o))): _*)))
      .drop("sig")
    val c = prepared(corpus, idCol, vecCol, "corpus_id", "cv", "cn")
      .withColumn("bucket", signature(col("cv"), planes))
    val sims = c.join(broadcast(q), Seq("bucket"))
      .where(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        round(cosine(col("qv"), col("qn"), col("cv"), col("cn")), 6).as("cosine"))
      .distinct() // multi-probe can reach the same (query, corpus) twice
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    sims.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"), col("rank"))
  }
}
