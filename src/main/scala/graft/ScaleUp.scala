package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes a LARGER scale factor from an existing one by key-disjoint
  * replication — the one-scale-up bench point the r11 verdict asked for
  * (prove the sf0.1 scaling claims on the driver's own table shapes
  * without touching the read-only /root/testdata).
  *
  * Each replica r ∈ [0, factor) is the source data with every long id
  * shifted by r·stride (stride = max(id)+1 per id column, so replicas can
  * never collide) and — crucially for the dedup/similarity families —
  * CONTENT moved to a replica-private universe:
  *
  *  - `documents.text`: every token of replica r > 0 is prefixed `u{r}·`,
  *    so shingles/fingerprints/minhashes never match across replicas —
  *    duplicate CLUSTERS replicate per-universe and pair counts scale
  *    LINEARLY in the factor (naive replication would put every doc in a
  *    factor-sized cross-replica clique: pair work would grow
  *    quadratically BY CONSTRUCTION and measure the generator, not the
  *    engine).
  *  - `embeddings.embedding`: replica r rotates the vector left by 5·r
  *    components — norms (and zero-norm edge rows) are preserved while
  *    cross-replica cosines decorrelate, so LSH buckets / IVF cells keep
  *    per-replica structure instead of factor-sized twins.
  *  - joins stay referentially intact: FK columns shift by the SAME stride
  *    as their PK (orders.o_custkey by customer's stride, etc.); the tiny
  *    region/nation dims are shared (copied as-is) like a real warehouse.
  *
  * Timestamps are left unchanged: densities per time window scale by the
  * factor, matching "same period, more traffic" — the realistic 100 TB
  * read of a bigger corpus.
  *
  * Usage: tools/run.sh graft.ScaleUp <srcDir> <dstDir> [factor]
  */
object ScaleUp {

  /** id columns shifted per table: (table, Seq(column -> strideOf)). A
    * column strides by ITS OWN table's PK domain unless aliased to the
    * referenced table's (FK integrity). */
  private val keyPlan: Seq[(String, Seq[(String, String)])] = Seq(
    "region" -> Seq.empty,
    "nation" -> Seq.empty,
    "customer" -> Seq("c_custkey" -> "customer"),
    "supplier" -> Seq("s_suppkey" -> "supplier"),
    "part" -> Seq("p_partkey" -> "part"),
    "orders" -> Seq("o_orderkey" -> "orders", "o_custkey" -> "customer"),
    "lineitem" -> Seq("l_orderkey" -> "orders", "l_partkey" -> "part",
      "l_suppkey" -> "supplier"),
    "events" -> Seq("event_id" -> "events:event_id", "user_id" -> "events:user_id"),
    "documents" -> Seq("doc_id" -> "documents"),
    "embeddings" -> Seq("vec_id" -> "embeddings"))

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleUp <srcDir> <dstDir> [factor]")
    val (srcDir, dstDir) = (args(0), args(1))
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    require(factor >= 1 && factor <= 99, s"factor must be 1..99, got $factor")
    val spark = GraftSession.create(defaultCpus = "16")

    def src(t: String): DataFrame = spark.read.parquet(s"$srcDir/$t.parquet")

    // PK stride per domain = max(id)+1 of the SOURCE table, so replica key
    // ranges are provably disjoint and FK arithmetic stays aligned.
    val strides: Map[String, Long] = keyPlan.flatMap { case (table, keys) =>
      keys.map(_._2).distinct.map {
        case dom @ s"$t:$c" =>
          dom -> (src(t).agg(max(col(c).cast("long"))).head().getLong(0) + 1)
        case dom =>
          val pk = keyPlan.toMap.apply(dom).head._1
          dom -> (src(dom).agg(max(col(pk).cast("long"))).head().getLong(0) + 1)
      }
    }.toMap
    println(s"strides: $strides")

    keyPlan.foreach { case (table, keys) =>
      val base = src(table)
      val out =
        if (keys.isEmpty) base // shared dims
        else {
          val replicas = (0 until factor).map { r =>
            val shifted = keys.foldLeft(base) { case (df, (c, dom)) =>
              // Preserve the source dtype (an int key + long literal would
              // silently widen the column and change the bench's schemas).
              df.withColumn(c,
                (col(c) + lit(strides(dom) * r)).cast(base.schema(c).dataType))
            }
            table match {
              case "documents" if r > 0 =>
                shifted
                  .withColumn("text", array_join(
                    transform(split(trim(col("text")), "\\s+"),
                      tk => concat(lit(s"u$r"), tk)), " "))
                  .withColumn("n_chars", length(col("text")))
              case "embeddings" if r > 0 =>
                val rot = (5 * r) % 64
                shifted.withColumn("embedding", concat(
                  slice(col("embedding"), rot + 1, 64 - rot),
                  slice(col("embedding"), 1, rot)))
              case _ => shifted
            }
          }
          replicas.reduce(_ unionByName _)
        }
      val n = out.count()
      out.repartition(1).write.mode("overwrite")
        .parquet(s"$dstDir/$table.parquet")
      println(f"$table%-10s rows=$n")
    }
    spark.stop()
  }
}
