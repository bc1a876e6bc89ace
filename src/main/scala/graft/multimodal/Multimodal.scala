package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata.
  *
  * The Spark-side architecture is real and tested — schema, partition-wise
  * batch decode via `mapPartitions`, stable UDF signature — while the codec
  * itself is STUBBED with a deterministic fake (this container has no
  * image/audio libraries). Swap [[StubCodec.decode]] for a real decoder
  * (JNI/FFI or subprocess) without touching the pipeline shape: decode runs
  * once per partition iterator, so codec init cost amortizes across the
  * partition exactly like an Arrow-batched UDF would.
  */
object Multimodal {

  /** Metadata produced by decoding one payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** Wrap a string column as the opaque binary payload + byte length —
    * the ingestion shape for media blobs arriving via parquet. */
  def withPayload(df: DataFrame, srcCol: String): DataFrame =
    df.withColumn("payload", col(srcCol).cast("binary"))
      .withColumn("byte_len", octet_length(col(srcCol)))

  /** Deterministic fake codec — replace with a real one. Derives plausible
    * dimensions from the payload bytes so tests are reproducible. */
  object StubCodec {
    def decode(payload: Array[Byte]): Row = {
      // ??? — real image/audio decode goes here (libs absent in container).
      val n = payload.length
      var h = 1469598103934665603L
      var i = 0
      while (i < math.min(n, 64)) { h ^= payload(i); h *= 1099511628211L; i += 1 }
      val w = 64 + (Math.floorMod(h, 512L)).toInt
      Row(w, 64 + Math.floorMod(n, 512), 3, 1 + Math.floorMod(n, 16))
    }
  }

  /** Partition-wise decode: one `mapPartitions` pass, preserving the input
    * partitioning (no shuffle). Output schema = input ++ mediaMetaSchema.
    * Stays in the Dataset API (row encoder) rather than dropping to
    * `df.rdd` — the plan keeps its columnar scan + codegen stages up to the
    * decode boundary instead of forcing a full RDD conversion. */
  def decodeMeta(spark: SparkSession, df: DataFrame): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ mediaMetaSchema.fields)
    val payloadIdx = inSchema.fieldIndex("payload")
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.map { row =>
        val meta = StubCodec.decode(row.getAs[Array[Byte]](payloadIdx))
        Row.fromSeq(row.toSeq ++ meta.toSeq)
      }
    }
  }

  /** Pure-Column metadata derivation (oracle-portable variant): dimensions
    * as exact integer arithmetic on the byte length. */
  def fakeMetaColumns(df: DataFrame): DataFrame =
    df.withColumn("width", (lit(64) + col("byte_len") % 512).cast("int"))
      .withColumn("height", (lit(64) + (col("byte_len") * 7) % 512).cast("int"))
      .withColumn("channels", lit(3))
}
