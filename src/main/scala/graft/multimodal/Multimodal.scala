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

  /** Uniform frame sampling: one row per kept frame index (0, stride,
    * 2·stride, …) of each clip. Pure-column `sequence` + `explode` — scan-
    * local, no shuffle; rows expand by ⌈n_frames/stride⌉, which at video
    * scale is exactly the fan-out a frame-level training pipeline wants to
    * pay, and nothing more (the payload column is NOT duplicated
    * per-frame until [[extractFrame]] actually slices it). */
  def sampleFrameIndexes(df: DataFrame, nFramesCol: String,
                         stride: Int): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    require(!df.columns.contains("frame_idx"),
      "column frame_idx already exists on the input")
    // Guarded: sequence(0, -1, +stride) THROWS at runtime (illegal
    // boundaries), so a corrupt clip with n_frames <= 0 (or null) must
    // short-circuit to an empty array — explode then simply drops the
    // clip, instead of one bad row failing the whole job.
    val n = col(nFramesCol).cast("int")
    df.withColumn("frame_idx",
      explode(when(n >= 1, sequence(lit(0), n - 1, lit(stride)))
        .otherwise(array().cast("array<int>"))))
  }

  /** Partition-wise frame extraction over (payload, frame_idx) rows —
    * the decode boundary of a frame-sampling pipeline, same shape as
    * [[decodeMeta]]: one `mapPartitions` pass, codec init amortized per
    * partition, no shuffle. The STUB slices a deterministic window of the
    * payload per frame (real codecs decode-and-seek here); output schema =
    * input ++ (frame_bytes BINARY). */
  def extractFrame(df: DataFrame): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("frame_bytes", BinaryType, nullable = true))
    val payloadIdx = inSchema.fieldIndex("payload")
    val frameIdx = inSchema.fieldIndex("frame_idx")
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.map { row =>
        val payload = row.getAs[Array[Byte]](payloadIdx)
        val f = row.getInt(frameIdx)
        // ??? — real frame decode goes here (codec libs absent in this
        // container). Deterministic stand-in: a 16-byte rotating window.
        // Null payload → null frame; empty payload → empty frame — a
        // corrupt row degrades to a quarantineable value, never an
        // ArrayIndexOutOfBounds/NPE that fails the whole job.
        val frame =
          if (payload == null) null
          else if (payload.isEmpty) Array.empty[Byte]
          else {
            val n = payload.length
            val start = Math.floorMod(f * 16, n)
            Array.tabulate(math.min(16, n))(i => payload((start + i) % n))
          }
        Row.fromSeq(row.toSeq :+ frame)
      }
    }
  }

  /** Stub batch resize: rewrites the metadata columns to the target box
    * (aspect-preserving fit, integer arithmetic) WITHOUT touching payload
    * bytes — the pure-column half of a resize stage; the byte transform
    * itself belongs at the [[decodeMeta]]-style partition boundary. The
    * scale-down factor is ⌈max(w,h)/target⌉-style exact integer math so an
    * oracle can reproduce it. */
  def resizeMetaTo(df: DataFrame, target: Int): DataFrame = {
    require(target >= 1, s"target must be >= 1, got $target")
    val longSide = greatest(col("width"), col("height"))
    // Column `/` is DOUBLE division; floor() keeps it exact here (pixel
    // dims ≪ 2^53, so the double round-trip cannot lose integer precision).
    val fit = when(longSide <= target, lit(1L))
      .otherwise(floor((longSide + lit(target) - 1) / lit(target)).cast("long"))
    df.withColumn("resized_width",
        floor(col("width") / fit).cast("int"))
      .withColumn("resized_height",
        floor(col("height") / fit).cast("int"))
  }
}
