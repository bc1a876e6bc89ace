package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.functions.TextOps

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("payload plumbing: binary column + byte length") {
    val df = Multimodal.withPayload(Seq((1L, "abc"), (2L, "ab€")).toDF("id", "src"), "src")
    val rows = df.select("id", "byte_len").as[(Long, Int)].collect().toMap
    assert(rows(1L) == 3 && rows(2L) == 5) // € is 3 bytes in UTF-8
    assert(df.schema("payload").dataType.typeName == "binary")
  }

  test("decodeMeta: partition-wise stub decode is deterministic and schema-stable") {
    val df = Multimodal.withPayload(
      Seq((1L, "hello world"), (2L, "another payload")).toDF("id", "src"), "src")
    val out = Multimodal.decodeMeta(spark, df)
    assert(Seq("width", "height", "channels", "n_frames")
      .forall(out.columns.contains))
    val a = out.orderBy("id").select("width", "height", "channels", "n_frames")
      .as[(Int, Int, Int, Int)].collect().toSeq
    val b = Multimodal.decodeMeta(spark, df).orderBy("id")
      .select("width", "height", "channels", "n_frames")
      .as[(Int, Int, Int, Int)].collect().toSeq
    assert(a == b)                      // deterministic fake codec
    assert(a.forall(r => r._1 >= 64 && r._2 >= 64 && r._3 == 3 && r._4 >= 1))
    // identical payloads decode identically; different payloads may differ
    val same = Multimodal.decodeMeta(spark,
      Multimodal.withPayload(Seq((1L, "x"), (2L, "x")).toDF("id", "src"), "src"))
      .select("width").as[Int].collect().toSet
    assert(same.size == 1)
  }

  test("MediaHeaders parses real PNG / GIF / WAV header bytes") {
    // Ground-truth fixtures built byte-for-byte from the specs:
    // 97x59 PNG IHDR, 320x200 GIF89a screen, stereo 44.1 kHz WAV fmt.
    val png = Array[Int](0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A,
      0x00, 0x00, 0x00, 0x0D, 0x49, 0x48, 0x44, 0x52,
      0x00, 0x00, 0x00, 0x61, 0x00, 0x00, 0x00, 0x3B).map(_.toByte)
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array[Int](0x40, 0x01, 0xC8, 0x00).map(_.toByte) // 320 LE, 200 LE
    val wav = "RIFF".getBytes("US-ASCII") ++
      Array[Int](0x24, 0x08, 0x00, 0x00).map(_.toByte) ++
      "WAVEfmt ".getBytes("US-ASCII") ++
      Array[Int](0x10, 0x00, 0x00, 0x00, 0x01, 0x00, 0x02, 0x00,
        0x44, 0xAC, 0x00, 0x00).map(_.toByte) // PCM, 2 ch, 44100 LE
    val txt = "just text".getBytes("US-ASCII")
    val df = Seq((1L, png), (2L, gif), (3L, wav), (4L, txt)).toDF("id", "payload")
    val got = df.select(col("id"),
        MediaHeaders.kind(col("payload")).as("kind"),
        MediaHeaders.width(col("payload")).as("w"),
        MediaHeaders.height(col("payload")).as("h"),
        MediaHeaders.channels(col("payload")).as("ch"),
        MediaHeaders.sampleRate(col("payload")).as("sr"))
      .orderBy("id")
      .as[(Long, String, Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    assert(got == Seq(
      (1L, "png", Some(97L), Some(59L), None, None),
      (2L, "gif", Some(320L), Some(200L), None, None),
      (3L, "wav", None, None, Some(2L), Some(44100L)),
      (4L, "unknown", None, None, None, None)))
  }

  test("frame sampling explodes every stride-th index without shuffling") {
    val df = Multimodal.withPayload(
        Seq((1L, "a short clip payload"), (2L, "x")).toDF("id", "src"), "src")
      .withColumn("n_frames", lit(10))
    val sampled = Multimodal.sampleFrameIndexes(df, "n_frames", stride = 4)
    val idx = sampled.where(col("id") === 1)
      .select("frame_idx").as[Int].collect().toSeq
    assert(idx == Seq(0, 4, 8))
    sampled.queryExecution.toRdd
    val plan = sampled.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Exchange"), s"frame sampling shuffled:\n$plan")
  }

  test("extractFrame slices a deterministic per-frame window at the partition boundary") {
    val df = Multimodal.withPayload(
        Seq((1L, "abcdefghijklmnopqrstuvwxyz")).toDF("id", "src"), "src")
      .withColumn("n_frames", lit(4))
    val frames = Multimodal.extractFrame(
      Multimodal.sampleFrameIndexes(df, "n_frames", stride = 1))
    val got = frames.orderBy("frame_idx")
      .select(col("frame_idx"), col("frame_bytes").cast("string"))
      .as[(Int, String)].collect().toSeq
    assert(got.size == 4)
    assert(got.head == ((0, "abcdefghijklmnop"))) // window at offset 0
    assert(got(1)._2 == "qrstuvwxyzabcdef")       // offset 16 wraps
    // Deterministic across runs.
    val again = Multimodal.extractFrame(
      Multimodal.sampleFrameIndexes(df, "n_frames", stride = 1))
      .orderBy("frame_idx").select(col("frame_bytes").cast("string"))
      .as[String].collect().toSeq
    assert(again == got.map(_._2))
  }

  test("zero-frame and null/empty-payload rows degrade, never crash") {
    // n_frames = 0 (corrupt clip): sequence(0, -1, stride) would THROW at
    // runtime — the guard must drop the clip instead.
    val zero = Multimodal.withPayload(Seq((1L, "x")).toDF("id", "src"), "src")
      .withColumn("n_frames", lit(0))
    assert(Multimodal.sampleFrameIndexes(zero, "n_frames", 2).count() == 0)
    // Null n_frames likewise contributes no frames.
    val nul = Multimodal.withPayload(Seq((1L, "x")).toDF("id", "src"), "src")
      .withColumn("n_frames", lit(null).cast("int"))
    assert(Multimodal.sampleFrameIndexes(nul, "n_frames", 2).count() == 0)
    // Empty payload → empty frame; null payload → null frame — no
    // ArrayIndexOutOfBounds/NPE from the stub extractor.
    val edgy = Seq((1L, Array.empty[Byte]), (2L, null: Array[Byte]))
      .toDF("id", "payload").withColumn("n_frames", lit(1))
    val frames = Multimodal.extractFrame(
        Multimodal.sampleFrameIndexes(edgy, "n_frames", 1))
      .select(col("id"), octet_length(col("frame_bytes")))
      .as[(Long, Option[Int])].collect().toMap
    assert(frames(1L).contains(0) && frames(2L).isEmpty)
  }

  test("resizeMetaTo fits the long side with exact integer scaling") {
    val df = Seq((1, 1024, 512), (2, 100, 300), (3, 64, 64))
      .toDF("id", "width", "height")
    val got = Multimodal.resizeMetaTo(df, 256).orderBy("id")
      .select("resized_width", "resized_height").as[(Int, Int)].collect().toSeq
    // 1024x512: fit=ceil(1024/256)=4 -> 256x128; 100x300: fit=ceil(300/256)=2
    // -> 50x150; 64x64 under target -> unchanged.
    assert(got == Seq((256, 128), (50, 150), (64, 64)))
  }

  test("repetitionStats counts total vs distinct tokens and 2-grams") {
    val df = Seq(
      (1L, "a a a"),            // toks 3/1; 2-grams "a a","a a" → 2/1
      (2L, "x y x y x"),        // toks 5/2; 2-grams "x y","y x","x y","y x" → 4/2
      (3L, "one two three"),    // all distinct: 3/3, 2/2
      (4L, "solo")              // 1/1, 0 2-grams
    ).toDF("id", "text")
    val got = df.select(col("id"),
        TextOps.repetitionStats(col("text"), 1).as("s1"),
        TextOps.repetitionStats(col("text"), 2).as("s2"))
      .select(col("id"), col("s1.total"), col("s1.distinct"),
        col("s2.total"), col("s2.distinct"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 3L, 1L, 2L, 1L), (2L, 5L, 2L, 4L, 2L),
      (3L, 3L, 3L, 2L, 2L), (4L, 1L, 1L, 0L, 0L)))
  }

  test("langId picks the language whose markers dominate") {
    val df = Seq(
      (1L, "the cat sat on a mat full of the best wool"),
      (2L, "der hund und die katze und der vogel"),
      (3L, "el perro que ladra y los gatos que corren")
    ).toDF("id", "text")
    val preds = df.select(col("id"), TextOps.langId(col("text")).as("p"))
      .as[(Long, String)].collect().toMap
    assert(preds(1L) == "en")
    assert(preds(2L) == "de")
    assert(preds(3L) == "es")
  }
}
