package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Real container-header parsing for media binary columns — pure `Column`
  * byte arithmetic over `hex(payload)` (codegen'd, no UDF, no native
  * libraries): magic-number detection plus width/height/channels/sample-rate
  * extraction for PNG (IHDR, big-endian), GIF (logical screen, little-
  * endian) and WAV (RIFF fmt chunk, little-endian).
  *
  * This is the codegen-friendly fast path for the header fields; the full
  * pixel/sample decode lives at [[Multimodal.JvmCodec]]'s partition
  * boundary (pure-JDK javax.imageio / javax.sound.sampled), and the two
  * cross-check each other in MultimodalSpec.
  * Parsing the fixed-offset header fields is exact byte arithmetic, which
  * is precisely what a Column expression does best: it runs inside
  * whole-stage codegen and never leaves the scan's projection.
  */
object MediaHeaders {

  /** Hex of only the header prefix — all parsed fields live in the first
    * 28 bytes, so never hex-encode a multi-megabyte payload to peek at
    * fixed offsets (hex(bin) alone would be O(payload) work and a
    * 2×-size string per evaluation). */
  private def hdr(bin: Column): Column = hex(substring(bin, 1, 32))

  /** Numeric value of the byte at 1-based offset `off`. */
  private def byteAt(bin: Column, off: Int): Column =
    conv(substring(hdr(bin), off * 2 - 1, 2), 16, 10).cast("long")

  /** Big-endian 4-byte unsigned int at 1-based byte offset. */
  private def beInt(bin: Column, off: Int): Column =
    conv(substring(hdr(bin), off * 2 - 1, 8), 16, 10).cast("long")

  /** Little-endian 2-byte unsigned at 1-based byte offset. */
  private def leShort(bin: Column, off: Int): Column =
    byteAt(bin, off + 1) * 256 + byteAt(bin, off)

  /** Little-endian 4-byte unsigned at 1-based byte offset. */
  private def leInt(bin: Column, off: Int): Column =
    ((byteAt(bin, off + 3) * 256 + byteAt(bin, off + 2)) * 256 +
      byteAt(bin, off + 1)) * 256 + byteAt(bin, off)

  private def hexAt(bin: Column, off: Int, hexLit: String): Column =
    substring(hdr(bin), off * 2 - 1, hexLit.length) === hexLit

  def isPng(bin: Column): Column = hexAt(bin, 1, "89504E470D0A1A0A")
  def isGif(bin: Column): Column = hexAt(bin, 1, "474946")
  def isWav(bin: Column): Column =
    hexAt(bin, 1, "52494646") && hexAt(bin, 9, "57415645")

  /** Container kind by magic number; "unknown" for anything else. */
  def kind(bin: Column): Column =
    when(isPng(bin), "png").when(isGif(bin), "gif").when(isWav(bin), "wav")
      .otherwise("unknown")

  /** Pixel width (PNG: IHDR bytes 17-20 BE; GIF: screen bytes 7-8 LE);
    * null for audio/unknown. */
  def width(bin: Column): Column =
    when(isPng(bin), beInt(bin, 17)).when(isGif(bin), leShort(bin, 7))

  /** Pixel height (PNG bytes 21-24 BE; GIF bytes 9-10 LE). */
  def height(bin: Column): Column =
    when(isPng(bin), beInt(bin, 21)).when(isGif(bin), leShort(bin, 9))

  /** Audio channel count (WAV fmt bytes 23-24 LE); null for images. */
  def channels(bin: Column): Column = when(isWav(bin), leShort(bin, 23))

  /** Audio sample rate (WAV fmt bytes 25-28 LE); null for images. */
  def sampleRate(bin: Column): Column = when(isWav(bin), leInt(bin, 25))
}
