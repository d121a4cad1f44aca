package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{ImageIOCodec, MediaRow, StubCodec}

/** The real (`javax.imageio`) codec through the SAME mapPartitions batch
  * path as the stub: generated PNG/BMP images decode to known luminance
  * pixels, corrupt payloads degrade to empty features instead of failing
  * the stage, and the oracle-checked stub path is untouched by the codec
  * parameter (same plan, different decode). */
class MultimodalCodecSpec extends SparkSpecBase {

  /** A w×h RGB image whose pixel (x, y) is (r, g, b) = f(x, y), encoded
    * with the JDK writer for `fmt` (png / bmp — both lossless). */
  private def encodedImage(w: Int, h: Int, fmt: String)
                          (f: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = f(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"JDK has no $fmt writer")
    bos.toByteArray
  }

  /** The codec's integer luminance — recomputed independently here. */
  private def lum(r: Int, g: Int, b: Int): Int = (r * 299 + g * 587 + b * 114) / 1000

  test("ImageIOCodec decodes generated PNG and BMP through extractFeatures") {
    val session = spark
    import session.implicits._
    // gradient PNG: pixel value depends on position, so a wrong scan order
    // or channel mix-up shifts the mean; solid BMP: exact known mean
    val png = encodedImage(16, 8, "png")((x, y) => (x * 15, y * 30, 128))
    val bmp = encodedImage(4, 4, "bmp")((_, _) => (200, 100, 50))
    val rows = Seq(
      MediaRow(1L, png, "image/png", 16, 8, png.length.toLong),
      MediaRow(2L, bmp, "image/bmp", 4, 4, bmp.length.toLong))
    val got = Multimodal.extractFeatures(rows.toDF(), ImageIOCodec)
      .collect().sortBy(_.doc_id)

    val expPng = (for (y <- 0 until 8; x <- 0 until 16)
      yield lum(x * 15, y * 30, 128)).toSeq
    assert(got(0).mean_byte == expPng.sum.toDouble / expPng.size)
    // feature = first 8 pixels in row-major order
    assert(got(0).feature.toSeq == expPng.take(8).map(_.toFloat))

    val expBmp = lum(200, 100, 50)
    assert(got(1).mean_byte == expBmp.toDouble)
    assert(got(1).feature.toSeq == Seq.fill(8)(expBmp.toFloat))
  }

  test("corrupt payloads decode to empty features, not a failed stage") {
    val session = spark
    import session.implicits._
    // unrecognized bytes AND a valid PNG signature over garbage chunk
    // data — the latter drives the reader into its chunk parser, whose
    // failures are not always IOException (NonFatal catch required)
    val sigGarbage = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A,
      0x1A, 0x0A) ++ Array.tabulate(64)(i => (i * 37).toByte)
    val rows = Seq(
      MediaRow(9L, Array[Byte](1, 2, 3), "image/png", 4, 4, 3L),
      MediaRow(10L, sigGarbage, "image/png", 4, 4, sigGarbage.length.toLong))
    val got = Multimodal.extractFeatures(rows.toDF(), ImageIOCodec).collect()
    assert(got.length == 2 && got.forall(r => r.mean_byte == 0.0 &&
      r.feature.forall(_ == 0f)))
  }

  test("codec parameter defaults to the oracle-replayable stub") {
    val session = spark
    import session.implicits._
    val payload = Array[Byte](10, 20, 30)
    val rows = Seq(MediaRow(5L, payload, "image/fake", 2, 2, 3L))
    val viaDefault = Multimodal.extractFeatures(rows.toDF()).collect().head
    val viaStub = Multimodal.extractFeatures(rows.toDF(), StubCodec).collect().head
    // stub tiles payload to w·h = 4 bytes: 10, 20, 30, 10
    assert(viaDefault.mean_byte == (10 + 20 + 30 + 10) / 4.0)
    assert(viaDefault.mean_byte == viaStub.mean_byte &&
      viaDefault.feature.toSeq == viaStub.feature.toSeq)
  }

  test("PcmCodec + extractAudioFeatures find the loud frame in a known waveform") {
    val session = spark
    import session.implicits._
    // 3 complete frames (64 samples = 128 bytes each) + a dangling half
    // frame that must be ignored: frame 0 silent, frame 1 all +1000,
    // frame 2 all -2000 (negative amplitudes count via abs)
    def pcm(v: Int): Array[Byte] =
      Array.fill(64)(Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)).flatten
    val payload = pcm(0) ++ pcm(1000) ++ pcm(-2000) ++ Array.fill(60)(7.toByte)
    val rows = Seq(MediaRow(1L, payload, "audio/pcm", 0, 0, payload.length.toLong),
      MediaRow(2L, Array[Byte](1, 2, 3), "audio/pcm", 0, 0, 3L)) // sub-frame: dropped
    val got = Multimodal.extractAudioFeatures(rows.toDF()).collect()
    assert(got.length == 1)
    val f = got.head
    assert(f.doc_id == 1L && f.n_frames == 3L)
    assert(f.peak_frame == 2L && f.peak_amp_m == 2000L)
    assert(f.mean_amp_m == (0L + 1000 * 64 + 2000 * 64) / (3 * 64))
  }

  test("PcmCodec decodes signed 16-bit little-endian including the extremes") {
    import graft.multimodal.Multimodal.PcmCodec
    val bytes = Array[Byte](
      0x00, 0x00,              // 0
      0xFF.toByte, 0x7F,       // 32767
      0x00, 0x80.toByte,       // -32768
      0x01, 0xFF.toByte)       // -255
    assert(PcmCodec.decode(bytes).toSeq == Seq(0, 32767, -32768, -255))
  }
}
