package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

/** Real image decode (JDK ImageIO): pixel-exact PNG round trip, the integer-exact
  * luminance grid, a FOREIGN checked-in PNG fixture (written by an independent
  * encoder, not ImageIO's own writer), and the extractFeatures kind/fallback
  * routing. */
class MultimodalSpec extends AnyFunSuite with SparkTest {

  test("synthetic PNG round trip is pixel-exact; lumaGridBp matches the closed form") {
    val id = 42L
    val img = Multimodal.decodeImage(Multimodal.syntheticPng(id, 16, 16)).get
    assert(img.getWidth == 16 && img.getHeight == 16)
    // spot-check pixels against the generator formula
    for ((x, y) <- Seq((0, 0), (7, 3), (15, 15))) {
      val v = ((7L * x + 13L * y + 31L * id) % 256L).toInt
      assert((img.getRGB(x, y) & 0xff) == v, s"pixel ($x,$y)")
    }
    // grid against a from-scratch reimplementation of the closed form
    val sums = Array.fill(16)(0L)
    val cnt = Array.fill(16)(0L)
    for (y <- 0 until 16; x <- 0 until 16) {
      val c = (y * 4 / 16) * 4 + (x * 4 / 16)
      sums(c) += (7L * x + 13L * y + 31L * id) % 256L
      cnt(c) += 1L
    }
    val expected = Array.tabulate(16)(c => 10000L * sums(c) / (255L * cnt(c)))
    assert(Multimodal.lumaGridBp(img, 4).toSeq == expected.toSeq)
  }

  test("a FOREIGN 8-bit grayscale PNG (independent encoder) decodes to pinned grid") {
    // written by a from-scratch python zlib/struct PNG writer — NOT ImageIO —
    // pixel (x,y) = (7x + 13y + 5) % 256 over 8x8; expected 2x2 grid computed from
    // the formula. Pins ImageIO's decode against an external producer.
    val b64 = "iVBORw0KGgoAAAANSUhEUgAAAAgAAAAICAAAAADhZOFXAAAAUElEQVR4nGNg5RGWUtTQ" +
      "N2MQklRQ1zO1cWaQV9M1sXbyDGDQMbZy9PAPi2WwdHD3C41JzmJw8w2JTsosKGcIjkrMyC+rbWFI" +
      "SM8rrWnumggAAKYSwWW2R9cAAAAASUVORK5CYII="
    val png = java.util.Base64.getDecoder.decode(b64)
    val img = Multimodal.decodeImage(png).get
    assert(img.getWidth == 8 && img.getHeight == 8)
    assert(Multimodal.lumaGridBp(img, 2).toSeq == Seq(1372L, 2470L, 3411L, 4509L))
  }

  test("indexed-color GIF (palette image) lumaGrid matches the same image as RGB") {
    // A GIF decodes to TYPE_BYTE_INDEXED where raster band 0 is a PALETTE INDEX,
    // not a gray value (round-4 advice): lumaGridBp must expand through the
    // palette. Encode the synthetic gradient as GIF with the JDK's own writer and
    // require the grid to equal the PNG (truecolor) grid of the SAME pixels.
    val id = 42L
    val rgb = Multimodal.decodeImage(Multimodal.syntheticPng(id, 16, 16)).get
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(rgb, "gif", bos), "JDK GIF writer missing")
    val gif = Multimodal.decodeImage(bos.toByteArray).get
    assert(gif.getColorModel.isInstanceOf[java.awt.image.IndexColorModel],
      s"fixture did not decode indexed: ${gif.getType}")
    // the gradient has 256 distinct gray values; GIF palettes hold 256 entries, so
    // the round trip is lossless and the grids must be IDENTICAL
    assert(Multimodal.lumaGridBp(gif, 4).toSeq == Multimodal.lumaGridBp(rgb, 4).toSeq)
  }

  test("decodeImage/decodeWavPcm16 swallow malformed payloads (NonFatal contract)") {
    // truncated/corrupted headers drive ImageIO plugin readers into unchecked
    // exceptions on some paths; the contract is None, never a throw
    val png = Multimodal.syntheticPng(7L, 8, 8)
    val wav = Multimodal.syntheticWav(7L, 64)
    for (cut <- Seq(2, 9, 16, 25, png.length - 3)) {
      val t = java.util.Arrays.copyOf(png, cut)
      assert(Multimodal.decodeImage(t).isEmpty || cut == png.length - 3,
        s"truncated png at $cut")
    }
    for (i <- 8 until 20) { // scribble over the IHDR length/type fields
      val bad = png.clone(); bad(i) = 0x7f
      Multimodal.decodeImage(bad) // must not throw; result may be Some or None
    }
    for (cut <- Seq(3, 11, 21, 43)) {
      val t = java.util.Arrays.copyOf(wav, cut)
      assert(Multimodal.decodeWavPcm16(t).isEmpty, s"truncated wav at $cut")
    }
    for (i <- 4 until 16) {
      val bad = wav.clone(); bad(i) = -1
      Multimodal.decodeWavPcm16(bad) // must not throw
    }
  }

  test("synthetic WAV round trip is sample-exact; frameEnergy matches closed form") {
    val id = 9L
    val n = 2048
    val samples = Multimodal.decodeWavPcm16(Multimodal.syntheticWav(id, n)).get
    assert(samples.length == n)
    for (i <- Seq(0, 1, 777, n - 1)) {
      val v = (((31L * id + 7L * i) % 65536L) - 32768L).toShort
      assert(samples(i) == v, s"sample $i")
    }
    // frame energies against a from-scratch reimplementation
    val sums = Array.fill(8)(0L)
    val cnt = Array.fill(8)(0L)
    for (i <- 0 until n) {
      val f = i * 8 / n
      sums(f) += math.abs((((31L * id + 7L * i) % 65536L) - 32768L))
      cnt(f) += 1L
    }
    val expected = Array.tabulate(8)(f => sums(f) / cnt(f))
    assert(Multimodal.frameEnergy(samples, 8).toSeq == expected.toSeq)
    // non-WAV bytes decode to None, never throw
    assert(Multimodal.decodeWavPcm16("not audio".getBytes("UTF-8")).isEmpty)
  }

  test("extractFeatures: real decode for images, stub for non-images and bad bytes") {
    import spark.implicits._
    val png = Multimodal.syntheticPng(7L, 16, 16)
    val textBytes = "not an image at all".getBytes("UTF-8")
    val wav = Multimodal.syntheticWav(5L, 1024)
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "image", png, 16, 16, 0L),
      Multimodal.MediaRow(2L, "image", textBytes, 0, 0, 0L),   // undecodable → stub
      Multimodal.MediaRow(3L, "audio", png, 0, 0, 1000L),      // not a WAV → stub
      Multimodal.MediaRow(4L, "audio", wav, 0, 0, 128L)))      // real PCM decode
    val out = Multimodal.extractFeatures(media, dim = 16)
      .collect().map(f => f.media_id -> f).toMap
    val gridF = Multimodal.lumaGridBp(Multimodal.decodeImage(png).get, 4)
      .map(_.toFloat / 10000f)
    assert(out(1L).features.toSeq == gridF.toSeq)
    assert(out(2L).features.toSeq == Multimodal.stubDecode(textBytes, 16).toSeq)
    assert(out(3L).features.toSeq == Multimodal.stubDecode(png, 16).toSeq)
    val energyF = Multimodal.frameEnergy(
      Multimodal.decodeWavPcm16(wav).get, 16).map(_.toFloat / 32768f)
    assert(out(4L).features.toSeq == energyF.toSeq)
    assert(out.values.forall(_.n_bytes > 0))
  }
}
