package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{CRC32, Deflater}
import javax.imageio.ImageIO

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** The [[Png]] fast path must be indistinguishable from the ImageIO walk
  * it replaces: same dims, bands, and BIT-IDENTICAL per-channel means on
  * every PNG inside its profile, and a clean `None` (→ ImageIO fallback)
  * on everything outside it. Filter coverage is forced, not sampled: a
  * test-side encoder writes each of the five PNG row filters explicitly,
  * since adaptive encoders won't reliably emit all of them. */
class PngCodecSpec extends AnyFunSuite {

  private def crcChunk(out: ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    def u32(v: Int): Array[Byte] =
      Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    out.write(u32(data.length), 0, 4)
    val t = typ.getBytes("US-ASCII")
    out.write(t, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(t); crc.update(data)
    out.write(u32(crc.getValue.toInt), 0, 4)
  }

  /** Encode samples as a PNG whose EVERY row uses `filter` (0–4). */
  private def encodeForcedFilter(
      w: Int, h: Int, colorType: Int, samples: Array[Byte], filter: Int): Array[Byte] = {
    val ch = colorType match { case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4 }
    val stride = w * ch
    val raw = new Array[Byte](h * (stride + 1))
    var y = 0
    while (y < h) {
      raw(y * (stride + 1)) = filter.toByte
      var x = 0
      while (x < stride) {
        val cur = samples(y * stride + x) & 0xff
        val left = if (x >= ch) samples(y * stride + x - ch) & 0xff else 0
        val up = if (y > 0) samples((y - 1) * stride + x) & 0xff else 0
        val ul = if (x >= ch && y > 0) samples((y - 1) * stride + x - ch) & 0xff else 0
        val enc = filter match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - ((left + up) >> 1)
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
            cur - pred
        }
        raw(y * (stride + 1) + 1 + x) = enc.toByte
        x += 1
      }
      y += 1
    }
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length * 2 + 64)
    val idat = new ByteArrayOutputStream()
    while (!d.finished()) idat.write(buf, 0, d.deflate(buf))
    d.end()
    val ihdr = new Array[Byte](13)
    ihdr(0) = (w >>> 24).toByte; ihdr(1) = (w >>> 16).toByte
    ihdr(2) = (w >>> 8).toByte; ihdr(3) = w.toByte
    ihdr(4) = (h >>> 24).toByte; ihdr(5) = (h >>> 16).toByte
    ihdr(6) = (h >>> 8).toByte; ihdr(7) = h.toByte
    ihdr(8) = 8; ihdr(9) = colorType.toByte
    val out = new ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'), 0, 8)
    crcChunk(out, "IHDR", ihdr)
    crcChunk(out, "IDAT", idat.toByteArray)
    crcChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def assertSameDecode(png: Array[Byte]): Unit = {
    val fast = Multimodal.decodeImage(png)
    val base = Multimodal.decodeImageIo(png)
    assert(fast.isDefined && base.isDefined)
    val (fw, fh, fc, fm) = fast.get
    val (bw, bh, bc, bm) = base.get
    assert((fw, fh, fc) === ((bw, bh, bc)))
    assert(fm.toSeq === bm.toSeq) // bit-identical doubles, not approx
  }

  test("every filter type x every color type decodes identically to ImageIO") {
    val rnd = new Random(7)
    for (colorType <- Seq(0, 2, 4, 6); filter <- 0 to 4) {
      val (w, h) = (23, 11)
      val ch = colorType match { case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4 }
      val samples = Array.fill[Byte](w * h * ch)(rnd.nextInt(256).toByte)
      val png = encodeForcedFilter(w, h, colorType, samples, filter)
      // the fast path must actually engage for these
      val d = Png.decode(png)
      assert(d.isDefined, s"fast path skipped colorType=$colorType filter=$filter")
      assert(d.get.samples.toSeq === samples.toSeq,
        s"samples drifted colorType=$colorType filter=$filter")
      assertSameDecode(png)
    }
  }

  test("encodeRgb8 round-trips through both our decoder and ImageIO") {
    val rnd = new Random(13)
    val (w, h) = (17, 29)
    val pixels = Array.fill[Byte](w * h * 3)(rnd.nextInt(256).toByte)
    val png = Png.encodeRgb8(w, h, pixels)
    val ours = Png.decode(png).get
    assert((ours.width, ours.height, ours.channels) === ((w, h, 3)))
    assert(ours.samples.toSeq === pixels.toSeq)
    val img = ImageIO.read(new ByteArrayInputStream(png))
    assert(img.getWidth === w && img.getHeight === h)
    val raster = img.getRaster
    assert(raster.getNumBands === 3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      assert(raster.getSample(x, y, c) === (pixels((y * w + x) * 3 + c) & 0xff))
  }

  test("solidPng through the codec still decodes to exact integer means") {
    val Some((w, h, ch, means)) = Multimodal.decodeImage(
      Multimodal.solidPng(13, 9, 200, 55, 7))
    assert((w, h, ch) === ((13, 9, 3)))
    assert(means.toSeq === Seq(200.0, 55.0, 7.0))
  }

  test("ImageIO-encoded PNGs (adaptive filters) take the fast path and agree") {
    val rnd = new Random(99)
    for (imgType <- Seq(BufferedImage.TYPE_INT_RGB, BufferedImage.TYPE_BYTE_GRAY)) {
      val (w, h) = (31, 19)
      val img = new BufferedImage(w, h, imgType)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, rnd.nextInt())
      val baos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", baos)
      val png = baos.toByteArray
      assert(Png.decode(png).isDefined, s"fast path skipped imgType=$imgType")
      assertSameDecode(png)
    }
  }

  test("property: random dims x colors x filters round-trip bit-exactly " +
    "through the codec and agree with ImageIO") {
    val rnd = new Random(2024)
    (0 until 60).foreach { _ =>
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(40)
      val colorType = Seq(0, 2, 4, 6)(rnd.nextInt(4))
      val ch = colorType match { case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4 }
      val filter = rnd.nextInt(5)
      val samples = Array.fill[Byte](w * h * ch)(rnd.nextInt(256).toByte)
      val png = encodeForcedFilter(w, h, colorType, samples, filter)
      val d = Png.decode(png)
      assert(d.isDefined, s"w=$w h=$h ct=$colorType f=$filter")
      assert(d.get.samples.toSeq == samples.toSeq,
        s"sample drift w=$w h=$h ct=$colorType f=$filter")
      assertSameDecode(png)
      // our own encoder round-trips the RGB slice of the space too
      if (colorType == 2) {
        val reenc = Png.encodeRgb8(w, h, samples)
        assert(Png.decode(reenc).get.samples.toSeq == samples.toSeq)
      }
    }
  }

  test("out-of-profile payloads fall back instead of mis-decoding") {
    // palette PNG: fast path declines, ImageIO fallback still decodes
    val indexed = new BufferedImage(8, 8, BufferedImage.TYPE_BYTE_INDEXED)
    val baos = new ByteArrayOutputStream()
    ImageIO.write(indexed, "png", baos)
    val palettePng = baos.toByteArray
    assert(Png.decode(palettePng).isEmpty)
    assert(Multimodal.decodeImage(palettePng).isDefined)

    // 16-bit gray: outside the 8-bit profile
    val deep = new BufferedImage(8, 8, BufferedImage.TYPE_USHORT_GRAY)
    val baos2 = new ByteArrayOutputStream()
    ImageIO.write(deep, "png", baos2)
    assert(Png.decode(baos2.toByteArray).isEmpty)
    assert(Multimodal.decodeImage(baos2.toByteArray).isDefined)

    // corrupt IDAT CRC: fast path declines cleanly
    val good = Multimodal.solidPng(6, 6, 1, 2, 3)
    val bad = good.clone()
    bad(bad.length - 20) = (bad(bad.length - 20) ^ 0x7f).toByte // inside IDAT data/crc tail
    assert(Png.decode(bad).isEmpty)

    // non-image garbage: both paths decline
    assert(Multimodal.decodeImage("not a png".getBytes) === None)
    assert(Multimodal.decodeImage(null) === None)

    // crafted IHDR with a ~600M width (valid CRCs): w*bpp overflows Int —
    // decode must DECLINE, never throw, and decodeImage must stay total
    val huge = {
      val out = new ByteArrayOutputStream()
      out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'), 0, 8)
      val ihdr = new Array[Byte](13)
      val w = 600000000
      ihdr(0) = (w >>> 24).toByte; ihdr(1) = (w >>> 16).toByte
      ihdr(2) = (w >>> 8).toByte; ihdr(3) = w.toByte
      ihdr(7) = 2 // height 2
      ihdr(8) = 8; ihdr(9) = 6 // bit depth 8, RGBA (bpp 4)
      crcChunk(out, "IHDR", ihdr)
      crcChunk(out, "IDAT", Array[Byte](1, 2, 3))
      crcChunk(out, "IEND", Array.emptyByteArray)
      out.toByteArray
    }
    assert(Png.decode(huge).isEmpty)
    assert(Multimodal.decodeImage(huge) === None)
  }
}
