package graft.operators

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal PNG codec for the multimodal hot path.
  *
  * `ImageIO.read`/`write` carry milliseconds of per-call overhead (reader
  * lookup, stream plumbing, color-model conversion) that dominates the
  * image pipeline when payloads are small — the 20× profile put the
  * encode+decode round trip at ~3.7 ms per image for 8–24 px PNGs. This
  * codec handles exactly the PNG common case directly over
  * `java.util.zip`:
  *
  *  - '''decode''': 8-bit-depth, non-interlaced, color types 0 (gray),
  *    2 (RGB), 4 (gray+alpha), 6 (RGBA), no tRNS. Anything else returns
  *    `None` and the caller falls back to ImageIO, so coverage never
  *    shrinks — only the constant factor does. Output samples are the raw
  *    PNG samples in (y, x, channel) order, which is byte-for-byte what
  *    `BufferedImage.getRaster.getSample` yields for these color types —
  *    and since all samples are integers, any sum of them in doubles is
  *    exact (each partial sum < 2^53), so downstream per-channel means are
  *    bit-identical to the ImageIO path (specced in PngCodecSpec).
  *  - '''encode''': RGB8 interleaved → filter-0 rows, one zlib stream,
  *    `Deflater(BEST_SPEED)`. Valid input for any PNG reader (the codec's
  *    own decoder, ImageIO, and external tools agree — specced).
  *
  * All chunk CRCs are computed with `java.util.zip.CRC32` and verified on
  * decode for the chunks the fast path consumes (IHDR/IDAT) — a corrupt
  * payload falls back rather than mis-decoding.
  */
object Png {

  private val Signature =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  /** Decoded image: width, height, channels, interleaved 8-bit samples
    * (length = width * height * channels, row-major, channel-interleaved —
    * the same (y, x, c) traversal order as a raster walk). */
  final case class Decoded(
      width: Int, height: Int, channels: Int, samples: Array[Byte])

  // ---------------------------------------------------------------- decode

  /** Fast-path decode; `None` for anything outside the supported profile
    * (caller falls back to ImageIO — never an error). */
  def decode(png: Array[Byte]): Option[Decoded] = {
    if (png == null || png.length < 45) return None
    var i = 0
    while (i < 8) { if (png(i) != Signature(i)) return None; i += 1 }

    var w = 0; var h = 0; var bitDepth = 0; var colorType = 0
    var interlace = 0
    var sawIhdr = false
    val idat = new ByteArrayOutputStream()
    var pos = 8
    var done = false
    try {
      while (!done && pos + 12 <= png.length) {
        val len = u32(png, pos)
        if (len < 0 || pos + 12 + len > png.length) return None
        val typ = new String(png, pos + 4, 4, "US-ASCII")
        typ match {
          case "IHDR" =>
            if (len != 13) return None
            if (!crcOk(png, pos, len)) return None
            w = u32(png, pos + 8)
            h = u32(png, pos + 12)
            bitDepth = png(pos + 16) & 0xff
            colorType = png(pos + 17) & 0xff
            // compression (18) and filter (19) methods must be 0
            if ((png(pos + 18) & 0xff) != 0 || (png(pos + 19) & 0xff) != 0)
              return None
            interlace = png(pos + 20) & 0xff
            sawIhdr = true
          case "IDAT" =>
            if (!crcOk(png, pos, len)) return None
            idat.write(png, pos + 8, len)
          case "PLTE" | "tRNS" =>
            // palette images and transparency chunks change what ImageIO's
            // raster exposes — out of the fast path's profile
            return None
          case "IEND" => done = true
          case _      => () // ancillary chunks don't affect raw samples
        }
        pos += 12 + len
      }
    } catch { case _: Exception => return None }

    if (!sawIhdr || w <= 0 || h <= 0) return None
    if (bitDepth != 8 || interlace != 0) return None
    val channels = colorType match {
      case 0 => 1 // gray
      case 2 => 3 // rgb
      case 4 => 2 // gray + alpha
      case 6 => 4 // rgba
      case _ => return None
    }
    val bpp = channels // bytes per pixel at bit depth 8
    // size arithmetic in Long BEFORE any Int is formed: a crafted IHDR
    // declaring a ~600M width would overflow `w * bpp` to a negative Int
    // and reach the allocation as a NegativeArraySizeException — decode
    // must never throw on malformed input, only decline
    val strideL = w.toLong * bpp
    val rawLenL = h.toLong * (strideL + 1L)
    if (rawLenL <= 0L || rawLenL > Int.MaxValue - 8) return None
    val stride = strideL.toInt
    val raw = new Array[Byte](rawLenL.toInt)
    val inflater = new Inflater()
    try {
      inflater.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, off, raw.length - off)
        // n == 0 without more input coming: truncated stream, or a
        // preset-dictionary stream (needsDictionary) — decline rather
        // than spin
        if (n == 0 && (inflater.needsInput() || inflater.needsDictionary()))
          return None
        off += n
      }
      if (off != raw.length) return None
    } catch { case _: Exception => return None }
    finally inflater.end()

    // unfilter in place into the output sample array
    val out = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val filter = raw(y * (stride + 1)) & 0xff
      val rowIn = y * (stride + 1) + 1
      val rowOut = y * stride
      val prevOut = rowOut - stride
      filter match {
        case 0 =>
          System.arraycopy(raw, rowIn, out, rowOut, stride)
        case 1 => // Sub
          var x = 0
          while (x < stride) {
            val left = if (x >= bpp) out(rowOut + x - bpp) & 0xff else 0
            out(rowOut + x) = ((raw(rowIn + x) & 0xff) + left).toByte
            x += 1
          }
        case 2 => // Up
          var x = 0
          while (x < stride) {
            val up = if (y > 0) out(prevOut + x) & 0xff else 0
            out(rowOut + x) = ((raw(rowIn + x) & 0xff) + up).toByte
            x += 1
          }
        case 3 => // Average
          var x = 0
          while (x < stride) {
            val left = if (x >= bpp) out(rowOut + x - bpp) & 0xff else 0
            val up = if (y > 0) out(prevOut + x) & 0xff else 0
            out(rowOut + x) =
              ((raw(rowIn + x) & 0xff) + ((left + up) >> 1)).toByte
            x += 1
          }
        case 4 => // Paeth
          var x = 0
          while (x < stride) {
            val a = if (x >= bpp) out(rowOut + x - bpp) & 0xff else 0
            val b = if (y > 0) out(prevOut + x) & 0xff else 0
            val c = if (x >= bpp && y > 0) out(prevOut + x - bpp) & 0xff else 0
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            out(rowOut + x) = ((raw(rowIn + x) & 0xff) + pred).toByte
            x += 1
          }
        case _ => return None
      }
      y += 1
    }
    Some(Decoded(w, h, channels, out))
  }

  // ---------------------------------------------------------------- encode

  /** Encode interleaved RGB8 samples (length = w*h*3) as a filter-0,
    * non-interlaced, 8-bit truecolor PNG. */
  def encodeRgb8(w: Int, h: Int, pixels: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0, "dimensions must be positive")
    require(pixels.length == w * h * 3,
      s"pixels must be w*h*3 = ${w * h * 3} bytes, got ${pixels.length}")
    val stride = w * 3
    // prepend the filter byte (0 = None) to each row, deflate in one stream
    val raw = new Array[Byte](h * (stride + 1))
    var y = 0
    while (y < h) {
      System.arraycopy(pixels, y * stride, raw, y * (stride + 1) + 1, stride)
      y += 1
    }
    val deflater = new Deflater(Deflater.BEST_SPEED)
    val idat =
      try {
        deflater.setInput(raw)
        deflater.finish()
        val buf = new Array[Byte](raw.length + (raw.length >> 1) + 64)
        val bos = new ByteArrayOutputStream(buf.length)
        while (!deflater.finished()) {
          val n = deflater.deflate(buf)
          bos.write(buf, 0, n)
        }
        bos.toByteArray
      } finally deflater.end()

    val ihdr = new Array[Byte](13)
    putU32(ihdr, 0, w)
    putU32(ihdr, 4, h)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // color type: truecolor
    // compression=0, filter=0, interlace=0 already zero

    val out = new ByteArrayOutputStream(idat.length + 64)
    out.write(Signature, 0, 8)
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", idat)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // ---------------------------------------------------------------- util

  private def u32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def putU32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte
    b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte
    b(off + 3) = v.toByte
  }

  /** CRC over type+data of the chunk whose length field starts at `pos`. */
  private def crcOk(png: Array[Byte], pos: Int, len: Int): Boolean = {
    val crc = new CRC32()
    crc.update(png, pos + 4, 4 + len)
    crc.getValue == (u32(png, pos + 8 + len).toLong & 0xffffffffL)
  }

  private def writeChunk(
      out: ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    val lenB = new Array[Byte](4)
    putU32(lenB, 0, data.length)
    out.write(lenB, 0, 4)
    val typB = typ.getBytes("US-ASCII")
    out.write(typB, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(typB, 0, 4)
    crc.update(data, 0, data.length)
    val crcB = new Array[Byte](4)
    putU32(crcB, 0, crc.getValue.toInt)
    out.write(crcB, 0, 4)
  }
}
