package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in fixed-size batches.
  *
  * Image decode and resize are REAL kernels over `javax.imageio.ImageIO`
  * (PNG/JPEG/BMP/GIF — ships with the JDK, no external dependency):
  * [[decodeImage]] → dimensions + per-channel means, [[resizeImage]] →
  * re-encoded PNG at target dimensions, both lifted to Datasets through the
  * same batched `mapPartitions` shape. Audio metadata is a REAL kernel
  * too: [[decodeWav]] parses the RIFF/WAVE header (pure JDK byte walk —
  * PCM metadata needs no codec) into sample rate / channels / bit depth /
  * frame count / duration, with the same quarantine shape. Video METADATA
  * is a REAL kernel as well: [[decodeMp4]] walks the ISO-BMFF/MP4 box tree
  * (duration, track count, codec fourcc, dimensions, frame count — pure
  * JDK, container metadata needs no codec). Only video PIXEL decode stays
  * a stub (`decodeStub`/`sampleFramesStub` — no video codec exists in the
  * JDK): those derive deterministic pseudo-features so the full pipeline
  * stays exercised end-to-end; a real codec slots into the same `Iterator`
  * shape a JNI or process-per-partition decoder would use (the Scala
  * analog of `mapInPandas` batch processing).
  */
object Multimodal {

  /** One media asset: id + opaque payload + metadata. */
  final case class MediaRow(
      media_id: Long,
      payload: Array[Byte],
      mime: String,
      width: Int,
      height: Int)

  /** Extracted features: fixed-dim vector + decoded dimensions. Double
    * slots so integer-valued features (the stub's byte sums) stay exact up
    * to 2^53 — no payload-size bound on the checksum contract. */
  final case class MediaFeatures(
      media_id: Long,
      mime: String,
      n_bytes: Long,
      features: Array[Double])

  /** Decoded image metadata + per-channel statistics. `ok = false` rows
    * carry the undecodable payloads (corrupt bytes, unsupported codec) —
    * kept rather than dropped so a pipeline can quarantine them. */
  final case class ImageMeta(
      media_id: Long,
      mime: String,
      n_bytes: Long,
      ok: Boolean,
      width: Int,
      height: Int,
      channels: Int,
      channel_mean: Array[Double])

  /** REAL image decode: dimensions, band count, per-channel mean sample
    * value. Returns None when the payload is not a decodable image.
    *
    * Common-profile PNGs (8-bit, non-interlaced, no palette/tRNS) take the
    * [[Png]] fast path — raw samples are identical to what ImageIO's
    * raster exposes for those color types, and the sums are integer-exact
    * in doubles, so the result is bit-identical to the ImageIO walk
    * (PngCodecSpec pins the equivalence per filter type and color type).
    * Everything else — other formats, other PNG profiles — falls back to
    * ImageIO unchanged. */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Int, Array[Double])] =
    Png.decode(payload) match {
      case Some(d) =>
        val ch = d.channels
        val sums = new Array[Double](ch)
        val samples = d.samples
        var i = 0
        while (i < samples.length) {
          var c = 0
          while (c < ch) { sums(c) += samples(i + c) & 0xff; c += 1 }
          i += ch
        }
        val n = d.width.toDouble * d.height.toDouble
        Some((d.width, d.height, ch, sums.map(_ / n)))
      case None => decodeImageIo(payload)
    }

  /** The ImageIO fallback walk (also the fast path's equivalence baseline). */
  private[operators] def decodeImageIo(
      payload: Array[Byte]): Option[(Int, Int, Int, Array[Double])] =
    try {
      Option(ImageIO.read(new ByteArrayInputStream(payload))).map { img =>
        val w = img.getWidth
        val h = img.getHeight
        val raster = img.getRaster
        val ch = raster.getNumBands
        val sums = new Array[Double](ch)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var c = 0
            while (c < ch) { sums(c) += raster.getSample(x, y, c); c += 1 }
            x += 1
          }
          y += 1
        }
        val n = w.toDouble * h.toDouble
        (w, h, ch, sums.map(_ / n))
      }
    } catch { case _: Exception => None }

  /** Batched image decode over a media Dataset — the real-codec twin of
    * [[extractFeatures]]. Undecodable rows come back with `ok = false`. */
  def decodeImages(ds: Dataset[MediaRow], batchSize: Int = 64): Dataset[ImageMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(_.iterator.map { r =>
      decodeImage(r.payload) match {
        case Some((w, h, ch, means)) =>
          ImageMeta(r.media_id, r.mime, r.payload.length.toLong, ok = true,
            w, h, ch, means)
        case None =>
          ImageMeta(r.media_id, r.mime, r.payload.length.toLong, ok = false,
            0, 0, 0, Array.empty[Double])
      }
    }))
  }

  /** REAL image resize (ImageIO + Graphics2D): decode, scale to
    * `targetW`×`targetH`, re-encode as PNG. None when not decodable. */
  def resizeImage(payload: Array[Byte], targetW: Int, targetH: Int): Option[Array[Byte]] =
    try {
      Option(ImageIO.read(new ByteArrayInputStream(payload))).map { img =>
        val out = new BufferedImage(targetW, targetH, BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try g.drawImage(img, 0, 0, targetW, targetH, null)
        finally g.dispose()
        val baos = new ByteArrayOutputStream()
        ImageIO.write(out, "png", baos)
        baos.toByteArray
      }
    } catch { case _: Exception => None }

  /** Batched image resize; undecodable payloads pass through unchanged. */
  def resizeImages(
      ds: Dataset[MediaRow],
      targetW: Int,
      targetH: Int,
      batchSize: Int = 64
  ): Dataset[MediaRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(_.iterator.map { r =>
      resizeImage(r.payload, targetW, targetH) match {
        case Some(png) => MediaRow(r.media_id, png, "image/png", targetW, targetH)
        case None      => r
      }
    }))
  }

  /** Decoded audio metadata. `ok = false` rows carry non-WAV/corrupt
    * payloads (quarantine shape, like [[ImageMeta]]). */
  final case class AudioMeta(
      media_id: Long,
      mime: String,
      n_bytes: Long,
      ok: Boolean,
      sample_rate: Int,
      channels: Int,
      bits_per_sample: Int,
      n_frames: Long,
      duration_sec: Double)

  /** REAL audio metadata kernel: RIFF/WAVE header parse (pure JDK — PCM
    * container metadata needs no codec). Walks the chunk list, reads the
    * `fmt ` chunk (channels, sample rate, block align, bit depth) and the
    * `data` chunk size (frame count = data bytes / block align). Returns
    * (sampleRate, channels, bitsPerSample, nFrames), or None for
    * non-RIFF/truncated/malformed payloads. */
  def decodeWav(payload: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    def u16(off: Int): Int =
      (payload(off) & 0xFF) | ((payload(off + 1) & 0xFF) << 8)
    def u32(off: Int): Long =
      (payload(off) & 0xFFL) | ((payload(off + 1) & 0xFFL) << 8) |
        ((payload(off + 2) & 0xFFL) << 16) | ((payload(off + 3) & 0xFFL) << 24)
    def tag(off: Int): String =
      new String(payload, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    try {
      if (payload.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var off = 12
      // audioFormat, channels, rate, blockAlign, bits
      var fmt: Option[(Int, Int, Int, Int, Int)] = None
      var dataBytes: Option[Long] = None
      while (off + 8 <= payload.length && (fmt.isEmpty || dataBytes.isEmpty)) {
        val id = tag(off)
        // clamp a corrupt/oversized chunk length to the remaining bytes:
        // never overflows Int, never walks backwards, and a truncated data
        // chunk reports the frames actually present
        val size = math.min(u32(off + 4), (payload.length - off - 8).toLong).toInt
        if (id == "fmt " && size >= 16)
          fmt = Some((u16(off + 8), u16(off + 10), u32(off + 12).toInt,
            u16(off + 20), u16(off + 22)))
        else if (id == "data")
          dataBytes = Some(size.toLong)
        // chunks are word-aligned: odd sizes carry a pad byte
        off += 8 + size + (size & 1)
      }
      // frames = data/blockAlign holds only for uncompressed layouts:
      // integer PCM (1), IEEE-float PCM (3), extensible (0xFFFE, which
      // wraps a PCM subformat with blockAlign still bytes-per-frame).
      // A compressed tag (ADPCM 2/17, …) uses blockAlign as the
      // compressed block size — quarantine instead of reporting a frame
      // count off by the compression factor
      for ((af, ch, rate, blockAlign, bits) <- fmt; data <- dataBytes
           if (af == 1 || af == 3 || af == 0xFFFE) &&
             ch > 0 && rate > 0 && blockAlign > 0)
        yield (rate, ch, bits, data / blockAlign)
    } catch { case _: Exception => None }
  }

  /** REAL WAV encoder — the write twin of [[decodeWav]]: canonical 44-byte
    * RIFF/WAVE header (PCM `fmt ` + `data` chunks) around raw PCM bytes.
    * Built with little-endian `ByteBuffer` puts, independent of the
    * parser's manual byte walk, so an encode→decode round trip exercises
    * both directions of the RIFF layout (the oracle hook for
    * `multimodal_audio`). */
  def encodeWav(
      sampleRate: Int,
      channels: Int,
      bitsPerSample: Int,
      data: Array[Byte]): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    import java.nio.charset.StandardCharsets.US_ASCII
    val blockAlign = channels * bitsPerSample / 8
    val buf = ByteBuffer.allocate(44 + data.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(US_ASCII)).putInt(36 + data.length)
      .put("WAVE".getBytes(US_ASCII))
      .put("fmt ".getBytes(US_ASCII)).putInt(16)
      .putShort(1.toShort) // audio format 1 = PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign)
      .putShort(blockAlign.toShort)
      .putShort(bitsPerSample.toShort)
      .put("data".getBytes(US_ASCII)).putInt(data.length)
      .put(data)
    buf.array()
  }

  /** Deterministic solid-color PNG — the fixture generator for oracling
    * [[decodeImage]] on real PNG payloads: a constant-fill image makes the
    * decoded per-channel means exact integers (`mean == fill value`), so
    * the kernel's sample walk is checkable bit-exactly from the generating
    * formula. Encoded through [[Png.encodeRgb8]] (a valid truecolor PNG
    * any reader decodes — ImageIO round-trip specced); the JDK decoder
    * remains the equivalence baseline in PngCodecSpec. */
  def solidPng(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val pixels = new Array[Byte](width * height * 3)
    var i = 0
    while (i < pixels.length) {
      pixels(i) = r.toByte
      pixels(i + 1) = g.toByte
      pixels(i + 2) = b.toByte
      i += 3
    }
    Png.encodeRgb8(width, height, pixels)
  }

  /** Batched audio metadata extraction — the audio twin of
    * [[decodeImages]]; undecodable rows come back `ok = false`. */
  def decodeAudio(ds: Dataset[MediaRow], batchSize: Int = 64): Dataset[AudioMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(_.iterator.map { r =>
      decodeWav(r.payload) match {
        case Some((rate, ch, bits, frames)) =>
          AudioMeta(r.media_id, r.mime, r.payload.length.toLong, ok = true,
            rate, ch, bits, frames, frames.toDouble / rate)
        case None =>
          AudioMeta(r.media_id, r.mime, r.payload.length.toLong, ok = false,
            0, 0, 0, 0L, 0.0)
      }
    }))
  }

  /** Decoded video metadata — the quarantine shape of [[ImageMeta]] /
    * [[AudioMeta]]. Duration is carried as the container's exact rational
    * (`duration_ticks` / `timescale`) plus the derived `duration_sec`;
    * codec/width/height/frame count come from the first video track. */
  final case class VideoMeta(
      media_id: Long,
      mime: String,
      n_bytes: Long,
      ok: Boolean,
      timescale: Long,
      duration_ticks: Long,
      duration_sec: Double,
      n_tracks: Int,
      codec: String,
      width: Int,
      height: Int,
      n_frames: Long,
      mdat_bytes: Long)

  /** Container-level video metadata from an ISO-BMFF/MP4 box walk. */
  final case class Mp4Info(
      timescale: Long,
      durationTicks: Long,
      nTracks: Int,
      codec: String,
      width: Int,
      height: Int,
      nFrames: Long,
      mdatBytes: Long)

  /** REAL video metadata kernel: a pure-JVM ISO-BMFF/MP4 box walk — the
    * video sibling of [[decodeWav]]'s RIFF walk (container metadata needs
    * no codec; only pixel decode does, and that remains out of scope for
    * a dependency-free JVM). Walks the top-level box list (`ftyp`/`moov`/
    * `mdat`), then inside `moov`: `mvhd` (movie timescale + duration,
    * version 0 and 1 layouts), each `trak` (counted), and for the FIRST
    * video track (`hdlr` handler `vide`): `tkhd` 16.16 fixed-point
    * dimensions, the `stsd` sample-entry fourcc (the codec), and the
    * `stsz`/`stz2` sample count (the frame count). `mdat` payload bytes
    * are reported so a pipeline can budget the media payload separately
    * from the metadata.
    *
    * Corrupt-box hardening mirrors [[decodeWav]]: declared sizes are
    * clamped to the enclosing extent (a lying size can neither overflow
    * nor walk backwards — boxes under 8 bytes abort the level), 64-bit
    * `largesize` and size-0 ("to end of enclosure") boxes are handled,
    * and any structural violation returns None → the `ok = false`
    * quarantine row, never a throw. */
  def decodeMp4(payload: Array[Byte]): Option[Mp4Info] = {
    def u16(off: Int): Int =
      ((payload(off) & 0xFF) << 8) | (payload(off + 1) & 0xFF)
    def u32(off: Int): Long =
      ((payload(off) & 0xFFL) << 24) | ((payload(off + 1) & 0xFFL) << 16) |
        ((payload(off + 2) & 0xFFL) << 8) | (payload(off + 3) & 0xFFL)
    def u64(off: Int): Long = (u32(off) << 32) | u32(off + 4)
    def tag(off: Int): String =
      new String(payload, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

    // Walk the boxes of [start, end); calls f(type, payloadStart,
    // payloadEnd) per box. Returns false on a structurally invalid level.
    def walk(start: Int, end: Int)(f: (String, Int, Int) => Unit): Boolean = {
      var off = start
      while (off + 8 <= end) {
        val declared = u32(off)
        val id = tag(off + 4)
        var hdr = 8
        var size = declared
        if (declared == 1L) {
          if (off + 16 > end) return false
          size = u64(off + 8); hdr = 16
        } else if (declared == 0L) size = (end - off).toLong
        if (size < hdr) return false // lying header: abort this level
        val boxEnd = math.min(off + size, end.toLong).toInt
        f(id, off + hdr, boxEnd)
        off = boxEnd
      }
      true
    }

    try {
      var timescale = 0L; var duration = -1L
      var nTracks = 0; var mdatBytes = 0L
      var codec = ""; var width = 0; var height = 0; var nFrames = -1L
      var sawMoov = false

      val topOk = walk(0, payload.length) { (id, s, e) =>
        id match {
          case "mdat" => mdatBytes += (e - s).toLong
          case "moov" =>
            sawMoov = true
            walk(s, e) { (mid, ms, me) =>
              mid match {
                case "mvhd" if me - ms >= 20 =>
                  val v = payload(ms) & 0xFF
                  if (v == 1 && me - ms >= 32) {
                    timescale = u32(ms + 20); duration = u64(ms + 24)
                  } else if (v == 0) {
                    timescale = u32(ms + 12); duration = u32(ms + 16)
                  }
                case "trak" =>
                  nTracks += 1
                  // first pass: the handler type decides whether this trak
                  // carries the video metadata we surface
                  var handler = ""
                  var tkW = 0; var tkH = 0
                  var trakCodec = ""; var trakFrames = -1L
                  walk(ms, me) { (tid, ts, te) =>
                    tid match {
                      case "tkhd" if te - ts >= 84 =>
                        val v = payload(ts) & 0xFF
                        val base = if (v == 1) ts + 88 else ts + 76
                        if (base + 8 <= te) {
                          // 16.16 fixed point; integer part only
                          tkW = u32(base).toInt >>> 16
                          tkH = u32(base + 4).toInt >>> 16
                        }
                      case "mdia" =>
                        walk(ts, te) { (did, dsOff, de) =>
                          did match {
                            case "hdlr" if de - dsOff >= 12 =>
                              handler = tag(dsOff + 8)
                            case "minf" =>
                              walk(dsOff, de) { (fid, fsOff, fe) =>
                                if (fid == "stbl") {
                                  walk(fsOff, fe) { (sid, ss, se) =>
                                    sid match {
                                      case "stsd" if se - ss >= 16 =>
                                        // ver/flags(4) + entry_count(4),
                                        // then the first sample entry's
                                        // own (size, fourcc) header
                                        if (u32(ss + 4) >= 1 && ss + 16 <= se)
                                          trakCodec = tag(ss + 12)
                                      case "stsz" if se - ss >= 12 =>
                                        trakFrames = u32(ss + 8)
                                      case "stz2" if se - ss >= 12 =>
                                        trakFrames = u32(ss + 8)
                                      case _ => ()
                                    }
                                  }
                                }
                              }
                            case _ => ()
                          }
                        }
                      case _ => ()
                    }
                  }
                  if (handler == "vide" && codec.isEmpty) {
                    codec = trakCodec; width = tkW; height = tkH
                    nFrames = trakFrames
                  }
                case _ => ()
              }
            }
          case _ => ()
        }
      }

      if (topOk && sawMoov && timescale > 0 && duration >= 0 &&
        codec.nonEmpty && nFrames >= 0)
        Some(Mp4Info(timescale, duration, nTracks, codec, width, height,
          nFrames, mdatBytes))
      else None
    } catch { case _: Exception => None }
  }

  /** REAL minimal-MP4 encoder — the write twin of [[decodeMp4]], as
    * [[encodeWav]] is to [[decodeWav]]: a valid ISO-BMFF layout
    * (`ftyp` + `moov`[`mvhd` + video `trak` + optional audio `trak`] +
    * `mdat`) built with big-endian `ByteBuffer` puts, independent of the
    * parser's manual walk, so encode→decode exercises both directions and
    * the `multimodal_video` oracle can state every output as an integer
    * function of the generating parameters. The video trak carries a full
    * VisualSampleEntry in `stsd` (fourcc = `codec`), constant-size `stsz`
    * (sample count = `nFrames`), and 16.16 `tkhd` dimensions; the audio
    * trak (when present) is a `soun`-handler twin with an `mp4a`
    * AudioSampleEntry. Byte layout is deterministic: total size is
    * `455 + mdat.length` plus 261 for the audio trak
    * (Mp4LayoutSpec pins the constants the SQL oracle hard-codes). */
  def encodeMp4(
      timescale: Int,
      durationTicks: Int,
      width: Int,
      height: Int,
      codec: String,
      nFrames: Int,
      withAudio: Boolean,
      mdat: Array[Byte]): Array[Byte] = {
    import java.nio.ByteBuffer
    import java.nio.charset.StandardCharsets.US_ASCII
    require(codec.length == 4, s"codec must be a fourcc, got '$codec'")

    def box(fourcc: String, body: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + body.length)
      b.putInt(8 + body.length).put(fourcc.getBytes(US_ASCII)).put(body)
      b.array()
    }
    def concat(parts: Array[Byte]*): Array[Byte] = {
      val out = ByteBuffer.allocate(parts.map(_.length).sum)
      parts.foreach(out.put)
      out.array()
    }

    val ftyp = box("ftyp", {
      val b = ByteBuffer.allocate(12)
      b.put("isom".getBytes(US_ASCII)).putInt(0).put("isom".getBytes(US_ASCII))
      b.array()
    })

    val mvhd = box("mvhd", {
      val b = ByteBuffer.allocate(100)
      b.putInt(0) // version 0 + flags
        .putInt(0).putInt(0) // creation, modification
        .putInt(timescale).putInt(durationTicks)
        .putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate, volume, reserved
        .putLong(0) // reserved
      // unity matrix
      b.putInt(0x00010000).putInt(0).putInt(0)
        .putInt(0).putInt(0x00010000).putInt(0)
        .putInt(0).putInt(0).putInt(0x40000000)
      (1 to 6).foreach(_ => b.putInt(0)) // pre_defined
      b.putInt(if (withAudio) 3 else 2) // next_track_ID
      b.array()
    })

    def tkhd(trackId: Int, w: Int, h: Int): Array[Byte] = box("tkhd", {
      val b = ByteBuffer.allocate(84)
      b.putInt(0x000007) // version 0, flags: enabled|in_movie|in_preview
        .putInt(0).putInt(0) // creation, modification
        .putInt(trackId).putInt(0).putInt(durationTicks)
        .putLong(0) // reserved
        .putShort(0).putShort(0).putShort(0).putShort(0) // layer, group, volume, reserved
      b.putInt(0x00010000).putInt(0).putInt(0)
        .putInt(0).putInt(0x00010000).putInt(0)
        .putInt(0).putInt(0).putInt(0x40000000)
      b.putInt(w << 16).putInt(h << 16) // 16.16 fixed
      b.array()
    })

    val mdhd = box("mdhd", {
      val b = ByteBuffer.allocate(24)
      b.putInt(0).putInt(0).putInt(0)
        .putInt(timescale).putInt(durationTicks)
        .putShort(0x55C4.toShort).putShort(0) // language "und", pre_defined
      b.array()
    })

    def hdlr(handlerType: String): Array[Byte] = box("hdlr", {
      val b = ByteBuffer.allocate(25)
      b.putInt(0).putInt(0).put(handlerType.getBytes(US_ASCII))
        .putInt(0).putInt(0).putInt(0)
        .put(0.toByte) // empty null-terminated name
      b.array()
    })

    val visualEntry = {
      val b = ByteBuffer.allocate(86)
      b.putInt(86).put(codec.getBytes(US_ASCII))
        .putInt(0).putShort(0) // 6 reserved bytes
        .putShort(1) // data_reference_index
      (1 to 4).foreach(_ => b.putInt(0)) // pre_defined/reserved (16 B)
      b.putShort(width.toShort).putShort(height.toShort)
        .putInt(0x00480000).putInt(0x00480000) // 72 dpi
        .putInt(0) // reserved
        .putShort(1) // frame_count
      b.put(new Array[Byte](32)) // compressorname (empty pascal string)
      b.putShort(24) // depth
        .putShort(0xFFFF.toShort) // pre_defined = -1
      b.array()
    }

    val audioEntry = {
      val b = ByteBuffer.allocate(36)
      b.putInt(36).put("mp4a".getBytes(US_ASCII))
        .putInt(0).putShort(0) // 6 reserved bytes
        .putShort(1) // data_reference_index
        .putLong(0) // reserved
        .putShort(2).putShort(16) // channelcount, samplesize
        .putShort(0).putShort(0) // pre_defined, reserved
        .putInt(44100 << 16) // samplerate 16.16
      b.array()
    }

    def stsd(entry: Array[Byte]): Array[Byte] = box("stsd", {
      val b = ByteBuffer.allocate(8 + entry.length)
      b.putInt(0).putInt(1).put(entry)
      b.array()
    })

    val stsz = box("stsz", {
      val b = ByteBuffer.allocate(12)
      // constant sample size (no per-sample table), sample_count = nFrames
      b.putInt(0).putInt(1024).putInt(nFrames)
      b.array()
    })

    def trak(trackId: Int, w: Int, h: Int, handlerType: String,
        entry: Array[Byte]): Array[Byte] = {
      val stbl = box("stbl", concat(stsd(entry), stsz))
      val minf = box("minf", stbl)
      val mdia = box("mdia", concat(mdhd, hdlr(handlerType), minf))
      box("trak", concat(tkhd(trackId, w, h), mdia))
    }

    val traks =
      if (withAudio)
        concat(trak(1, width, height, "vide", visualEntry),
          trak(2, 0, 0, "soun", audioEntry))
      else trak(1, width, height, "vide", visualEntry)
    val moov = box("moov", concat(mvhd, traks))
    concat(ftyp, moov, box("mdat", mdat))
  }

  /** Batched video metadata extraction — the video twin of
    * [[decodeImages]]/[[decodeAudio]]; undecodable rows come back
    * `ok = false` (quarantine shape). */
  def decodeVideo(ds: Dataset[MediaRow], batchSize: Int = 64): Dataset[VideoMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(_.iterator.map { r =>
      decodeMp4(r.payload) match {
        case Some(i) =>
          VideoMeta(r.media_id, r.mime, r.payload.length.toLong, ok = true,
            i.timescale, i.durationTicks,
            i.durationTicks.toDouble / i.timescale, i.nTracks, i.codec,
            i.width, i.height, i.nFrames, i.mdatBytes)
        case None =>
          VideoMeta(r.media_id, r.mime, r.payload.length.toLong, ok = false,
            0L, 0L, 0.0, 0, "", 0, 0, 0L, 0L)
      }
    }))
  }

  /** STUB (non-image/audio modalities): deterministic byte-statistics
    * features so the full pipeline (schema → partition batches → feature
    * table) stays exercised end-to-end for payloads the JDK cannot decode. */
  private def decodeStub(payload: Array[Byte], dim: Int): Array[Double] = {
    // accumulate in Long (exact for any realistic payload), emit Double
    // (exact integers < 2^53): downstream integer checksums are exact with
    // no payload-size bound
    val sums = new Array[Long](dim)
    var i = 0
    while (i < payload.length) {
      sums(i % dim) += (payload(i) & 0xFF)
      i += 1
    }
    sums.map(_.toDouble)
  }

  /** Per-partition batched feature extraction. Batches bound peak memory
    * the way Arrow batches do on a Python `mapInPandas` path. */
  def extractFeatures(
      ds: Dataset[MediaRow],
      dim: Int = 16,
      batchSize: Int = 256
  ): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // a real decoder would decode `batch` as one unit (GPU/process call)
        batch.iterator.map { r =>
          MediaFeatures(r.media_id, r.mime, r.payload.length.toLong,
            decodeStub(r.payload, dim))
        }
      }
    }
  }

  /** STUB (non-image payloads — see [[resizeImage]] for the real image
    * kernel): "resizes" by deterministic byte subsampling to `targetBytes`,
    * preserving the batched per-partition shape a real codec call uses. */
  def resizeStub(payload: Array[Byte], targetBytes: Int): Array[Byte] =
    if (payload.length <= targetBytes) payload
    else {
      val out = new Array[Byte](targetBytes)
      val stride = payload.length.toDouble / targetBytes
      var i = 0
      while (i < targetBytes) {
        out(i) = payload((i * stride).toInt.min(payload.length - 1))
        i += 1
      }
      out
    }

  /** STUB (no video codec in the JDK): samples `n` evenly-spaced
    * fixed-size "frames" from a video-like payload. Output is one row per
    * frame — the explode shape a real decoder produces. */
  def sampleFramesStub(payload: Array[Byte], n: Int, frameBytes: Int): Seq[Array[Byte]] =
    (0 until n).map { f =>
      val start = ((payload.length.max(1) - 1).toLong * f / n.max(1)).toInt
      payload.slice(start, (start + frameBytes).min(payload.length))
    }

  /** Resize pass over a media Dataset (batched mapPartitions, stub kernel). */
  def resize(ds: Dataset[MediaRow], targetBytes: Int, batchSize: Int = 256): Dataset[MediaRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(_.iterator.map(r =>
      r.copy(payload = resizeStub(r.payload, targetBytes)))))
  }

  /** Frame sampling: one output row per sampled frame, keyed by media_id. */
  def sampleFrames(
      ds: Dataset[MediaRow],
      framesPerAsset: Int,
      frameBytes: Int,
      batchSize: Int = 256
  ): Dataset[MediaRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(_.iterator.flatMap { r =>
      sampleFramesStub(r.payload, framesPerAsset, frameBytes).zipWithIndex.map {
        case (frame, i) =>
          MediaRow(r.media_id * 1000 + i, frame, r.mime, r.width, r.height)
      }
    }))
  }

  /** Demo pipeline over the `documents` table: treat each document's bytes
    * as an opaque media payload, run the batched decode path, and emit a
    * features table. Proves the plumbing (binary column → typed Dataset →
    * mapPartitions batches → feature frame) on real data. */
  def documentBytesPipeline(spark: SparkSession, documents: DataFrame, dim: Int = 16): DataFrame = {
    import spark.implicits._
    val media = documents.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("text/plain").as("mime"),
      lit(0).as("width"),
      lit(0).as("height")
    ).as[MediaRow]

    // feature slots are exact integer-valued floats (decodeStub), so the
    // fold is an exact byte-sum checksum — oracle-able against an engine
    // that sums the document's bytes
    extractFeatures(media, dim)
      .toDF()
      .select(col("media_id"), col("mime"), col("n_bytes"),
        aggregate(col("features"), lit(0.0), (acc, x) => acc + x.cast("double"))
          .cast("bigint").as("checksum"))
  }
}
