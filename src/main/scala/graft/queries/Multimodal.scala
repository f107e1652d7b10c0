package graft.queries

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** P11 — multimodal column plumbing.
  *
  * Media payloads are opaque `binary` columns with typed metadata.
  * The metadata decode is REAL binary parsing: `graft_media_dims` (a
  * codegen'd Catalyst expression, functions/GraftFunctions.scala)
  * reads the actual container headers — PNG IHDR, JPEG SOFn marker
  * scan, GIF logical screen descriptor, WEBP VP8X/VP8L/VP8, BMP DIB.
  *
  * The PIXEL level is real too (r13, extended r14): payloads for the
  * gated pixel keys are honest-to-goodness PNG files — 8-bit gray
  * (color type 0) and truecolor RGB (color type 2), zlib-deflated
  * scanlines, CRC'd chunks, JDK-only encode — plus real uncompressed
  * 24-bpp BMPs on the mixed-codec key; all decoded back through
  * `javax.imageio` (the JVM's real codecs, NOT our encoders), then
  * resampled with a deterministic integer aspect-fit average pool
  * (per-channel for RGB) whose output pixel checksums the DuckDB
  * oracle reproduces arithmetically.  Video (r14) is a REAL public
  * container: RIFF AVI with an `idx1` index, one `vids` stream of
  * losslessly-compressed frames (Motion-PNG, fourcc `MPNG` — the
  * lossless sibling of MJPEG-in-AVI), and frame sampling seeks via
  * `idx1` so unsampled frames' bytes are never touched.
  *
  * At 100 TB the payload column dominates: the header parse runs as a
  * scalar inside the scan stage (no shuffle, no typed serde, stays in
  * whole-stage codegen), pixel decode is partition-local flatMap work
  * that never shuffles pixels, and metadata extraction projects away
  * the payload as early as possible so downstream operators only ever
  * see the narrow metadata columns.
  */
object Multimodal {

  /** Input: an opaque payload plus its id. */
  final case class MediaIn(doc_id: Long, payload: Array[Byte])

  // ------------------------------------------------- payload builders
  // Minimal VALID headers of each public format, used to synthesize
  // binary fixtures (and by tests): a real corpus would carry real
  // files; the parser cannot tell the difference — that is the point.

  /** 33-byte PNG prefix: signature + IHDR (incl. CRC32). */
  def buildPng(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(33 + body.length)
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = new java.io.ByteArrayOutputStream(17)
    ihdr.write("IHDR".getBytes(UTF_8))
    def be32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
      o.write((v >>> 24) & 0xff); o.write((v >>> 16) & 0xff)
      o.write((v >>> 8) & 0xff); o.write(v & 0xff)
    }
    be32(ihdr, w); be32(ihdr, h)
    ihdr.write(8); ihdr.write(2); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    be32(out, 13)
    val chunk = ihdr.toByteArray
    out.write(chunk)
    val crc = new java.util.zip.CRC32(); crc.update(chunk)
    be32(out, crc.getValue.toInt)
    out.write(body)
    out.toByteArray
  }

  /** 15-byte JPEG prefix: SOI + a single-component SOF0 segment. */
  def buildJpeg(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(15 + body.length)
    out.write(0xff); out.write(0xd8) // SOI
    out.write(0xff); out.write(0xc0) // SOF0
    out.write(0); out.write(11) // segment length
    out.write(8) // precision
    out.write((h >>> 8) & 0xff); out.write(h & 0xff)
    out.write((w >>> 8) & 0xff); out.write(w & 0xff)
    out.write(1) // one component
    out.write(1); out.write(0x11); out.write(0)
    out.write(body)
    out.toByteArray
  }

  /** 13-byte GIF prefix: header + logical screen descriptor. */
  def buildGif(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(13 + body.length)
    out.write("GIF89a".getBytes(UTF_8))
    out.write(w & 0xff); out.write((w >>> 8) & 0xff)
    out.write(h & 0xff); out.write((h >>> 8) & 0xff)
    out.write(0); out.write(0); out.write(0)
    out.write(body)
    out.toByteArray
  }

  /** 30-byte WEBP prefix: RIFF header + VP8X chunk (canvas size). */
  def buildWebp(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(30 + body.length)
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    def le24(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff); out.write((v >>> 16) & 0xff)
    }
    out.write("RIFF".getBytes(UTF_8))
    le32(4 + 8 + 10 + body.length) // riff payload size
    out.write("WEBP".getBytes(UTF_8))
    out.write("VP8X".getBytes(UTF_8))
    le32(10)
    out.write(0); out.write(0); out.write(0); out.write(0) // flags + reserved
    le24(w - 1); le24(h - 1)
    out.write(body)
    out.toByteArray
  }

  /** 88-byte AVI prefix: RIFF header + LIST hdrl holding the 56-byte
    * `avih` main header (frame dims at dwords 8/9) — the
    * metadata-bearing prefix of the real container [[buildAviFrom]]
    * emits, used by the metadata gate the way [[buildPng]] etc. are. */
  def buildAviHeader(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(88 + body.length)
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    out.write("RIFF".getBytes(UTF_8)); le32(80 + body.length)
    out.write("AVI ".getBytes(UTF_8))
    out.write("LIST".getBytes(UTF_8)); le32(68)
    out.write("hdrl".getBytes(UTF_8))
    out.write("avih".getBytes(UTF_8)); le32(56)
    le32(33333); le32(0); le32(0); le32(0x10) // µs/frame, rate, pad, HASINDEX
    le32(0); le32(0); le32(1); le32(0) // frames, initial, streams, bufsize
    le32(w); le32(h)
    le32(0); le32(0); le32(0); le32(0) // reserved
    out.write(body)
    out.toByteArray
  }

  /** Real-header metadata decode over a payload frame: one codegen'd
    * scalar in the scan stage — no shuffle, no typed serde. */
  def decodeMeta(spark: SparkSession, in: DataFrame): DataFrame =
    in.select(col("doc_id"), expr("graft_media_dims(payload)").as("dims"),
        length(col("payload")).cast("bigint").as("n_bytes"))
      .select(col("doc_id"), col("n_bytes"),
        col("dims").getItem(1).as("width"),
        col("dims").getItem(2).as("height"),
        expr("CASE dims[0] WHEN 1 THEN 'jpeg' WHEN 2 THEN 'png' WHEN 3 THEN 'gif' " +
          "WHEN 4 THEN 'webp' WHEN 5 THEN 'bmp' WHEN 6 THEN 'avi' " +
          "ELSE 'unknown' END").as("fmt"))

  // ------------------------------------------------- real pixel layer
  // JDK-only, cluster-safe: encode = raw zlib PNG writer (Deflater +
  // CRC32), decode = javax.imageio (the JVM's own PNG codec — a
  // genuinely foreign decoder for our encoder's output).  All pixel
  // math is integer-exact so a SQL engine can replay it.

  /** The deterministic test-pixel formula shared with the DuckDB
    * oracle: gray(x, y) of frame `f` of doc `id`. */
  @inline def pixFormula(x: Int, y: Int, id: Long, f: Int): Int =
    ((x.toLong * 31 + y.toLong * 17 + id * 7 + f.toLong * 11) % 256).toInt

  // Per-thread native resources, reused across images: a corpus is
  // hundreds of millions of SMALL images, and `new Deflater` (a native
  // zlib stream) / ImageIO's per-call reader lookup cost more than the
  // pixel work itself at thumbnail sizes (measured: q_frame_sample's
  // 450k-image sf1 run dropped ~10x with reuse).  reset() between
  // images; one instance per executor thread, freed with the thread.
  // Cleanup contract (ADVICE r13): these hold NATIVE zlib state per
  // thread for the JVM's lifetime — correct for Spark's long-lived
  // executor thread pools (bounded thread count, freed at JVM exit via
  // the hook below), but a caller spinning up unbounded short-lived
  // threads would accumulate native memory; such callers should use
  // their own Deflater and end() it.
  private val liveDeflaters =
    new java.util.concurrent.ConcurrentLinkedQueue[java.util.zip.Deflater]
  private val liveReaders =
    new java.util.concurrent.ConcurrentLinkedQueue[javax.imageio.ImageReader]
  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    liveDeflaters.forEach(_.end())
    liveReaders.forEach(_.dispose())
  }))
  private val deflaterTL = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater = {
      // BEST_SPEED: still a spec-valid zlib stream (any inflater reads
      // it); compression ratio is irrelevant for fixtures
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
      liveDeflaters.add(d)
      d
    }
  }
  // One reusable ImageReader per (thread, format): the registry scan
  // plus reader construction inside `ImageIO.read` costs more than the
  // pixel work at thumbnail sizes (r13 measured ~10x on PNG; r14's
  // MEDIAPROBE caught the mixed-codec key running SUPERLINEAR at x10
  // data because its BMP/GIF shares still paid the per-call scan).
  private val readersTL =
    new ThreadLocal[java.util.HashMap[String, javax.imageio.ImageReader]] {
      override def initialValue() = new java.util.HashMap[String, javax.imageio.ImageReader]
    }
  private def readerFor(fmt: String): javax.imageio.ImageReader = {
    val m = readersTL.get()
    var r = m.get(fmt)
    if (r == null) {
      val it = javax.imageio.ImageIO.getImageReadersByFormatName(fmt)
      require(it.hasNext, s"JVM has no $fmt ImageReader")
      r = it.next()
      liveReaders.add(r)
      m.put(fmt, r)
    }
    r
  }

  /** A REAL 8-bit grayscale PNG: signature, IHDR, one zlib-deflated
    * IDAT of filter-0 scanlines, IEND — decodable by any PNG reader. */
  def encodePngGray(w: Int, h: Int, pix: Array[Int]): Array[Byte] = {
    require(pix.length == w * h, s"pixel buffer ${pix.length} != ${w}x$h")
    val raw = new Array[Byte]((w + 1) * h)
    var p = 0
    var y = 0
    while (y < h) {
      raw(p) = 0 // filter type None
      p += 1
      var x = 0
      while (x < w) { raw(p) = (pix(y * w + x) & 0xff).toByte; p += 1; x += 1 }
      y += 1
    }
    val defl = deflaterTL.get()
    defl.reset()
    defl.setInput(raw); defl.finish()
    val zout = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!defl.finished()) { val k = defl.deflate(buf); zout.write(buf, 0, k) }
    val idat = zout.toByteArray

    val out = new java.io.ByteArrayOutputStream(64 + idat.length)
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def be32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
      o.write((v >>> 24) & 0xff); o.write((v >>> 16) & 0xff)
      o.write((v >>> 8) & 0xff); o.write(v & 0xff)
    }
    def chunk(typ: String, data: Array[Byte]): Unit = {
      be32(out, data.length)
      val body = typ.getBytes(UTF_8) ++ data
      out.write(body)
      val crc = new java.util.zip.CRC32(); crc.update(body)
      be32(out, crc.getValue.toInt)
    }
    val ihdr = new java.io.ByteArrayOutputStream(13)
    be32(ihdr, w); be32(ihdr, h)
    ihdr.write(8); ihdr.write(0) // bit depth 8, color type 0 (gray)
    ihdr.write(0); ihdr.write(0); ihdr.write(0)
    chunk("IHDR", ihdr.toByteArray)
    chunk("IDAT", idat)
    chunk("IEND", Array.empty)
    out.toByteArray
  }

  /** A REAL 8-bit RGB (PNG color type 2) image: 3 bytes per pixel,
    * packed 0xRRGGBB ints in/out — the color twin of
    * [[encodePngGray]]. */
  def encodePngRgb(w: Int, h: Int, rgb: Array[Int]): Array[Byte] = {
    require(rgb.length == w * h, s"pixel buffer ${rgb.length} != ${w}x$h")
    val raw = new Array[Byte]((3 * w + 1) * h)
    var p = 0
    var y = 0
    while (y < h) {
      raw(p) = 0 // filter type None
      p += 1
      var x = 0
      while (x < w) {
        val v = rgb(y * w + x)
        raw(p) = ((v >>> 16) & 0xff).toByte
        raw(p + 1) = ((v >>> 8) & 0xff).toByte
        raw(p + 2) = (v & 0xff).toByte
        p += 3; x += 1
      }
      y += 1
    }
    val defl = deflaterTL.get()
    defl.reset()
    defl.setInput(raw); defl.finish()
    val zout = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!defl.finished()) { val k = defl.deflate(buf); zout.write(buf, 0, k) }
    val idat = zout.toByteArray

    val out = new java.io.ByteArrayOutputStream(64 + idat.length)
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def be32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
      o.write((v >>> 24) & 0xff); o.write((v >>> 16) & 0xff)
      o.write((v >>> 8) & 0xff); o.write(v & 0xff)
    }
    def chunk(typ: String, data: Array[Byte]): Unit = {
      be32(out, data.length)
      val body = typ.getBytes(UTF_8) ++ data
      out.write(body)
      val crc = new java.util.zip.CRC32(); crc.update(body)
      be32(out, crc.getValue.toInt)
    }
    val ihdr = new java.io.ByteArrayOutputStream(13)
    be32(ihdr, w); be32(ihdr, h)
    ihdr.write(8); ihdr.write(2) // bit depth 8, color type 2 (truecolor)
    ihdr.write(0); ihdr.write(0); ihdr.write(0)
    chunk("IHDR", ihdr.toByteArray)
    chunk("IDAT", idat)
    chunk("IEND", Array.empty)
    out.toByteArray
  }

  /** A REAL uncompressed 24-bpp Windows BMP (BITMAPFILEHEADER +
    * BITMAPINFOHEADER + bottom-up BGR rows padded to 4 bytes) carrying
    * a grayscale image as r=g=b — built from the public DIB spec, and
    * decodable by the JVM's BMP ImageReader.  Exists to drive the
    * GENERIC (non-PNG) branch of [[decodeGray]] with a second real
    * codec: band 0 of the decoded raster is the gray value whatever
    * the reader's internal byte order. */
  def encodeBmpGray(w: Int, h: Int, pix: Array[Int]): Array[Byte] = {
    require(pix.length == w * h, s"pixel buffer ${pix.length} != ${w}x$h")
    val rowSize = (3 * w + 3) & ~3
    val dataSize = rowSize * h
    val out = new java.io.ByteArrayOutputStream(54 + dataSize)
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    out.write('B'); out.write('M')
    le32(54 + dataSize); le16(0); le16(0); le32(54)
    le32(40); le32(w); le32(h) // positive height = bottom-up rows
    le16(1); le16(24); le32(0) // planes, 24 bpp, BI_RGB
    le32(dataSize); le32(2835); le32(2835); le32(0); le32(0)
    var y = h - 1
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val g = pix(y * w + x) & 0xff
        out.write(g); out.write(g); out.write(g) // B, G, R
        x += 1
      }
      var pad = rowSize - 3 * w
      while (pad > 0) { out.write(0); pad -= 1 }
      y -= 1
    }
    out.toByteArray
  }

  /** A REAL GIF89a carrying a grayscale image: 256-entry global
    * palette with identity-gray entries (index i = (i,i,i)) and one
    * full-frame image whose LZW stream is LITERAL-CODED — every pixel
    * emitted as its own 9-bit code with a CLEAR every 200 codes so the
    * code width never grows (the stored-mode analog of deflate:
    * spec-valid LZW, compression ratio deliberately sacrificed; the
    * DECODER still runs the real variable-width LZW machinery incl.
    * clear-code resets).  With the identity palette the decoded
    * raster's band-0 sample (the palette index) IS the gray value, so
    * the mixed-codec oracle stays codec-blind. */
  def encodeGifGray(w: Int, h: Int, pix: Array[Int]): Array[Byte] = {
    require(pix.length == w * h, s"pixel buffer ${pix.length} != ${w}x$h")
    val out = new java.io.ByteArrayOutputStream(13 + 768 + pix.length * 2)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    out.write("GIF89a".getBytes(UTF_8))
    le16(w); le16(h)
    out.write(0xf7) // global palette present, 8-bit resolution, 256 entries
    out.write(0); out.write(0) // background index, aspect
    var c = 0
    while (c < 256) { out.write(c); out.write(c); out.write(c); c += 1 }
    out.write(0x2c) // image descriptor
    le16(0); le16(0); le16(w); le16(h)
    out.write(0) // no local palette, not interlaced
    out.write(8) // LZW minimum code size
    // 9-bit little-endian-packed code stream: clear, literals, EOI
    val codes = new java.io.ByteArrayOutputStream(pix.length + pix.length / 8 + 16)
    var acc = 0L
    var nbits = 0
    def emit(code: Int): Unit = {
      acc |= (code.toLong & 0x1ff) << nbits
      nbits += 9
      while (nbits >= 8) { codes.write((acc & 0xff).toInt); acc >>>= 8; nbits -= 8 }
    }
    val clear = 256
    emit(clear)
    var i = 0
    var sinceClear = 0
    while (i < pix.length) {
      emit(pix(i) & 0xff)
      sinceClear += 1
      // decoder dict grows one entry per code after the first
      // post-clear code; clearing well before slot 512 pins 9-bit codes
      if (sinceClear == 200) { emit(clear); sinceClear = 0 }
      i += 1
    }
    emit(clear + 1) // end-of-information
    if (nbits > 0) codes.write((acc & 0xff).toInt)
    // chop into <=255-byte sub-blocks
    val cs = codes.toByteArray
    var off = 0
    while (off < cs.length) {
      val n = math.min(255, cs.length - off)
      out.write(n); out.write(cs, off, n)
      off += n
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Magic-byte sniff for the formats we keep per-thread readers for;
    * anything else falls back to the generic `ImageIO.read` scan. */
  private def sniffFormat(b: Array[Byte]): String =
    if (b.length > 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
    else if (b.length > 2 && b(0) == 'B' && b(1) == 'M') "bmp"
    else if (b.length > 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') "gif"
    else null

  private def decodeImage(payload: Array[Byte]): java.awt.image.BufferedImage = {
    val fmt = sniffFormat(payload)
    val img =
      if (fmt != null) {
        val reader = readerFor(fmt)
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          reader.setInput(iis, true, true)
          reader.read(0)
        } finally {
          reader.setInput(null)
          iis.close()
        }
      } else
        javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    img
  }

  /** Real decode through the JVM's codecs; returns (w, h, gray pixels
    * row-major).  Throws on undecodable bytes — a corrupt payload in a
    * 100 TB corpus should surface, not silently zero.  PNG/BMP/GIF
    * payloads are sniffed and decoded by per-thread instances of their
    * three DISTINCT ImageIO plugin readers (the per-call registry scan
    * in `ImageIO.read` dominates at thumbnail sizes and made the
    * mixed-codec key superlinear at ×10 data — MEDIAPROBE r14);
    * unsniffed formats (e.g. real JPEGs, spec-pinned) fall back to the
    * generic `ImageIO.read` lookup. */
  def decodeGray(payload: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = decodeImage(payload)
    val w = img.getWidth
    val h = img.getHeight
    val r = img.getRaster
    val pix = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { pix(y * w + x) = r.getSample(x, y, 0); x += 1 }
      y += 1
    }
    (w, h, pix)
  }

  /** Color decode: (w, h, packed 0xRRGGBB row-major).  Raster band
    * order is logical (0=R, 1=G, 2=B) for both the PNG and generic
    * readers regardless of their internal byte layout; single-band
    * (gray) sources replicate band 0 into all three channels. */
  def decodeRgb(payload: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = decodeImage(payload)
    val w = img.getWidth
    val h = img.getHeight
    val r = img.getRaster
    val bands = r.getNumBands
    val pix = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val red = r.getSample(x, y, 0)
        val grn = if (bands > 1) r.getSample(x, y, 1) else red
        val blu = if (bands > 2) r.getSample(x, y, 2) else red
        pix(y * w + x) = (red << 16) | (grn << 8) | blu
        x += 1
      }
      y += 1
    }
    (w, h, pix)
  }

  /** Deterministic integer average pool to tw×th: source pixel (x, y)
    * lands in bucket (x·tw div w, y·th div h); pooled value = bucket
    * sum div bucket count.  Pure integer math — no Graphics2D, no
    * float filter kernels — so a SQL engine reproduces it exactly. */
  def poolGray(w: Int, h: Int, pix: Array[Int], tw: Int, th: Int): Array[Int] = {
    // pooling only shrinks: tw > w (or th > h) leaves buckets no source
    // pixel lands in and the average below divides by zero.  Callers
    // clamp via thumbDims/resizePooled; misuse of the public helper
    // must fail with the geometry, not a raw ArithmeticException.
    require(tw > 0 && th > 0 && tw <= w && th <= h,
      s"pool target ${tw}x$th must be within source ${w}x$h and positive")
    val sums = new Array[Long](tw * th)
    val cnts = new Array[Long](tw * th)
    var y = 0
    while (y < h) {
      val ty = y * th / h
      var x = 0
      while (x < w) {
        val i = ty * tw + x * tw / w
        sums(i) += pix(y * w + x); cnts(i) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(tw * th)(i => (sums(i) / cnts(i)).toInt)
  }

  /** Per-channel integer average pool over packed 0xRRGGBB pixels —
    * identical bucket geometry to [[poolGray]], each channel summed
    * and divided independently, repacked.  Pure integer math, so the
    * oracle replays it per channel. */
  def poolRgb(w: Int, h: Int, rgb: Array[Int], tw: Int, th: Int): Array[Int] = {
    require(tw > 0 && th > 0 && tw <= w && th <= h,
      s"pool target ${tw}x$th must be within source ${w}x$h and positive")
    val sr = new Array[Long](tw * th)
    val sg = new Array[Long](tw * th)
    val sb = new Array[Long](tw * th)
    val cnts = new Array[Long](tw * th)
    var y = 0
    while (y < h) {
      val ty = y * th / h
      var x = 0
      while (x < w) {
        val i = ty * tw + x * tw / w
        val v = rgb(y * w + x)
        sr(i) += (v >>> 16) & 0xff
        sg(i) += (v >>> 8) & 0xff
        sb(i) += v & 0xff
        cnts(i) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(tw * th) { i =>
      (((sr(i) / cnts(i)).toInt) << 16) |
        (((sg(i) / cnts(i)).toInt) << 8) | (sb(i) / cnts(i)).toInt
    }
  }

  /** REAL resize: ImageIO decode → integer aspect-preserving average
    * pool to exactly (w, h) → PNG re-encode.  The full decode →
    * transform → re-encode pipeline, partition-local. */
  final case class Resized(doc_id: Long, width: Long, height: Long, payload: Array[Byte])

  def resizePooled(spark: SparkSession, in: DataFrame, w: Int, h: Int): DataFrame = {
    import spark.implicits._
    in.select(col("doc_id"), col("payload")).as[MediaIn]
      .mapPartitions(_.map { m =>
        val (sw, sh, pix) = decodeGray(m.payload)
        val tw = math.min(w, sw) // pool only shrinks; clamp like a thumbnailer
        val th = math.min(h, sh)
        Resized(m.doc_id, tw.toLong, th.toLong,
          encodePngGray(tw, th, poolGray(sw, sh, pix, tw, th)))
      })
      .toDF()
  }

  /** A REAL RIFF AVI container (public spec: the AVI RIFF form,
    * `RIFF('AVI ' LIST('hdrl' ...) LIST('movi' ...) 'idx1')`) carrying
    * one `vids` stream of PNG-compressed frames — Motion-PNG, the
    * lossless sibling of MJPEG-in-AVI, registered fourcc `MPNG`.
    * `hdrl` holds a 56-byte `avih` main header (AVIF_HASINDEX set) and
    * the stream's `strl` list (56-byte `strh` + 40-byte
    * BITMAPINFOHEADER `strf`); each frame is a `00dc` chunk in the
    * `movi` list, padded to even length per RIFF; `idx1` entries are
    * 16 bytes — ckid, AVIIF_KEYFRAME, offset (relative to the `movi`
    * fourcc, first chunk at 4), size.  Frames stay individually
    * lossless so the oracle replays decoded pixels arithmetically.
    * `absoluteIdx` emits the OTHER spec-sanctioned idx1 convention —
    * offsets absolute from the file start — which some real-world
    * writers use; [[sampleFrames]] accepts both. */
  def buildAviFrom(frames: Seq[Array[Byte]], w: Int, h: Int,
                   absoluteIdx: Boolean = false): Array[Byte] = {
    type BAOS = java.io.ByteArrayOutputStream
    def le32(o: BAOS, v: Int): Unit = {
      o.write(v & 0xff); o.write((v >>> 8) & 0xff)
      o.write((v >>> 16) & 0xff); o.write((v >>> 24) & 0xff)
    }
    def le16(o: BAOS, v: Int): Unit = { o.write(v & 0xff); o.write((v >>> 8) & 0xff) }
    def fcc(o: BAOS, s: String): Unit = o.write(s.getBytes(UTF_8))
    val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max

    val movi = new BAOS
    fcc(movi, "movi")
    val offs = frames.map { fr =>
      val off = movi.size() // offset of this chunk from the movi fourcc
      fcc(movi, "00dc"); le32(movi, fr.length); movi.write(fr)
      if ((fr.length & 1) == 1) movi.write(0) // RIFF chunks are even-aligned
      off
    }

    val strh = new BAOS
    fcc(strh, "vids"); fcc(strh, "MPNG")
    le32(strh, 0); le16(strh, 0); le16(strh, 0) // flags, priority, language
    le32(strh, 0) // initial frames
    le32(strh, 1); le32(strh, 30) // scale/rate = 30 fps
    le32(strh, 0); le32(strh, frames.length) // start, length
    le32(strh, maxFrame) // suggested buffer size
    le32(strh, -1); le32(strh, 0) // quality (default), sample size
    le16(strh, 0); le16(strh, 0); le16(strh, w); le16(strh, h) // rcFrame

    val strf = new BAOS // BITMAPINFOHEADER
    le32(strf, 40); le32(strf, w); le32(strf, h)
    le16(strf, 1); le16(strf, 24) // planes, bit count
    fcc(strf, "MPNG") // biCompression: the codec fourcc
    le32(strf, w * h * 3); le32(strf, 0); le32(strf, 0); le32(strf, 0); le32(strf, 0)

    val strl = new BAOS
    fcc(strl, "strl")
    fcc(strl, "strh"); le32(strl, strh.size()); strl.write(strh.toByteArray)
    fcc(strl, "strf"); le32(strl, strf.size()); strl.write(strf.toByteArray)

    val avih = new BAOS
    le32(avih, 33333) // µs per frame (30 fps)
    le32(avih, 0); le32(avih, 0) // max bytes/sec, padding granularity
    le32(avih, 0x10) // AVIF_HASINDEX
    le32(avih, frames.length); le32(avih, 0); le32(avih, 1) // total, initial, streams
    le32(avih, maxFrame); le32(avih, w); le32(avih, h)
    (0 until 4).foreach(_ => le32(avih, 0)) // reserved

    val hdrl = new BAOS
    fcc(hdrl, "hdrl")
    fcc(hdrl, "avih"); le32(hdrl, avih.size()); hdrl.write(avih.toByteArray)
    fcc(hdrl, "LIST"); le32(hdrl, strl.size()); hdrl.write(strl.toByteArray)

    // idx1 built LAST: the absolute convention needs the movi fourcc's
    // final file position (after the RIFF header and hdrl LIST)
    val moviFourccPos = 12 + 8 + hdrl.size() + 8
    val idx = new BAOS
    frames.zip(offs).foreach { case (fr, off) =>
      val emitted = if (absoluteIdx) moviFourccPos + off else off
      fcc(idx, "00dc"); le32(idx, 0x10); le32(idx, emitted); le32(idx, fr.length)
    }

    val out = new BAOS(12 + 8 + hdrl.size() + 8 + movi.size() + 8 + idx.size())
    fcc(out, "RIFF")
    le32(out, 4 + 8 + hdrl.size() + 8 + movi.size() + 8 + idx.size())
    fcc(out, "AVI ")
    fcc(out, "LIST"); le32(out, hdrl.size()); out.write(hdrl.toByteArray)
    fcc(out, "LIST"); le32(out, movi.size()); out.write(movi.toByteArray)
    fcc(out, "idx1"); le32(out, idx.size()); out.write(idx.toByteArray)
    out.toByteArray
  }

  /** The deterministic AVI fixture: `nFrames` real PNG frames of the
    * shared [[pixFormula]] pattern in a real AVI container. */
  def buildAvi(id: Long, nFrames: Int, w: Int, h: Int): Array[Byte] =
    buildAviFrom(Array.tabulate(nFrames)(f => encodePngGray(w, h,
      Array.tabulate(w * h)(i => pixFormula(i % w, i / w, id, f)))).toSeq, w, h)

  /** Every `stride`-th frame's codec bytes, seeking DIRECTLY to the
    * sampled `00dc` chunks via the AVI `idx1` index — unsampled
    * frames' bytes are never touched (the point of an indexed
    * container).  Corrupt containers — and a 100 TB corpus WILL
    * contain truncated payloads — fail with a `ctx`-carrying message
    * (pass the doc id) instead of a raw bounds exception deep inside
    * a task. */
  def sampleFrames(payload: Array[Byte], stride: Int,
                   ctx: String = ""): Iterator[(Int, Array[Byte])] = {
    require(stride >= 1, s"frame stride must be >= 1, got $stride $ctx".trim)
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"corrupt AVI ($msg) $ctx".trim)
    def str4(o: Int): String =
      if (o < 0 || o + 4 > payload.length) fail(s"fourcc at $o past end ${payload.length}")
      else new String(payload, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def le32(o: Int): Int =
      if (o < 0 || o + 4 > payload.length) fail(s"u32 at $o past end ${payload.length}")
      else (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8) |
        ((payload(o + 2) & 0xff) << 16) | ((payload(o + 3) & 0xff) << 24)
    if (payload.length < 12 || str4(0) != "RIFF" || str4(8) != "AVI ")
      fail("not a RIFF/AVI header")
    val riffSz = le32(4)
    if (riffSz < 4 || 8L + riffSz > payload.length)
      fail(s"RIFF size $riffSz vs file ${payload.length}")
    // top-level chunk walk: locate the movi LIST and the idx1 chunk
    var off = 12
    var moviPos = -1 // offset of the movi fourcc (idx1 offsets are relative to it)
    var idxOff = -1
    var idxLen = 0
    while (off + 8 <= 8 + riffSz && (moviPos < 0 || idxOff < 0)) {
      val ck = str4(off)
      val sz = le32(off + 4)
      if (sz < 0 || off + 8L + sz > payload.length)
        fail(s"chunk $ck size $sz at $off overruns ${payload.length}")
      if (ck == "LIST" && sz >= 4 && str4(off + 8) == "movi") moviPos = off + 8
      else if (ck == "idx1") { idxOff = off + 8; idxLen = sz }
      off += 8 + sz + (sz & 1)
    }
    if (moviPos < 0) fail("no movi list")
    if (idxOff < 0) fail("no idx1 index")
    val n = idxLen / 16
    val mp = moviPos
    val io = idxOff
    new Iterator[(Int, Array[Byte])] {
      private var f = 0
      private def skip(): Unit = while (f < n && f % stride != 0) f += 1
      skip()
      override def hasNext: Boolean = f < n
      override def next(): (Int, Array[Byte]) = {
        val e = io + f * 16
        if (str4(e) != "00dc") fail(s"idx1 entry $f has ckid ${str4(e)}")
        val rel = le32(e + 8)
        val sz = le32(e + 12)
        if (rel < 0 || sz < 0) fail(s"idx1 entry $f offset $rel size $sz negative")
        // The AVI spec sanctions BOTH idx1 offset conventions and both
        // ship in the wild: relative to the `movi` fourcc (most
        // writers, and ours) or absolute from the file start (ADVICE
        // r14).  Try movi-relative first, then retry absolute — a
        // valid frame chunk must carry its own `00dc` header with the
        // idx1-declared size, so a wrong interpretation cannot pass.
        def chunkAt(p: Long): Boolean =
          p >= 0 && p + 8 + sz <= payload.length &&
            str4(p.toInt) == "00dc" && le32(p.toInt + 4) == sz
        val at =
          if (chunkAt(mp.toLong + rel)) mp + rel
          else if (chunkAt(rel.toLong)) rel
          else fail(s"frame $f chunk header mismatch at ${mp.toLong + rel} " +
            s"(movi-relative) and $rel (absolute)")
        val bytes = java.util.Arrays.copyOfRange(payload, at + 8, at + 8 + sz)
        val id = f
        f += 1; skip()
        (id, bytes)
      }
    }
  }

  /** Deterministic binary fixtures: each document's text bytes wrapped
    * in a REAL format container whose dimensions derive from doc_id —
    * so the oracle can compute the expected metadata arithmetically
    * while the Spark side must actually parse the headers it built. */
  def mediaPayloads(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val body = text.getBytes(UTF_8)
        val w = (id % 640 + 1).toInt
        val h = (id % 480 + 1).toInt
        val payload = (id % 5) match {
          case 0 => buildJpeg(w, h, body)
          case 1 => buildPng(w, h, body)
          case 2 => buildGif(w, h, body)
          case 3 => buildWebp(w, h, body)
          case _ => buildAviHeader(w, h, body) // video rides the same column
        }
        MediaIn(id, payload)
      })
      .toDF()
  }

  def qMultimodalMeta(s: SparkSession, d: String): DataFrame =
    decodeMeta(s, mediaPayloads(s, d)).orderBy("doc_id")

  /** The oracle derives the expected metadata from doc_id arithmetic —
    * the Spark side earns the hash match only if its built headers
    * parse back to exactly these values. */
  val qMultimodalMetaSql: String =
    """SELECT doc_id,
      |  CAST(CASE doc_id % 5 WHEN 0 THEN 15 WHEN 1 THEN 33 WHEN 2 THEN 13
      |       WHEN 3 THEN 30 ELSE 88 END
      |       + octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
      |  CAST(doc_id % 640 + 1 AS BIGINT) AS width,
      |  CAST(doc_id % 480 + 1 AS BIGINT) AS height,
      |  CASE doc_id % 5 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' WHEN 2 THEN 'gif'
      |       WHEN 3 THEN 'webp' ELSE 'avi' END AS fmt
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------ P11b frames
  /** Gated frame sampling with REAL pixel decode (r13) in a REAL
    * container (r14): each doc's payload is an AVI file of
    * (doc_id % 9 + 1) genuine PNG frames; the sampler seeks to even
    * frames via the `idx1` index and ImageIO-decodes every 2nd one,
    * never touching odd frames' bytes.  frame_sig is an exact
    * integer position-weighted checksum of the DECODED pixels —
    * Σ gray(x,y)·(y·w + x + 1) — which the oracle reproduces from the
    * generator formula, so the hash match proves a real decode
    * happened (any filter/deflate/raster mistake shifts bytes and
    * breaks the positional weighting).  Scale shape: build + sample +
    * decode are one partition-local flatMap; pixels never shuffle —
    * only (doc_id, frame_no, dims, sig) rows leave the stage. */
  final case class FrameRow(doc_id: Long, frame_no: Long, width: Long,
                            height: Long, frame_sig: Long)

  def videoPayloads(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // explicit width: the doc_id-only scan plans by FILE BYTES (a
    // pruned narrow column ≈ 1-2 input splits), which would pin the
    // CPU-heavy encode/decode below onto 2 of N cores — a 50k-long
    // shuffle buys a full-width pixel stage (measured ~6x at sf1)
    Tables.documents(s, d).select(col("doc_id"))
      .repartition(s.sparkContext.defaultParallelism * 2)
      .as[Long]
      .mapPartitions(_.map { id =>
        val w = (id % 24 + 8).toInt
        val h = (id % 18 + 8).toInt
        MediaIn(id, buildAvi(id, (id % 9 + 1).toInt, w, h))
      })
      .toDF()
  }

  def qFrameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    videoPayloads(s, d)
      .as[MediaIn]
      .mapPartitions(_.flatMap { m =>
        sampleFrames(m.payload, stride = 2, ctx = s"doc_id=${m.doc_id}").map { case (f, png) =>
          val (w, h, pix) = decodeGray(png)
          var sig = 0L
          var i = 0
          while (i < pix.length) { sig += pix(i).toLong * (i + 1); i += 1 }
          FrameRow(m.doc_id, f.toLong, w.toLong, h.toLong, sig)
        }
      })
      .toDF()
      .orderBy("doc_id", "frame_no")
  }

  val qFrameSampleSql: String =
    """WITH f AS (
      |  SELECT doc_id, unnest(range((doc_id % 9) + 1)) AS frame_no FROM documents
      |), s AS (
      |  SELECT doc_id, frame_no,
      |    CAST(doc_id % 24 + 8 AS BIGINT) AS width,
      |    CAST(doc_id % 18 + 8 AS BIGINT) AS height
      |  FROM f WHERE frame_no % 2 = 0
      |), px1 AS (
      |  SELECT *, unnest(range(width)) AS x FROM s
      |), px AS (
      |  SELECT *, unnest(range(height)) AS y FROM px1
      |)
      |SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no, width, height,
      |  CAST(SUM(((x*31 + y*17 + doc_id*7 + frame_no*11) % 256)
      |           * (y*width + x + 1)) AS BIGINT) AS frame_sig
      |FROM px GROUP BY doc_id, frame_no, width, height
      |ORDER BY doc_id, frame_no""".stripMargin

  // -------------------------------------------------- P11c thumbnails
  /** Gated thumbnailing with REAL pixel work (r13): every doc's
    * payload is a genuine PNG (dims doc_id-derived, up to 111×83);
    * the query ImageIO-decodes it, aspect-fits into a 16×16 box with
    * integer geometry OFF THE DECODED DIMS, and average-pools the
    * decoded pixels with [[poolGray]].  pix_sum / pix_hash are exact
    * integer checksums of the POOLED pixels (hash is position-
    * weighted: Σ pv·(ty·tw + tx + 1)), reproduced arithmetically by
    * the oracle — a hash match certifies decode, geometry, bucket
    * assignment and integer division all at once.  Scale shape:
    * decode + pool are scan-local; only 7 narrow columns leave. */
  final case class ThumbRow(doc_id: Long, width: Long, height: Long,
                            thumb_w: Long, thumb_h: Long,
                            pix_sum: Long, pix_hash: Long)

  val ThumbBox = 16

  /** Aspect-fit geometry, NEVER upscaling: an image already inside
    * the box keeps its own dims (pooling with tw > w would leave
    * empty buckets).  The gate corpus always has max(w, h) ≥ box so
    * its oracle never sees the clamp. */
  def thumbDims(w: Int, h: Int, box: Int): (Int, Int) = {
    val mx = math.max(w, h)
    (math.max(1, math.min(w, w * box / mx)),
      math.max(1, math.min(h, h * box / mx)))
  }

  def imagePayloads(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // see videoPayloads: full-width pixel stage off a byte-planned scan
    Tables.documents(s, d).select(col("doc_id"))
      .repartition(s.sparkContext.defaultParallelism * 2)
      .as[Long]
      .mapPartitions(_.map { id =>
        val w = (id % 96 + 16).toInt
        val h = (id % 72 + 12).toInt
        MediaIn(id, encodePngGray(w, h,
          Array.tabulate(w * h)(i => pixFormula(i % w, i / w, id, 0))))
      })
      .toDF()
  }

  def qThumbnail(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    imagePayloads(s, d)
      .as[MediaIn]
      .mapPartitions(_.map { m =>
        val (w, h, pix) = decodeGray(m.payload)
        val (tw, th) = thumbDims(w, h, ThumbBox)
        val pooled = poolGray(w, h, pix, tw, th)
        var sum = 0L
        var hash = 0L
        var i = 0
        while (i < pooled.length) {
          sum += pooled(i); hash += pooled(i).toLong * (i + 1); i += 1
        }
        ThumbRow(m.doc_id, w.toLong, h.toLong, tw.toLong, th.toLong, sum, hash)
      })
      .toDF()
      .orderBy("doc_id")
  }

  val qThumbnailSql: String =
    s"""WITH dims AS (
       |  SELECT doc_id,
       |    CAST(doc_id % 96 + 16 AS BIGINT) AS width,
       |    CAST(doc_id % 72 + 12 AS BIGINT) AS height
       |  FROM documents
       |), t AS (
       |  SELECT doc_id, width, height,
       |    GREATEST(1, (width * $ThumbBox) // GREATEST(width, height)) AS thumb_w,
       |    GREATEST(1, (height * $ThumbBox) // GREATEST(width, height)) AS thumb_h
       |  FROM dims
       |), px1 AS (
       |  SELECT *, unnest(range(width)) AS x FROM t
       |), px AS (
       |  SELECT *, unnest(range(height)) AS y FROM px1
       |), pooled AS (
       |  SELECT doc_id, width, height, thumb_w, thumb_h,
       |    (x * thumb_w) // width AS tx, (y * thumb_h) // height AS ty,
       |    CAST(SUM((x*31 + y*17 + doc_id*7) % 256)
       |         // COUNT(*) AS BIGINT) AS pv
       |  FROM px
       |  GROUP BY doc_id, width, height, thumb_w, thumb_h,
       |           (x * thumb_w) // width, (y * thumb_h) // height
       |)
       |SELECT doc_id, width, height, thumb_w, thumb_h,
       |  CAST(SUM(pv) AS BIGINT) AS pix_sum,
       |  CAST(SUM(pv * (ty * thumb_w + tx + 1)) AS BIGINT) AS pix_hash
       |FROM pooled
       |GROUP BY doc_id, width, height, thumb_w, thumb_h
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------- P11d RGB thumbnails
  /** Color thumbnailing (r14): payloads are genuine truecolor PNGs
    * (color type 2), per-channel value c∈{R,G,B} = pixFormula(x, y,
    * id, c); the query decodes all three bands, aspect-fits, and
    * average-pools EACH CHANNEL independently with [[poolRgb]].
    * sum_r/g/b are per-channel pooled sums and pix_hash_rgb packs the
    * three pooled channel values into one position-weighted checksum
    * (Σ (pr·2¹⁶ + pg·2⁸ + pb)·(i+1)) — the oracle reproduces all four
    * arithmetically, so a hash match certifies 3-band decode, channel
    * order, geometry, and per-channel integer division at once. */
  final case class ThumbRgbRow(doc_id: Long, width: Long, height: Long,
                               thumb_w: Long, thumb_h: Long,
                               sum_r: Long, sum_g: Long, sum_b: Long,
                               pix_hash_rgb: Long)

  def imagePayloadsRgb(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // see videoPayloads: full-width pixel stage off a byte-planned scan
    Tables.documents(s, d).select(col("doc_id"))
      .repartition(s.sparkContext.defaultParallelism * 2)
      .as[Long]
      .mapPartitions(_.map { id =>
        val w = (id % 96 + 16).toInt
        val h = (id % 72 + 12).toInt
        MediaIn(id, encodePngRgb(w, h, Array.tabulate(w * h) { i =>
          val (x, y) = (i % w, i / w)
          (pixFormula(x, y, id, 0) << 16) |
            (pixFormula(x, y, id, 1) << 8) | pixFormula(x, y, id, 2)
        }))
      })
      .toDF()
  }

  def qThumbnailRgb(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    imagePayloadsRgb(s, d)
      .as[MediaIn]
      .mapPartitions(_.map { m =>
        val (w, h, rgb) = decodeRgb(m.payload)
        val (tw, th) = thumbDims(w, h, ThumbBox)
        val pooled = poolRgb(w, h, rgb, tw, th)
        var sr = 0L; var sg = 0L; var sb = 0L
        var hash = 0L
        var i = 0
        while (i < pooled.length) {
          val v = pooled(i)
          sr += (v >>> 16) & 0xff; sg += (v >>> 8) & 0xff; sb += v & 0xff
          hash += v.toLong * (i + 1)
          i += 1
        }
        ThumbRgbRow(m.doc_id, w.toLong, h.toLong, tw.toLong, th.toLong,
          sr, sg, sb, hash)
      })
      .toDF()
      .orderBy("doc_id")
  }

  val qThumbnailRgbSql: String =
    s"""WITH dims AS (
       |  SELECT doc_id,
       |    CAST(doc_id % 96 + 16 AS BIGINT) AS width,
       |    CAST(doc_id % 72 + 12 AS BIGINT) AS height
       |  FROM documents
       |), t AS (
       |  SELECT doc_id, width, height,
       |    GREATEST(1, (width * $ThumbBox) // GREATEST(width, height)) AS thumb_w,
       |    GREATEST(1, (height * $ThumbBox) // GREATEST(width, height)) AS thumb_h
       |  FROM dims
       |), px1 AS (
       |  SELECT *, unnest(range(width)) AS x FROM t
       |), px AS (
       |  SELECT *, unnest(range(height)) AS y FROM px1
       |), pooled AS (
       |  SELECT doc_id, width, height, thumb_w, thumb_h,
       |    (x * thumb_w) // width AS tx, (y * thumb_h) // height AS ty,
       |    CAST(SUM((x*31 + y*17 + doc_id*7) % 256) // COUNT(*) AS BIGINT) AS pr,
       |    CAST(SUM((x*31 + y*17 + doc_id*7 + 11) % 256) // COUNT(*) AS BIGINT) AS pg,
       |    CAST(SUM((x*31 + y*17 + doc_id*7 + 22) % 256) // COUNT(*) AS BIGINT) AS pb
       |  FROM px
       |  GROUP BY doc_id, width, height, thumb_w, thumb_h,
       |           (x * thumb_w) // width, (y * thumb_h) // height
       |)
       |SELECT doc_id, width, height, thumb_w, thumb_h,
       |  CAST(SUM(pr) AS BIGINT) AS sum_r,
       |  CAST(SUM(pg) AS BIGINT) AS sum_g,
       |  CAST(SUM(pb) AS BIGINT) AS sum_b,
       |  CAST(SUM((pr * 65536 + pg * 256 + pb) * (ty * thumb_w + tx + 1))
       |       AS BIGINT) AS pix_hash_rgb
       |FROM pooled
       |GROUP BY doc_id, width, height, thumb_w, thumb_h
       |ORDER BY doc_id""".stripMargin

  // -------------------------------------- P11e mixed-codec thumbnails
  /** The mixed-codec gate (r14): the same gray thumbnail kernel over a
    * corpus that MIXES three real codecs — doc_id % 3 picks our
    * zlib-PNG, a real uncompressed 24-bpp BMP, or a real LZW GIF with
    * an identity-gray palette.  `sniffFormat` + `readerFor` route all
    * THREE to per-thread ImageIO plugin readers (PNG, BMP, GIF — the
    * per-call registry scan made this key superlinear at ×10 data,
    * MEDIAPROBE r14); `ImageIO.read`'s generic lookup remains only the
    * fallback for unsniffed formats (exercised by the real-JPEG spec).
    * The oracle is pure doc_id arithmetic, blind to the codec: the
    * hash matches only if ALL THREE decode paths reproduce the exact
    * same pixels. */
  def imagePayloadsMixed(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id"))
      .repartition(s.sparkContext.defaultParallelism * 2)
      .as[Long]
      .mapPartitions(_.map { id =>
        val w = (id % 80 + 20).toInt
        val h = (id % 60 + 15).toInt
        val pix = Array.tabulate(w * h)(i => pixFormula(i % w, i / w, id, 0))
        MediaIn(id, (id % 3) match {
          case 0 => encodePngGray(w, h, pix)
          case 1 => encodeBmpGray(w, h, pix)
          case _ => encodeGifGray(w, h, pix)
        })
      })
      .toDF()
  }

  def qThumbnailMixed(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    imagePayloadsMixed(s, d)
      .as[MediaIn]
      .mapPartitions(_.map { m =>
        val (w, h, pix) = decodeGray(m.payload)
        val (tw, th) = thumbDims(w, h, ThumbBox)
        val pooled = poolGray(w, h, pix, tw, th)
        var sum = 0L
        var hash = 0L
        var i = 0
        while (i < pooled.length) {
          sum += pooled(i); hash += pooled(i).toLong * (i + 1); i += 1
        }
        ThumbRow(m.doc_id, w.toLong, h.toLong, tw.toLong, th.toLong, sum, hash)
      })
      .toDF()
      .orderBy("doc_id")
  }

  val qThumbnailMixedSql: String =
    s"""WITH dims AS (
       |  SELECT doc_id,
       |    CAST(doc_id % 80 + 20 AS BIGINT) AS width,
       |    CAST(doc_id % 60 + 15 AS BIGINT) AS height
       |  FROM documents
       |), t AS (
       |  SELECT doc_id, width, height,
       |    GREATEST(1, (width * $ThumbBox) // GREATEST(width, height)) AS thumb_w,
       |    GREATEST(1, (height * $ThumbBox) // GREATEST(width, height)) AS thumb_h
       |  FROM dims
       |), px1 AS (
       |  SELECT *, unnest(range(width)) AS x FROM t
       |), px AS (
       |  SELECT *, unnest(range(height)) AS y FROM px1
       |), pooled AS (
       |  SELECT doc_id, width, height, thumb_w, thumb_h,
       |    (x * thumb_w) // width AS tx, (y * thumb_h) // height AS ty,
       |    CAST(SUM((x*31 + y*17 + doc_id*7) % 256)
       |         // COUNT(*) AS BIGINT) AS pv
       |  FROM px
       |  GROUP BY doc_id, width, height, thumb_w, thumb_h,
       |           (x * thumb_w) // width, (y * thumb_h) // height
       |)
       |SELECT doc_id, width, height, thumb_w, thumb_h,
       |  CAST(SUM(pv) AS BIGINT) AS pix_sum,
       |  CAST(SUM(pv * (ty * thumb_w + tx + 1)) AS BIGINT) AS pix_hash
       |FROM pooled
       |GROUP BY doc_id, width, height, thumb_w, thumb_h
       |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> (qMultimodalMeta _),
    "q_frame_sample" -> (qFrameSample _),
    "q_thumbnail" -> (qThumbnail _),
    "q_thumbnail_rgb" -> (qThumbnailRgb _),
    "q_thumbnail_mixed" -> (qThumbnailMixed _))

  val oracle: Map[String, String] = Map(
    "q_multimodal_meta" -> qMultimodalMetaSql,
    "q_frame_sample" -> qFrameSampleSql,
    "q_thumbnail" -> qThumbnailSql,
    "q_thumbnail_rgb" -> qThumbnailRgbSql,
    "q_thumbnail_mixed" -> qThumbnailMixedSql)
}
