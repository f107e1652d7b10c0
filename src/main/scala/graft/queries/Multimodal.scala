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
  * The PIXEL level is real too (r13): payloads for the gated pixel
  * keys are honest-to-goodness PNG files (zlib-deflated scanlines,
  * CRC'd chunks — JDK-only encode), decoded back through
  * `javax.imageio.ImageIO` (the JVM's real PNG codec, NOT our
  * encoder), then resampled with a deterministic integer aspect-fit
  * average pool whose output pixel checksums the DuckDB oracle
  * reproduces arithmetically.  Video stays a stub only in the sense
  * that no ffmpeg exists offline: the "video" container is an honest
  * length-prefixed sequence of real PNG frames, and frame sampling
  * SEEKS past unsampled frames and really decodes the sampled ones.
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

  /** Real-header metadata decode over a payload frame: one codegen'd
    * scalar in the scan stage — no shuffle, no typed serde. */
  def decodeMeta(spark: SparkSession, in: DataFrame): DataFrame =
    in.select(col("doc_id"), expr("graft_media_dims(payload)").as("dims"),
        length(col("payload")).cast("bigint").as("n_bytes"))
      .select(col("doc_id"), col("n_bytes"),
        col("dims").getItem(1).as("width"),
        col("dims").getItem(2).as("height"),
        expr("CASE dims[0] WHEN 1 THEN 'jpeg' WHEN 2 THEN 'png' WHEN 3 THEN 'gif' " +
          "WHEN 4 THEN 'webp' WHEN 5 THEN 'bmp' ELSE 'unknown' END").as("fmt"))

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
  private val deflaterTL = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      // BEST_SPEED: still a spec-valid zlib stream (any inflater reads
      // it); compression ratio is irrelevant for fixtures
      new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
  }
  private val pngReaderTL = new ThreadLocal[javax.imageio.ImageReader] {
    override def initialValue(): javax.imageio.ImageReader = {
      val it = javax.imageio.ImageIO.getImageReadersByFormatName("png")
      require(it.hasNext, "JVM has no PNG ImageReader")
      it.next()
    }
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

  /** Real decode through the JVM's codec; returns (w, h, gray pixels
    * row-major).  Throws on undecodable bytes — a corrupt payload in a
    * 100 TB corpus should surface, not silently zero.  The PNG
    * ImageReader is reused per thread (the per-call reader lookup in
    * `ImageIO.read` dominates at thumbnail sizes); non-PNG payloads
    * fall back to the generic path. */
  def decodeGray(payload: Array[Byte]): (Int, Int, Array[Int]) = {
    val isPng = payload.length > 8 && (payload(0) & 0xff) == 0x89 &&
      payload(1) == 'P' && payload(2) == 'N' && payload(3) == 'G'
    val img =
      if (isPng) {
        val reader = pngReaderTL.get()
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

  /** Deterministic integer average pool to tw×th: source pixel (x, y)
    * lands in bucket (x·tw div w, y·th div h); pooled value = bucket
    * sum div bucket count.  Pure integer math — no Graphics2D, no
    * float filter kernels — so a SQL engine reproduces it exactly. */
  def poolGray(w: Int, h: Int, pix: Array[Int], tw: Int, th: Int): Array[Int] = {
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

  /** The honest offline "video" container: 4-byte big-endian length +
    * PNG bytes per frame, concatenated — the seekable frame index an
    * MJPEG-style stream gives a sampler. */
  def buildVideo(id: Long, nFrames: Int, w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < nFrames) {
      val png = encodePngGray(w, h,
        Array.tabulate(w * h)(i => pixFormula(i % w, i / w, id, f)))
      out.write((png.length >>> 24) & 0xff); out.write((png.length >>> 16) & 0xff)
      out.write((png.length >>> 8) & 0xff); out.write(png.length & 0xff)
      out.write(png)
      f += 1
    }
    out.toByteArray
  }

  /** Every `stride`-th frame's bytes, SEEKING past the others by their
    * length prefix (unsampled frames are never decoded — the point of
    * a seekable container). */
  def sampleFrames(payload: Array[Byte], stride: Int): Iterator[(Int, Array[Byte])] =
    new Iterator[(Int, Array[Byte])] {
      private var off = 0
      private var f = 0
      override def hasNext: Boolean = off + 4 <= payload.length
      override def next(): (Int, Array[Byte]) = {
        // skip unsampled frames without touching their pixel bytes
        while (f % stride != 0) { off += 4 + len(off); f += 1 }
        val n = len(off)
        val bytes = java.util.Arrays.copyOfRange(payload, off + 4, off + 4 + n)
        val id = f
        off += 4 + n; f += 1
        // advance past trailing unsampled frames so hasNext is exact
        while (off + 4 <= payload.length && f % stride != 0) { off += 4 + len(off); f += 1 }
        (id, bytes)
      }
      private def len(o: Int): Int =
        ((payload(o) & 0xff) << 24) | ((payload(o + 1) & 0xff) << 16) |
          ((payload(o + 2) & 0xff) << 8) | (payload(o + 3) & 0xff)
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
        val payload = (id % 4) match {
          case 0 => buildJpeg(w, h, body)
          case 1 => buildPng(w, h, body)
          case 2 => buildGif(w, h, body)
          case _ => buildWebp(w, h, body)
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
      |  CAST(CASE doc_id % 4 WHEN 0 THEN 15 WHEN 1 THEN 33 WHEN 2 THEN 13
      |       ELSE 30 END + octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
      |  CAST(doc_id % 640 + 1 AS BIGINT) AS width,
      |  CAST(doc_id % 480 + 1 AS BIGINT) AS height,
      |  CASE doc_id % 4 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' WHEN 2 THEN 'gif'
      |       ELSE 'webp' END AS fmt
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------ P11b frames
  /** Gated frame sampling with REAL pixel decode (r13): each doc's
    * payload is a length-prefixed stream of (doc_id % 9 + 1) genuine
    * PNG frames; the sampler SEEKS past odd frames by their length
    * prefix and ImageIO-decodes every 2nd one.  frame_sig is an exact
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
        MediaIn(id, buildVideo(id, (id % 9 + 1).toInt, w, h))
      })
      .toDF()
  }

  def qFrameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    videoPayloads(s, d)
      .as[MediaIn]
      .mapPartitions(_.flatMap { m =>
        sampleFrames(m.payload, stride = 2).map { case (f, png) =>
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> (qMultimodalMeta _),
    "q_frame_sample" -> (qFrameSample _),
    "q_thumbnail" -> (qThumbnail _))

  val oracle: Map[String, String] = Map(
    "q_multimodal_meta" -> qMultimodalMetaSql,
    "q_frame_sample" -> qFrameSampleSql,
    "q_thumbnail" -> qThumbnailSql)
}
