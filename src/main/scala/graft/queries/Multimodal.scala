package graft.queries

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

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
  * Only pixel-level work (resize, frame extraction) remains stubbed,
  * since the image/video codecs themselves are not in this container.
  *
  * At 100 TB the payload column dominates: the header parse runs as a
  * scalar inside the scan stage (no shuffle, no typed serde, stays in
  * whole-stage codegen), and metadata extraction projects away the
  * payload as early as possible so downstream operators only ever see
  * the narrow metadata columns.
  */
object Multimodal {

  /** Input: an opaque payload plus its id. */
  final case class MediaIn(doc_id: Long, payload: Array[Byte])

  private def md5Hex(b: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(b).map("%02x".format(_)).mkString

  private def hash32(b: Array[Byte]): Long =
    java.lang.Long.parseLong(md5Hex(b).substring(0, 8), 16)

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

  /** STUB resize: a real implementation would rescale pixel data; the
    * stub deterministically derives the output payload from input
    * payload + target dims so the partition-local pipeline shape
    * (decode → transform → re-encode) is end-to-end testable. */
  final case class Resized(doc_id: Long, width: Long, height: Long, payload: Array[Byte])

  def resizeStub(spark: SparkSession, in: DataFrame, w: Int, h: Int): DataFrame = {
    import spark.implicits._
    in.select(col("doc_id"), col("payload")).as[MediaIn]
      .mapPartitions(_.map { m =>
        val sig = md5Hex(m.payload).getBytes(UTF_8)
        Resized(m.doc_id, w.toLong, h.toLong, sig.take(16))
      })
      .toDF()
  }

  /** STUB frame sampling: emits every `stride`-th "frame" of a fake
    * video payload — one row per sampled frame, the flatMap shape a
    * real ffmpeg-backed sampler would use. */
  final case class Frame(doc_id: Long, frame_no: Long, frame_sig: Long)

  def frameSampleStub(spark: SparkSession, in: DataFrame, nFrames: Int,
                      stride: Int): DataFrame = {
    import spark.implicits._
    in.select(col("doc_id"), col("payload")).as[MediaIn]
      .mapPartitions(_.flatMap { m =>
        (0 until nFrames by stride).map { f =>
          Frame(m.doc_id, f.toLong, hash32(m.payload ++ BigInt(f).toByteArray))
        }
      })
      .toDF()
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
  /** Gated frame sampling: every 2nd of a payload-dependent frame
    * count, one output row per sampled frame — the flatMap shape an
    * ffmpeg-backed sampler uses, end-to-end through real payloads.
    * The container dims ride along from the REAL header parse
    * (decodeMeta — the oracle only matches if the built headers parse
    * back), while the pixel-level frame decode is the documented stub:
    * frame_sig derives deterministically from (doc_id, frame_no) with
    * the same md5-walk hash both engines share.  Scale shape: the
    * scan-stage metadata decode projects the payload away BEFORE the
    * typed fan-out, so only (id, dims) rows leave the scan. */
  def qFrameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    decodeMeta(s, mediaPayloads(s, d))
      .select(col("doc_id"), col("width"), col("height"))
      .as[(Long, Long, Long)]
      .mapPartitions(_.flatMap { case (id, w, h) =>
        val n = (id % 9 + 1).toInt
        (0 until n by 2).iterator.map { f =>
          (id, f.toLong, w, h, hash32(s"$id:$f".getBytes(UTF_8)))
        }
      })
      .toDF("doc_id", "frame_no", "width", "height", "frame_sig")
      .orderBy("doc_id", "frame_no")
  }

  val qFrameSampleSql: String = {
    val sig = Pipeline.duckHash32(
      "CAST(doc_id AS VARCHAR) || ':' || CAST(frame_no AS VARCHAR)")
    s"""WITH f AS (
       |  SELECT doc_id, unnest(range((doc_id % 9) + 1)) AS frame_no FROM documents
       |)
       |SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no,
       |  CAST(doc_id % 640 + 1 AS BIGINT) AS width,
       |  CAST(doc_id % 480 + 1 AS BIGINT) AS height,
       |  $sig AS frame_sig
       |FROM f WHERE frame_no % 2 = 0
       |ORDER BY doc_id, frame_no""".stripMargin
  }

  // -------------------------------------------------- P11c thumbnails
  /** Gated resize planning: aspect-fit every image into a 64×64 box —
    * the geometry a thumbnailing pass computes, in PURE INTEGER
    * arithmetic off the REAL header parse (the oracle only matches if
    * the built containers parse back), with the pixel resample itself
    * the documented stub (thumb_sig = the shared md5-walk hash of the
    * planned geometry).  Scale shape: scalar scan-stage math — the
    * payload is projected away right after the header parse, exactly
    * where a real resizer would hand off to its pixel kernel. */
  def qThumbnail(s: SparkSession, d: String): DataFrame =
    decodeMeta(s, mediaPayloads(s, d))
      .select(col("doc_id"), col("fmt"), col("width"), col("height"))
      .withColumn("thumb_w",
        expr("greatest(1L, (width * 64) DIV greatest(width, height))"))
      .withColumn("thumb_h",
        expr("greatest(1L, (height * 64) DIV greatest(width, height))"))
      .withColumn("thumb_sig", expr(
        "graft_hash32(concat(CAST(doc_id AS STRING), 'x', " +
          "CAST(thumb_w AS STRING), 'x', CAST(thumb_h AS STRING)))"))
      .select("doc_id", "fmt", "width", "height", "thumb_w", "thumb_h", "thumb_sig")
      .orderBy("doc_id")

  val qThumbnailSql: String = {
    val sig = Pipeline.duckHash32(
      "CAST(doc_id AS VARCHAR) || 'x' || CAST(thumb_w AS VARCHAR) || 'x' || CAST(thumb_h AS VARCHAR)")
    s"""WITH dims AS (
       |  SELECT doc_id,
       |    CASE doc_id % 4 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' WHEN 2 THEN 'gif'
       |         ELSE 'webp' END AS fmt,
       |    CAST(doc_id % 640 + 1 AS BIGINT) AS width,
       |    CAST(doc_id % 480 + 1 AS BIGINT) AS height
       |  FROM documents
       |), t AS (
       |  SELECT doc_id, fmt, width, height,
       |    GREATEST(1, (width * 64) // GREATEST(width, height)) AS thumb_w,
       |    GREATEST(1, (height * 64) // GREATEST(width, height)) AS thumb_h
       |  FROM dims
       |)
       |SELECT doc_id, fmt, width, height, thumb_w, thumb_h, $sig AS thumb_sig
       |FROM t ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> (qMultimodalMeta _),
    "q_frame_sample" -> (qFrameSample _),
    "q_thumbnail" -> (qThumbnail _))

  val oracle: Map[String, String] = Map(
    "q_multimodal_meta" -> qMultimodalMetaSql,
    "q_frame_sample" -> qFrameSampleSql,
    "q_thumbnail" -> qThumbnailSql)
}
