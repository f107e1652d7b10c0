package graft.queries

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** P11 — multimodal column plumbing.
  *
  * Media payloads are opaque `binary` columns with typed metadata.
  * The decode step is a clearly-marked deterministic STUB (the real
  * image/audio libraries are not in this container); everything
  * Spark-side — schema, binary column, partition-preserving
  * mapPartitions batch shape, output schema — is real and is what a
  * production decoder would plug into.
  *
  * At 100 TB the payload column dominates: the decode is a
  * mapPartitions (no shuffle), metadata extraction projects away the
  * payload as early as possible, and downstream operators only ever
  * see the narrow metadata columns.
  */
object Multimodal {

  /** Input: an opaque payload plus its id. */
  final case class MediaIn(doc_id: Long, payload: Array[Byte])

  /** Output: typed metadata extracted by the (stub) decoder. */
  final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long,
                             height: Long, fmt: String)

  private def md5Hex(b: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(b).map("%02x".format(_)).mkString

  /** First 8 md5 hex digits as a long — same function as the SQL-side
    * hash32 in [[Pipeline]], so the stub is oracle-checkable. */
  private def hash32(b: Array[Byte]): Long =
    java.lang.Long.parseLong(md5Hex(b).substring(0, 8), 16)

  /** STUB decoder: a real implementation would parse the media header
    * (libjpeg/ffmpeg/...); this derives deterministic fake dimensions
    * from the payload so the plumbing is end-to-end testable. */
  def decodeStub(m: MediaIn): MediaMeta = {
    val w = hash32(m.payload) % 640 + 1
    val h = hash32(m.payload ++ "h".getBytes(UTF_8)) % 480 + 1
    val fmt = (m.doc_id % 3) match {
      case 0 => "jpeg"; case 1 => "png"; case _ => "webp"
    }
    MediaMeta(m.doc_id, m.payload.length.toLong, w, h, fmt)
  }

  /** Batch decode over a payload Dataset: partition-local, no shuffle;
    * the iterator shape is what a vectorized decoder would consume. */
  def decodeMeta(spark: SparkSession, in: DataFrame): DataFrame = {
    import spark.implicits._
    in.select(col("doc_id"), col("payload")).as[MediaIn]
      .mapPartitions(_.map(decodeStub))
      .toDF()
  }

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

  def qMultimodalMeta(s: SparkSession, d: String): DataFrame = {
    val in = Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    decodeMeta(s, in).orderBy("doc_id")
  }

  /** Oracle replicates the stub arithmetic (md5-derived dimensions)
    * over the same UTF-8 payload bytes. */
  val qMultimodalMetaSql: String = {
    def h32(x: String) =
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(8), " +
        s"i -> CAST(strpos('0123456789abcdef', substr(md5($x), CAST(i + 1 AS INT), 1)) - 1 AS BIGINT))), (a, b) -> a * 16 + b)"
    s"""SELECT doc_id,
       |  CAST(strlen(text) AS BIGINT) AS n_bytes,
       |  ${h32("text")} % 640 + 1 AS width,
       |  ${h32("text || 'h'")} % 480 + 1 AS height,
       |  CASE doc_id % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS fmt
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> (qMultimodalMeta _))

  val oracle: Map[String, String] = Map(
    "q_multimodal_meta" -> qMultimodalMetaSql)
}
