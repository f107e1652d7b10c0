package graft.queries

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** P11f — the AUDIO leg of the multimodal column story (r14).
  *
  * Payloads are REAL WAV files: RIFF/WAVE container with a 16-byte PCM
  * `fmt ` chunk and a `data` chunk of 16-bit little-endian mono
  * samples, built from the public RIFF-WAVE spec.  Decode goes through
  * `javax.sound.sampled.AudioSystem` — the JVM's own WAV parser, a
  * genuinely foreign decoder for our encoder's output (the ImageIO
  * pattern of the image leg, applied to sound).  All feature math is
  * integer-exact so the DuckDB oracle replays it arithmetically:
  *
  *   - `q_audio_meta`: container metadata (sample rate, sample count,
  *     integer duration) as parsed BACK from the real header;
  *   - `q_audio_energy`: framed energy profile — 256-sample frames,
  *     per-frame Σ|s|, summarized per doc as (n_frames, sum_abs,
  *     peak_frame_energy, position-weighted energy hash).  A hash
  *     match certifies PCM byte order, sign handling, frame split and
  *     the integer sums all at once.
  *
  * 100 TB shape: build + decode + featurize are one scan-local
  * flatMap/map — samples never shuffle, only the narrow feature
  * columns leave the stage (the q_thumbnail discipline).
  */
object Audio {

  final case class AudioIn(doc_id: Long, payload: Array[Byte])

  /** The deterministic test-signal formula shared with the oracle:
    * sample i of doc id, full 16-bit signed range. */
  @inline def sampleFormula(i: Int, id: Long): Int =
    (((i.toLong * 131 + id * 17) % 65536L) - 32768L).toInt

  /** A REAL 16-bit LE mono PCM WAV: RIFF header, canonical 16-byte
    * fmt chunk, data chunk — readable by any WAV parser. */
  def buildWav(rate: Int, samples: Array[Int]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    out.write("RIFF".getBytes(UTF_8)); le32(36 + dataLen)
    out.write("WAVE".getBytes(UTF_8))
    out.write("fmt ".getBytes(UTF_8)); le32(16)
    le16(1) // PCM
    le16(1) // mono
    le32(rate)
    le32(rate * 2) // byte rate
    le16(2) // block align
    le16(16) // bits per sample
    out.write("data".getBytes(UTF_8)); le32(dataLen)
    var i = 0
    while (i < samples.length) { le16(samples(i) & 0xffff); i += 1 }
    out.toByteArray
  }

  // The JVM's audio parsers, obtained ONCE through the public
  // `AudioFileReader` SPI.  `AudioSystem.getAudioInputStream` resolves
  // its provider list through a synchronized registry on EVERY call,
  // which serializes all 32 executor threads on one lock — measured:
  // q_audio_meta 20.7s at sf1 against 2.5s of actual single-thread
  // decode work (the audio twin of the r13 per-call-ImageIO lesson).
  // Reader instances are stateless; one shared list serves all threads
  // lock-free.  WAV readers ordered first so the common case never
  // pays the other parsers' rejection exceptions.
  private lazy val audioReaders: List[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    val rs = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.toList
    val (wav, rest) = rs.partition(_.getClass.getSimpleName.startsWith("Wave"))
    wav ++ rest
  }

  /** Real decode through the JVM's own PCM parsers (resolved via the
    * public SPI, see [[audioReaders]] — WAV and AIFF both route here);
    * returns (sampleRate, channels, bitsPerSample, signed samples,
    * interleaved).  Handles 8-bit unsigned / 16-bit / 24-bit PCM in
    * either byte order, so one conversion loop serves the WAV (LE) and
    * AIFF (BE) containers.  Throws a ctx-carrying failure on
    * undecodable bytes — a truncated payload in a 100 TB corpus should
    * surface with its context, not silently zero.  Any reader blowing
    * up non-fatally on malformed bytes (ADVICE r14: not just the two
    * declared exception types) counts as "this reader can't", so the
    * failure always exits through the ctx path. */
  def decodePcm(payload: Array[Byte], ctx: String = ""): (Int, Int, Int, Array[Int]) = {
    var in: javax.sound.sampled.AudioInputStream = null
    val it = audioReaders.iterator
    while (in == null && it.hasNext) {
      val r = it.next()
      try in = r.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => () }
    }
    if (in == null)
      // unlikely fallback (e.g. no SPI providers visible): the slow
      // registry path, whose error message carries the context
      in = try {
        javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
      } catch {
        case scala.util.control.NonFatal(e) =>
          throw new IllegalArgumentException(
            s"payload is not decodable audio (${e.getMessage}) $ctx".trim)
      }
    try {
      val fmt = in.getFormat
      val bits = fmt.getSampleSizeInBits
      val bytesPer = bits / 8
      val unsigned =
        fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
      require(bits == 8 || bits == 16 || bits == 24,
        s"expected 8/16/24-bit PCM, got $fmt $ctx")
      val bytes = in.readAllBytes()
      val n = bytes.length / bytesPer
      val samples = new Array[Int](n)
      var i = 0
      if (bits == 8) {
        // 8-bit PCM is unsigned in WAV (center 128); recentre to signed
        while (i < n) { samples(i) = (bytes(i) & 0xff) - (if (unsigned) 128 else 0); i += 1 }
      } else if (bits == 16 && !fmt.isBigEndian) {
        while (i < n) {
          samples(i) = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
          i += 1
        }
      } else if (bits == 16) {
        while (i < n) {
          samples(i) = ((bytes(2 * i + 1) & 0xff) | (bytes(2 * i) << 8)).toShort.toInt
          i += 1
        }
      } else { // 24-bit: sign-extend via <<8 >>8
        while (i < n) {
          val v =
            if (fmt.isBigEndian)
              ((bytes(3 * i) & 0xff) << 16) | ((bytes(3 * i + 1) & 0xff) << 8) |
                (bytes(3 * i + 2) & 0xff)
            else
              (bytes(3 * i) & 0xff) | ((bytes(3 * i + 1) & 0xff) << 8) |
                ((bytes(3 * i + 2) & 0xff) << 16)
          samples(i) = (v << 8) >> 8
          i += 1
        }
      }
      (fmt.getSampleRate.toInt, fmt.getChannels, bits, samples)
    } finally in.close()
  }

  /** The 16-bit-LE gate the r14 keys pin: [[decodePcm]] plus the
    * original container contract check. */
  def decodeWav(payload: Array[Byte], ctx: String = ""): (Int, Int, Array[Int]) = {
    val (rate, ch, bits, samples) = decodePcm(payload, ctx)
    require(bits == 16, s"expected 16-bit LE PCM, got $bits-bit $ctx")
    (rate, ch, samples)
  }

  val FrameLen = 256

  /** The framed-energy kernel, ONE spelling (ADVICE r14): 256-sample
    * frames over the decoded samples, per-frame Σ|s|, summarized as
    * (n_frames, sum_abs, peak_frame_energy, position-weighted energy
    * hash).  Shared VERBATIM by the batch query ([[qAudioEnergy]]) and
    * the streaming face ([[graft.streaming.StreamAudioEnergy]]) so the
    * batch/stream bit-identity their specs assert cannot drift. */
  def energyOf(samples: Array[Int]): (Long, Long, Long, Long) = {
    val nFrames = (samples.length + FrameLen - 1) / FrameLen
    var sumAbs = 0L
    var peak = 0L
    var hash = 0L
    var f = 0
    while (f < nFrames) {
      var e = 0L
      var i = f * FrameLen
      val end = math.min(samples.length, i + FrameLen)
      while (i < end) { e += math.abs(samples(i)).toLong; i += 1 }
      sumAbs += e
      if (e > peak) peak = e
      hash += e * (f + 1)
      f += 1
    }
    (nFrames.toLong, sumAbs, peak, hash)
  }

  def audioPayloads(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // full-width stage off a byte-planned narrow scan (see
    // Multimodal.videoPayloads — same 100 TB lesson)
    Tables.documents(s, d).select(col("doc_id"))
      .repartition(s.sparkContext.defaultParallelism * 2)
      .as[Long]
      .mapPartitions(_.map { id =>
        val rate = (8000 + (id % 4) * 4000).toInt
        val n = (id % 2000 + 500).toInt
        AudioIn(id, buildWav(rate, Array.tabulate(n)(i => sampleFormula(i, id))))
      })
      .toDF()
  }

  /** Metadata parsed back from the REAL container by the foreign
    * decoder — the oracle derives the same values from doc_id
    * arithmetic, so the match proves the header round-trip. */
  final case class AudioMeta(doc_id: Long, sample_rate: Long, channels: Long,
                             n_samples: Long, duration_ms: Long)

  def qAudioMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    audioPayloads(s, d)
      .as[AudioIn]
      .mapPartitions(_.map { a =>
        val (rate, ch, samples) = decodeWav(a.payload, s"doc_id=${a.doc_id}")
        AudioMeta(a.doc_id, rate.toLong, ch.toLong, samples.length.toLong,
          samples.length.toLong * 1000 / rate)
      })
      .toDF()
      .orderBy("doc_id")
  }

  val qAudioMetaSql: String =
    """SELECT doc_id,
      |  CAST(8000 + (doc_id % 4) * 4000 AS BIGINT) AS sample_rate,
      |  CAST(1 AS BIGINT) AS channels,
      |  CAST(doc_id % 2000 + 500 AS BIGINT) AS n_samples,
      |  CAST((doc_id % 2000 + 500) * 1000
      |       // (8000 + (doc_id % 4) * 4000) AS BIGINT) AS duration_ms
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Framed integer energy profile over the DECODED samples. */
  final case class AudioEnergy(doc_id: Long, n_frames: Long, sum_abs: Long,
                               peak_frame_energy: Long, energy_hash: Long)

  def qAudioEnergy(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    audioPayloads(s, d)
      .as[AudioIn]
      .mapPartitions(_.map { a =>
        val (_, _, samples) = decodeWav(a.payload, s"doc_id=${a.doc_id}")
        val (nFrames, sumAbs, peak, hash) = energyOf(samples)
        AudioEnergy(a.doc_id, nFrames, sumAbs, peak, hash)
      })
      .toDF()
      .orderBy("doc_id")
  }

  val qAudioEnergySql: String =
    s"""WITH s AS (
       |  SELECT doc_id, unnest(range(doc_id % 2000 + 500)) AS i FROM documents
       |), sv AS (
       |  SELECT doc_id, i // $FrameLen AS f,
       |    ABS((i * 131 + doc_id * 17) % 65536 - 32768) AS a
       |  FROM s
       |), fe AS (
       |  SELECT doc_id, f, CAST(SUM(a) AS BIGINT) AS e
       |  FROM sv GROUP BY doc_id, f
       |)
       |SELECT doc_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_frames,
       |  CAST(SUM(e) AS BIGINT) AS sum_abs,
       |  CAST(MAX(e) AS BIGINT) AS peak_frame_energy,
       |  CAST(SUM(e * (f + 1)) AS BIGINT) AS energy_hash
       |FROM fe GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_audio_meta" -> (qAudioMeta _),
    "q_audio_energy" -> (qAudioEnergy _))

  val oracle: Map[String, String] = Map(
    "q_audio_meta" -> qAudioMetaSql,
    "q_audio_energy" -> qAudioEnergySql)
}
