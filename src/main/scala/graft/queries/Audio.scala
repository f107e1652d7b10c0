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

  /** A REAL PCM WAV: RIFF header, canonical 16-byte fmt chunk, data
    * chunk — readable by any WAV parser.  `samples` is channel-
    * interleaved signed values; 8-bit is stored unsigned (center 128)
    * per the WAV spec, 16/24-bit little-endian signed. */
  def buildWavPcm(rate: Int, channels: Int, bits: Int,
                  samples: Array[Int]): Array[Byte] = {
    require(bits == 8 || bits == 16 || bits == 24, s"unsupported bits $bits")
    require(channels >= 1 && samples.length % channels == 0,
      s"${samples.length} samples not a multiple of $channels channels")
    val bytesPer = bits / 8
    val blockAlign = channels * bytesPer
    val dataLen = samples.length * bytesPer
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
    le16(channels)
    le32(rate)
    le32(rate * blockAlign) // byte rate
    le16(blockAlign)
    le16(bits)
    out.write("data".getBytes(UTF_8)); le32(dataLen)
    var i = 0
    while (i < samples.length) {
      val s = samples(i)
      if (bits == 8) out.write((s + 128) & 0xff)
      else if (bits == 16) le16(s & 0xffff)
      else { out.write(s & 0xff); out.write((s >>> 8) & 0xff); out.write((s >>> 16) & 0xff) }
      i += 1
    }
    out.toByteArray
  }

  /** The 16-bit LE mono shape the r14 keys pin. */
  def buildWav(rate: Int, samples: Array[Int]): Array[Byte] =
    buildWavPcm(rate, 1, 16, samples)

  /** An IEEE 754 80-bit extended float (the AIFF COMM sample-rate
    * field, public AIFF-1.3 spec) of a positive integer: 15-bit
    * biased exponent + explicit-leading-bit 64-bit mantissa, BE. */
  private[graft] def extended80(v: Int): Array[Byte] = {
    require(v > 0, s"sample rate must be positive, got $v")
    val nbits = 64 - java.lang.Long.numberOfLeadingZeros(v.toLong)
    val exp = 16382 + nbits // 16383 + (nbits - 1)
    val mant = v.toLong << (64 - nbits) // MSB (the explicit integer bit) at bit 63
    val out = new Array[Byte](10)
    out(0) = ((exp >>> 8) & 0xff).toByte
    out(1) = (exp & 0xff).toByte
    var i = 0
    while (i < 8) { out(2 + i) = ((mant >>> (56 - 8 * i)) & 0xff).toByte; i += 1 }
    out
  }

  /** A REAL AIFF file (public spec: `FORM size 'AIFF' COMM SSND`) of
    * 16-bit BIG-endian mono PCM — the sign/endianness analog of the
    * image leg's BMP/GIF codec test: the JVM's own AIFF parser (a
    * different SPI reader than the WAV one) must reproduce the exact
    * samples through the opposite byte order. */
  def buildAiff(rate: Int, samples: Array[Int]): Array[Byte] = {
    val dataLen = samples.length * 2
    val ssndLen = 8 + dataLen // offset + blockSize + frames
    val formLen = 4 + (8 + 18) + (8 + ssndLen) // 'AIFF' + COMM + SSND
    val out = new java.io.ByteArrayOutputStream(8 + formLen)
    def be32(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    def be16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    out.write("FORM".getBytes(UTF_8)); be32(formLen)
    out.write("AIFF".getBytes(UTF_8))
    out.write("COMM".getBytes(UTF_8)); be32(18)
    be16(1) // channels
    be32(samples.length) // numSampleFrames
    be16(16) // sampleSize
    out.write(extended80(rate))
    out.write("SSND".getBytes(UTF_8)); be32(ssndLen)
    be32(0); be32(0) // offset, blockSize
    var i = 0
    while (i < samples.length) { be16(samples(i) & 0xffff); i += 1 }
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

  // -------------------------------------------- P11g mixed containers
  /** The audio analog of the image leg's mixed-codec gate (r15):
    * doc_id % 5 picks one of FIVE real encodings — 16-bit mono WAV,
    * 16-bit STEREO WAV, 24-bit mono WAV, 8-bit (unsigned-container)
    * mono WAV, or 16-bit BIG-endian mono AIFF — all decoded through
    * the same SPI reader list (the WAV and AIFF parsers are different
    * JVM plugins).  One codec-blind oracle derives every feature from
    * doc_id arithmetic; the position- AND channel-weighted sample
    * hash certifies byte order, sign handling (8-bit recentring,
    * 24-bit sign extension), channel interleave and frame count all
    * at once.  Scale shape: build + decode + featurize stay one
    * scan-local map — samples never shuffle. */
  @inline def sample24Formula(i: Int, id: Long): Int =
    (((i.toLong * 7919 + id * 101) % 16777216L) - 8388608L).toInt

  @inline def sample8Formula(i: Int, id: Long): Int =
    (((i.toLong * 13 + id * 7) % 256L) - 128L).toInt

  def mixedPayloads(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id"))
      .repartition(s.sparkContext.defaultParallelism * 2)
      .as[Long]
      .mapPartitions(_.map { id =>
        val rate = (8000 + (id % 4) * 4000).toInt
        val n = (id % 1500 + 400).toInt
        val payload = (id % 5) match {
          case 0 => buildWavPcm(rate, 1, 16, Array.tabulate(n)(i => sampleFormula(i, id)))
          case 1 => buildWavPcm(rate, 2, 16, Array.tabulate(2 * n) { j =>
            sampleFormula(j / 2, id + j % 2) // frame-interleaved, ch c = formula(i, id+c)
          })
          case 2 => buildWavPcm(rate, 1, 24, Array.tabulate(n)(i => sample24Formula(i, id)))
          case 3 => buildWavPcm(rate, 1, 8, Array.tabulate(n)(i => sample8Formula(i, id)))
          case _ => buildAiff(rate, Array.tabulate(n)(i => sampleFormula(i, id)))
        }
        AudioIn(id, payload)
      })
      .toDF()
  }

  final case class AudioMixed(doc_id: Long, container: String, bits: Long,
                              channels: Long, sample_rate: Long, n_frames: Long,
                              sum_abs: Long, sample_hash: Long)

  def qAudioMixed(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mixedPayloads(s, d)
      .as[AudioIn]
      .mapPartitions(_.map { a =>
        val (rate, ch, bits, samples) = decodePcm(a.payload, s"doc_id=${a.doc_id}")
        // container from the payload magic — the hash already proves
        // the decode, the label just names which parser earned it
        val container = if (a.payload.length >= 4 && a.payload(0) == 'F') "aiff" else "wav"
        var sumAbs = 0L
        var hash = 0L
        var j = 0
        while (j < samples.length) {
          val v = samples(j).toLong
          sumAbs += math.abs(v)
          hash += v * (j / ch + 1) * (j % ch + 1)
          j += 1
        }
        AudioMixed(a.doc_id, container, bits.toLong, ch.toLong, rate.toLong,
          (samples.length / ch).toLong, sumAbs, hash)
      })
      .toDF()
      .orderBy("doc_id")
  }

  val qAudioMixedSql: String =
    """WITH d AS (
      |  SELECT doc_id, doc_id % 5 AS v, doc_id % 1500 + 400 AS n FROM documents
      |), si AS (
      |  SELECT doc_id, v, unnest(range(n)) AS i FROM d
      |), sc AS (
      |  SELECT doc_id, v, i,
      |    unnest(range(CASE WHEN v = 1 THEN 2 ELSE 1 END)) AS ch
      |  FROM si
      |), sv AS (
      |  SELECT doc_id, i, ch,
      |    CASE
      |      WHEN v = 2 THEN (i*7919 + doc_id*101) % 16777216 - 8388608
      |      WHEN v = 3 THEN (i*13 + doc_id*7) % 256 - 128
      |      ELSE (i*131 + (doc_id + ch)*17) % 65536 - 32768
      |    END AS s
      |  FROM sc
      |)
      |SELECT doc_id,
      |  CASE WHEN doc_id % 5 = 4 THEN 'aiff' ELSE 'wav' END AS container,
      |  CAST(CASE WHEN doc_id % 5 = 2 THEN 24
      |            WHEN doc_id % 5 = 3 THEN 8 ELSE 16 END AS BIGINT) AS bits,
      |  CAST(CASE WHEN doc_id % 5 = 1 THEN 2 ELSE 1 END AS BIGINT) AS channels,
      |  CAST(8000 + (doc_id % 4) * 4000 AS BIGINT) AS sample_rate,
      |  CAST(doc_id % 1500 + 400 AS BIGINT) AS n_frames,
      |  CAST(SUM(ABS(s)) AS BIGINT) AS sum_abs,
      |  CAST(SUM(s * (i + 1) * (ch + 1)) AS BIGINT) AS sample_hash
      |FROM sv GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_audio_meta" -> (qAudioMeta _),
    "q_audio_energy" -> (qAudioEnergy _),
    "q_audio_mixed" -> (qAudioMixed _))

  val oracle: Map[String, String] = Map(
    "q_audio_meta" -> qAudioMetaSql,
    "q_audio_energy" -> qAudioEnergySql,
    "q_audio_mixed" -> qAudioMixedSql)
}
