package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.HammingDedup

/** P72 — audio fingerprint near-dup (r15): the audio analog of the
  * P71 image dedup, and the operator a 100 TB multimodal pipeline
  * runs to collapse re-encoded copies of the same recording (the
  * acoustic-fingerprint idea behind Chromaprint-style dedup, reduced
  * to integer arithmetic the oracle can replay).
  *
  * Signature: 64-bit envelope dHash — the decoded samples' |s| pooled
  * into 65 equal time zones (zone of sample i = i·65/n, the
  * [[Multimodal.poolGray]] box geometry in one dimension), bit k set
  * iff zone(k+1) > zone(k).  Loudness-envelope GRADIENT signs are
  * what survives re-encoding: a uniform gain/DC offset moves every
  * zone sum together, so the sign field is stable where the envelope
  * is unambiguous — the same robustness argument as image dHash under
  * brightness shift.
  *
  * Fixture: docs pair up as (2g, 2g+1) over recording group g — the
  * even doc is a 16-bit LE mono WAV of the group's base signal, the
  * odd doc a 16-bit BIG-endian mono AIFF of the same signal
  * DC-offset by +512 (clamped at 32767).  Near-dup pairs therefore
  * only exist ACROSS a container/byte-order boundary: both of the
  * JVM's SPI parsers (different plugins) must reproduce the exact
  * samples through opposite endianness for a single pair to land.
  *
  * Scale shape: build + decode + fingerprint are one scan-local map —
  * samples never shuffle, only (doc_id, sig) leaves the stage — and
  * the pair/count forms are [[HammingDedup]]'s banded construction
  * (4×16-bit bands over distinct sigs, never all-pairs).
  */
object AudioDedup {

  /** Max hamming distance reported as a near-dup (4 disjoint 16-bit
    * bands pigeonhole-cover dist ≤ 3). */
  val MaxDist = 3

  /** 65 zone sums → 64 envelope-gradient bits. */
  val Zones = 65

  /** The DC offset of the twin: big enough that the clamp and the
    * |s| fold flip a bit or two per doc (the near-dup spectrum stays
    * non-trivial), small enough that twins stay within [[MaxDist]]. */
  val TwinOffset = 512

  @inline def baseSample(i: Int, g: Long): Int = Audio.sampleFormula(i, g)

  @inline def twinSample(i: Int, g: Long): Int =
    math.min(Audio.sampleFormula(i, g) + TwinOffset, 32767)

  /** 64-bit envelope dHash of decoded samples: 65 integer zone sums of
    * |s|, then the gradient sign field — bit k (k the LEFT zone of the
    * compared pair) set iff zone k+1 is strictly greater. */
  def envHash64(samples: Array[Int]): Long = {
    val n = samples.length
    require(n >= Zones, s"need >= $Zones samples for a $Zones-zone envelope, got $n")
    val zones = new Array[Long](Zones)
    var i = 0
    while (i < n) {
      zones(((i.toLong * Zones) / n).toInt) += math.abs(samples(i)).toLong
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < Zones - 1) {
      if (zones(k + 1) > zones(k)) sig |= 1L << k
      k += 1
    }
    sig
  }

  /** The cross-container near-dup corpus: group g = doc_id / 2; even
    * doc = WAV (16-bit LE) of the base signal, odd doc = AIFF (16-bit
    * BE) of the DC-offset twin.  Length (600–2399 samples) and rate
    * derive from g so both members of a pair share geometry. */
  def audioPayloadsPaired(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // full-width payload stage off a byte-planned narrow scan (the
    // Multimodal.videoPayloads 100 TB lesson)
    Tables.documents(s, d).select(col("doc_id"))
      .repartition(s.sparkContext.defaultParallelism * 2)
      .as[Long]
      .mapPartitions(_.map { id =>
        val g = id / 2
        val rate = (8000 + (g % 4) * 4000).toInt
        val n = (g % 1800 + 600).toInt
        Audio.AudioIn(id,
          if (id % 2 == 0) Audio.buildWav(rate, Array.tabulate(n)(baseSample(_, g)))
          else Audio.buildAiff(rate, Array.tabulate(n)(twinSample(_, g))))
      })
      .toDF()
  }

  /** (doc_id, sig, n_samples) — decode through the foreign SPI parsers
    * + envelope dHash, one scan-local map; n_samples comes from the
    * DECODED stream (not doc_id arithmetic — the keeper criterion must
    * come from the audio itself).  Shared by the pair, count and
    * cluster-keep forms. */
  private[graft] def sigFrame(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    audioPayloadsPaired(s, d)
      .as[Audio.AudioIn]
      .mapPartitions(_.map { a =>
        val (_, _, bits, samples) = Audio.decodePcm(a.payload, s"doc_id=${a.doc_id}")
        require(bits == 16, s"expected 16-bit PCM, got $bits-bit doc_id=${a.doc_id}")
        (a.doc_id, envHash64(samples), samples.length.toLong)
      })
      .toDF("doc_id", "sig", "n_samples")
  }

  def qAudioDedup(s: SparkSession, d: String): DataFrame = {
    // five consumers, one decode pass
    val sigs = sigFrame(s, d).select("doc_id", "sig").transform(Pipeline.stableCheckpoint)
    HammingDedup.pairs(sigs, "sig", MaxDist, bandBits = 16)
  }

  /** The ACTION step (VERDICT r15 item 4): audio dedup ending in a
    * KEEP-LIST — verified banded pairs → P2b label propagation
    * ([[Pipeline.componentLabels]], shared verbatim) → P36 keeper
    * window re-keyed on recording length (longest decoded recording
    * wins, doc_id tiebreak).  One row per multi-member cluster. */
  def qAudioClusterKeep(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sigs = sigFrame(s, d).transform(Pipeline.stableCheckpoint) // pairs + keeper metadata off one decode pass
    // r17: CC over the DISTINCT-SIG graph, not the doc-pair graph —
    // the doc expansion is C(m,2) inside dense clusters and OOM'd at
    // sf10 (see Pipeline.componentLabelsBySig)
    val sigPairs = HammingDedup
      .sigPairs(sigs.select(col("sig")).distinct(), "sig", MaxDist, bandBits = 16)
      .select("sig_a", "sig_b")
    val w = Window.partitionBy("cluster_id").orderBy(desc("n_samples"), col("doc_id"))
    // `n_samples` rides through the CC attach (r19) — no doc_id re-join
    Pipeline.componentLabelsBySig(s, sigs.select("doc_id", "sig", "n_samples"), sigPairs)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("cluster_id"), col("doc_id").as("keeper"), col("n_samples"))
      .orderBy("cluster_id")
  }

  /** Count-only form (the P52b discipline): per-distance pair counts
    * from signature group sizes — aggregation-shaped at any scale. */
  def qAudioDedupCount(s: SparkSession, d: String): DataFrame = {
    val groups = sigFrame(s, d)
      .groupBy("sig").agg(count(lit(1)).as("g"))
      .transform(Pipeline.stableCheckpoint) // one decode pass feeds all three consumers
    HammingDedup.counts(groups, "sig", MaxDist, bandBits = 16)
  }

  /** The DuckDB replay of signal → |s| zone pool → gradient sign →
    * 64-bit packing as two 32-bit halves: CTE `sig(doc_id, lo, hi)`.
    * Shared by both oracles. */
  private[graft] val duckSigCte: String =
    s"""dims AS (
       |  SELECT doc_id, doc_id // 2 AS g,
       |    CAST((doc_id // 2) % 1800 + 600 AS BIGINT) AS n
       |  FROM documents
       |), si AS (
       |  SELECT doc_id, g, n, unnest(range(n)) AS i FROM dims
       |), sv AS (
       |  SELECT doc_id, n, i,
       |    CASE WHEN doc_id % 2 = 1
       |      THEN LEAST((i*131 + g*17) % 65536 - 32768 + $TwinOffset, 32767)
       |      ELSE (i*131 + g*17) % 65536 - 32768 END AS s
       |  FROM si
       |), zones AS (
       |  SELECT doc_id, (i * $Zones) // n AS z, CAST(SUM(ABS(s)) AS BIGINT) AS e
       |  FROM sv GROUP BY doc_id, (i * $Zones) // n
       |), bits AS (
       |  SELECT l.doc_id, l.z AS b,
       |    CASE WHEN r.e > l.e THEN 1 ELSE 0 END AS bit
       |  FROM zones l JOIN zones r ON l.doc_id = r.doc_id AND r.z = l.z + 1
       |), sig AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN b < 32 THEN bit * (CAST(1 AS BIGINT) << CAST(b AS INT))
       |             ELSE 0 END) AS BIGINT) AS lo,
       |    CAST(SUM(CASE WHEN b >= 32 THEN bit * (CAST(1 AS BIGINT) << CAST(b - 32 AS INT))
       |             ELSE 0 END) AS BIGINT) AS hi
       |  FROM bits GROUP BY doc_id
       |)""".stripMargin

  val qAudioDedupSql: String =
    s"""WITH $duckSigCte
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS INT) AS dist
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= $MaxDist
       |ORDER BY doc_a, doc_b""".stripMargin

  val qAudioDedupCountSql: String =
    s"""WITH $duckSigCte
       |SELECT CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS INT) AS dist,
       |  CAST(COUNT(*) AS BIGINT) AS n_pairs
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= $MaxDist
       |GROUP BY 1 HAVING COUNT(*) > 0 ORDER BY dist""".stripMargin

  /** Keep-list oracle: the sig replay feeding the recursive
    * reachability closure and the length-keeper window (n from the
    * dims CTE — the same value the decoder reproduces). */
  val qAudioClusterKeepSql: String =
    s"""WITH RECURSIVE $duckSigCte, p AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= $MaxDist
       |), e AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM p
       |  UNION ALL SELECT doc_b, doc_a FROM p
       |), reach AS (
       |  SELECT DISTINCT src AS doc, src AS r FROM e
       |  UNION
       |  SELECT e.dst AS doc, reach.r FROM reach JOIN e ON e.src = reach.doc
       |), cl AS (
       |  SELECT doc AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc
       |)
       |SELECT cluster_id, keeper, n_samples FROM (
       |  SELECT cl.cluster_id, cl.doc_id AS keeper,
       |    CAST(dm.n AS BIGINT) AS n_samples,
       |    ROW_NUMBER() OVER (PARTITION BY cl.cluster_id
       |      ORDER BY dm.n DESC, cl.doc_id) AS rk
       |  FROM cl JOIN dims dm ON dm.doc_id = cl.doc_id)
       |WHERE rk = 1
       |ORDER BY cluster_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_audio_dedup" -> (qAudioDedup _),
    "q_audio_dedup_count" -> (qAudioDedupCount _),
    "q_audio_cluster_keep" -> (qAudioClusterKeep _))

  val oracle: Map[String, String] = Map(
    "q_audio_dedup" -> qAudioDedupSql,
    "q_audio_dedup_count" -> qAudioDedupCountSql,
    "q_audio_cluster_keep" -> qAudioClusterKeepSql)
}
