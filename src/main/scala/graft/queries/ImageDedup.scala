package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** P71 — perceptual-hash image near-dup (r15): the canonical 100 TB
  * image-dedup operator of a multimodal training pipeline, composed
  * from the two layers that already exist: the REAL pixel layer
  * (encode → foreign ImageIO decode → integer pooling, P11) and the
  * P52 pigeonhole band join + `graft_hamming64` verify over DISTINCT
  * signatures.
  *
  * Signature: 64-bit dHash (difference hash) over the 9×8 integer
  * average pool of the decoded gray pixels — bit (ty·8 + tx) is set
  * iff pooled(ty, tx+1) > pooled(ty, tx).  Every step is integer
  * arithmetic off [[Multimodal.poolGray]], so the DuckDB oracle
  * replays pool → gradient sign → packing → pairing exactly; a hash
  * match certifies the decode, bucket geometry, sign convention and
  * bit order all at once.
  *
  * Fixture: docs pair up as (2g, 2g+1) over image group g — the even
  * doc is our zlib-PNG of the group's base pattern, the odd doc a
  * REAL 24-bpp BMP of the same image brightness-shifted by +4
  * (clamped at 255).  dHash is gradient-based, so the shifted twin
  * lands within a few bits of its base — near-dup pairs that only
  * exist ACROSS a codec boundary, which is exactly what a real image
  * dedup must find (the same photo re-encoded by different tools).
  *
  * Scale shape (the P52 discipline): candidates come from an
  * equi-join on (band, bits) over DISTINCT signatures — 4 disjoint
  * 16-bit bands, so any pair within hamming distance ≤ 3 must agree
  * exactly on at least one band; O(n·4) fixed-width keys through the
  * shuffle, never O(n²) — and each distinct signature pair is
  * hamming-verified once.  Pixels never shuffle: decode + pool +
  * dHash are scan-local, only (doc_id, sig) leaves the stage.
  * [[qImageDedup]] materializes the pair list (output-bound, like
  * P52); [[qImageDedupCount]] is the declared scale shape — per-
  * distance pair COUNTS from signature group sizes alone, so not one
  * pair row is ever built.
  */
object ImageDedup {

  /** Max hamming distance reported as a near-dup.  4 disjoint 16-bit
    * bands pigeonhole-cover any pair at distance ≤ 3: fewer than 4
    * differing bits cannot touch all 4 bands. */
  val MaxDist = 3

  /** dHash pool geometry: 9 columns × 8 rows → 8×8 horizontal
    * gradients = 64 bits. */
  val PoolW = 9
  val PoolH = 8

  /** The deterministic base-pattern formula shared with the oracle:
    * gray(x, y) of image group `g`.  The per-group MULTIPLIER (not
    * just an additive offset) keeps distinct groups' gradient fields
    * genuinely different, so the signature space stays spread at
    * corpus scale instead of collapsing onto a few dozen sigs. */
  @inline def basePix(x: Int, y: Int, g: Long): Int =
    (((x.toLong * 31 + y.toLong * 17) * (g % 13 + 3) + g * 7) % 256).toInt

  /** The near-dup twin: brightness +4, clamped to the 8-bit range —
    * gradient signs survive except where adjacent pooled values sat
    * within the clamp distortion, so the twin lands a few bits away. */
  @inline def twinPix(x: Int, y: Int, g: Long): Int =
    math.min(basePix(x, y, g) + 4, 255)

  /** 64-bit dHash of decoded gray pixels: integer 9×8 average pool,
    * then the horizontal gradient sign field.  Bit (ty·8 + tx) — tx
    * the LEFT column of the compared pair — is set iff the right
    * pooled value is strictly greater. */
  def dHash64(w: Int, h: Int, pix: Array[Int]): Long = {
    val pooled = Multimodal.poolGray(w, h, pix, PoolW, PoolH)
    var sig = 0L
    var ty = 0
    while (ty < PoolH) {
      var tx = 0
      while (tx < PoolW - 1) {
        if (pooled(ty * PoolW + tx + 1) > pooled(ty * PoolW + tx))
          sig |= 1L << (ty * 8 + tx)
        tx += 1
      }
      ty += 1
    }
    sig
  }

  /** The cross-codec near-dup corpus: group g = doc_id / 2; even doc
    * = PNG of the base pattern, odd doc = real BMP of the brightness
    * twin.  Dims (≥ 24×18) derive from g so both members of a pair
    * share geometry. */
  def imagePayloadsPaired(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // full-width pixel stage off a byte-planned narrow scan (see
    // Multimodal.videoPayloads — same 100 TB lesson)
    Tables.documents(s, d).select(col("doc_id"))
      .repartition(s.sparkContext.defaultParallelism * 2)
      .as[Long]
      .mapPartitions(_.map { id =>
        val g = id / 2
        val w = (g % 64 + 24).toInt
        val h = (g % 48 + 18).toInt
        val pix =
          if (id % 2 == 0) Array.tabulate(w * h)(i => basePix(i % w, i / w, g))
          else Array.tabulate(w * h)(i => twinPix(i % w, i / w, g))
        Multimodal.MediaIn(id,
          if (id % 2 == 0) Multimodal.encodePngGray(w, h, pix)
          else Multimodal.encodeBmpGray(w, h, pix))
      })
      .toDF()
  }

  /** (doc_id, sig) — the dHash frame: decode + pool + sign, one
    * scan-local map.  Shared by the pair and count forms. */
  private[graft] def dhashFrame(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    imagePayloadsPaired(s, d)
      .as[Multimodal.MediaIn]
      .mapPartitions(_.map { m =>
        val (w, h, pix) = Multimodal.decodeGray(m.payload)
        (m.doc_id, dHash64(w, h, pix))
      })
      .toDF("doc_id", "sig")
  }

  def qImageDedup(s: SparkSession, d: String): DataFrame = {
    // the P52 plan, re-keyed on the image signature — 4×16-bit bands
    // over 64-bit sigs (the banding identity at double width, as
    // P52's own Scaladoc prescribes for denser spaces); the banded
    // construction is HammingDedup's one spelling.  The 16-byte/doc
    // sig frame materializes once (five consumers).
    val sigs = dhashFrame(s, d).localCheckpoint()
    graft.operators.HammingDedup.pairs(sigs, "sig", MaxDist, bandBits = 16)
  }

  /** Count-only form (the P52b discipline): per-distance pair counts
    * from signature GROUP SIZES — Σ C(g,2) at distance 0, Σ g_a·g_b
    * over verified distinct-sig pairs at 1..MaxDist — so the answer
    * stays aggregation-shaped at any corpus scale. */
  def qImageDedupCount(s: SparkSession, d: String): DataFrame = {
    val groups = dhashFrame(s, d)
      .groupBy("sig").agg(count(lit(1)).as("g"))
      .localCheckpoint() // one decode pass feeds all three consumers
    graft.operators.HammingDedup.counts(groups, "sig", MaxDist, bandBits = 16)
  }

  /** The DuckDB replay of pool → gradient sign → 64-bit packing, as
    * two 32-bit halves (BIGINT shifts stay far from the sign bit):
    * CTE `sig(doc_id, lo, hi)`.  Shared by both oracles. */
  private val duckSigCte: String =
    s"""dims AS (
       |  SELECT doc_id, doc_id // 2 AS g,
       |    CAST((doc_id // 2) % 64 + 24 AS BIGINT) AS width,
       |    CAST((doc_id // 2) % 48 + 18 AS BIGINT) AS height
       |  FROM documents
       |), px1 AS (
       |  SELECT *, unnest(range(width)) AS x FROM dims
       |), px AS (
       |  SELECT *, unnest(range(height)) AS y FROM px1
       |), pv0 AS (
       |  SELECT doc_id, g, width, height, x, y,
       |    ((x*31 + y*17) * (g % 13 + 3) + g*7) % 256 AS base
       |  FROM px
       |), pval AS (
       |  SELECT doc_id, width, height, x, y,
       |    CASE WHEN doc_id % 2 = 1 THEN LEAST(base + 4, 255) ELSE base END AS v
       |  FROM pv0
       |), pooled AS (
       |  SELECT doc_id,
       |    (x * $PoolW) // width AS tx, (y * $PoolH) // height AS ty,
       |    CAST(SUM(v) // COUNT(*) AS BIGINT) AS pv
       |  FROM pval
       |  GROUP BY doc_id, (x * $PoolW) // width, (y * $PoolH) // height
       |), bits AS (
       |  SELECT l.doc_id, l.ty * 8 + l.tx AS b,
       |    CASE WHEN r.pv > l.pv THEN 1 ELSE 0 END AS bit
       |  FROM pooled l JOIN pooled r
       |    ON l.doc_id = r.doc_id AND l.ty = r.ty AND r.tx = l.tx + 1
       |), sig AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN b < 32 THEN bit * (CAST(1 AS BIGINT) << CAST(b AS INT))
       |             ELSE 0 END) AS BIGINT) AS lo,
       |    CAST(SUM(CASE WHEN b >= 32 THEN bit * (CAST(1 AS BIGINT) << CAST(b - 32 AS INT))
       |             ELSE 0 END) AS BIGINT) AS hi
       |  FROM bits GROUP BY doc_id
       |)""".stripMargin

  val qImageDedupSql: String =
    s"""WITH $duckSigCte
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS INT) AS dist
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= $MaxDist
       |ORDER BY doc_a, doc_b""".stripMargin

  val qImageDedupCountSql: String =
    s"""WITH $duckSigCte
       |SELECT CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS INT) AS dist,
       |  CAST(COUNT(*) AS BIGINT) AS n_pairs
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= $MaxDist
       |GROUP BY 1 HAVING COUNT(*) > 0 ORDER BY dist""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_image_dedup" -> (qImageDedup _),
    "q_image_dedup_count" -> (qImageDedupCount _))

  val oracle: Map[String, String] = Map(
    "q_image_dedup" -> qImageDedupSql,
    "q_image_dedup_count" -> qImageDedupCountSql)
}
