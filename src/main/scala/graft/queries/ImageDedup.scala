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
    * corpus scale instead of collapsing onto a few dozen sigs.  The
    * multiplier cycles mod 251 (prime, near the 8-bit ceiling — a
    * multiplier only acts through its value mod 256): the r15
    * original cycled mod 13, the exact saturation class the video
    * probe caught at sf10 (VERDICT r15 watch item — the image sig
    * vocabulary was bounded ≈ lcm(13, 64, 48)-scale groups). */
  @inline def basePix(x: Int, y: Int, g: Long): Int =
    (((x.toLong * 31 + y.toLong * 17) * (g % 251 + 3) + g * 7) % 256).toInt

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

  /** (doc_id, sig, area) — the dHash frame plus the DECODED pixel
    * area (not doc_id arithmetic: the keeper criterion must come from
    * the image itself, as it would in a real corpus): decode + pool +
    * sign, one scan-local map.  Shared by the pair, count and
    * cluster-keep forms. */
  private[graft] def dhashFrame(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    imagePayloadsPaired(s, d)
      .as[Multimodal.MediaIn]
      .mapPartitions(_.map { m =>
        val (w, h, pix) = Multimodal.decodeGray(m.payload)
        (m.doc_id, dHash64(w, h, pix), w.toLong * h)
      })
      .toDF("doc_id", "sig", "area")
  }

  def qImageDedup(s: SparkSession, d: String): DataFrame = {
    // the P52 plan, re-keyed on the image signature — 4×16-bit bands
    // over 64-bit sigs (the banding identity at double width, as
    // P52's own Scaladoc prescribes for denser spaces); the banded
    // construction is HammingDedup's one spelling.  The 16-byte/doc
    // sig frame materializes once (five consumers).
    val sigs = dhashFrame(s, d).select("doc_id", "sig").transform(Pipeline.stableCheckpoint)
    graft.operators.HammingDedup.pairs(sigs, "sig", MaxDist, bandBits = 16)
  }

  /** The ACTION step (VERDICT r15 item 4): near-dup image dedup ending
    * in a KEEP-LIST, not a pair list — the corpus-shrink step a real
    * pipeline ships.  The verified banded-hamming pairs feed the P2b
    * label-propagation (shared VERBATIM via
    * [[Pipeline.componentLabels]]); per connected component the
    * largest image (decoded pixel area, doc_id tiebreak) survives —
    * the P36 keeper window re-keyed on image area.  Docs in no pair
    * are their own keepers by definition and never enter the loop, so
    * the output is one row per multi-member cluster: (cluster_id,
    * keeper, area). */
  def qImageClusterKeep(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sigs = dhashFrame(s, d).transform(Pipeline.stableCheckpoint) // pairs + keeper metadata off one decode pass
    // r17: CC over the DISTINCT-SIG graph, not the doc-pair graph —
    // the doc expansion is C(m,2) inside dense clusters and OOM'd the
    // audio analog at sf10 (see Pipeline.componentLabelsBySig)
    val sigPairs = graft.operators.HammingDedup
      .sigPairs(sigs.select(col("sig")).distinct(), "sig", MaxDist, bandBits = 16)
      .select("sig_a", "sig_b")
    val w = Window.partitionBy("cluster_id").orderBy(desc("area"), col("doc_id"))
    // `area` rides through the CC attach (r19) — no doc_id re-join
    Pipeline.componentLabelsBySig(s, sigs.select("doc_id", "sig", "area"), sigPairs)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("cluster_id"), col("doc_id").as("keeper"), col("area"))
      .orderBy("cluster_id")
  }

  /** Count-only form (the P52b discipline): per-distance pair counts
    * from signature GROUP SIZES — Σ C(g,2) at distance 0, Σ g_a·g_b
    * over verified distinct-sig pairs at 1..MaxDist — so the answer
    * stays aggregation-shaped at any corpus scale. */
  def qImageDedupCount(s: SparkSession, d: String): DataFrame = {
    val groups = dhashFrame(s, d)
      .groupBy("sig").agg(count(lit(1)).as("g"))
      .transform(Pipeline.stableCheckpoint) // one decode pass feeds all three consumers
    graft.operators.HammingDedup.counts(groups, "sig", MaxDist, bandBits = 16)
  }

  /** The DuckDB replay of pool → gradient sign → 64-bit packing, as
    * two 32-bit halves (BIGINT shifts stay far from the sign bit):
    * CTE `sig(doc_id, lo, hi)`.  Shared by both oracles. */
  private[graft] val duckSigCte: String =
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
       |    ((x*31 + y*17) * (g % 251 + 3) + g*7) % 256 AS base
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

  /** Keep-list oracle: the same sig replay feeding the recursive
    * reachability closure (the P2b/P36 DuckDB spelling) and the
    * area-keeper window. */
  val qImageClusterKeepSql: String =
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
       |SELECT cluster_id, keeper, area FROM (
       |  SELECT cl.cluster_id, cl.doc_id AS keeper,
       |    CAST(dm.width * dm.height AS BIGINT) AS area,
       |    ROW_NUMBER() OVER (PARTITION BY cl.cluster_id
       |      ORDER BY dm.width * dm.height DESC, cl.doc_id) AS rk
       |  FROM cl JOIN dims dm ON dm.doc_id = cl.doc_id)
       |WHERE rk = 1
       |ORDER BY cluster_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_image_dedup" -> (qImageDedup _),
    "q_image_dedup_count" -> (qImageDedupCount _),
    "q_image_cluster_keep" -> (qImageClusterKeep _))

  val oracle: Map[String, String] = Map(
    "q_image_dedup" -> qImageDedupSql,
    "q_image_dedup_count" -> qImageDedupCountSql,
    "q_image_cluster_keep" -> qImageClusterKeepSql)
}
