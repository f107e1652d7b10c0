package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity self-joins via document-frequency-ordered
  * prefix filtering with a multi-prefix COUNT filter — the
  * AllPairs/PPJoin family (Bayardo et al., WWW'07; Xiao et al.,
  * WWW'08) plus the extended-prefix pigeonhole refinement (surveyed in
  * Mann et al., "An Empirical Evaluation of Set Similarity Join
  * Techniques", VLDB'16).
  *
  * Same answers as the naive all-pairs join, WITHOUT enumerating all
  * pairs. Two lossless filters stack:
  *
  *  1. PREFIX: a pair at similarity τ must overlap in ≥ t tokens, and
  *     t-overlap forces a collision inside each record's
  *     (len − t + 1)-prefix under any shared total token order; rarity
  *     order (block-local document frequency, ties by token value)
  *     makes those collisions rare.
  *  2. COUNT (the one that bites on low-diversity corpora): extending
  *     the prefix by e extra tokens forces not one collision but
  *     ≥ t − (la − pA) − (lb − pB) of them — every shared token missed
  *     by a prefix must occupy one of the few suffix slots. A corpus
  *     whose typical pair shares a handful of common tokens sails
  *     through filter 1 (any one collision admits the pair) but dies
  *     on filter 2 (it demands as many collisions as the suffixes
  *     cannot hide). Measured on the sf0.1 documents table at τ=0.5:
  *     single-collision prefixes admit 41% of all-pairs; the count
  *     filter admits 0.6%.
  *
  * The exact merge kernel (graft_intersect_size) then verifies each
  * surviving candidate, and the caller applies its original measure
  * expression unchanged — the result is bit-identical to the
  * quadratic form (SimJoinSpec pins parity on the real corpus and the
  * FP boundary cases).
  *
  * Scale shape: linear scans, hash shuffles, a per-record window
  * (partitioned by record id — high cardinality, parallel in cores),
  * and an inverted-index equi-join whose output is
  * Σ_token df_prefix(token)² — bounded above by block-local all-pairs,
  * in practice far below it. On corpora whose vocabulary grows with
  * the data (Heaps' law — real text) prefix document frequencies stay
  * bounded and the join is near-linear; on vocabulary-saturated
  * corpora it degrades toward the answer's own growth rate, which is
  * the regime where minhash-LSH (P2) is the sanctioned approximate
  * path. No stage holds a block in memory.
  *
  * Reference scope note: Hadoop-BAM has no similarity operators; this
  * family extends the engine for training-data pipelines (SURVEY §2.3
  * P4/P4b).
  */
object SimJoin {

  /** Slack subtracted before every ⌈τ·len⌉-style ceiling: an FP
    * product landing an ulp ABOVE the true rational value would
    * shorten a prefix / raise a required-overlap bound and drop a
    * qualifying pair (e.g. 0.3·10 = 3.0000000000000004 in doubles).
    * Erring low only lengthens prefixes and lowers thresholds — more
    * candidates, never fewer answers. */
  private val Eps = 1e-9

  /** Extra prefix tokens per record (fraction of len): each extra
    * token raises the required collision count by one per side.
    * 0.25·len makes the demanded collision count scale with document
    * size while indexing ≤ ~3/4 of each record. Any value is exact;
    * this is purely a pruning/index-size trade. */
  private val ExtraFrac = 0.25

  private def base(recs: DataFrame, id: String, blk: String, set: String) =
    recs.select(col(id).as("id"), col(blk).as("blk"), col(set).as("sh"))
      .withColumn("len", size(col("sh")))

  /** One row per (blk, tok, id, len) — the full inverted index. */
  private def tokens(b: DataFrame) =
    b.select(col("id"), col("blk"), col("len"), explode(col("sh")).as("tok"))

  /** Prefix length for a record of length `len` at threshold τ:
    * minimum lossless length (len − ⌈τ·len⌉ + 1) plus the extra
    * tokens that power the count filter, capped at len. */
  private def prefLenExpr(len: org.apache.spark.sql.Column, tau: Double) =
    least(len,
      (len - ceil(len * tau - Eps) + 1 + ceil(len * ExtraFrac)).cast("int"))

  /** The plen rarest tokens of each record, rarity = block-local
    * document frequency (ties broken by token value, so the order is
    * total and identical for every record in a block — required for
    * the prefix lemma). Carries plen for the count filter. */
  private def prefixes(toks: DataFrame, tau: Double) = {
    val dfreq = toks.groupBy("blk", "tok").agg(count(lit(1L)).as("df"))
    toks.join(dfreq, Seq("blk", "tok"))
      .withColumn("plen", prefLenExpr(col("len"), tau))
      .withColumn("rn", row_number().over(
        Window.partitionBy("id").orderBy(col("df"), col("tok"))))
      .filter(col("rn") <= col("plen"))
      .select("blk", "tok", "id", "len", "plen")
  }

  /** Attach the original sorted-hash arrays and run the linear merge
    * kernel once per candidate; callers finish with their measure. */
  private def verified(cand: DataFrame, b: DataFrame) =
    cand
      .join(b.select(col("id").as("ida"), col("sh").as("sha")), "ida")
      .join(b.select(col("id").as("idb"), col("sh").as("shb")), "idb")
      .select(col("ida"), col("idb"),
        expr("graft_intersect_size(sha, shb)").as("inter"),
        size(col("sha")).as("la"), size(col("shb")).as("lb"))

  /** Identical-set collapse: one representative record per distinct
    * (blk, sh) class. Exact-duplicate documents are the dominant
    * redundancy of production corpora (and of the replica-built sf1
    * gate corpus); running the candidate join on class representatives
    * and expanding class pairs back to id pairs afterwards makes the
    * quadratic-prone stage cost what the DISTINCT content costs.
    * Identical sets have identical measures, so expansion is exact. */
  private def classes(b: DataFrame): (DataFrame, DataFrame) = {
    val reps = b.groupBy("blk", "sh").agg(min(col("id")).as("id"))
      .withColumn("len", size(col("sh")))
    val members = b.join(
        reps.select(col("blk"), col("sh"), col("id").as("rid")),
        Seq("blk", "sh"))
      .select(col("id"), col("rid"))
    (reps, members)
  }

  /** Rep-level jaccard candidate pairs (see jaccardCandidates). */
  private def repJaccard(b: DataFrame, tau: Double): DataFrame = {
    val pref = prefixes(tokens(b), tau)
    val cand = pref.as("a").join(pref.as("b"),
        col("a.blk") === col("b.blk") && col("a.tok") === col("b.tok") &&
          col("a.id") < col("b.id") &&
          col("b.len") >= col("a.len") * tau - Eps &&
          col("a.len") >= col("b.len") * tau - Eps)
      .groupBy(
        col("a.id").as("ida"), col("b.id").as("idb"),
        col("a.len").as("lla"), col("b.len").as("llb"),
        col("a.plen").as("pa"), col("b.plen").as("pb"))
      .agg(count(lit(1L)).as("hits"))
      .filter(col("hits") >= greatest(lit(1L),
        ceil((col("lla") + col("llb")) * (tau / (1 + tau)) - Eps)
          - (col("lla") - col("pa")) - (col("llb") - col("pb"))))
      .select("ida", "idb")
    verified(cand, b)
  }

  /** Unordered candidate pairs (ida < idb) that can reach
    * J = |A∩B|/|A∪B| ≥ τ, with the exact intersection size attached.
    *
    * Losslessness: J ≥ τ ⟹ i := |A∩B| ≥ τ/(1+τ)·(la+lb) =: t (and
    * i ≤ min ⟹ min ≥ τ·max — the length filter). Every shared token
    * outside the A-prefix∩B-prefix collision set occupies an A-suffix
    * or B-suffix slot, so observed collisions ≥ i − (la−pA) − (lb−pB)
    * ≥ ⌈t⌉ − (la−pA) − (lb−pB) — the count filter. The join runs on
    * identical-set class representatives; class pairs expand to member
    * pairs and within-class pairs carry inter = la = lb (J = 1, or
    * NULL-measure for empty sets — exactly what the naive form
    * computes on identical arrays). Output is a candidate SUPERSET;
    * the caller's τ filter on the exact measure restores equality
    * with the all-pairs result. */
  def jaccardCandidates(recs: DataFrame, idCol: String, blockCol: String,
      setCol: String, tau: Double): DataFrame = {
    val b0 = base(recs, idCol, blockCol, setCol)
    val (reps, members) = classes(b0)
    val cross = repJaccard(reps, tau)
      .join(members.select(col("rid").as("ida"), col("id").as("xa")), "ida")
      .join(members.select(col("rid").as("idb"), col("id").as("xb")), "idb")
      .select(
        least(col("xa"), col("xb")).as("ida"),
        greatest(col("xa"), col("xb")).as("idb"),
        col("inter"),
        // keep la with the smaller id, as the quadratic form does
        when(col("xa") <= col("xb"), col("la")).otherwise(col("lb")).as("la"),
        when(col("xa") <= col("xb"), col("lb")).otherwise(col("la")).as("lb"))
    val within = members.as("x").join(members.as("y"),
        col("x.rid") === col("y.rid") && col("x.id") < col("y.id"))
      .join(reps.select(col("id").as("wrid"), col("len")),
        col("x.rid") === col("wrid"))
      .select(col("x.id").as("ida"), col("y.id").as("idb"),
        col("len").as("inter"), col("len").as("la"), col("len").as("lb"))
    cross.unionByName(within)
  }

  /** Ordered candidate pairs (ida ≠ idb, ida the direction owner)
    * that can reach C = |A∩B|/|A| ≥ τ, exact intersection attached.
    *
    * Losslessness: C ≥ τ ⟹ i ≥ ⌈τ·la⌉, so |B| ≥ i ≥ τ·la (length
    * filter), and every shared token outside A's prefix occupies one
    * of A's (la − pA) suffix slots ⟹ collisions against B's FULL
    * index ≥ ⌈τ·la⌉ − (la − pA) — the single-sided count filter (B
    * carries no prefix: the overlap bound depends on |A| only). The
    * join runs on identical-set class representatives (both ordered
    * directions are separate rep pairs); within-class ordered pairs
    * carry inter = la. */
  def containmentCandidates(recs: DataFrame, idCol: String, blockCol: String,
      setCol: String, tau: Double): DataFrame = {
    val b0 = base(recs, idCol, blockCol, setCol)
    val (reps, members) = classes(b0)
    val toks = tokens(reps)
    val cand = prefixes(toks, tau).as("a").join(toks.as("b"),
        col("a.blk") === col("b.blk") && col("a.tok") === col("b.tok") &&
          col("a.id") =!= col("b.id") &&
          col("b.len") >= col("a.len") * tau - Eps)
      .groupBy(col("a.id").as("ida"), col("b.id").as("idb"),
        col("a.len").as("lla"), col("a.plen").as("pa"))
      .agg(count(lit(1L)).as("hits"))
      .filter(col("hits") >= greatest(lit(1L),
        ceil(col("lla") * tau - Eps) - (col("lla") - col("pa"))))
      .select("ida", "idb")
    val cross = verified(cand, reps)
      .join(members.select(col("rid").as("ida"), col("id").as("xa")), "ida")
      .join(members.select(col("rid").as("idb"), col("id").as("xb")), "idb")
      .select(col("xa").as("ida"), col("xb").as("idb"),
        col("inter"), col("la"), col("lb"))
    val within = members.as("x").join(members.as("y"),
        col("x.rid") === col("y.rid") && col("x.id") =!= col("y.id"))
      .join(reps.select(col("id").as("wrid"), col("len")),
        col("x.rid") === col("wrid"))
      .select(col("x.id").as("ida"), col("y.id").as("idb"),
        col("len").as("inter"), col("len").as("la"), col("len").as("lb"))
    cross.unionByName(within)
  }
}
