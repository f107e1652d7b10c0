package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Ranked

/** Corpus-level statistics and hygiene operators that round out the
  * training-data pipeline surface (SURVEY §2.3): TF-IDF term scoring,
  * eval-set decontamination, exact multi-quantile profiling, event
  * pivoting, and within-document repetition scoring.
  *
  * Oracle-parity rules as everywhere else: integer/BIGINT arithmetic
  * until the last step, identical float expression trees on both
  * sides, total deterministic ORDER BY.
  */
object Corpus {

  /** Whitespace token count, spelled once per engine — P24/P25 (and
    * P9's q_token_count) must never drift apart on tokenization. */
  private[graft] val tokCount =
    "CAST(size(filter(split(text, ' '), t -> t <> '')) AS BIGINT)"
  private[queries] val duckTokCount =
    "CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT)"

  // ------------------------------------------------ shared exact ln tree
  // ADVICE r10: JVM and libm ln() differ in the last ulp, so any gate
  // of the form FLOOR(1e6·ln(x) + 0.5) can flip by one micro-unit
  // nondeterministically across platforms/libm versions.  P61/P62
  // therefore evaluate ln through ONE shared expression tree instead
  // of each engine's libm: e = floor(log2 n) is the EXACT binary
  // digit count (`length(bin(n)) - 1` — no leading zeros in either
  // engine), and the mantissa contribution rides the artanh series
  //   ln(n) = e·ln2 + 2(t + t³/3 + t⁵/5 + t⁷/7 + t⁹/9 + t¹¹/11),
  //   t = (n − 2^e)/(n + 2^e) ∈ [0, 1/3),
  // in which EVERY operation is an exactly-rounded IEEE add/sub/mul/
  // div over identical operands — Spark and DuckDB produce
  // bit-identical doubles by the IEEE-754 correctly-rounded-ops
  // guarantee, with no transcendental anywhere.  ln2 and the series
  // coefficients are ≤17-significant-digit literals, which parse to
  // the same double in both engines (correctly rounded decimal→binary
  // conversion).  Truncation error ≤ 2·(1/3)¹³/13 ≈ 1.2e-7, i.e. the
  // micro-unit results are within ~0.2 of the true rounded ln —
  // deterministically, on both sides.

  /** The shared ln(n) tree over a POSITIVE BIGINT SQL expression.
    * `duck` switches the one spelling difference (DuckDB `<<` vs
    * Spark `shiftleft`) — the VALUE trees are identical. */
  private def lnTree(n: String, duck: Boolean): String = {
    val e = s"(length(bin($n)) - 1)"
    val p = if (duck) s"(CAST(1 AS BIGINT) << $e)"
            else s"shiftleft(CAST(1 AS BIGINT), $e)"
    val a = s"CAST($n AS DOUBLE)"
    val pd = s"CAST($p AS DOUBLE)"
    val t = s"(($a - $pd) / ($a + $pd))"
    val t2 = s"($t * $t)"
    s"(CAST($e AS DOUBLE) * 0.6931471805599453 + $t * (2.0 + $t2 * " +
      s"(0.6666666666666666 + $t2 * (0.4 + $t2 * (0.2857142857142857 + $t2 * " +
      s"(0.2222222222222222 + $t2 * 0.18181818181818182))))))"
  }

  /** round(1e6·ln(num/den)) in integer micro-units (num, den positive
    * BIGINT expressions), deterministic across engines. */
  private[graft] def microLnRatio(num: String, den: String, duck: Boolean): String =
    s"CAST(FLOOR(1000000.0 * (${lnTree(num, duck)} - ${lnTree(den, duck)}) + 0.5) AS BIGINT)"

  /** round(1e6·ln(n)) for a single positive BIGINT expression. */
  private[graft] def microLn(n: String, duck: Boolean): String =
    s"CAST(FLOOR(1000000.0 * ${lnTree(n, duck)} + 0.5) AS BIGINT)"

  // ------------------------------------------------------------ tf-idf
  // Top-3 TF-IDF terms per document — the keyword-extraction /
  // relevance-weighting pass.  Shape at scale: one explode + two hash
  // aggregates (term frequencies, document frequencies), a broadcast
  // of the tiny df/N dims back onto terms, and a rank-pruned window
  // (WindowGroupLimit keeps 3 rows per doc flowing).  All counts stay
  // BIGINT.  The idf is the BM25 rational form (N−df+0.5)/(df+0.5)
  // rather than a logarithm: +,−,/ are exactly-rounded IEEE ops that
  // hash-match across engines, while ln() differs in the last ulp
  // between the JVM and libm (measured).
  def qTfidf(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val terms = docs
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = terms.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = terms
      .join(broadcast(df), "term")
      .crossJoin(broadcast(n))
      .withColumn("score", expr(
        "CAST(tf AS DOUBLE) * ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))"))
    val w = Window.partitionBy("doc_id").orderBy(desc("score"), col("term"))
    scored
      .select(col("doc_id"), col("term"), col("score"),
        row_number().over(w).cast("bigint").as("rk"))
      .filter(col("rk") <= 3)
      .orderBy("doc_id", "rk")
  }

  val qTfidfSql: String =
    """WITH t AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
      |), tf AS (
      |  SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY doc_id, term
      |), df AS (
      |  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
      |), scored AS (
      |  SELECT tf.doc_id, tf.term,
      |    CAST(tf AS DOUBLE) * ((CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)
      |      - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) AS score
      |  FROM tf JOIN df ON tf.term = df.term
      |)
      |SELECT doc_id, term, score, rk FROM (
      |  SELECT doc_id, term, score,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
      |      ORDER BY score DESC, term) AS BIGINT) AS rk
      |  FROM scored)
      |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  // --------------------------------------------------- decontamination
  // Benchmark-contamination check: which training documents share at
  // least one 5-gram with the (hash-designated) eval set?  This is the
  // n-gram overlap decontamination of large-corpus pipelines.  Shape
  // at scale: explode DISTINCT shingles on both sides and equi-join on
  // the shingle — work ∝ Σ_shingle df_train·df_eval, never
  // |train|·|eval| — then one distinct + one aggregate.  The eval-set
  // predicate is a deterministic content-hash row filter (no shuffle).
  def qDecontaminate(s: SparkSession, d: String): DataFrame = {
    // ONE shingle subplan, self-joined: both join inputs are the
    // identical (scan → shingle-explode → shuffle-on-sh) subtree, so
    // Spark's ReusedExchange computes the expensive explode+shuffle
    // once and feeds both sides (measured ~2× over two filtered
    // scans).  The eval/train split happens after the join.
    // 64-bit shingle hashes, not strings: the fused kernel shingles
    // each doc in one pass (the HOF SQL chain re-evaluates the inlined
    // split() per element) and the join shuffles 8-byte keys instead
    // of ~30-byte 5-gram strings (r5: 4.5s → 0.4s at sf0.1; counts
    // identical — 2⁻⁶⁴ collision odds, same argument as P4).
    val sh = Tables.documents(s, d)
      .select(col("doc_id"),
        expr("graft_hash32(text) % 20 = 0").as("is_eval"),
        explode(expr("graft_shingles64(text, 5)")).as("sh"))
    sh.as("t").join(sh.as("e"), "sh")
      .filter(!col("t.is_eval") && col("e.is_eval"))
      .select(col("t.doc_id").as("train_id"), col("e.doc_id").as("eval_id"))
      .distinct()
      .groupBy("train_id")
      .agg(count(lit(1)).as("n_eval_hits"))
      .orderBy("train_id")
  }

  val qDecontaminateSql: String = {
    val sh = Pipeline.duckShingles(5)
    val hash = Pipeline.duckHash32("text")
    s"""WITH e AS (
       |  SELECT doc_id AS eval_id, unnest($sh) AS sh
       |  FROM documents WHERE $hash % 20 = 0
       |), tr AS (
       |  SELECT doc_id AS train_id, unnest($sh) AS sh
       |  FROM documents WHERE NOT ($hash % 20 = 0)
       |), hits AS (
       |  SELECT DISTINCT train_id, eval_id FROM tr JOIN e ON tr.sh = e.sh
       |)
       |SELECT train_id, COUNT(*) AS n_eval_hits
       |FROM hits GROUP BY train_id ORDER BY train_id""".stripMargin
  }

  // --------------------------------------------------------------- P61
  // DSIR-style importance scoring (Xie et al. NeurIPS'23 "Data
  // Selection for Language Models via Importance Resampling"): score
  // every document by how target-like its hashed-unigram profile is —
  // Σ_tokens log(p_target(bucket) / p_raw(bucket)) under Laplace-
  // smoothed bag-of-hashed-ngrams models, the importance weight DSIR
  // resamples by.  The target set reuses the P20/P54 eval convention
  // (graft_hash32(text) % 20 = 0).  Engine exactness: the per-bucket
  // log-ratio is fixed to integer MICRO-UNITS through the shared
  // exact ln tree above (r11 — no libm ln anywhere; the BIGINT
  // products stay exact while per-bucket counts × corpus tokens
  // < 2⁶³, far past gate scale; beyond that split into per-term
  // rounded lns as P62 does), so per-doc scores are order-free BIGINT
  // sums.  Scale shape: one token scan feeds the 4096-row bucket
  // stats AND the per-doc sum (checkpoint barrier); the model is a
  // broadcast — scoring is scan-local + one doc agg.
  private val DsirBuckets = 4096

  def qDsirScore(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"),
        expr("graft_hash32(text) % 20 = 0").as("is_target"),
        explode(expr(Pipeline.tok)).as("t"))
      .filter(col("t") =!= "")
      .select(col("doc_id"), col("is_target"),
        expr(s"graft_hash32(t) % $DsirBuckets").as("b"))
      // one tokenize+hash pass feeds the bucket stats and the per-doc
      // score join; without the barrier both consumers re-scan
      .transform(Pipeline.stableCheckpoint)
    val stats = toks.groupBy("b").agg(
      sum(when(col("is_target"), 1L).otherwise(0L)).as("ct"),
      sum(when(!col("is_target"), 1L).otherwise(0L)).as("cr"))
    val totals = stats.agg(sum("ct").as("nt"), sum("cr").as("nr"))
    val lr = stats.crossJoin(broadcast(totals))
      // the codegen kernel implements the IDENTICAL IEEE tree as the
      // oracle's SQL spelling (bit-equal, MicroLnSpec) without the
      // ~12x-inlined bin() string work
      .withColumn("lr_u", expr(
        s"graft_micro_ln_ratio((ct + 1) * (nr + $DsirBuckets), " +
          s"(cr + 1) * (nt + $DsirBuckets))"))
      .select("b", "lr_u")
    val scored = toks.join(broadcast(lr), "b")
      .groupBy("doc_id", "is_target")
      .agg(count(lit(1)).as("n_tok"), sum("lr_u").as("score_u"))
    // DSIR resamples by RELATIVE weight — the absolute sign carries
    // the smoothing asymmetry (V >> N_target drags every log-ratio
    // down), so the keep gate is rank-based: top 20% of raw docs by
    // score (nearest-rank, deterministic doc_id tie-break).  r11: the
    // ranking runs on the keyless RankedPrefixSum (VERDICT r10 item
    // 1) — a partition-less row_number() window serializes every doc
    // row onto ONE task, while the ranked operator range-partitions
    // the sort across every core and stitches with a one-long-per-
    // task offset table.
    val raws = scored.filter(!col("is_target"))
    val k = raws.agg(expr("count(1) DIV 5").as("k"))
    val kept = Ranked
      .rowNumber(raws, Seq(), Seq(("score_u", true), ("doc_id", false)), "rk")
      .crossJoin(broadcast(k))
      .filter(col("rk") <= col("k"))
      .select(col("doc_id"), lit(true).as("keep"))
    scored.join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("is_target"), col("n_tok"), col("score_u"),
        coalesce(col("keep"), lit(false)).as("keep"))
      .orderBy("doc_id")
  }

  val qDsirScoreSql: String = {
    val hashText = Pipeline.duckHash32("text")
    val hashTok = Pipeline.duckHash32("w")
    s"""WITH base AS (
       |  SELECT doc_id, $hashText % 20 = 0 AS is_target, lower(text) AS lt
       |  FROM documents
       |), tk AS (
       |  SELECT doc_id, is_target, $hashTok % $DsirBuckets AS b
       |  FROM (SELECT doc_id, is_target, unnest(string_split(lt, ' ')) AS w
       |        FROM base)
       |  WHERE w <> ''
       |), st AS (
       |  SELECT b,
       |    CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS ct,
       |    CAST(SUM(CASE WHEN is_target THEN 0 ELSE 1 END) AS BIGINT) AS cr
       |  FROM tk GROUP BY b
       |), tot AS (
       |  SELECT CAST(SUM(ct) AS BIGINT) AS nt, CAST(SUM(cr) AS BIGINT) AS nr
       |  FROM st
       |), lr AS (
       |  SELECT b, ${microLnRatio(s"(ct + 1) * (nr + $DsirBuckets)",
                                   s"(cr + 1) * (nt + $DsirBuckets)", duck = true)}
       |    AS lr_u
       |  FROM st CROSS JOIN tot
       |)
       |, scored AS (
       |  SELECT tk.doc_id, tk.is_target,
       |    CAST(COUNT(*) AS BIGINT) AS n_tok,
       |    CAST(SUM(lr_u) AS BIGINT) AS score_u
       |  FROM tk JOIN lr USING (b)
       |  GROUP BY tk.doc_id, tk.is_target
       |), kept AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score_u DESC, doc_id) AS rk
       |    FROM scored WHERE NOT is_target)
       |  WHERE rk <= (SELECT COUNT(*) // 5 FROM scored WHERE NOT is_target)
       |)
       |SELECT s.doc_id, s.is_target, s.n_tok, s.score_u,
       |  kept.doc_id IS NOT NULL AS keep
       |FROM scored s LEFT JOIN kept ON s.doc_id = kept.doc_id
       |ORDER BY s.doc_id""".stripMargin
  }

  // --------------------------------------------------------------- P62
  // CCNet-style LM perplexity filtering (Wenzek et al. LREC'20): score
  // every document's mean negative log-likelihood under a Laplace-
  // smoothed BIGRAM model trained on the target subset (the P20/P54
  // eval-hash convention), keep the lowest-perplexity 20% of raw docs
  // — the head/middle/tail split CCNet makes with its wiki LM.
  // Exactness (r11): the per-bigram NLL is the difference of two
  // PER-TERM rounded micro-nat lns — round(1e6·ln(ca+v)) −
  // round(1e6·ln(cab+1)), each through the shared exact ln tree (no
  // libm) and each attached to its BROADCAST MODEL row, so the token
  // stream itself does pure integer subtraction; per-doc sums are
  // order-free BIGINT; mean = truncating integer division (both
  // operands non-negative, so Spark DIV ≡ DuckDB //).  Scale shape:
  // the model is trained on the FIXED-SIZE target set (the P54
  // bounded-broadcast argument — a benchmark-suite-sized corpus), so
  // both model tables broadcast regardless of raw-corpus scale and
  // scoring is scan-local + one doc aggregate.  Bigrams ride the
  // fused graft_word_ngrams kernel (shared with P17).
  def qLmPerplexity(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"),
      expr("graft_hash32(text) % 20 = 0").as("is_target"))
    val uni = docs.filter(col("is_target"))
      .select(explode(expr(Pipeline.tok)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("ca"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val big = docs.filter(col("is_target"))
      .select(explode(expr("graft_word_ngrams(text, 2)")).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("cab"))
    // the ln work lives on the model frames (|vocab| + |bigrams|
    // rows, fixed-size), never on the exploded token stream
    val uniLn = uni.crossJoin(broadcast(vocab))
      .select(col("w").as("ctx"),
        expr("graft_micro_ln(ca + v)").as("lnden_u"))
    val lnv = vocab.select(expr("graft_micro_ln(v)").as("lnv_u"))
    val bigLn = big.select(col("bigram"),
      expr("graft_micro_ln(cab + 1)").as("lnnum_u"))
    val scored = docs
      .select(col("doc_id"), col("is_target"),
        explode(expr("graft_word_ngrams(text, 2)")).as("bigram"))
      .withColumn("ctx", expr("substring_index(bigram, ' ', 1)"))
      .join(broadcast(bigLn), Seq("bigram"), "left")
      .join(broadcast(uniLn), Seq("ctx"), "left")
      .crossJoin(broadcast(lnv))
      // unseen ctx → den = v (Laplace base); unseen bigram → num = 1,
      // ln 1 = 0 — pure BIGINT arithmetic on the stream
      .withColumn("b_nll_u", expr(
        "coalesce(lnden_u, lnv_u) - coalesce(lnnum_u, CAST(0 AS BIGINT))"))
      .groupBy("doc_id", "is_target")
      .agg(count(lit(1)).as("n_big"), sum("b_nll_u").as("nll_u"))
      .withColumn("mnll_u", expr("nll_u DIV n_big"))
    // r11: keyless RankedPrefixSum gate (see qDsirScore)
    val raws = scored.filter(!col("is_target"))
    val k = raws.agg(expr("count(1) DIV 5").as("k"))
    val kept = Ranked
      .rowNumber(raws, Seq(), Seq(("mnll_u", false), ("doc_id", false)), "rk")
      .crossJoin(broadcast(k))
      .filter(col("rk") <= col("k"))
      .select(col("doc_id"), lit(true).as("keep"))
    scored.join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("is_target"), col("n_big"), col("nll_u"),
        col("mnll_u"), coalesce(col("keep"), lit(false)).as("keep"))
      .orderBy("doc_id")
  }

  val qLmPerplexitySql: String = {
    val hash = Pipeline.duckHash32("text")
    s"""WITH docs AS (
       |  SELECT doc_id, $hash % 20 = 0 AS is_target,
       |    string_split(lower(text), ' ') AS t
       |  FROM documents
       |), uni AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS ca
       |  FROM (SELECT unnest(t) AS w FROM docs WHERE is_target) GROUP BY w
       |), voc AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS v FROM uni
       |), big AS (
       |  SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cab FROM (
       |    SELECT unnest(list_transform(generate_series(1, len(t) - 1),
       |      i -> t[i] || ' ' || t[i + 1])) AS bigram
       |    FROM docs WHERE is_target AND len(t) >= 2)
       |  GROUP BY bigram
       |), unil AS (
       |  SELECT w, ${microLn("ca + v", duck = true)} AS lnden_u
       |  FROM uni CROSS JOIN voc
       |), bigl AS (
       |  SELECT bigram, ${microLn("cab + 1", duck = true)} AS lnnum_u
       |  FROM big
       |), lnv AS (
       |  SELECT ${microLn("v", duck = true)} AS lnv_u FROM voc
       |), db AS (
       |  SELECT doc_id, is_target,
       |    unnest(list_transform(generate_series(1, len(t) - 1),
       |      i -> t[i] || ' ' || t[i + 1])) AS bigram
       |  FROM docs WHERE len(t) >= 2
       |), sb AS (
       |  SELECT db.doc_id, db.is_target,
       |    COALESCE(unil.lnden_u, (SELECT lnv_u FROM lnv))
       |      - COALESCE(bigl.lnnum_u, CAST(0 AS BIGINT)) AS b_nll_u
       |  FROM db LEFT JOIN bigl USING (bigram)
       |    LEFT JOIN unil ON unil.w = split_part(db.bigram, ' ', 1)
       |), scored AS (
       |  SELECT doc_id, is_target, CAST(COUNT(*) AS BIGINT) AS n_big,
       |    CAST(SUM(b_nll_u) AS BIGINT) AS nll_u
       |  FROM sb GROUP BY doc_id, is_target
       |), sc2 AS (
       |  SELECT doc_id, is_target, n_big, nll_u, nll_u // n_big AS mnll_u
       |  FROM scored
       |), kept AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY mnll_u, doc_id) AS rk
       |    FROM sc2 WHERE NOT is_target)
       |  WHERE rk <= (SELECT COUNT(*) // 5 FROM sc2 WHERE NOT is_target)
       |)
       |SELECT s.doc_id, s.is_target, s.n_big, s.nll_u, s.mnll_u,
       |  kept.doc_id IS NOT NULL AS keep
       |FROM sc2 s LEFT JOIN kept ON s.doc_id = kept.doc_id
       |ORDER BY s.doc_id""".stripMargin
  }

  // ---------------------------------------------- exact multi-quantile
  // Exact p25/p50/p75/p95 of document length per language
  // (nearest-rank definition, pure integer arithmetic — no float
  // quantile interpolation to disagree across engines).
  //
  // Shape at scale (r12): a ROW-level `row_number()/COUNT(*) OVER
  // (PARTITION BY lang)` hash-partitions the whole corpus onto
  // |lang| ≈ 5 tasks.  Exact quantiles never need per-row ranks —
  // only the value-frequency histogram: groupBy (lang, n_chars)
  // collapses the corpus map-side to ≤ |lang|·|distinct lengths|
  // rows, the keyed RankedPrefixSum turns frequencies into cumulative
  // counts (range-partitioned by (lang, n_chars) — parallel in cores,
  // not groups, even if the histogram itself is huge), and the value
  // at rank r is MIN(n_chars | cum ≥ r).  The |lang|-row totals frame
  // broadcasts; nothing corpus-sized crosses a keyed exchange.
  def qQuantiles(s: SparkSession, d: String): DataFrame = {
    val hist = Tables.documents(s, d)
      .select("lang", "n_chars")
      .groupBy("lang", "n_chars")
      .agg(count(lit(1)).as("freq"))
    // cum AND the per-lang total ride ONE ranked pass (RTotal output
    // column — no second aggregate, no broadcast join)
    val ct = Ranked.prefixSumWithTotal(
      hist, Seq("lang"), Seq("n_chars"), "freq", "cum", "cnt")
    def pick(pct: Int) =
      min(when(expr(s"cum >= (cnt * $pct + 99) DIV 100"), col("n_chars")))
    ct.groupBy("lang")
      .agg(pick(25).as("p25"), pick(50).as("p50"),
        pick(75).as("p75"), pick(95).as("p95"),
        max("cnt").as("n_docs"))
      .orderBy("lang")
  }

  val qQuantilesSql: String =
    """WITH r AS (
      |  SELECT lang, n_chars,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS BIGINT) AS rn,
      |    COUNT(*) OVER (PARTITION BY lang) AS cnt
      |  FROM documents)
      |SELECT lang,
      |  MAX(CASE WHEN rn = (cnt * 25 + 99) // 100 THEN n_chars END) AS p25,
      |  MAX(CASE WHEN rn = (cnt * 50 + 99) // 100 THEN n_chars END) AS p50,
      |  MAX(CASE WHEN rn = (cnt * 75 + 99) // 100 THEN n_chars END) AS p75,
      |  MAX(CASE WHEN rn = (cnt * 95 + 99) // 100 THEN n_chars END) AS p95,
      |  MAX(cnt) AS n_docs
      |FROM r GROUP BY lang ORDER BY lang""".stripMargin

  // -------------------------------------------------------- event pivot
  // Per-user behavior profile: event_type pivoted to columns with an
  // explicit value list (no discovery job), counts + exact DECIMAL
  // value sums.  One hash aggregate with map-side partials; at 100 TB
  // this is the flat-profile builder that feeds feature stores.
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  def qPivotEvents(s: SparkSession, d: String): DataFrame = {
    val agg = EventTypes.flatMap { t =>
      Seq(
        sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t"),
        (sum(when(col("event_type") === t,
          expr(Relational.microExpr("value"))))
          .cast("double") / 10000.0).as(s"v_$t"))
    }
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(agg.head, agg.tail: _*)
      .orderBy("user_id")
  }

  val qPivotEventsSql: String = {
    val cols = EventTypes.flatMap { t =>
      Seq(
        s"CAST(SUM(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS n_$t",
        s"CAST(SUM(CASE WHEN event_type = '$t' THEN " +
          s"${Relational.microExpr("value")} END) AS DOUBLE) / 10000.0 AS v_$t")
    }.mkString(",\n  ")
    s"""SELECT user_id,
       |  $cols
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  // --------------------------------------------------- repetition score
  // Within-document repetition: token count, distinct tokens, the
  // most-frequent token's share, and the repetition ratio — the
  // boilerplate/spam signal quality filters cut on.  Two-level
  // aggregate keeps everything distributed (no per-doc collect); all
  // counts BIGINT, ratios computed with identical float trees.
  def qRepetition(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_tok"), count(lit(1)).as("n_uniq"), max("c").as("max_c"))
      .select(col("doc_id"), col("n_tok"), col("n_uniq"),
        expr("1.0 - CAST(n_uniq AS DOUBLE) / CAST(n_tok AS DOUBLE)").as("rep_ratio"),
        expr("CAST(max_c AS DOUBLE) / CAST(n_tok AS DOUBLE)").as("top_share"))
      .orderBy("doc_id")

  val qRepetitionSql: String =
    """WITH t AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents
      |), c AS (
      |  SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY doc_id, tok
      |), a AS (
      |  SELECT doc_id, SUM(c) AS n_tok, COUNT(*) AS n_uniq, MAX(c) AS max_c
      |  FROM c GROUP BY doc_id)
      |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, n_uniq,
      |  1.0 - CAST(n_uniq AS DOUBLE) / CAST(n_tok AS DOUBLE) AS rep_ratio,
      |  CAST(max_c AS DOUBLE) / CAST(n_tok AS DOUBLE) AS top_share
      |FROM a ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------- domain mixing
  // Per-source corpus composition + the resampling weight that would
  // rebalance the mix to uniform across sources — the knob every
  // pretraining pipeline tunes (domain mixing ratios).  One hash
  // aggregate over source; totals ride a broadcast.  All ratios are
  // single divisions of exact BIGINTs — identical float trees.
  def qDomainMix(s: SparkSession, d: String): DataFrame = {
    val per = Tables.documents(s, d)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(expr(tokCount)).as("n_tokens"))
    val tot = per.agg(count(lit(1)).as("n_sources"),
      sum("n_docs").as("total_docs"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("CAST(n_docs AS DOUBLE) / CAST(total_docs AS DOUBLE)").as("share"),
        expr("CAST(total_docs AS DOUBLE) / (CAST(n_sources AS DOUBLE) * CAST(n_docs AS DOUBLE))")
          .as("uniform_weight"))
      .orderBy("source")
  }

  val qDomainMixSql: String =
    s"""WITH per AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM($duckTokCount) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source
      |), tot AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
      |    CAST(SUM(n_docs) AS BIGINT) AS total_docs FROM per
      |)
      |SELECT source, n_docs, n_tokens,
      |  CAST(n_docs AS DOUBLE) / CAST(total_docs AS DOUBLE) AS share,
      |  CAST(total_docs AS DOUBLE) / (CAST(n_sources AS DOUBLE) * CAST(n_docs AS DOUBLE)) AS uniform_weight
      |FROM per CROSS JOIN tot ORDER BY source""".stripMargin

  // --------------------------------------------------- mix resampling
  // P64: APPLY the domain-mixing knob qDomainMix computes — rebalance
  // the corpus to a uniform per-source mix by deterministic
  // downsampling: every source keeps exactly t = min(|source|) docs,
  // chosen in content-hash order (an unbiased, reproducible sample —
  // the same doc set on every run and every cluster size, no RNG
  // state).  Shape at scale: ranking is per-source with a handful of
  // sources — exactly the LOW-CARDINALITY regime the keyed
  // RankedPrefixSum exists for (a keyed window would collapse 100 TB
  // onto |sources| tasks); t rides a broadcast.
  def qMixResample(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        expr("graft_hash32(text)").as("h"))
    val t = docs.groupBy("source").agg(count(lit(1)).as("n"))
      .agg(min("n").as("t"))
    Ranked.rowNumber(docs, Seq("source"), Seq(("h", false), ("doc_id", false)), "rk")
      .crossJoin(broadcast(t))
      .select(col("doc_id"), col("source"), col("rk"),
        (col("rk") <= col("t")).as("keep"), col("t"))
      .orderBy("doc_id")
  }

  val qMixResampleSql: String = {
    val hash = Pipeline.duckHash32("text")
    s"""WITH d AS (
       |  SELECT doc_id, source, $hash AS h FROM documents
       |), t AS (
       |  SELECT CAST(MIN(n) AS BIGINT) AS t FROM (
       |    SELECT COUNT(*) AS n FROM d GROUP BY source)
       |), r AS (
       |  SELECT doc_id, source,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id)
       |      AS BIGINT) AS rk
       |  FROM d
       |)
       |SELECT r.doc_id, r.source, r.rk, r.rk <= t.t AS keep, t.t AS t
       |FROM r CROSS JOIN t ORDER BY r.doc_id""".stripMargin
  }

  // ------------------------------------------ weighted mix resampling
  // P68: the general form of the P64 knob — downsample every source to
  // an ARBITRARY target mix (the "20% code, 40% web" production
  // recipe), not just uniform.  All-integer targets so both engines
  // agree exactly: with per-source weight w_s (derived here from the
  // source name; in production, the P26 frame), the largest feasible
  // scale is T = min_s(n_s DIV w_s) and each source keeps its first
  // t_s = w_s·T docs in content-hash order (deterministic, unbiased,
  // cluster-size-independent).  Shape at scale: the |sources|-row
  // size/target frames broadcast; ranking is the keyed
  // RankedPrefixSum (parallel in cores, not |sources| tasks); the
  // corpus itself never shuffles except the one range exchange.
  def qMixToWeights(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        expr("graft_hash32(text)").as("h"),
        expr("CAST(substring(source, 4) AS INT) % 4 + 1").cast("long").as("w"))
    val sizes = docs.groupBy("source", "w").agg(count(lit(1)).as("n"))
    val tScale = sizes.agg(min(expr("n DIV w")).as("T"))
    val targets = sizes.crossJoin(broadcast(tScale))
      .select(col("source"), col("w"), (col("w") * col("T")).as("t_s"))
    Ranked.rowNumber(docs.drop("w"), Seq("source"),
        Seq(("h", false), ("doc_id", false)), "rk")
      .join(broadcast(targets), Seq("source"))
      .filter(col("rk") <= col("t_s"))
      .select(col("source"), col("doc_id"), col("rk"), col("w"), col("t_s"))
      .orderBy("source", "rk")
  }

  val qMixToWeightsSql: String = {
    val hash = Pipeline.duckHash32("text")
    s"""WITH d AS (
       |  SELECT doc_id, source, $hash AS h,
       |    CAST(CAST(substr(source, 4) AS INT) % 4 + 1 AS BIGINT) AS w
       |  FROM documents
       |), sz AS (
       |  SELECT source, w, COUNT(*) AS n FROM d GROUP BY source, w
       |), t AS (
       |  SELECT MIN(n // w) AS T FROM sz
       |), tg AS (
       |  SELECT source, w, w * (SELECT T FROM t) AS t_s FROM sz
       |), r AS (
       |  SELECT doc_id, source,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id)
       |      AS BIGINT) AS rk
       |  FROM d
       |)
       |SELECT r.source, r.doc_id, r.rk, tg.w, tg.t_s
       |FROM r JOIN tg ON r.source = tg.source
       |WHERE r.rk <= tg.t_s ORDER BY r.source, rk""".stripMargin
  }

  // ----------------------------------------------- token-budget shards
  // Assign documents to fixed-token-budget training shards: within
  // each language, docs are packed in doc_id order and a new shard
  // starts every 20k tokens — the dataset-sharding step before
  // sequence packing.  One window sum per language partition, pure
  // integer arithmetic (exact on both engines); at 100 TB the window
  // is per-lang range-partitioned, never global.
  def qTokenShard(s: SparkSession, d: String): DataFrame = {
    // INCLUSIVE running frame minus the current row (≡ the exclusive
    // `ROWS .. 1 PRECEDING` sum, since every group has ≥ 1 row) —
    // spelled this way because the inclusive ROWS-running shape is
    // the one RankedWindowRule can swap to the distributed
    // RankedPrefixSum under `spark.graft.ranked.autoRewrite`; the
    // exclusive frame has no rewrite path and would pin the per-lang
    // sort onto |lang| tasks at scale.
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), expr(tokCount).as("n_tok"))
      .withColumn("cum_before", sum("n_tok").over(w) - col("n_tok"))
      .withColumn("shard", expr("CAST(cum_before DIV 20000 AS BIGINT)"))
      .select("doc_id", "lang", "n_tok", "shard")
      .orderBy("doc_id")
  }

  val qTokenShardSql: String =
    s"""WITH t AS (
      |  SELECT doc_id, lang, $duckTokCount AS n_tok
      |  FROM documents
      |)
      |SELECT doc_id, lang, n_tok,
      |  CAST(COALESCE(CAST(SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) // 20000 AS BIGINT) AS shard
      |FROM t ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- label centroids
  // Per-label mean embedding (the classifier-support / cluster-center
  // computation), dimension-wise.  Values are fixed to exact integer
  // micro-units BEFORE summing — FLOOR(v·10⁶ + 0.5) is exact IEEE
  // arithmetic on both engines — so the per-(label,dim) BIGINT sums
  // are aggregation-order-independent and the final mean is a single
  // identical division.  Shape at scale: posexplode + one hash
  // aggregate on (label, dim); map-side partials collapse each
  // partition to ≤ labels×64 rows before the shuffle.
  def qLabelCentroid(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(FLOOR(CAST(v AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)"))
          .as("sum_micros"))
      .select(col("label"), col("dim"), col("n"),
        expr("CAST(sum_micros AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)").as("mean_v"))
      .orderBy("label", "dim")

  val qLabelCentroidSql: String =
    """WITH e AS (
      |  SELECT label, CAST(i AS INT) AS dim,
      |    CAST(FLOOR(CAST(embedding[CAST(i + 1 AS INT)] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS micros
      |  FROM embeddings CROSS JOIN range(64) t(i)
      |)
      |SELECT label, dim, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(micros) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 1000000.0) AS mean_v
      |FROM e GROUP BY label, dim ORDER BY label, dim""".stripMargin

  // ------------------------------------------------- token rarity score
  // Inverse-frequency document scoring — the cheap stand-in for the
  // LM-perplexity filter of CCNet-style pipelines: documents made of
  // rare tokens score high, boilerplate of corpus-dominant tokens
  // scores low.  Per-token rarity is quantized to total DIV freq
  // (BIGINT integer division — EXACT on both engines, where a float
  // per-token ratio would hit the double→DECIMAL rounding boundary),
  // summed exactly, divided once at the end.  Shape at scale: one
  // explode, one token-frequency aggregate (Zipf-small → broadcast
  // back), one per-doc aggregate.
  def qRarityScore(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(expr("filter(split(lower(text), ' '), t -> t <> '')")).as("tok"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("freq"))
    val tot = toks.agg(count(lit(1)).as("total"))
    toks.join(freq, "tok")
      .crossJoin(broadcast(tot))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        sum(expr("total DIV freq")).as("rarity_sum"))
      .select(col("doc_id"), col("n_tok"), col("rarity_sum"),
        expr("CAST(rarity_sum AS DOUBLE) / CAST(n_tok AS DOUBLE)").as("rarity_score"))
      .orderBy("doc_id")
  }

  val qRarityScoreSql: String =
    """WITH t AS (
      |  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS tok
      |  FROM documents
      |), f AS (
      |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq FROM t GROUP BY tok
      |), tot AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS total FROM t
      |)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
      |  CAST(SUM(total // freq) AS BIGINT) AS rarity_sum,
      |  CAST(CAST(SUM(total // freq) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS rarity_score
      |FROM t JOIN f USING (tok) CROSS JOIN tot
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tfidf" -> (qTfidf _),
    "q_decontaminate" -> (qDecontaminate _),
    "q_dsir_score" -> (qDsirScore _),
    "q_lm_perplexity" -> (qLmPerplexity _),
    "q_quantiles" -> (qQuantiles _),
    "q_pivot_events" -> (qPivotEvents _),
    "q_repetition" -> (qRepetition _),
    "q_domain_mix" -> (qDomainMix _),
    "q_mix_resample" -> (qMixResample _),
    "q_mix_to_weights" -> (qMixToWeights _),
    "q_token_shard" -> (qTokenShard _),
    "q_label_centroid" -> (qLabelCentroid _),
    "q_rarity_score" -> (qRarityScore _))

  val oracle: Map[String, String] = Map(
    "q_tfidf" -> qTfidfSql,
    "q_decontaminate" -> qDecontaminateSql,
    "q_dsir_score" -> qDsirScoreSql,
    "q_lm_perplexity" -> qLmPerplexitySql,
    "q_quantiles" -> qQuantilesSql,
    "q_pivot_events" -> qPivotEventsSql,
    "q_repetition" -> qRepetitionSql,
    "q_domain_mix" -> qDomainMixSql,
    "q_mix_resample" -> qMixResampleSql,
    "q_mix_to_weights" -> qMixToWeightsSql,
    "q_token_shard" -> qTokenShardSql,
    "q_label_centroid" -> qLabelCentroidSql,
    "q_rarity_score" -> qRarityScoreSql)
}
