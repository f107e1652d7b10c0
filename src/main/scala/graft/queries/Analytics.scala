package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AsOf, Skew}

/** Point-in-time / statistics operators a training-data pipeline
  * leans on beyond SURVEY §2.2-2.3: as-of join (feature lookup at
  * event time), top-k per group (best-of-stratum selection), exact
  * per-group median, z-score standardization, deterministic hash
  * sampling, corpus n-gram statistics, and text normalization.
  *
  * All follow the oracle-parity rules of [[Relational]] (DECIMAL
  * sums, BIGINT casts, identical float expression trees, total
  * deterministic ORDER BY).
  */
object Analytics {

  // ------------------------------------------------------- as-of join
  // For each purchase event, the most recent click by the same user
  // at-or-before the purchase (the point-in-time state lookup of
  // feature-store pipelines).  Spark side runs the union+window
  // [[AsOf]] operator — one shuffle, O(|L|+|R|); the DuckDB oracle is
  // its native ASOF JOIN.  Clicks are pre-deduped to one row per
  // (user, ts) (max event_id) so the at-tie match is well-defined.
  def qAsofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).withColumn("ts_us", expr("ts DIV 1000"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event"), col("user_id"), col("ts_us").as("p_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts_us").as("c_us"))
      .agg(max("event_id").cast("bigint").as("c_event"))
    AsOf.joinAsOf(purchases, clicks, on = Seq("user_id"),
        leftTs = "p_us", rightTs = "c_us")
      .filter(col("c_event").isNotNull) // inner semantics, like ASOF JOIN
      .select("p_event", "user_id", "p_us", "c_event", "c_us")
      .orderBy("p_event")
  }

  val qAsofJoinSql: String =
    """WITH p AS (
      |  SELECT event_id AS p_event, user_id, epoch_us(ts) AS p_us
      |  FROM events WHERE event_type = 'purchase'
      |), c AS (
      |  SELECT user_id, epoch_us(ts) AS c_us, CAST(MAX(event_id) AS BIGINT) AS c_event
      |  FROM events WHERE event_type = 'click' GROUP BY user_id, epoch_us(ts)
      |)
      |SELECT p.p_event, p.user_id, p.p_us, c.c_event, c.c_us
      |FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.p_us >= c.c_us
      |ORDER BY p_event""".stripMargin

  // -------------------------------------------------- top-k per group
  // Highest-quality k documents per (lang, source) stratum — the
  // selection step of curated-subset building.  One shuffle on the
  // group key; rank prunes before anything downstream materializes.
  def qTopkPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("lang", "source")
      .orderBy(desc("n_chars"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("lang"), col("source"), col("doc_id"), col("n_chars"),
        row_number().over(w).cast("bigint").as("rk"))
      .filter(col("rk") <= 3)
      .orderBy("lang", "source", "rk")
  }

  val qTopkPerGroupSql: String =
    """SELECT lang, source, doc_id, n_chars, rk FROM (
      |  SELECT lang, source, doc_id, n_chars,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY lang, source
      |         ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rk
      |  FROM documents)
      |WHERE rk <= 3 ORDER BY lang, source, rk""".stripMargin

  // ------------------------------------------------ exact group median
  // Exact (not approximate) per-group median via rank selection: the
  // middle one-or-two rows per group, averaged.  Both window passes
  // share one partitioning (one shuffle); the count() pass reuses the
  // already-sorted run, which measures FASTER than a second scan +
  // broadcast-join of pre-aggregated counts (tried: 2.2s vs 1.5s at
  // sf0.1) — the join variant pays a full extra scan of the table.
  def qMedianGroup(s: SparkSession, d: String): DataFrame = {
    // EXACT median without a per-group window: `row_number() OVER
    // (PARTITION BY l_returnflag ...)` hash-partitions 6M rows into
    // THREE tasks (one per flag) and single-threads a 2M-row sort in
    // each — the classic low-cardinality window scale-killer; at
    // 100 TB those three tasks are the job.  The distributed-ranking
    // construction is the first-class operator now
    // (plans.RankedPrefixSumExec, all-InternalRow): rn = prefix sum
    // of 1 over the range-partitioned total ordering key, sort
    // parallel in cores, offsets input-size-independent, one exchange.
    val base = Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_orderkey"),
        col("l_linenumber"), lit(1L).as("one"))
    val ranked = graft.operators.Ranked.prefixSum(base, Seq("l_returnflag"),
      Seq("l_extendedprice", "l_orderkey", "l_linenumber"), "one", "rn")
    // per-flag totals: a 3-row aggregate (driver state is |flags|,
    // input-size-independent) → the two mid ranks each flag wants
    val wanted = Tables.lineitem(s, d).groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cond = wanted.map { case (f, cnt) =>
      col("l_returnflag") === f &&
        (col("rn") === (cnt + 1) / 2 || col("rn") === (cnt + 2) / 2)
    }.reduce(_ || _)
    ranked.filter(cond)
      .groupBy("l_returnflag")
      .agg(
        (Relational.dsum("l_extendedprice") /
          count(lit(1)).cast("double")).as("median_price"),
        count(lit(1)).as("n_mid"))
      .orderBy("l_returnflag")
  }

  val qMedianGroupSql: String =
    s"""WITH r AS (
      |  SELECT l_returnflag, l_extendedprice,
      |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
      |      ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
      |    COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
      |  FROM lineitem)
      |SELECT l_returnflag,
      |  ${Relational.dsumSql("l_extendedprice")}
      |    / CAST(COUNT(*) AS DOUBLE) AS median_price,
      |  COUNT(*) AS n_mid
      |FROM r WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // --------------------------------------------- z-score per stratum
  // Per-language standardization of document length.  Sums stay in
  // exact BIGINT (integer column), so the mean/variance inputs are
  // identical regardless of aggregation order; the float expression
  // tree is written identically on both sides.
  private val zExpr =
    "(CAST(n_chars AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) / " +
      "sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))"

  def qZscore(s: SparkSession, d: String): DataFrame = {
    // The per-language moments are a GROUP BY, not a window: `SUM(x)
    // OVER (PARTITION BY lang)` hash-partitions the whole corpus onto
    // |lang| ≈ 5 tasks (the low-cardinality keyed-window scale
    // killer — at 100 TB those five tasks ARE the job).  groupBy
    // keeps map-side partial aggregation (every core combines), the
    // |lang|-row moment frame broadcasts back, and the z expression
    // stays a pure per-row map — no corpus shuffle at all.
    val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
    val stats = docs.groupBy("lang").agg(
      sum("n_chars").as("s1"),
      // widen BEFORE multiplying: an INT-width product wraps silently
      // in Spark for n_chars >= 46341 (DuckDB would error instead)
      sum(expr("CAST(n_chars AS BIGINT) * n_chars")).as("s2"),
      count(lit(1)).as("n"))
    docs.join(broadcast(stats), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("n_chars"), expr(zExpr).as("z"))
      .orderBy("doc_id")
  }

  val qZscoreSql: String =
    s"""SELECT doc_id, lang, n_chars, $zExpr AS z FROM (
      |  SELECT doc_id, lang, n_chars,
      |    CAST(SUM(n_chars) OVER (PARTITION BY lang) AS BIGINT) AS s1,
      |    CAST(SUM(CAST(n_chars AS BIGINT) * n_chars) OVER (PARTITION BY lang) AS BIGINT) AS s2,
      |    COUNT(*) OVER (PARTITION BY lang) AS n
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  // --------------------------------------- deterministic hash sample
  // Content-hash stratified sampling (~10%): reproducible across
  // engines, runs, and cluster sizes — unlike rand()-based sampling —
  // and embarrassingly parallel (pure per-row predicate, no shuffle).
  def qSampleHash(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(expr("graft_hash32(text) % 10 = 0"))
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")

  val qSampleHashSql: String =
    s"""SELECT doc_id, lang, n_chars FROM documents
      |WHERE ${Pipeline.duckHash32("text")} % 10 = 0
      |ORDER BY doc_id""".stripMargin

  // ----------------------------------- fixed-size stratified sample
  // Exactly k documents per language, chosen by content-hash rank —
  // the deterministic analog of per-stratum reservoir sampling
  // (identical across runs, engines, and cluster sizes; rand() is
  // none of those).  One window shuffle; rank pushdown prunes to k
  // rows per stratum before anything else runs.
  def qSampleStratified(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("lang")
      .orderBy(expr("graft_hash32(text)").asc, col("doc_id").asc)
    Tables.documents(s, d)
      .select(col("lang"), col("doc_id"), col("n_chars"),
        row_number().over(w).cast("bigint").as("rk"))
      .filter(col("rk") <= 20)
      .orderBy("lang", "rk")
  }

  val qSampleStratifiedSql: String =
    s"""SELECT lang, doc_id, n_chars, rk FROM (
      |  SELECT lang, doc_id, n_chars,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY ${Pipeline.duckHash32("text")} ASC, doc_id ASC) AS BIGINT) AS rk
      |  FROM documents)
      |WHERE rk <= 20 ORDER BY lang, rk""".stripMargin

  // -------------------------------------------- corpus n-gram counts
  // Global bigram frequency table (top 100) — the corpus-statistics
  // pass of tokenizer/quality work.  Explode + count is one shuffle
  // on the bigram; map-side partial agg collapses the long tail
  // before it moves.
  def qNgramCounts(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      // fused kernel: one tokenize+join pass per doc; docs with < 2
      // tokens yield an empty array (≡ the old size(t) >= 2 filter)
      .select(explode(expr("graft_word_ngrams(text, 2)")).as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("bigram"))
      .limit(100)

  val qNgramCountsSql: String =
    """WITH toks AS (
      |  SELECT string_split(lower(text), ' ') AS t FROM documents
      |  WHERE len(string_split(lower(text), ' ')) >= 2
      |), b AS (
      |  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
      |    i -> t[i] || ' ' || t[i + 1])) AS bigram
      |  FROM toks)
      |SELECT bigram, COUNT(*) AS n FROM b GROUP BY bigram
      |ORDER BY n DESC, bigram LIMIT 100""".stripMargin

  // -------------------------------------------- text normalization
  // Canonicalize (lowercase, strip punctuation, collapse whitespace)
  // and group — the normalization front of near-dup pipelines.  Pure
  // per-row codegen'd expressions + one hash aggregate.
  def qNormalizeText(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(expr(
        "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' '), ' +', ' '))")
        .as("norm_text"), col("doc_id"))
      .groupBy("norm_text")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keep_id"))
      .orderBy("keep_id")

  val qNormalizeTextSql: String =
    """SELECT trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
      |            ' +', ' ', 'g')) AS norm_text,
      |  COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
      |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin

  // ------------------------------------------------- salted skew join
  // The explicit hot-key mitigation gated against the PLAIN join
  // oracle: spreading each supplier key over 8 deterministic salts
  // (and replicating the small side per salt) must change nothing but
  // the shuffle layout.  This is the tool for the pathological key
  // AQE's skew split can't rebalance.  r12: the PACKED single-key
  // form — SkewProbe measured the (key, salt) pair join paying a
  // record-comparator fallback on the 100%-tied key radix prefix
  // (slowest task 2.19s vs 0.99s packed at identical balance);
  // suppkey is integral so the packing contract holds trivially.
  def qSkewJoin(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_suppkey").as("suppkey"), col("l_quantity"), col("l_orderkey"))
    val sup = Tables.supplier(s, d)
      .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
    Skew.saltedJoinPacked(li, sup, "suppkey", col("l_orderkey"), nSalts = 8)
      .groupBy("s_nationkey")
      .agg(
        Relational.dsum("l_quantity").as("sum_qty"),
        count(lit(1)).as("n_items"))
      .orderBy("s_nationkey")
  }

  // ------------------------------------------- tie-aware leaderboard
  // Top quality BANDS per (lang, source) with competition semantics:
  // documents scoring in a top-3 band all surface, `rank()` leaves
  // gaps after ties, `dense_rank()` numbers the bands — the tie-aware
  // variant of q_topk_per_group (row_number would pick arbitrary
  // winners inside a band).  Both rankings run on the KEYED
  // RankedPrefixSum typed APIs (Ranked.rank / Ranked.denseRank):
  // chained over the same (part, order) spec they share ONE range
  // exchange (parallel in cores, not |lang×source| groups), and the
  // cross-partition peer-run chaining — a tie run straddling a range
  // boundary — is exactly what the oracle gate pins here.
  def qLeaderboard(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("lang"), col("source"), col("doc_id"), col("n_chars"),
        expr("CAST(n_chars DIV 100 AS BIGINT)").as("band"))
    val r1 = graft.operators.Ranked.rank(
      docs, Seq("lang", "source"), Seq(("band", true)), "rk")
    val r2 = graft.operators.Ranked.denseRank(
      r1, Seq("lang", "source"), Seq(("band", true)), "band_rk")
    r2.filter(col("rk") <= 3)
      .select("lang", "source", "doc_id", "n_chars", "band", "rk", "band_rk")
      .orderBy("lang", "source", "rk", "doc_id")
  }

  val qLeaderboardSql: String =
    """SELECT lang, source, doc_id, n_chars, band, rk, band_rk FROM (
      |  SELECT lang, source, doc_id, n_chars,
      |    CAST(n_chars // 100 AS BIGINT) AS band,
      |    CAST(RANK() OVER (PARTITION BY lang, source
      |         ORDER BY n_chars // 100 DESC) AS BIGINT) AS rk,
      |    CAST(DENSE_RANK() OVER (PARTITION BY lang, source
      |         ORDER BY n_chars // 100 DESC) AS BIGINT) AS band_rk
      |  FROM documents)
      |WHERE rk <= 3 ORDER BY lang, source, rk, doc_id""".stripMargin

  // ----------------------------------------------- top quality bands
  // All documents in the k best quality bands per (lang, source) — the
  // "take the best few quality tiers per domain" selection a curation
  // pipeline runs.  dense_rank (band_rk) numbers the bands, and the
  // band_rk <= 4 bound is the KeepDistinctTies pushdown's gated
  // consumer: the pruner keeps every local row whose band is among
  // the 4 best DISTINCT local bands, below the range exchange — band
  // POPULATION never counts, only band identity, so a million-row
  // band costs the shuffle no more than a singleton (contrast
  // q_leaderboard's rank() bound, where tied ROWS set the threshold).
  def qTopBands(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("lang"), col("source"), col("doc_id"), col("n_chars"),
        expr("CAST(n_chars DIV 100 AS BIGINT)").as("band"))
    graft.operators.Ranked.denseRank(
        docs, Seq("lang", "source"), Seq(("band", true)), "band_rk")
      .filter(col("band_rk") <= 4)
      .select("lang", "source", "doc_id", "band", "band_rk")
      .orderBy("lang", "source", "band_rk", "doc_id")
  }

  val qTopBandsSql: String =
    """SELECT lang, source, doc_id, band, band_rk FROM (
      |  SELECT lang, source, doc_id,
      |    CAST(n_chars // 100 AS BIGINT) AS band,
      |    CAST(DENSE_RANK() OVER (PARTITION BY lang, source
      |         ORDER BY n_chars // 100 DESC) AS BIGINT) AS band_rk
      |  FROM documents)
      |WHERE band_rk <= 4 ORDER BY lang, source, band_rk, doc_id""".stripMargin

  // ------------------------------------- sketch-exact heavy hitters
  // Tokens covering ≥ 1% of the corpus token stream, EXACTLY — via the
  // two-pass sketch pattern that scales where `GROUP BY token` does
  // not: pass 1 aggregates a capacity-127 Misra-Gries summary
  // (mergeable, ≤ 127 entries of state per task — map-side combine
  // does all the work, NO vocabulary-wide shuffle; every token with
  // frequency > N/128 provably survives, and 1/100 > 1/128, so the
  // survivors are a guaranteed superset of the answer), pass 2
  // recounts ONLY the ≤ 127 candidates exactly behind a broadcast
  // semi-join and applies the 1% threshold to true counts.  The
  // oracle is the plain exact GROUP BY — the gate proves the sketch
  // path loses nothing.  At 100 TB pass 1's shuffle is ≤ 127 rows per
  // map task and pass 2's is |candidates| keys, vs |V| for the naive
  // form.
  /** The heavy-hitter token stream, spelled once — the streaming face
    * (streaming/StreamHeavyHitters) uses it VERBATIM so the two
    * cannot drift on tokenization. */
  private[graft] val hhTokens = "filter(split(lower(text), ' '), t -> t <> '')"

  def qHeavyHitters(s: SparkSession, d: String): DataFrame = {
    val k = 127 // superset guarantee needs pct > 1/(k+1): 1/100 > 1/128
    val toks = Tables.documents(s, d)
      .select(explode(expr(hhTokens)).as("tok"))
    val sketch = toks.agg(
      expr(s"graft_misra_gries(tok, $k)").as("cand"),
      count(lit(1)).as("n_total"))
    val cand = sketch
      .select(explode(col("cand")).as("c"), col("n_total"))
      .select(col("c.tok").as("tok"), col("n_total"))
    toks.join(broadcast(cand), Seq("tok"))
      .groupBy("tok", "n_total")
      .agg(count(lit(1)).as("n_tok"))
      .filter(col("n_tok") * 100 >= col("n_total"))
      .select("tok", "n_tok", "n_total")
      .orderBy(desc("n_tok"), col("tok"))
  }

  val qHeavyHittersSql: String =
    """WITH t AS (
      |  SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS tok
      |  FROM documents
      |), tot AS (SELECT COUNT(*) AS n_total FROM t)
      |SELECT tok, COUNT(*) AS n_tok, (SELECT n_total FROM tot) AS n_total
      |FROM t GROUP BY tok
      |HAVING COUNT(*) * 100 >= (SELECT n_total FROM tot)
      |ORDER BY n_tok DESC, tok""".stripMargin

  // --------------------------------- deterministic weighted sampling
  // 100 documents sampled WITHOUT replacement with probability
  // proportional to length — the Efraimidis-Spirakis scheme (each row
  // draws key = ln(u)/w for uniform u, the k largest keys are the
  // sample), made deterministic and cross-engine exact: u comes from
  // the content hash (reproducible across runs/engines/cluster
  // sizes), ln goes through the shared exact IEEE micro-ln tree, and
  // the remaining ops (integer subtract, one double divide) are
  // exactly-rounded IEEE on identical operands, so both engines
  // compute bit-identical keys.  (micro-ln discretizes ln u to 1e-6 —
  // a deterministic, engine-identical perturbation of the E-S key.)
  // Scale shape: a pure per-row map + distributed top-k
  // (TakeOrdered — per-partition heaps, no global sort, no shuffle of
  // non-winners).
  /** The E-S key, spelled once per engine (q_weighted_sample and the
    * per-group q_sample_weighted_group share it verbatim).
    * h ∈ [1, 2^31]; 21487563 = ⌈1e6·31·ln2⌉ ⇒ es_key = 1e6·ln(u)/w ≤ 0. */
  private[graft] val esKey =
    "CAST(graft_micro_ln((CAST(graft_hash32(text) AS BIGINT) & 2147483647) + 1) " +
      "- 21487563 AS DOUBLE) / CAST(n_chars AS DOUBLE)"
  private[queries] def esKeyDuck: String = {
    val h = s"((CAST(${Pipeline.duckHash32("text")} AS BIGINT) & 2147483647) + 1)"
    s"CAST(${Corpus.microLn(h, duck = true)} - 21487563 AS DOUBLE) / CAST(n_chars AS DOUBLE)"
  }

  def qWeightedSample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        expr(esKey).as("es_key"))
      .orderBy(desc("es_key"), col("doc_id"))
      .limit(100)

  val qWeightedSampleSql: String =
    s"""SELECT doc_id, lang, n_chars, $esKeyDuck AS es_key
      |FROM documents WHERE n_chars > 0
      |ORDER BY es_key DESC, doc_id LIMIT 100""".stripMargin

  // -------------------------------- per-stratum weighted sampling
  // 20 docs per language, weighted by length — the per-group form of
  // q_weighted_sample, run as the AGGREGATE-shaped top-k
  // (`graft_topk_by`): a bounded heap per (task, lang) combines
  // MAP-SIDE, so the one exchange carries ≤ 20 rows per task per lang
  // and nothing is sorted beyond the 20-element state.  Compare the
  // window form (full corpus shuffle + per-lang sort + rank filter)
  // and the ranked form (range exchange + two passes): for small-k
  // per-group selection this is the cheapest distributed shape — and
  // the same aggregate is streaming-legal with k-entry per-window
  // state.  The E-S key is shared VERBATIM with q_weighted_sample;
  // ties (impossible here — doc_id breaks them) are pinned by the
  // aggregate's (key DESC, payload ASC) total order.
  def qSampleWeightedGroup(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("n_chars") > 0)
      .select(col("lang"), col("doc_id"), expr(esKey).as("es_key"))
      .groupBy("lang")
      .agg(expr("graft_topk_by(es_key, doc_id, 20)").as("top"))
      .select(col("lang"), posexplode(col("top")))
      .select(col("lang"), col("col.payload").as("doc_id"),
        col("col.key").as("es_key"), (col("pos") + 1).cast("bigint").as("rk"))
      .orderBy("lang", "rk")

  val qSampleWeightedGroupSql: String =
    s"""SELECT lang, doc_id, es_key, rk FROM (
      |  SELECT lang, doc_id, es_key,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY es_key DESC, doc_id ASC) AS BIGINT) AS rk
      |  FROM (SELECT lang, doc_id, $esKeyDuck AS es_key
      |        FROM documents WHERE n_chars > 0))
      |WHERE rk <= 20 ORDER BY lang, rk""".stripMargin

  val qSkewJoinSql: String =
    s"""SELECT s_nationkey,
      |  ${Relational.dsumSql("l_quantity")} AS sum_qty,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> (qAsofJoin _),
    "q_topk_per_group" -> (qTopkPerGroup _),
    "q_leaderboard" -> (qLeaderboard _),
    "q_top_bands" -> (qTopBands _),
    "q_median_group" -> (qMedianGroup _),
    "q_zscore" -> (qZscore _),
    "q_sample_hash" -> (qSampleHash _),
    "q_sample_stratified" -> (qSampleStratified _),
    "q_ngram_counts" -> (qNgramCounts _),
    "q_normalize_text" -> (qNormalizeText _),
    "q_heavy_hitters" -> (qHeavyHitters _),
    "q_weighted_sample" -> (qWeightedSample _),
    "q_sample_weighted_group" -> (qSampleWeightedGroup _),
    "q_skew_join" -> (qSkewJoin _))

  val oracle: Map[String, String] = Map(
    "q_asof_join" -> qAsofJoinSql,
    "q_topk_per_group" -> qTopkPerGroupSql,
    "q_leaderboard" -> qLeaderboardSql,
    "q_top_bands" -> qTopBandsSql,
    "q_median_group" -> qMedianGroupSql,
    "q_zscore" -> qZscoreSql,
    "q_sample_hash" -> qSampleHashSql,
    "q_sample_stratified" -> qSampleStratifiedSql,
    "q_ngram_counts" -> qNgramCountsSql,
    "q_normalize_text" -> qNormalizeTextSql,
    "q_heavy_hitters" -> qHeavyHittersSql,
    "q_weighted_sample" -> qWeightedSampleSql,
    "q_sample_weighted_group" -> qSampleWeightedGroupSql,
    "q_skew_join" -> qSkewJoinSql)
}
