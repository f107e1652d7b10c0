package graft

import org.apache.spark.sql.functions._

/** Misra-Gries heavy-hitter summary (functions/Sketches.scala) — the
  * candidate half of q_heavy_hitters' two-pass exact pattern.  The
  * oracle gate proves the sf-data instance; these pins prove the
  * GUARANTEES the 100 TB argument rests on, on data where the sketch
  * actually prunes (vocabulary >> k — the gate corpus has |V| = 31,
  * so there the sketch trivially retains everything):
  *   - superset: every token with count > N/(k+1) survives, across
  *     many partitions (exercises update, partial-buffer serialize /
  *     deserialize, AND the mergeable-summaries combine);
  *   - size: at most k entries come back;
  *   - lower bounds: reported counters never exceed true counts and
  *     sit within N/(k+1) of them;
  *   - determinism: output is token-sorted and partition-layout
  *     independent.
  */
class SketchSpec extends SparkSpec {

  import spark.implicits._

  // zipf-ish stream: token t_i appears ~ n/i times, vocab 3000 >> k
  private lazy val stream: Seq[String] = {
    val rnd = new scala.util.Random(42)
    val raw = (1 to 3000).flatMap { i =>
      Seq.fill(math.max(1, 6000 / i))(s"t$i")
    }
    rnd.shuffle(raw)
  }

  private def exact: Map[String, Long] =
    stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }

  test("superset + size + lower-bound guarantees on a zipf stream, k=50") {
    val k = 50
    val n = stream.size.toLong
    val out = stream.toDF("tok").repartition(13)
      .agg(expr(s"graft_misra_gries(tok, $k)").as("s"))
      .select(explode($"s").as("c"))
      .select($"c.tok", $"c.lb").as[(String, Long)].collect().toMap
    assert(out.size <= k, s"summary exceeded capacity: ${out.size} > $k")
    val thresh = n.toDouble / (k + 1)
    val must = exact.filter(_._2 > thresh).keySet
    assert(must.nonEmpty && must.size < k, "test data must actually prune")
    must.foreach { t =>
      assert(out.contains(t), s"token $t with count ${exact(t)} > N/(k+1)=$thresh dropped")
    }
    out.foreach { case (t, lb) =>
      val truth = exact.getOrElse(t, 0L)
      assert(lb <= truth, s"$t: counter $lb exceeds true count $truth")
      assert(truth - lb <= thresh + 1, s"$t: counter $lb more than N/(k+1) below $truth")
    }
  }

  test("output is token-sorted and identical across partition layouts") {
    def run(parts: Int): Seq[String] =
      stream.toDF("tok").repartition(parts)
        .agg(expr("graft_misra_gries(tok, 40)").as("s"))
        .select(explode($"s").as("c")).select($"c.tok")
        .as[String].collect().toSeq
    val a = run(1)
    assert(a == a.sorted, "summary not token-sorted")
    // survivors CAN differ across layouts (the guarantee is a
    // superset, not a unique set) — but the guaranteed survivors and
    // sortedness must hold in every layout
    val n = stream.size.toLong
    val must = exact.filter(_._2 > n.toDouble / 41).keySet
    Seq(1, 7, 32).foreach { p =>
      val got = run(p)
      assert(got == got.sorted)
      must.foreach(t => assert(got.contains(t), s"layout $p dropped $t"))
    }
  }

  test("nulls are skipped; k=1 degenerates to majority candidate") {
    val out = Seq(Some("a"), None, Some("a"), Some("b"), Some("a"), None)
      .toDF("tok")
      .agg(expr("graft_misra_gries(tok, 1)").as("s"))
      .select(explode($"s").as("c")).select($"c.tok", $"c.lb")
      .as[(String, Long)].collect()
    // a has strict majority of the 4 non-null rows → must survive
    assert(out.map(_._1).toSeq == Seq("a"))
  }

  test("non-foldable or out-of-range k fails loudly") {
    val df = Seq("a").toDF("tok")
    intercept[Exception] {
      df.agg(expr("graft_misra_gries(tok, 0)")).collect()
    }
    intercept[Exception] {
      df.agg(expr("graft_misra_gries(tok, tok)")).collect()
    }
  }

  test("null-literal k is a clean analysis failure, not a thrown extractor (r12 ADVICE)") {
    // CAST(NULL AS INT) is foldable but evaluates to null — must come
    // back as AnalysisException from checkInputDataTypes, not an
    // IllegalArgumentException leaking out of the lazy k extractor
    val df = Seq("a").toDF("tok")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(expr("graft_misra_gries(tok, CAST(NULL AS INT))")).collect()
    }
    assert(e1.getMessage.contains("graft_misra_gries"), e1.getMessage)
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1.0, 1L)).toDF("key", "p")
        .agg(expr("graft_topk_by(key, p, CAST(NULL AS INT))")).collect()
    }
    assert(e2.getMessage.contains("graft_topk_by"), e2.getMessage)
  }

  test("graft_topk_by equals the window top-k on random data across layouts") {
    val rnd = new scala.util.Random(9)
    val rows = (1 to 5000).map { i =>
      (s"g${i % 7}", rnd.nextDouble() * 100 - 50, i.toLong)
    }
    def viaAgg(parts: Int): Seq[(String, Long)] =
      rows.toDF("g", "key", "p").repartition(parts)
        .groupBy("g").agg(expr("graft_topk_by(key, p, 9)").as("t"))
        .select($"g", explode($"t.payload").as("p"))
        .as[(String, Long)].collect().sortBy(identity).toSeq
    val viaWindow = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("g").orderBy(desc("key"), $"p")
      rows.toDF("g", "key", "p")
        .select($"g", $"p", row_number().over(w).as("rk"))
        .filter($"rk" <= 9).select($"g", $"p")
        .as[(String, Long)].collect().sortBy(identity).toSeq
    }
    Seq(1, 8, 32).foreach { parts =>
      assert(viaAgg(parts) == viaWindow, s"layout $parts diverged")
    }
  }

  test("graft_topk_by long keys are lossless beyond 2^53 and order correctly") {
    // doubles lose integer fidelity above 2^53 — the aggregate must
    // carry BIGINT keys by their own bits, not a double cast
    val big = Seq(
      (9007199254740993L, 1L), (9007199254740992L, 2L), // distinct, d-equal
      (Long.MaxValue, 3L), (Long.MinValue, 4L), (-1L, 5L), (0L, 6L))
    val out = big.toDF("key", "p")
      .agg(expr("graft_topk_by(key, p, 3)").as("t"))
      .select(explode($"t").as("e")).select($"e.key", $"e.payload")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((Long.MaxValue, 3L), (9007199254740993L, 1L),
      (9007199254740992L, 2L)), out.toString)
  }

  test("graft_topk_by skips nulls, ties break by smaller payload, k bounds enforced") {
    val out = Seq((Some(5.0), Some(10L)), (Some(5.0), Some(3L)), (None, Some(1L)),
      (Some(4.0), None), (Some(1.0), Some(7L)))
      .toDF("key", "p")
      .agg(expr("graft_topk_by(key, p, 2)").as("t"))
      .select(explode($"t").as("e")).select($"e.payload")
      .as[Long].collect().toSeq
    assert(out == Seq(3L, 10L), out.toString) // 5.0-tie: payload 3 first
    intercept[Exception] {
      Seq((1.0, 1L)).toDF("key", "p")
        .agg(expr("graft_topk_by(key, p, 0)")).collect()
    }
  }

  test("q_heavy_hitters two-pass result equals the naive exact form at sf0.001") {
    val d = "/root/testdata/sf0.001"
    val got = graft.queries.Analytics.qHeavyHitters(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val toks = Tables.documents(spark, d)
      .select(explode(expr("filter(split(lower(text), ' '), t -> t <> '')")).as("tok"))
    val n = toks.count()
    val naive = toks.groupBy("tok").agg(count(lit(1)).as("n_tok"))
      .filter($"n_tok" * 100 >= n)
      .orderBy(desc("n_tok"), $"tok")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == naive)
    assert(got.nonEmpty)
  }
}
