package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Ranked

/** Ranked.prefixSum must equal the window form bit-for-bit — it is a
  * drop-in for `sum(x) OVER (PARTITION BY k ORDER BY o)` when |k| is
  * far below the core count. */
class RankedSpec extends SparkSpec {

  test("prefixSum equals the window running sum on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = (0 until 20000).map { i =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(1000).toLong, rnd.nextInt(4),
        rnd.nextInt(5).toLong, i.toLong)
    }
    val df = rows.toDF("k", "pos", "flag", "delta", "row_id")
    val viaOp = Ranked.prefixSum(df, Seq("k"), Seq("pos", "flag", "row_id"),
      "delta", "cum")
      .select("row_id", "cum").as[(Long, Long)].collect().sortBy(_._1)
    val w = Window.partitionBy("k").orderBy("pos", "flag", "row_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val viaWin = df.withColumn("cum", sum("delta").over(w))
      .select("row_id", "cum").as[(Long, Long)].collect().sortBy(_._1)
    assert(viaOp.toSeq === viaWin.toSeq)
  }

  test("keyless prefixSum equals the GLOBAL running sum (empty partitionBy)") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (0 until 30000).map(i => (i.toLong, rnd.nextInt(7).toLong))
    val df = rows.toDF("row_id", "delta").repartition(16)
    val got = Ranked.prefixSum(df, Seq(), Seq("row_id"), "delta", "cum")
      .select("row_id", "cum").as[(Long, Long)].collect().sortBy(_._1)
    // the oracle is a driver-side scan — the keyless window form would
    // serialize onto one task, which is the case this exists to avoid
    var acc = 0L
    val want = rows.sortBy(_._1).map { case (id, d) => acc += d; (id, acc) }
    assert(got.toSeq === want)
    // and the range exchange is genuinely parallel (AQE coalesces this
    // tiny frame to 1 partition — disable that to see the real fan-out)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val parts = Ranked.prefixSum(df, Seq(), Seq("row_id"), "delta", "cum")
        .rdd.getNumPartitions
      assert(parts > 1, s"keyless prefixSum collapsed to $parts partition(s)")
    } finally spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
  }

  test("prefixSumWithTotal equals the running-sum AND unordered-total window pair") {
    import spark.implicits._
    val rnd = new scala.util.Random(12)
    val rows = (0 until 20000).map { i =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(1000).toLong, rnd.nextInt(5).toLong, i.toLong)
    }
    val df = rows.toDF("k", "pos", "delta", "row_id")
    val got = Ranked.prefixSumWithTotal(df, Seq("k"), Seq("pos", "row_id"),
        "delta", "cum", "tot")
      .select("row_id", "cum", "tot").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    val wo = Window.partitionBy("k").orderBy("pos", "row_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wg = Window.partitionBy("k")
    val want = df.withColumn("cum", sum("delta").over(wo))
      .withColumn("tot", sum("delta").over(wg))
      .select("row_id", "cum", "tot").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(got.toSeq === want.toSeq)
    // one group spanning every partition boundary: the total must be
    // the FULL group sum on every row, not the before-only offset
    val one = (0 until 5000).map(i => ("only", i.toLong, 1L, i.toLong))
      .toDF("k", "pos", "delta", "row_id")
    val g2 = Ranked.prefixSumWithTotal(one, Seq("k"), Seq("pos"),
        "delta", "cum", "tot")
      .select("row_id", "cum", "tot").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    g2.foreach { case (rid, cum, tot) =>
      assert(cum === rid + 1); assert(tot === 5000L)
    }
    // and the plan is ONE ranked node, no window, no join
    val plan = Ranked.prefixSumWithTotal(df, Seq("k"), Seq("pos", "row_id"),
      "delta", "cum", "tot").queryExecution.executedPlan.toString
    assert(plan.contains("RankedPrefixSum"), plan)
    assert(!plan.contains("Window "), plan)
    assert(!plan.contains("Join"), plan)
    // bare totals without an order are refused — that shape belongs to
    // groupBy + broadcast join, not this operator
    intercept[IllegalArgumentException](
      Ranked.prefixSumWithTotal(df, Seq("k"), Seq(), "delta", "cum", "tot"))
  }

  test("rn<=k filter pushes a map-side top-k below the exchange and stays exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = (0 until 30000).map { i =>
      (s"g${rnd.nextInt(4)}", rnd.nextInt(100000).toLong, i.toLong)
    }
    val df = rows.toDF("k", "score", "row_id").repartition(16)
    def ranked = Ranked.rowNumber(df, Seq("k"), Seq(("score", true), ("row_id", false)), "rk")
      .filter(col("rk") <= 5)
      .select("k", "row_id", "rk")
    // the limit lands in the physical plan below the exec
    val plan = ranked.queryExecution.executedPlan.toString
    assert(plan.contains("RankedLocalTopK"), plan)
    // and the answer matches the un-pruned window form exactly
    val w = Window.partitionBy("k").orderBy(desc("score"), col("row_id"))
    val want = df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5).select("k", "row_id", "rk")
      .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._3))
    val got = ranked.as[(String, Long, Long)].collect().sortBy(r => (r._1, r._3))
    assert(got.toSeq === want.toSeq)
    // running-sum outputs must NOT be pruned (partial sums would
    // corrupt) — the rule leaves them alone
    val splan = Ranked.prefixSum(df.withColumn("d", lit(1L)), Seq("k"),
        Seq("score", "row_id"), "d", "cum")
      .filter(col("cum") <= 5).queryExecution.executedPlan.toString
    assert(!splan.contains("RankedLocalTopK"), splan)
    // rk = 1 (the per-group argmax shape) also prunes
    val eq = Ranked.rowNumber(df, Seq("k"), Seq(("score", true), ("row_id", false)), "rk")
      .filter(col("rk") === 1)
    assert(eq.queryExecution.executedPlan.toString.contains("RankedLocalTopK"))
    assert(eq.count() === 4L)
  }

  test("top-k pruning under TIED order keys keeps valid row_number semantics") {
    // with duplicate order keys, row_number is arbitrary among ties —
    // the pruned plan may attribute boundary ranks to different tied
    // rows than the window form (exactly Spark's own WindowGroupLimit
    // contract), but the MULTISET of (group, key) surviving rk<=k and
    // the rank sequence per group must be identical, and every
    // emitted row must genuinely belong to the group's k smallest
    // keys (counting multiplicity)
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    val rows = (0 until 20000).map { i =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(5).toLong, i.toLong) // heavy ties
    }
    val df = rows.toDF("k", "score", "row_id").repartition(16)
    val pruned = Ranked.rowNumber(df, Seq("k"), Seq(("score", false)), "rk")
      .filter(col("rk") <= 7)
      .select("k", "score", "rk")
      .as[(String, Long, Long)].collect()
    // rank sequence per group is 1..7
    pruned.groupBy(_._1).foreach { case (g, rs) =>
      assert(rs.map(_._3).sorted.toSeq === (1L to 7L), s"group $g: ${rs.toSeq}")
    }
    // surviving (group, score) multiset equals the window form's
    val w = Window.partitionBy("k").orderBy(col("score"))
    val want = df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 7).select("k", "score")
      .as[(String, Long)].collect().sorted.toSeq
    assert(pruned.map(r => (r._1, r._2)).sorted.toSeq === want)
  }

  test("rank<=k bound pushes a TIE-AWARE pruner; boundary ties across partitions stay exact") {
    // competition ranking keeps whole tie bands: with heavy ties the
    // pruner must keep EVERY row tied with the k-th local row, across
    // every partition layout — the r12 watch item (RankedLimitRule was
    // row_number-only, so q_leaderboard shipped the full corpus)
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val rows = (0 until 30000).map { i =>
      (s"g${rnd.nextInt(4)}", rnd.nextInt(7).toLong, i.toLong) // huge bands
    }
    val w = Window.partitionBy("k").orderBy(desc("score"), col("row_id"))
    for (parts <- Seq(1, 3, 16)) {
      val df = rows.toDF("k", "score", "row_id").repartition(parts)
      val pruned = Ranked.rank(df, Seq("k"), Seq(("score", true), ("row_id", false)), "rk")
        .filter(col("rk") <= 5).select("k", "score", "row_id", "rk")
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("RankedLocalTopK"), plan)
      assert(plan.contains("KeepTies"), plan)
      val want = df.withColumn("rk", rank().over(w).cast("long"))
        .filter(col("rk") <= 5).select("k", "score", "row_id", "rk")
        .as[(String, Long, Long, Long)].collect().sorted.toSeq
      val got = pruned.as[(String, Long, Long, Long)].collect().sorted.toSeq
      assert(got === want, s"parts=$parts")
    }
  }

  test("rank<=1 with ALL keys tied keeps every row — the whole group is one band") {
    // worst-case pruner memory is the semantically-required answer:
    // every row ties with the local minimum, so nothing may be pruned
    // and the survivor buffer grows to the full partition (exercises
    // the compaction path with a threshold that never tightens)
    import spark.implicits._
    val df = (0 until 8000).map(i => ("g" + i % 2, 7L, i.toLong))
      .toDF("k", "score", "row_id").repartition(8)
    val pruned = Ranked.rank(df, Seq("k"), Seq(("score", true)), "rk")
      .filter(col("rk") <= 1)
    assert(pruned.queryExecution.executedPlan.toString.contains("KeepTies"))
    assert(pruned.count() === 8000L)
    assert(pruned.select("rk").distinct().as[Long].collect().toSeq === Seq(1L))
  }

  test("dense_rank bound equal to the distinct-key count keeps everything") {
    import spark.implicits._
    val df = (0 until 6000).map(i => ("g", (i % 4).toLong, i.toLong))
      .toDF("k", "score", "row_id").repartition(8)
    val pruned = Ranked.denseRank(df, Seq("k"), Seq(("score", false)), "dr")
      .filter(col("dr") <= 4)
    assert(pruned.queryExecution.executedPlan.toString.contains("KeepDistinctTies"))
    assert(pruned.count() === 6000L)
    val drs = pruned.select("dr").distinct().as[Long].collect().sorted.toSeq
    assert(drs === Seq(1L, 2L, 3L, 4L))
  }

  test("dense_rank<=k bound prunes by the k-th DISTINCT key and stays exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    // many rows per band, many bands: the distinct threshold must keep
    // every row of the k best bands and nothing else
    val rows = (0 until 30000).map { i =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(40).toLong, i.toLong)
    }
    val df = rows.toDF("k", "score", "row_id").repartition(16)
    val pruned = Ranked.denseRank(df, Seq("k"), Seq(("score", true), ("row_id", false)), "dr")
      .filter(col("dr") <= 4).select("k", "score", "row_id", "dr")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("RankedLocalTopK"), plan)
    assert(plan.contains("KeepDistinctTies"), plan)
    val w = Window.partitionBy("k").orderBy(desc("score"), col("row_id"))
    val want = df.withColumn("dr", dense_rank().over(w).cast("long"))
      .filter(col("dr") <= 4).select("k", "score", "row_id", "dr")
      .as[(String, Long, Long, Long)].collect().sorted.toSeq
    assert(pruned.as[(String, Long, Long, Long)].collect().sorted.toSeq === want)
  }

  test("a chained rank + dense_rank (leaderboard shape) pushes the limit to the BOTTOM node") {
    // two same-spec RankedPrefixSum nodes ride one range exchange; the
    // rk<=k filter above the outer node must prune below the exchange
    // (i.e. below the INNER node), and the outer dense_rank stays
    // exact because tie-aware pruning keeps all bands it can see
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val rows = (0 until 30000).map { i =>
      (s"g${rnd.nextInt(4)}", rnd.nextInt(9).toLong, i.toLong)
    }
    val df = rows.toDF("k", "score", "row_id").repartition(16)
    val r1 = Ranked.rank(df, Seq("k"), Seq(("score", true)), "rk")
    val r2 = Ranked.denseRank(r1, Seq("k"), Seq(("score", true)), "dr")
    val pruned = r2.filter(col("rk") <= 3).select("k", "score", "rk", "dr")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("RankedLocalTopK"), plan)
    assert(plan.contains("KeepTies"), plan)
    // the pruner sits BELOW both ranked nodes (bottom of the chain)
    val topkIdx = plan.indexOf("RankedLocalTopK")
    assert(plan.lastIndexOf("RankedPrefixSum", topkIdx) >= 0 &&
      "RankedPrefixSum".r.findAllIn(plan.take(topkIdx)).length == 2, plan)
    val w = Window.partitionBy("k").orderBy(desc("score"))
    val want = df
      .withColumn("rk", rank().over(w).cast("long"))
      .withColumn("dr", dense_rank().over(w).cast("long"))
      .filter(col("rk") <= 3).select("k", "score", "rk", "dr")
      .as[(String, Long, Long, Long)].collect().sorted.toSeq
    assert(pruned.as[(String, Long, Long, Long)].collect().sorted.toSeq === want)
  }

  test("re-fire guard: a filter bounding BOTH chained outputs lands exactly one pruner") {
    // ADVICE r13: once a pass lands the limit on the bottom node, a
    // later fixed-point pass sees the TOP node limit-free, chainOf
    // stops above the limited node, and (without the guard) a second
    // redundant local top-k appears above the range exchange whenever
    // the filter also bounds the upper node's output — exactly this
    // rk<=3 AND dr<=4 shape
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    val rows = (0 until 20000).map { i =>
      (s"g${rnd.nextInt(4)}", rnd.nextInt(9).toLong, i.toLong)
    }
    val df = rows.toDF("k", "score", "row_id").repartition(16)
    val r1 = Ranked.rank(df, Seq("k"), Seq(("score", true)), "rk")
    val r2 = Ranked.denseRank(r1, Seq("k"), Seq(("score", true)), "dr")
    val pruned = r2.filter(col("rk") <= 3 && col("dr") <= 4)
      .select("k", "score", "rk", "dr")
    val plan = pruned.queryExecution.executedPlan.toString
    assert("RankedLocalTopK".r.findAllIn(plan).length === 1, plan)
    // and a second manual application of the rule is a no-op
    val opt = pruned.queryExecution.optimizedPlan
    val again = graft.plans.RankedLimitRule(opt)
    def limited(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int =
      p.collect { case r: graft.plans.RankedPrefixSum if r.limit.nonEmpty => r }.size
    assert(limited(again) === limited(opt) && limited(opt) === 1)
    val w = Window.partitionBy("k").orderBy(desc("score"))
    val want = df
      .withColumn("rk", rank().over(w).cast("long"))
      .withColumn("dr", dense_rank().over(w).cast("long"))
      .filter(col("rk") <= 3 && col("dr") <= 4).select("k", "score", "rk", "dr")
      .as[(String, Long, Long, Long)].collect().sorted.toSeq
    assert(pruned.as[(String, Long, Long, Long)].collect().sorted.toSeq === want)
  }

  test("prefixSum is exact when one group dominates a partition boundary") {
    import spark.implicits._
    // all rows in ONE group: every partition boundary splits the group
    val df = (0 until 5000).map(i => ("only", i.toLong, 1L, i.toLong))
      .toDF("k", "pos", "delta", "row_id")
    val got = Ranked.prefixSum(df, Seq("k"), Seq("pos"), "delta", "cum")
      .select("row_id", "cum").as[(Long, Long)].collect().sortBy(_._1)
    got.foreach { case (rid, cum) => assert(cum === rid + 1) }
  }

  private def withRule[T](on: Boolean)(f: => T): T = {
    spark.conf.set("spark.graft.ranked.autoRewrite", on.toString)
    try f finally spark.conf.unset("spark.graft.ranked.autoRewrite")
  }

  private def hasRankedExec(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("RankedPrefixSum")

  test("autoRewrite rule swaps an eligible running-sum window and matches it") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0 until 20000).map { i =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(1000).toLong, rnd.nextInt(5).toLong,
        i.toLong)
    }
    val df = rows.toDF("k", "pos", "delta", "row_id")
    val w = Window.partitionBy("k").orderBy("pos", "row_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // QueryExecution caches per Dataset: build a fresh frame per conf
    def q = df.withColumn("cum", sum("delta").over(w)).select("row_id", "cum")
    val (rewrittenPlan, got) = withRule(on = true) {
      (hasRankedExec(q), q.as[(Long, Long)].collect().sortBy(_._1))
    }
    assert(rewrittenPlan, "expected RankedPrefixSumExec in the plan")
    val (windowPlan, want) = withRule(on = false) {
      (hasRankedExec(q), q.as[(Long, Long)].collect().sortBy(_._1))
    }
    assert(!windowPlan, "rule must stay off by default")
    assert(got.toSeq === want.toSeq)
  }

  test("autoRewrite rule swaps row_number() and matches it") {
    import spark.implicits._
    val rows = (0 until 10000).map(i => (s"c${i % 4}", (i * 131) % 7919, i.toLong))
    val df = rows.toDF("k", "pos", "row_id")
    val w = Window.partitionBy("k").orderBy("pos", "row_id")
    def q = df.withColumn("rn", row_number().over(w)).select("row_id", "rn")
    val (planned, got) = withRule(on = true) {
      (hasRankedExec(q), q.as[(Long, Int)].collect().sortBy(_._1))
    }
    assert(planned, "expected RankedPrefixSumExec for row_number")
    val want = withRule(on = false)(q.as[(Long, Int)].collect().sortBy(_._1))
    assert(got.toSeq === want.toSeq)
  }

  test("autoRewrite swaps a KEYLESS running-sum window (global cumsum)") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val rows = (0 until 20000).map(i => (i.toLong, rnd.nextInt(9).toLong))
    val df = rows.toDF("row_id", "delta").repartition(8)
    val w = Window.orderBy("row_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def q = df.withColumn("cum", sum("delta").over(w)).select("row_id", "cum")
    val (planned, got) = withRule(on = true) {
      (hasRankedExec(q), q.as[(Long, Long)].collect().sortBy(_._1))
    }
    assert(planned, "keyless running sum must rewrite — the window form " +
      "serializes the whole table onto one task")
    // true window-form oracle needs BOTH gates off (keylessRewrite is
    // default-on since r11)
    val want = withKeyless(on = false) {
      withRule(on = false)(q.as[(Long, Long)].collect().sortBy(_._1))
    }
    assert(got.toSeq === want.toSeq)
  }

  test("typed rank/denseRank APIs equal the window forms (keyed + keyless, desc)") {
    import spark.implicits._
    val rnd = new scala.util.Random(67)
    val rows = (0 until 12000).map(i =>
      (s"g${i % 3}", rnd.nextInt(40).toLong, i.toLong)) // heavy ties
    val df = rows.toDF("k", "score", "row_id")
    // keyed, descending score
    val wk = Window.partitionBy("k").orderBy(desc("score"))
    val wantK = withKeyless(on = false) {
      df.withColumn("r", rank().over(wk).cast("bigint"))
        .withColumn("d", dense_rank().over(wk).cast("bigint"))
        .select("row_id", "r", "d").as[(Long, Long, Long)].collect().sortBy(_._1)
    }
    val gotK = graft.operators.Ranked.denseRank(
        graft.operators.Ranked.rank(df, Seq("k"), Seq(("score", true)), "r"),
        Seq("k"), Seq(("score", true)), "d")
      .select("row_id", "r", "d").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(gotK.toSeq === wantK.toSeq)
    // keyless, ascending
    val wg = Window.orderBy("score")
    val wantG = withKeyless(on = false) {
      df.withColumn("r", rank().over(wg).cast("bigint"))
        .select("row_id", "r").as[(Long, Long)].collect().sortBy(_._1)
    }
    val gotG = graft.operators.Ranked.rank(df, Seq(), Seq(("score", false)), "r")
      .select("row_id", "r").as[(Long, Long)].collect().sortBy(_._1)
    assert(gotG.toSeq === wantG.toSeq)
  }

  private def withKeyless[T](on: Boolean)(f: => T): T = {
    spark.conf.set("spark.graft.ranked.keylessRewrite", on.toString)
    try f finally spark.conf.unset("spark.graft.ranked.keylessRewrite")
  }

  test("keyless windows rewrite BY DEFAULT (r11); keyed still need the opt-in") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val rows = (0 until 15000).map(i => (s"g${i % 5}", i.toLong, rnd.nextInt(7).toLong))
    val df = rows.toDF("k", "row_id", "delta").repartition(8)
    val wg = Window.orderBy("row_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def q = df.withColumn("cum", sum("delta").over(wg))
      .withColumn("rn", row_number().over(Window.orderBy(desc("delta"), col("row_id"))))
      .select("row_id", "cum", "rn")
    // no conf set at all: the partition-less shape rewrites — it is
    // ALWAYS a single-task serialization, no cardinality regime
    // favors the window form
    assert(hasRankedExec(q), "keyless window must rewrite by default")
    // keyed windows keep the opt-in (cardinality is a data property)
    val wk = Window.partitionBy("k").orderBy("row_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def qk = df.withColumn("cum", sum("delta").over(wk)).select("row_id", "cum")
    assert(!hasRankedExec(qk), "keyed windows must not rewrite by default")
    // explicit off restores the window exec; values identical
    val got = q.as[(Long, Long, Int)].collect().sortBy(_._1)
    val (off, want) = withKeyless(on = false) {
      (hasRankedExec(q), q.as[(Long, Long, Int)].collect().sortBy(_._1))
    }
    assert(!off, "keylessRewrite=false must restore the window exec")
    assert(got.toSeq === want.toSeq)
  }

  test("autoRewrite leaves ineligible windows alone") {
    import spark.implicits._
    val df = (0 until 100).map(i => (s"g${i % 3}", i.toLong, i.toLong))
      .toDF("k", "pos", "delta")
    withRule(on = true) {
      // RANGE frame (the orderBy default): not a ROWS running sum
      val range = Window.partitionBy("k").orderBy("pos")
      assert(!hasRankedExec(df.withColumn("c", sum("delta").over(range))))
      // avg: not a prefix sum
      val rows = Window.partitionBy("k").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      assert(!hasRankedExec(df.withColumn("c", avg("delta").over(rows))))
      // a node mixing an eligible and an ineligible expression stays
      assert(!hasRankedExec(df.select(col("*"),
        row_number().over(Window.partitionBy("k").orderBy("pos")).as("rn"),
        avg("delta").over(rows).as("a"))))
    }
  }

  test("autoRewrite handles nullable sums with SQL null-until-first-value semantics") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // group g0 starts with a long null prefix so the null-propagation
    // path is exercised across partition boundaries too
    val rows = (0 until 20000).map { i =>
      val k = s"g${rnd.nextInt(3)}"
      val d: java.lang.Long =
        if (k == "g0" && i < 15000) null
        else java.lang.Long.valueOf(rnd.nextInt(5).toLong)
      (k, rnd.nextInt(1000).toLong, d, i.toLong)
    }
    val df = rows.toDF("k", "pos", "delta", "row_id")
    val w = Window.partitionBy("k").orderBy("pos", "row_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def q = df.withColumn("cum", sum("delta").over(w)).select("row_id", "cum")
    val (planned, got) = withRule(on = true) {
      (hasRankedExec(q), q.as[(Long, Option[Long])].collect().sortBy(_._1))
    }
    assert(planned, "expected RankedPrefixSumExec for a nullable sum")
    val want = withRule(on = false)(q.as[(Long, Option[Long])].collect().sortBy(_._1))
    assert(got.exists(_._2.isEmpty), "fixture should produce null running sums")
    assert(got.toSeq === want.toSeq)
  }

  test("autoRewrite handles sum + row_number sharing one spec (q_median_group shape)") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (0 until 20000).map { i =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(1000).toLong, rnd.nextInt(5).toLong,
        i.toLong)
    }
    val df = rows.toDF("k", "pos", "delta", "row_id")
    val spec = Window.partitionBy("k").orderBy("pos", "row_id")
    val running = spec.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def q = df.select(col("row_id"),
      sum("delta").over(running).as("cum"),
      row_number().over(spec).as("rn"))
    val (planned, got) = withRule(on = true) {
      (hasRankedExec(q), q.as[(Long, Long, Int)].collect().sortBy(_._1))
    }
    assert(planned, "expected ONE RankedPrefixSumExec for both expressions")
    val want = withRule(on = false)(q.as[(Long, Long, Int)].collect().sortBy(_._1))
    assert(got.toSeq === want.toSeq)
  }

  test("SQL rank window + rk<=k filter under autoRewrite composes rewrite AND tie-aware pushdown") {
    // the full user path: a plain Window rank() query with a bound —
    // RankedWindowRule swaps the window for RankedPrefixSum, then
    // RankedLimitRule lands the KeepTies pruner below the exchange;
    // result identical to the window form with the flag off
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    val rows = (0 until 20000).map { i =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(6).toLong, i.toLong)
    }
    val df = rows.toDF("k", "pos", "row_id").repartition(8)
    val spec = Window.partitionBy("k").orderBy(desc("pos"), col("row_id"))
    def q = df.select(col("k"), col("pos"), col("row_id"),
        rank().over(spec).cast("long").as("rk"))
      .filter(col("rk") <= 4)
    val (plan, got) = withRule(on = true) {
      (q.queryExecution.executedPlan.toString,
        q.as[(String, Long, Long, Long)].collect().sorted.toSeq)
    }
    assert(plan.contains("RankedPrefixSum"), plan)
    assert(plan.contains("RankedLocalTopK") && plan.contains("KeepTies"), plan)
    val want = withRule(on = false)(
      q.as[(String, Long, Long, Long)].collect().sorted.toSeq)
    assert(got === want)
  }

  test("autoRewrite handles rank() exactly, including peer runs spanning partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    // only 7 distinct order values over 30000 rows: every range
    // partition boundary lands inside a peer run, so the cross-
    // partition chaining is load-bearing, not incidental
    val rows = (0 until 30000).map { i =>
      (s"g${rnd.nextInt(2)}", rnd.nextInt(7).toLong, i.toLong)
    }
    val df = rows.toDF("k", "pos", "row_id")
    val spec = Window.partitionBy("k").orderBy("pos")
    def q = df.select(col("row_id"), col("k"), col("pos"),
      rank().over(spec).as("rk"))
    val (planned, got) = withRule(on = true) {
      (hasRankedExec(q),
        q.select("row_id", "rk").as[(Long, Int)].collect().sortBy(_._1))
    }
    assert(planned, "expected RankedPrefixSumExec for rank()")
    val want = withRule(on = false)(
      q.select("row_id", "rk").as[(Long, Int)].collect().sortBy(_._1))
    assert(got.toSeq === want.toSeq)
    // and a single-key group: one giant peer run across every partition
    val flat = (0 until 5000).map(i => ("only", 42L, i.toLong))
      .toDF("k", "pos", "row_id")
    def q2 = flat.select(col("row_id"), rank().over(spec).as("rk"))
    val got2 = withRule(on = true)(q2.as[(Long, Int)].collect())
    assert(got2.forall(_._2 === 1))
  }

  test("autoRewrite handles dense_rank() exactly across partition boundaries") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    // 7 distinct order values over 30000 rows: every range boundary
    // splits a key run, so the once-per-key boundary merge in the
    // driver chain is load-bearing
    val rows = (0 until 30000).map { i =>
      (s"g${rnd.nextInt(2)}", rnd.nextInt(7).toLong, i.toLong)
    }
    val df = rows.toDF("k", "pos", "row_id")
    val spec = Window.partitionBy("k").orderBy("pos")
    def q = df.select(col("row_id"),
      dense_rank().over(spec).as("drk"), rank().over(spec).as("rk"),
      row_number().over(spec).as("rn"))
    val (planned, got) = withRule(on = true) {
      (hasRankedExec(q), q.as[(Long, Int, Int, Int)].collect().sortBy(_._1))
    }
    assert(planned, "expected RankedPrefixSumExec for dense_rank")
    val want = withRule(on = false)(
      q.as[(Long, Int, Int, Int)].collect().sortBy(_._1))
    assert(got.toSeq === want.toSeq)
    // single-key group: dense_rank 1 everywhere regardless of boundaries
    val flat = (0 until 5000).map(i => ("only", 42L, i.toLong))
      .toDF("k", "pos", "row_id")
    def q2 = flat.select(col("row_id"), dense_rank().over(spec).as("drk"))
    val got2 = withRule(on = true)(q2.as[(Long, Int)].collect())
    assert(got2.forall(_._2 === 1))
    // keyless dense_rank: a global distinct-value ranking
    val kspec = Window.orderBy("pos")
    def q3 = df.select(col("row_id"), dense_rank().over(kspec).as("drk"))
    val got3 = withRule(on = true)(q3.as[(Long, Int)].collect().sortBy(_._1))
    val want3 = withRule(on = false)(q3.as[(Long, Int)].collect().sortBy(_._1))
    assert(got3.toSeq === want3.toSeq)
  }

  test("autoRewrite handles rank + row_number + sum in one window node") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = (0 until 15000).map { i =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(11).toLong, rnd.nextInt(5).toLong,
        i.toLong)
    }
    val df = rows.toDF("k", "pos", "delta", "row_id")
    val spec = Window.partitionBy("k").orderBy("pos", "row_id")
    val tieSpec = Window.partitionBy("k").orderBy("pos")
    val running = spec.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def q = df.select(col("row_id"),
      sum("delta").over(running).as("cum"),
      row_number().over(spec).as("rn"),
      rank().over(tieSpec).as("rk"))
    // rank's spec differs (no tiebreaker) so Catalyst plans two Window
    // nodes; BOTH must rewrite
    val (planned, got) = withRule(on = true) {
      val nExecs = "RankedPrefixSum".r
        .findAllIn(q.queryExecution.executedPlan.toString).length
      (nExecs, q.as[(Long, Long, Int, Int)].collect().sortBy(_._1))
    }
    assert(planned >= 2, s"expected both window nodes rewritten, got $planned")
    val want = withRule(on = false)(q.as[(Long, Long, Int, Int)].collect().sortBy(_._1))
    assert(got.toSeq === want.toSeq)
  }
}
