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

  test("autoRewrite leaves ineligible windows alone") {
    import spark.implicits._
    val df = (0 until 100).map(i => (s"g${i % 3}", i.toLong, i.toLong))
      .toDF("k", "pos", "delta")
    withRule(on = true) {
      // RANGE frame (the orderBy default): not a ROWS running frame
      val range = Window.partitionBy("k").orderBy("pos")
      assert(!hasRankedExec(df.withColumn("c", sum("delta").over(range))))
      // avg: not a prefix sum
      val rows = Window.partitionBy("k").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      assert(!hasRankedExec(df.withColumn("c", avg("delta").over(rows))))
      // nullable delta: running SQL sum stays null until a value appears
      val nullable = df.withColumn("d",
        when(col("pos") > 10, col("delta")))
      assert(!hasRankedExec(nullable.withColumn("c", sum("d").over(rows))))
    }
  }
}
