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
}
