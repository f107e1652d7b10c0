package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RangeJoinCountRule: count-only aggregates over interval-overlap
  * joins must become dual prefix-sum window plans (no pair stream),
  * and must return bit-identical results to the naive join on every
  * edge the inner join semantics cover: ties, duplicate intervals,
  * inverted bounds, null keys/bounds, left- or right-side group keys,
  * and global (ungrouped) counts.
  */
class RangeCountRuleSpec extends SparkSpec {

  import spark.implicits._

  private def reads: DataFrame = {
    val rows = (0 until 3000).map { i =>
      (i.toLong, s"c${i % 3}", (i * 37L) % 500, (i * 37L) % 500 + (i % 90))
    } ++ Seq(
      (9001L, "c0", 300L, 200L),           // inverted bounds — still joinable
      (9002L, null.asInstanceOf[String], 10L, 50L)) // null key — never matches
    rows.toDF("read_id", "contig", "rstart", "rend")
  }

  private def targets: DataFrame = {
    val rows = (0 until 400).map { i =>
      (i.toLong, s"c${i % 3}", (i * 91L) % 500, (i * 91L) % 500 + (i % 60))
    } ++ Seq(
      (8001L, "c1", 450L, 400L),           // inverted target
      (8002L, "c2", 499L, 499L))           // point interval
    rows.toDF("target_id", "tcontig", "tstart", "tend")
  }

  private def overlapJoin = reads.join(targets,
    col("contig") === col("tcontig") &&
      col("rstart") <= col("tend") && col("tstart") <= col("rend"))

  private def withRule[A](on: Boolean)(f: => A): A = {
    spark.conf.set("spark.graft.rangejoin.countPushdown", on.toString)
    try f finally spark.conf.set("spark.graft.rangejoin.countPushdown", "true")
  }

  /** The query must be BUILT inside the conf scope: a Dataset caches
    * its QueryExecution, so collecting a pre-built frame under a
    * different conf re-runs the same physical plan and the
    * "fast vs slow" comparison silently compares the rewrite against
    * itself. */
  private def sortedRows(mk: => DataFrame): Seq[Row2] =
    mk.collect().map(r => Row2(r.toSeq.map(String.valueOf).mkString("|"))).sortBy(_.s).toSeq
  case class Row2(s: String)

  test("grouped pair count matches the naive join exactly") {
    def q = overlapJoin.groupBy("target_id").agg(count(lit(1)).as("n_reads"))
    val fast = withRule(on = true)(sortedRows(q))
    val slow = withRule(on = false)(sortedRows(q))
    assert(fast === slow)
    assert(fast.nonEmpty)
  }

  test("the naive baseline really is a different plan (guard against vacuous compare)") {
    def q = overlapJoin.groupBy("target_id").agg(count(lit(1)).as("n"))
    val fastPlan = withRule(on = true)(q.queryExecution.executedPlan.toString)
    val slowPlan = withRule(on = false)(q.queryExecution.executedPlan.toString)
    assert(fastPlan.contains("Window") && !slowPlan.contains("Window"),
      s"fast:\n$fastPlan\nslow:\n$slowPlan")
  }

  test("keyless overlap join is left alone (empty partitionBy would serialize)") {
    def q = reads.join(targets,
        col("rstart") <= col("tend") && col("tstart") <= col("rend"))
      .agg(count(lit(1)).as("pairs"))
    val plan = withRule(on = true)(q.queryExecution.optimizedPlan.toString)
    assert(!plan.contains("windowspecdefinition"), plan)
  }

  test("spark.graft.rangejoin.enabled=false disables count pushdown too") {
    def q = overlapJoin.groupBy("target_id").agg(count(lit(1)).as("n"))
    spark.conf.set("spark.graft.rangejoin.enabled", "false")
    try {
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), plan)
    } finally spark.conf.set("spark.graft.rangejoin.enabled", "true")
  }

  test("rewritten plan has no pair-producing join — windows only (plus rare-row fallbacks)") {
    def q = overlapJoin.groupBy("target_id").agg(count(lit(1)).as("n_reads"))
    val plan = withRule(on = true)(q.queryExecution.executedPlan.toString)
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the binned Generate must NOT appear — count never needs pairs
    assert(!plan.contains("Generate"), plan)
    // the only joins are the two broadcast fallbacks over the rare
    // inverted-bounds rows; the bulk flows through the windows
    assert("Join".r.findAllIn(plan).length <= 2, plan)
  }

  test("group keys can come from the left side too") {
    def q = overlapJoin.groupBy("contig").agg(count(lit(1)).as("n"))
    val fast = withRule(on = true)(sortedRows(q))
    val slow = withRule(on = false)(sortedRows(q))
    assert(fast === slow)
    val plan = withRule(on = true)(q.queryExecution.executedPlan.toString)
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("global (ungrouped) pair count matches") {
    def q = overlapJoin.agg(count(lit(1)).as("pairs"))
    val fast = withRule(on = true)(sortedRows(q))
    val slow = withRule(on = false)(sortedRows(q))
    assert(fast === slow)
  }

  test("grouping on an expression and extra count aliases still match") {
    def q = overlapJoin.groupBy(expr("target_id % 7").as("bucket"))
      .agg(count(lit(1)).as("a"), count(lit(1)).as("b"))
    val fast = withRule(on = true)(sortedRows(q))
    val slow = withRule(on = false)(sortedRows(q))
    assert(fast === slow)
  }

  test("non-count aggregates are left alone (rule must not fire)") {
    def q = overlapJoin.groupBy("target_id").agg(sum("rstart").as("s"))
    val fast = withRule(on = true)(sortedRows(q))
    val slow = withRule(on = false)(sortedRows(q))
    assert(fast === slow)
    val plan = withRule(on = true)(q.queryExecution.executedPlan.toString)
    // the range-join rule still bins it, but no prefix-sum windows
    assert(!plan.contains("Window"), plan)
  }

  test("generative: random interval tables match a local brute-force count") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val rowGen = for {
      key <- Gen.frequency(4 -> Gen.oneOf("a", "b", "c"), 1 -> Gen.const(null: String))
      s <- Gen.choose(-50L, 50L)
      // mostly well-formed, some inverted, some point intervals
      len <- Gen.frequency(6 -> Gen.choose(0L, 30L), 1 -> Gen.choose(-20L, -1L))
    } yield (key, s, s + len)
    val tblGen = for {
      nl <- Gen.choose(0, 120)
      nr <- Gen.choose(0, 60)
      ls <- Gen.listOfN(nl, rowGen)
      rs <- Gen.listOfN(nr, rowGen)
    } yield (ls, rs)
    (0 until 25).foreach { i =>
      val (ls, rs) = tblGen(Gen.Parameters.default, Seed(i.toLong)).get
      val l = ls.zipWithIndex.map { case ((k, s, e), id) => (id.toLong, k, s, e) }
        .toDF("lid", "k", "ls", "le")
      val r = rs.zipWithIndex.map { case ((k, s, e), id) => (id.toLong, k, s, e) }
        .toDF("rid", "k2", "rs", "re")
      def q = l.join(r, col("k") === col("k2") &&
          col("ls") <= col("re") && col("rs") <= col("le"))
        .groupBy("rid").agg(count(lit(1)).as("n"))
      val got = withRule(on = true)(
        q.collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq)
      // local brute force over the same rows
      val expect = rs.zipWithIndex.flatMap { case ((k2, s2, e2), rid) =>
        val n = ls.count { case (k1, s1, e1) =>
          k1 != null && k2 != null && k1 == k2 && s1 <= e2 && s2 <= e1 }
        if (n > 0) Some((rid.toLong, n.toLong)) else None
      }.sorted
      assert(got === expect, s"seed=$i")
    }
  }

  test("groups that only exist through zero-count probes never surface") {
    // a target on a contig with no reads at all: inner join emits no
    // row, so the group must be absent — not present with count 0
    val lonely = Seq((7777L, "zz", 0L, 1000L)).toDF("target_id", "tcontig", "tstart", "tend")
    val q = reads.join(lonely,
        col("contig") === col("tcontig") &&
          col("rstart") <= col("tend") && col("tstart") <= col("rend"))
      .groupBy("target_id").agg(count(lit(1)).as("n"))
    assert(withRule(on = true)(q.count()) === 0L)
  }
}
