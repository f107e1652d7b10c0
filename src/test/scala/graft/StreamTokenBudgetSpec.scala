package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamTokenBudget
import graft.streaming.StreamTokenBudget.{Assignment, Doc}

/** Streaming token-budget sharding (I4 × P25): watermark-finalized
  * per-lang shard assignments must equal the batch q_token_shard
  * packing over the same docs — including out-of-order delivery and a
  * late block — and must use the SAME tokenization (shared
  * expression). */
class StreamTokenBudgetSpec extends SparkSpec {

  private val base = 1700000000000000L // µs
  private val min_ = 60L * 1000000L

  /** Batch oracle: per lang in doc_id order (ts is doc_id-aligned in
    * these tests), shard = floor(cum_before / budget) — exactly the
    * P25 window. */
  private def oracle(docs: Seq[(Long, String, Long)], budget: Long): Map[Long, (Long, Long)] =
    docs.groupBy(_._2).flatMap { case (_, ds) =>
      var cum = 0L
      ds.sortBy(_._1).map { case (id, _, n) =>
        val shard = cum / budget
        cum += n
        id -> (n, shard)
      }
    }

  private def tokCounts(docs: Seq[Doc]): Map[Long, Long] = {
    val sq = spark
    import sq.implicits._
    docs.map(d => (d.doc_id, d.text)).toDF("doc_id", "text")
      .select(col("doc_id"), expr(graft.queries.Corpus.tokCount).as("n"))
      .as[(Long, Long)].collect().toMap
  }

  private def runStream(name: String, batches: Seq[Seq[Doc]],
                        budget: Long, delay: String): Map[Long, (Long, Long)] = {
    val sq = spark
    import sq.implicits._
    implicit val sc = sq.sqlContext
    val mem = MemoryStream[Doc]
    val query = StreamTokenBudget.assignments(mem.toDS(), budget, delay)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); query.processAllAvailable() }
      spark.table(name).as[Assignment].collect()
        .map(a => a.doc_id -> (a.n_tok, a.shard)).toMap
    } finally query.stop()
  }

  test("corpus slice: stream shards ≡ batch packing under disorder + late data") {
    val sq = spark
    import sq.implicits._
    val rows = Tables.documents(spark, "/root/testdata/sf0.01")
      .orderBy("doc_id").limit(150)
      .select("doc_id", "lang", "text").as[(Long, String, String)].collect()
    val docs = rows.zipWithIndex.map { case ((id, lang, t), i) =>
      Doc(id, lang, t, base + i * min_)
    }
    val rnd = new scala.util.Random(7)
    val late = docs.slice(40, 70)
    val batch1 = rnd.shuffle((docs.take(40) ++ docs.slice(70, 100)).toSeq)
    val batch2 = rnd.shuffle((late ++ docs.drop(100)).toSeq)
    val movers = Seq(
      Seq(Doc(9999998L, "zz", "mover", base + 5000 * min_)),
      Seq(Doc(9999999L, "zz", "mover two", base + 9000 * min_)))
    val budget = 1500L
    val got = runStream("stb_corpus", Seq(batch1, batch2) ++ movers,
      budget, "90 minutes")
    val n = tokCounts(docs.toSeq)
    val want = oracle(docs.map(d => (d.doc_id, d.lang, n(d.doc_id))).toSeq, budget)
    val gotReal = got.view.filterKeys(_ < 9999998L).toMap
    assert(gotReal === want)
    // multiple shards must actually occur per lang for this to test packing
    assert(want.values.map(_._2).max > 0, "budget too large — single shard")
  }

  test("property: arbitrary micro-batch splits cannot move a shard boundary") {
    val sq = spark
    import sq.implicits._
    val rows = Tables.documents(spark, "/root/testdata/sf0.01")
      .orderBy("doc_id").limit(60)
      .select("doc_id", "lang", "text").as[(Long, String, String)].collect()
    val docs = rows.zipWithIndex.map { case ((id, lang, t), i) =>
      Doc(id, lang, t, base + i * min_)
    }
    val n = tokCounts(docs.toSeq)
    val budget = 800L
    val want = oracle(docs.map(d => (d.doc_id, d.lang, n(d.doc_id))).toSeq, budget)
    (0 until 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      // random partition into 3 batches, each internally shuffled —
      // any doc may arrive in any batch (disorder bounded only by the
      // generous watermark delay)
      val assigned = docs.map(d => (d, rnd.nextInt(3)))
      val batches = (0 until 3).map(b =>
        rnd.shuffle(assigned.filter(_._2 == b).map(_._1).toSeq)) :+
        Seq(Doc(9999999L, "zz", "mover", base + 9000 * min_))
      val got = runStream(s"stb_prop_$seed", batches, budget, "3000 minutes")
        .view.filterKeys(_ < 9999999L).toMap
      assert(got === want, s"seed $seed diverged from the batch packing")
    }
  }

  test("per-lang running totals persist across quiet batches") {
    val docs = Seq(
      Doc(1, "en", "a b c d", base),
      Doc(2, "en", "e f g", base + min_),
      Doc(3, "en", "h i", base + 10 * min_))
    // finalize docs 1-2 first, doc 3 in a later batch: the shard for
    // doc 3 must remember cum = 7 from the earlier batches (movers
    // advance the watermark without outrunning doc 3's event time)
    val batches = Seq(
      Seq(docs(0), docs(1)),
      Seq(Doc(9999998L, "zz", "mover", base + 2 * min_)),
      Seq(docs(2)),
      Seq(Doc(9999999L, "zz", "mover two", base + 20 * min_)))
    val got = runStream("stb_quiet", batches, 5L, "1 minutes")
    assert(got(1L) === ((4L, 0L)))
    assert(got(2L) === ((3L, 0L))) // cum_before 4 -> shard 0
    assert(got(3L) === ((2L, 1L))) // cum_before 7 -> shard 1
  }
}
