package graft

import org.apache.spark.sql.functions._

/** q_weighted_sample — deterministic Efraimidis-Spirakis sampling.
  * The oracle gate pins cross-engine exactness; these pins prove the
  * sampling SEMANTICS and the scale shape:
  *   - weight-proportional inclusion: with two weight classes 100:1,
  *     the heavy class dominates the sample in (approximately) its
  *     share of total weight — the property that makes this a
  *     weighted sampler rather than a top-k-by-length;
  *   - without replacement: sample rows are distinct documents;
  *   - determinism across partition layouts (hash-derived keys +
  *     total tie-break, no rand());
  *   - plan: distributed top-k (TakeOrdered), not a global sort.
  */
class WeightedSampleSpec extends SparkSpec {

  import spark.implicits._

  private val esKey =
    "CAST(graft_micro_ln((CAST(graft_hash32(text) AS BIGINT) & 2147483647) + 1) " +
      "- 21487563 AS DOUBLE) / CAST(w AS DOUBLE)"

  test("inclusion tracks weight: a 10x-weight class takes ~its weight share") {
    // 500 heavy docs (w=50) + 500 light (w=5): heavy share of total
    // weight ≈ 91%, so an E-S top-100 should hold ≈ 91 heavy docs —
    // far above the 50 a uniform sampler would pick, and strictly
    // below the 100 a top-k-by-weight would (all heavy weights tie,
    // so pure weight ordering would fill the sample from one class).
    val docs = (0 until 1000).map { i =>
      val heavy = i < 500
      (i.toLong, s"doc $i ${if (heavy) "heavy" else "light"} payload", if (heavy) 50L else 5L)
    }.toDF("doc_id", "text", "w")
    val top = docs.select($"doc_id", expr(esKey).as("k"))
      .orderBy(desc("k"), $"doc_id").limit(100)
      .collect().map(_.getLong(0))
    val nHeavy = top.count(_ < 500)
    assert(nHeavy >= 75 && nHeavy <= 99,
      s"heavy class got $nHeavy of 100 — expected ≈91 (weight share)")
    assert(top.toSet.size == 100, "sample has duplicate documents")
  }

  test("result is partition-layout independent") {
    val d = "/root/testdata/sf0.001"
    val base = graft.queries.Analytics.qWeightedSample(spark, d)
      .collect().map(_.getLong(0)).toSeq
    val docs = Tables.documents(spark, d).repartition(17)
    docs.createOrReplaceTempView("wsdocs")
    val re = spark.sql(
      """SELECT doc_id FROM (
        |  SELECT doc_id,
        |    CAST(graft_micro_ln((CAST(graft_hash32(text) AS BIGINT) & 2147483647) + 1)
        |      - 21487563 AS DOUBLE) / CAST(n_chars AS DOUBLE) AS es_key
        |  FROM wsdocs WHERE n_chars > 0)
        |ORDER BY es_key DESC, doc_id LIMIT 100""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(base == re)
  }

  test("plan is a distributed top-k, not a global sort") {
    val plan = graft.queries.Analytics.qWeightedSample(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no TakeOrdered in:\n$plan")
  }
}
