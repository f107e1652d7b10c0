package graft.sources

import graft.SparkSpec
import graft.model.{SamHeader, SamRecord, SamRef}

/** SQL-facing surfaces beyond DataFrame calls: pure-SQL access to the
  * graft format sources (`CREATE TEMPORARY VIEW ... USING bam` — the
  * DSv2 route; direct `FROM bam.` file queries are reserved by Spark
  * for built-in FileFormat sources), and bucketed tables for
  * exchange-free co-located joins (the 100 TB co-location story).
  */
class SqlSurfaceSpec extends SparkSpec {

  private val header = SamHeader(
    "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:100000",
    Array(SamRef("chr1", 100000)))

  private def rec(i: Int) = SamRecord(s"r$i", 0, "chr1", 1 + i, 60, "10M",
    "*", 0, 0, "ACGTACGTAC", "IIIIIIIIII", Array.empty)

  test("pure SQL over a BAM file via CREATE TEMPORARY VIEW ... USING bam") {
    import spark.implicits._
    val file = s"${tmpDir("sqlbam")}/t.bam"
    BamIO.writeSorted(spark.createDataset((0 until 200).map(rec)).coalesce(1),
      header, file)
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW sql_bam USING bam OPTIONS (path '$file')")
    try {
      val n = spark.sql("SELECT count(*) AS n FROM sql_bam").head().getLong(0)
      assert(n === 200L)
      val filtered = spark.sql(
        "SELECT qname FROM sql_bam WHERE pos <= 50 ORDER BY qname")
        .collect().map(_.getString(0))
      assert(filtered.length === 50)
    } finally spark.sql("DROP VIEW IF EXISTS sql_bam")
  }

  test("bucketed tables join without any exchange (co-located join)") {
    import spark.implicits._
    // disable broadcast so the join would otherwise shuffle both sides;
    // AQE keeps bucket info
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = (0 until 10000).map(i => (i.toLong % 500, i.toLong)).toDF("k", "v")
      val dims = (0 until 500).map(i => (i.toLong, s"d$i")).toDF("k", "name")
      facts.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("facts_b")
      dims.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("dims_b")
      val joined = spark.table("facts_b").join(spark.table("dims_b"), "k")
      joined.collect() // materialize under AQE
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be exchange-free:\n$plan")
      assert(joined.count() === 10000L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS facts_b")
      spark.sql("DROP TABLE IF EXISTS dims_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
