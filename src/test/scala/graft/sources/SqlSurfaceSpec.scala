package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.{SamHeader, SamRecord, SamRef}

/** SQL-facing surfaces beyond DataFrame calls: direct SQL-on-file
  * queries over the graft formats, and bucketed tables for
  * exchange-free co-located joins (the 100 TB co-location story).
  */
class SqlSurfaceSpec extends SparkSpec {

  private val header = SamHeader(
    "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:100000",
    Array(SamRef("chr1", 100000)))

  private def rec(i: Int) = SamRecord(s"r$i", 0, "chr1", 1 + i, 60, "10M",
    "*", 0, 0, "ACGTACGTAC", "IIIIIIIIII", Array.empty)

  test("SQL-on-file: SELECT directly over a BAM path") {
    import spark.implicits._
    val file = s"${tmpDir("sqlbam")}/t.bam"
    BamIO.writeSorted(spark.createDataset((0 until 200).map(rec)).coalesce(1),
      header, file)
    val n = spark.sql(s"SELECT count(*) AS n FROM bam.`$file`").head().getLong(0)
    assert(n === 200L)
    val filtered = spark.sql(
      s"SELECT qname FROM bam.`$file` WHERE pos <= 50 ORDER BY qname")
      .collect().map(_.getString(0))
    assert(filtered.length === 50)
  }

  test("bucketed tables join without any exchange (co-located join)") {
    import spark.implicits._
    val wh = tmpDir("graft_wh")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.warehouse.dir", wh)
    // AQE keeps bucket info; disable broadcast so the join would
    // otherwise shuffle both sides
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import s2.implicits._
    val facts = (0 until 10000).map(i => (i.toLong % 500, i.toLong)).toDF("k", "v")
    val dims = (0 until 500).map(i => (i.toLong, s"d$i")).toDF("k", "name")
    facts.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("facts_b")
    dims.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("dims_b")
    val joined = s2.table("facts_b").join(s2.table("dims_b"), "k")
    joined.collect() // materialize under AQE
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join should be exchange-free:\n$plan")
    assert(joined.count() === 10000L)
    s2.sql("DROP TABLE facts_b"); s2.sql("DROP TABLE dims_b")
  }
}
