package graft

import org.apache.spark.sql.functions._

/** Tables.events must surface `ts` as BIGINT epoch NANOS for every
  * physical type the events table has shipped with, independent of the
  * session timezone (ADVICE r9), and fail loudly on schema drift.
  */
class TablesEventsSpec extends SparkSpec {

  private val nanos = 1723500000123456000L // 2024-08-12T22:00:00.123456Z

  private def writeEvents(dir: String, tsExpr: String): Unit = {
    spark.range(1)
      .select(expr(tsExpr).as("ts"), lit("u1").as("user_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def readTs(dir: String): Long =
    Tables.events(spark, dir).select("ts").head().getLong(0)

  test("BIGINT nanos passes through untouched") {
    val d = tmpDir("ev-long")
    writeEvents(d, s"CAST(${nanos}L AS BIGINT)")
    assert(readTs(d) === nanos)
  }

  test("TIMESTAMP_NTZ converts timezone-independently") {
    val d = tmpDir("ev-ntz")
    // micros precision: drop the sub-micro part of the reference value
    val micros = nanos / 1000
    writeEvents(d, s"CAST(timestampadd(MICROSECOND, ${micros}L, " +
      "timestamp_ntz'1970-01-01 00:00:00') AS TIMESTAMP_NTZ)")
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      for (tz <- Seq("UTC", "America/New_York", "Asia/Tokyo")) {
        spark.conf.set("spark.sql.session.timeZone", tz)
        assert(readTs(d) === micros * 1000L, s"tz=$tz")
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("TIMESTAMP (LTZ) converts via the instant, timezone-independently") {
    val d = tmpDir("ev-ltz")
    val micros = nanos / 1000
    writeEvents(d, s"timestamp_micros(${micros}L)")
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      for (tz <- Seq("UTC", "America/New_York")) {
        spark.conf.set("spark.sql.session.timeZone", tz)
        assert(readTs(d) === micros * 1000L, s"tz=$tz")
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("unexpected ts type fails loudly instead of being misread") {
    val d = tmpDir("ev-drift")
    writeEvents(d, "'2024-08-12 22:00:00'") // STRING ts = schema drift
    val e = intercept[IllegalArgumentException] { Tables.events(spark, d) }
    assert(e.getMessage.contains("events.ts"))
  }
}
