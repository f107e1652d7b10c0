package graft.examples

import org.apache.spark.sql.functions._

/** One-off A/B: where does the lineitem aggregate head spend its time —
  * the DECIMAL(18,4) exact-sum path, or the scan?
  *
  *   sbt "runMain graft.examples.AggProbe /root/testdata/sf0.1"
  */
object AggProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.GraftSession.local(32)
    s.sparkContext.setLogLevel("ERROR")
    val li = () => graft.Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2000-12-01"))
      .groupBy("l_returnflag", "l_linestatus")

    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }

    time("decimal18_4 sums x4") {
      li().agg(
        sum(expr("CAST(l_quantity AS DECIMAL(18,4))")).cast("double").as("a"),
        sum(expr("CAST(l_extendedprice AS DECIMAL(18,4))")).cast("double").as("b"),
        sum(expr("CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))")).cast("double").as("c"),
        count(lit(1)).as("n"))
    }
    time("bigint micro-unit sums x4") {
      li().agg(
        (sum(expr("CAST(ROUND(l_quantity * 10000) AS BIGINT)")) / 10000.0).as("a"),
        (sum(expr("CAST(ROUND(l_extendedprice * 10000) AS BIGINT)")) / 10000.0).as("b"),
        (sum(expr("CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)")) / 10000.0).as("c"),
        count(lit(1)).as("n"))
    }
    time("decimal-quantize bigint sums") {
      li().agg(
        (sum(expr("CAST(CAST(l_quantity AS DECIMAL(18,4)) * 10000 AS BIGINT)")).cast("double") / 10000.0).as("a"),
        (sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)")).cast("double") / 10000.0).as("b"),
        (sum(expr("CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) * 10000 AS BIGINT)")).cast("double") / 10000.0).as("c"),
        count(lit(1)).as("n"))
    }
    time("plain double sums x4") {
      li().agg(sum("l_quantity").as("a"), sum("l_extendedprice").as("b"),
        sum(expr("l_extendedprice * (1 - l_discount)")).as("c"), count(lit(1)).as("n"))
    }
    time("count only") { li().agg(count(lit(1)).as("n")) }
    s.stop()
  }
}
