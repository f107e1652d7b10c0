package graft

import org.apache.spark.sql.functions._

import graft.queries.Corpus

/** The `graft_micro_ln` / `graft_micro_ln_ratio` codegen kernels must
  * be BIT-EQUAL to the shared SQL ln tree the DuckDB oracles spell
  * (queries/Corpus.scala) — both implement the identical sequence of
  * exactly-rounded IEEE operations, so equality here transitively
  * pins kernel ≡ oracle.  Sweep: every n ≤ 8192, all powers of two
  * ±1 up to 2⁶², and random positive longs across the full range. */
class MicroLnSpec extends SparkSpec {

  private def values: Seq[Long] = {
    val rnd = new scala.util.Random(53)
    val small = (1L to 8192L)
    val powers = (0 until 62).flatMap { k =>
      val p = 1L << k
      Seq(p - 1, p, p + 1).filter(_ >= 1)
    }
    val random = Seq.fill(4000)(math.abs(rnd.nextLong()) % ((1L << 62) - 3) + 1)
    (small ++ powers ++ random).distinct
  }

  test("graft_micro_ln is bit-equal to the shared SQL ln tree") {
    import spark.implicits._
    val df = values.toDF("n")
    val diff = df.select(
        expr("graft_micro_ln(n)").as("kernel"),
        expr(Corpus.microLn("n", duck = false)).as("tree"),
        col("n"))
      .filter(col("kernel") =!= col("tree"))
      .collect()
    assert(diff.isEmpty, s"kernel != tree on: ${diff.take(5).mkString(", ")}")
  }

  test("graft_micro_ln_ratio is bit-equal to the shared SQL ratio tree") {
    import spark.implicits._
    val rnd = new scala.util.Random(59)
    val vs = values.toArray
    val pairs = Seq.fill(6000)((vs(rnd.nextInt(vs.length)), vs(rnd.nextInt(vs.length))))
    val df = pairs.toDF("a", "b")
    val diff = df.select(
        expr("graft_micro_ln_ratio(a, b)").as("kernel"),
        expr(Corpus.microLnRatio("a", "b", duck = false)).as("tree"),
        col("a"), col("b"))
      .filter(col("kernel") =!= col("tree"))
      .collect()
    assert(diff.isEmpty, s"kernel != tree on: ${diff.take(5).mkString(", ")}")
  }

  test("micro_ln tracks true ln within ~1 micro-unit on the series domain") {
    // semantic sanity (not a cross-engine gate): the artanh-to-t¹¹
    // truncation is ≤ 1.2e-7 in ln space
    values.filter(_ <= (1L << 52)).take(2000).foreach { n =>
      val got = graft.functions.GraftFunctions.microLn(n)
      val want = math.round(1e6 * math.log(n.toDouble))
      assert(math.abs(got - want) <= 1L, s"n=$n got=$got want=$want")
    }
  }

  test("micro_ln fails loudly on non-positive input") {
    intercept[Exception] {
      graft.functions.GraftFunctions.microLn(0L)
    }
  }
}
