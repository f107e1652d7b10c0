package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Batched-BPE scaling probe (VERDICT r10 item 3): measure that
  * batch-N merge learning cuts DRIVER ROUNDS (and wall time) ∝ 1/N at
  * equal encode quality on this corpus.  For each batch size: learn
  * `rounds` merges, report driver rounds (= ceil(rounds/batch) when
  * pairs never run dry), wall seconds, and the corpus-wide symbol
  * savings of encoding with the learned table (the quality metric —
  * batched picks use pre-batch counts, so the TABLE may deviate from
  * strict Sennrich order; the question is whether the encode
  * compression it buys is the same).
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.BpeProbe <dir> <rounds> <batch...>
  */
object BpeProbe {

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: BpeProbe <dir> <rounds> <batch> [<batch> ...]")
    val dir = args(0)
    val rounds = args(1).toInt
    val batches = args.drop(2).map(_.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = new StringBuilder
    batches.foreach { b =>
      val probe = Bench.calibrate(25000000)
      val t0 = System.nanoTime()
      val (merges, driverRounds) = graft.queries.Packing.learnMergesCounted(
        spark, dir, batch = b, rounds = rounds)
      val learnSec = (System.nanoTime() - t0) / 1e9
      val flat = merges.flatMap(m => Seq(m._2, m._3))
      val saved = Tables.documents(spark, dir)
        .select(call_function("graft_bpe_stats", col("text"),
          array(flat.map(lit): _*)).as("st"))
        .agg(sum(expr("st[0] - st[1]")).as("saved"), sum(expr("st[0]")).as("pre"))
        .collect()(0)
      val line = s"""{"dir":"$dir","rounds":$rounds,"batch":$b,""" +
        s""""n_merges":${merges.size},"driver_rounds":$driverRounds,""" +
        s""""learn_sec":$learnSec,"saved_syms":${saved.getLong(0)},""" +
        s""""pre_syms":${saved.getLong(1)},"probe":$probe}"""
      println(line)
      out.append(line).append('\n')
    }
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        out.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
