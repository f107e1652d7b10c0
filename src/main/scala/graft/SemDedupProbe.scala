package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SemDeDup k-scaling probe (VERDICT r10 item 4): demonstrate that
  * raising k with n — the paper's own scaling argument — keeps the
  * within-cell pair work (Σ|cell|·(|cell|−1)/2, the candidate volume
  * of the cell-equi self-join) and the wall time near-flat as the
  * corpus grows, where fixed k would grow both quadratically.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.SemDedupProbe \
  *          <dir1> <k1> [<dir2> <k2> ...]
  * Prints one JSON line per (dir, k): n_vecs, k, occupied cells,
  * candidate pairs, max cell size, and the noop-sink wall time of the
  * full parameterized q_semdedup (probe timed before each run, graft
  * bench protocol).
  */
object SemDedupProbe {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2 && args.length % 2 == 0,
      "usage: SemDedupProbe <dir> <k> [<dir> <k> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = new StringBuilder
    args.grouped(2).foreach { case Array(dir, kStr) =>
      val k = kStr.toInt
      val probe = Bench.calibrate(25000000)
      // pair-work audit: within-cell candidate volume of the verify join
      val cells = graft.queries.Pipeline.semDedupAt(spark, dir, k)
        .groupBy("cell").agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("cells"),
          sum(expr("n * (n - 1) DIV 2")).as("pairs"),
          max("n").as("max_cell"), sum("n").as("n_vecs"))
        .collect()(0)
      spark.catalog.clearCache()
      // timed run: the full dedup under the noop sink, like Bench
      val t0 = System.nanoTime()
      graft.queries.Pipeline.semDedupAt(spark, dir, k)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      val line = s"""{"dir":"$dir","k":$k,"n_vecs":${cells.getLong(3)},""" +
        s""""cells":${cells.getLong(0)},"pairs":${cells.getLong(1)},""" +
        s""""max_cell":${cells.getLong(2)},"sec":$sec,"probe":$probe}"""
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
