package graft

import org.apache.spark.sql.SparkSession

/** Plan-shape audit artifact: the per-query numbers behind the
  * "would this survive 100×" judgement, extracted from every registry
  * query's physical plan in one run.  PlanAuditSpec asserts the CLASS
  * invariants (no cartesians, no partition-less or low-cardinality
  * keyed windows, broadcasts for dims, group limits under autoRewrite)
  * and fails the build on regressions; this main makes the underlying
  * shape counts a per-round ARTIFACT so cross-round drift is diffable
  * — a new hash exchange or a lost broadcast shows up as a number
  * moving, without anyone re-reading 99 explain dumps.
  *
  * Per query (plan built against the given sf dir, never executed —
  * except queries whose CONSTRUCTION runs a bounded driver step, e.g.
  * q_median_group's |flags|-row totals):
  *   - exchange_hash / exchange_range / exchange_single: shuffle
  *     count by partitioning kind (single = the scale smell;
  *     presentation coalesce excepted);
  *   - broadcast / reused: BroadcastExchange and ReusedExchange nodes
  *     (reuse = a shared shuffle paying once);
  *   - smj / bhj / shj / bnlj / cartesian: join strategy mix;
  *   - window / ranked / local_topk / group_limit: corpus-frame
  *     window nodes vs their distributed replacements (the window
  *     CLASS gates — partition-less, low-card keyed — are asserted in
  *     PlanAuditSpec; the counts here include the sanctioned bounded
  *     frames, e.g. probe-set top-k under WindowGroupLimit);
  *   - scans / pushed: parquet scans and how many carry pushed
  *     filters.
  *
  * Usage: SPARK_GRAFT_CPUS=N [SPARK_GRAFT_BENCH_OUT=file] \
  *          runMain graft.PlanAudit <sfDir> [query ...]
  * Prints one JSON line (and writes it to SPARK_GRAFT_BENCH_OUT).
  */
object PlanAudit {

  final case class Shape(
      exchangeHash: Int, exchangeRange: Int, exchangeSingle: Int,
      broadcast: Int, reused: Int,
      smj: Int, bhj: Int, shj: Int, bnlj: Int, cartesian: Int,
      window: Int, ranked: Int, localTopK: Int, groupLimit: Int,
      scans: Int, pushed: Int)

  def shapeOf(plan: String): Shape = {
    def n(re: String): Int = re.r.findAllMatchIn(plan).length
    Shape(
      exchangeHash = n("Exchange hashpartitioning"),
      exchangeRange = n("Exchange rangepartitioning"),
      exchangeSingle = n("Exchange SinglePartition"),
      broadcast = n("BroadcastExchange"),
      reused = n("ReusedExchange"),
      smj = n("SortMergeJoin"),
      bhj = n("BroadcastHashJoin"),
      shj = n("ShuffledHashJoin"),
      bnlj = n("BroadcastNestedLoopJoin"),
      cartesian = n("CartesianProduct"),
      window = n("\\bWindow "),
      ranked = n("RankedPrefixSum"),
      localTopK = n("RankedLocalTopK"),
      groupLimit = n("WindowGroupLimit"),
      scans = n("FileScan parquet|BatchScan"),
      pushed = n("PushedFilters: \\[[^\\]]"))
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanAudit <sfDir> [query ...]")
    val sfDir = args(0)
    val only = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the two all-pairs baselines guard-throw by corpus size, not at
    // plan time, and their cartesian is the documented intent
    val guarded = Set("q_ann_bruteforce", "q_dedup_embedding")

    val rows = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .flatMap { case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
          Some(name -> shapeOf(plan))
        } catch {
          case e: Throwable =>
            System.err.println(s"[planaudit] $name failed: ${e.getMessage}")
            None
        }
      }

    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString
    }
    val perQuery = rows.map { case (name, s) =>
      s""""${esc(name)}":{"xh":${s.exchangeHash},"xr":${s.exchangeRange},""" +
        s""""x1":${s.exchangeSingle},"bc":${s.broadcast},"reuse":${s.reused},""" +
        s""""smj":${s.smj},"bhj":${s.bhj},"shj":${s.shj},"bnlj":${s.bnlj},""" +
        s""""cart":${s.cartesian},"win":${s.window},"ranked":${s.ranked},""" +
        s""""topk":${s.localTopK},"wgl":${s.groupLimit},""" +
        s""""scans":${s.scans},"pushed":${s.pushed}}"""
    }.mkString(",")

    val shapes = rows.map(_._2)
    val offendersCart = rows.collect {
      case (n, s) if s.cartesian > 0 && !guarded(n) => n }
    val offendersWin = rows.collect { case (n, s) if s.window > 0 => n }
    val summary =
      s""""queries":${rows.size},""" +
      s""""total_shuffles":${shapes.map(s => s.exchangeHash + s.exchangeRange + s.exchangeSingle).sum},""" +
      s""""total_broadcasts":${shapes.map(_.broadcast).sum},""" +
      s""""total_windows":${shapes.map(_.window).sum},""" +
      s""""window_queries":[${offendersWin.map(n => s""""${esc(n)}"""").mkString(",")}],""" +
      s""""unguarded_cartesians":[${offendersCart.map(n => s""""${esc(n)}"""").mkString(",")}]"""

    val line = s"""{"metric":"plan_shapes","sf":"${esc(sfDir)}",$summary,"per_query":{$perQuery}}"""
    println(line)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { f =>
      java.nio.file.Files.write(java.nio.file.Paths.get(f),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
