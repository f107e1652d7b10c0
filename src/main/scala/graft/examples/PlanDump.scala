package graft.examples

/** Dump the full executed plan of one query (diagnostic). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local(4)
    s.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(1))(s, args(0))
    df.collect()
    println(df.queryExecution.executedPlan.toString)
    s.stop()
  }
}
