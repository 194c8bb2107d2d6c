package graft

/** Plan inspection tool: print the formatted physical plan (and
  * optionally the adaptive final plan after execution) of any
  * SparkEntry query. Usage:
  *
  *   runMain graft.Explain <sfDir> <query>[,<query>...] [--run]
  *
  * `--run` executes the query first so AQE's final plan (actual join
  * strategies, coalesced partitions, runtime row counts) is shown
  * instead of the static estimate.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val run = args.contains("--run")
    val spark = GraftSession.get()
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"===== $name =====")
      if (run) {
        df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
      }
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
