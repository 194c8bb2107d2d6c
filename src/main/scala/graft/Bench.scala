package graft
import graft.sources.Tables

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line for the driver.
  *
  * Evaluation is forced by draining `queryExecution.toRdd` on the executors:
  * unlike `.count()`, this adds no aggregate on top of the plan, so Catalyst
  * cannot column-prune the projections away — projection-only queries are
  * timed as their expressions, not as scan+count. Works for any output type
  * (maps/arrays included, which a hash-agg forcer would reject). Nothing is
  * collected to the driver.
  *
  * A query that throws aborts the bench with the query name: a broken query
  * must fail the round, not bench as ~0s.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    // Warm the session: parquet footers, filesystem metadata, codegen
    // infrastructure — so the first timed query isn't charged for
    // JVM/session cold start.
    Tables.all.foreach { t =>
      try Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => }
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreachPartition { it =>
        while (it.hasNext) it.next()
      }
    // steady-state timing: best of two runs per query (first run also
    // pays plan compilation; the driver wants operator throughput)
    def once(name: String,
             fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try force(fn(spark, sfDir))
      catch {
        case e: Throwable =>
          System.err.println(s"BENCH FAILURE in $name: ${e}")
          throw e
      }
      (System.nanoTime() - t0) / 1e9
    }
    // SPARK_GRAFT_BENCH_ONLY=q1,q2 restricts the run (local iteration);
    // unset = the full driver sweep.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }
    val results = selected.map { case (name, fn) =>
      // settle the heap between operators: without this, a
      // garbage-heavy query taxes its successors' timings and the
      // per-operator numbers measure GC debt, not the operator
      System.gc()
      name -> math.min(once(name, fn), once(name, fn))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
