package graft.tools

/** Ad-hoc A/B timer for single queries: `runMain graft.tools.TimeQuery
  * <sfDir> <query> [reps] [--bare]` — `--bare` runs WITHOUT the
  * engine's optimizer extensions (rule-off baseline for rewrite A/Bs).
  * Prints per-rep seconds + median; same session posture as Bench.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val reps = args.lift(2).filterNot(_.startsWith("--")).map(_.toInt)
      .getOrElse(3)
    val bare = args.contains("--bare")
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val session = if (bare) spark.newSession() else spark
    graft.GraftSession.tuneShuffleFor(session, dir)
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(session, dir)
      val n = df.count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[time] $name%s rows=$n%d ${s}%.3f s")
      s
    }
    println(f"[time] $name median=${times.sorted.apply(reps / 2)}%.3f s " +
      s"(bare=$bare)")
    spark.stop()
  }
}
