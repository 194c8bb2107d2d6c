package graft.tools

/** Scratch main: print YqlSql.rewrite of argv cases with a watchdog —
  * used to corner infinite-rewrite regressions without a Spark session. */
object RewriteDebug {
  def main(args: Array[String]): Unit = {
    val cases =
      if (args.nonEmpty) args.toSeq
      else Seq(
        "SELECT StaticMap(<|a: 1, b: 2|>, ($item) -> ($item * 10)) AS m",
        "SELECT StaticZip((<|k1: 1, k2: 2.0e0|>), (<|k1: 3.0e0, k2: 4|>)) AS z",
        "SELECT StaticMap(X, ($tuple) -> ($tuple.0 + $tuple.1)) AS sum",
        "SELECT StaticMap(AsTuple(1, 2), ($item) -> {\n    RETURN CAST($item AS String); }) AS t")
    for (c <- cases) {
      println("IN : " + c.replace("\n", "\\n"))
      val t = new Thread(() =>
        try println("OUT: " +
          graft.functions.YqlSql.rewrite(c).replace("\n", "\\n"))
        catch { case e: Throwable => println("ERR: " + e) })
      t.setDaemon(true); t.start(); t.join(5000)
      if (t.isAlive) println("OUT: TIMEOUT (loop)")
    }
  }
}
