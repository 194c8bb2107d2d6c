package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Seed-sweep harness for the differential fuzz domains: renders every
  * fuzz family at MANY fresh seeds (the shipped `ql_fuzz_*` /
  * `yql_fuzz_*` queries pin one seed each), runs the engine side, and
  * dumps the same outdir layout `tools/check.py` consumes — so one
  * DuckDB pass value-compares hundreds of randomized cases. A
  * divergence here is a real lowering/semantics bug caught before it
  * ships. Usage: runMain graft.tools.FuzzSweep SFDIR OUTDIR SEED_LO SEED_HI
  */
object FuzzSweep {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val seedLo = args.lift(2).map(_.toLong).getOrElse(100L)
    val seedHi = args.lift(3).map(_.toLong).getOrElse(110L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()

    val fw = graft.sources.Tables.load(spark, sfDir, "orders").select(
      col("o_orderkey").as("a"),
      (col("o_custkey") % 7).as("k"),
      (col("o_custkey") % 997).as("v"))
    fw.createOrReplaceTempView("fw")
    val fwCte = """WITH fw AS (SELECT o_orderkey AS a, o_custkey % 7 AS k,
      |  o_custkey % 997 AS v FROM orders)""".stripMargin

    val queries = scala.collection.mutable.LinkedHashMap
      .empty[String, (() => org.apache.spark.sql.DataFrame, String)]

    for (seed <- seedLo to seedHi) {
      queries(s"fz_win_$seed") = (() => {
        val cols = graft.ql.ExprFuzz.windowCases(10, seed)
          .zipWithIndex.map { case (w, i) => s"$w AS w$i" }.mkString(", ")
        spark.sql(s"SELECT a, $cols FROM fw")
      }, {
        val cols = graft.ql.ExprFuzz.windowCases(10, seed)
          .zipWithIndex.map { case (w, i) => s"$w AS w$i" }.mkString(", ")
        s"$fwCte\nSELECT a, $cols FROM fw"
      })
      queries(s"fz_set_$seed") = (() => {
        graft.ql.ExprFuzz.setOpCases(8, seed).map(spark.sql)
          .reduce(_ unionByName _)
      }, fwCte + "\n" +
        graft.ql.ExprFuzz.setOpCases(8, seed).mkString("\nUNION ALL\n"))
      queries(s"fz_script_$seed") = (() => {
        graft.ql.ExprFuzz.scriptCases(8, seed)
          .map { case (sc, _) => graft.functions.YqlSql.sql(spark, sc) }
          .reduce(_ unionByName _)
      }, fwCte + "\n" +
        graft.ql.ExprFuzz.scriptCases(8, seed).map(_._2).mkString("\nUNION ALL\n"))
    }

    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      queries.map { case (k, (_, sql)) => s"${q(k)}: ${q(sql)}" }
        .mkString("{", ",", "}"))
    Files.writeString(Paths.get(s"$outDir/queries.json"),
      queries.keys.map(q).mkString("[", ",", "]"))
    queries.foreach { case (name, (fn, _)) =>
      try fn().coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[fuzzsweep] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
