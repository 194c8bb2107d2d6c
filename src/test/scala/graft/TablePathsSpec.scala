package graft

import graft.functions.{YqlSql, YqlTablePaths}

/** Table-path functions in FROM (SQLv1.g.in:952; yql_yt_key.cpp
  * MrTableRange/MrFolder discovery): RANGE/EACH/CONCAT/FOLDER/LIKE/
  * REGEXP over a directory of parquet tables, with STRUCTURAL pruning
  * — out-of-range members never enter the plan. */
class TablePathsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_tp").toFile
    Seq("2024-01-01" -> 1, "2024-01-02" -> 2, "2024-01-03" -> 3,
      "2024-02-01" -> 4).foreach { case (name, base) =>
      Seq((base.toLong, s"d$base")).toDF("k", "v")
        .write.mode("overwrite").parquet(s"${d.getAbsolutePath}/$name")
    }
    d.getAbsolutePath
  }

  test("RANGE unions name-bounded members; out-of-range never scanned") {
    val df = YqlSql.sql(spark,
      s"SELECT k, v FROM RANGE('$dir', '2024-01-02', '2024-02-01') ORDER BY k")
    assert(df.as[(Long, String)].collect().toSeq ==
      Seq((2L, "d2"), (3L, "d3"), (4L, "d4")))
    // structural pruning: the 2024-01-01 member is absent from the scan
    val files = df.inputFiles.toSeq
    assert(files.nonEmpty)
    assert(!files.exists(_.contains("2024-01-01")),
      s"out-of-range member scanned: $files")
    // and it is ONE scan (a path glob), not an N-way union
    val scans = df.queryExecution.executedPlan.collectLeaves()
    assert(scans.length == 1, s"expected one scan node, got ${scans.length}")
  }

  test("RANGE with one bound / no bounds; empty range is an empty table") {
    assert(YqlSql.sql(spark, s"SELECT k FROM RANGE('$dir', '2024-02-01')")
      .as[Long].collect().toSeq == Seq(4L))
    assert(YqlSql.sql(spark, s"SELECT k FROM RANGE('$dir')")
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    val empty = YqlSql.sql(spark, s"SELECT k FROM RANGE('$dir', '2030', '2031')")
    assert(empty.isEmpty)
    assert(empty.columns.toSeq == Seq("k")) // schema survives
  }

  test("CONCAT and EACH union the named tables") {
    val df = YqlSql.sql(spark,
      s"""$$paths = ['$dir/2024-01-01', '$dir/2024-02-01'];
         |SELECT
         |  (SELECT CAST(SUM(k) AS BIGINT) FROM CONCAT('$dir/2024-01-01', '$dir/2024-01-02')) AS a,
         |  (SELECT CAST(SUM(k) AS BIGINT) FROM EACH($$paths)) AS b""".stripMargin)
    assert(df.as[(Long, Long)].head() == ((3L, 5L)))
  }

  test("LIKE and REGEXP filter members by name") {
    assert(YqlSql.sql(spark,
      s"SELECT CAST(SUM(k) AS BIGINT) AS s FROM LIKE('$dir', '2024-01-%')")
      .as[Long].head() == 6L)
    assert(YqlSql.sql(spark,
      s"SELECT CAST(SUM(k) AS BIGINT) AS s FROM REGEXP('$dir', '-0[23]$$')")
      .as[Long].head() == 5L)
  }

  test("FOLDER lists the directory as (Path, Type)") {
    val rows = YqlSql.sql(spark,
      s"SELECT Path, Type FROM FOLDER('$dir') ORDER BY Path")
      .as[(String, String)].collect().toSeq
    assert(rows.map(_._2).forall(_ == "table"))
    assert(rows.map(_._1) == Seq("2024-01-01", "2024-01-02", "2024-01-03",
      "2024-02-01").map(n => s"$dir/$n"))
  }

  test("TablePath()/TableName() carry per-row provenance through RANGE") {
    val rows = YqlSql.sql(spark,
      s"""SELECT TableName() AS t, TablePath() AS p, CAST(SUM(k) AS BIGINT) AS s
         |FROM RANGE('$dir', '2024-01-01', '2024-01-02')
         |GROUP BY TableName(), TablePath() ORDER BY t""".stripMargin)
      .as[(String, String, Long)].collect().toSeq
    assert(rows == Seq(
      ("2024-01-01", s"$dir/2024-01-01", 1L),
      ("2024-01-02", s"$dir/2024-01-02", 2L)))
    // without the pseudo-functions the plan stays ONE glob scan;
    // with them it becomes a per-member union (the provenance price)
    val plain = YqlSql.sql(spark,
      s"SELECT k FROM RANGE('$dir', '2024-01-01', '2024-01-02')")
    assert(plain.queryExecution.executedPlan.collectLeaves().length == 1)
    // TableName() over EACH uses the logical (extension-less) name
    val e = YqlSql.sql(spark,
      s"SELECT TableName() AS t FROM EACH(['$dir/2024-02-01']) GROUP BY 1")
      .as[String].head()
    assert(e == "2024-02-01")
  }

  test("filters push down into the glob scan; TableName() fans out per member") {
    val df = YqlSql.sql(spark,
      s"SELECT k FROM RANGE('$dir', '2024-01-01', '2024-01-03') WHERE k >= 2")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("GreaterThanOrEqual"),
      s"filter not pushed to the multi-member scan: $scan")
    // provenance forces one scan per member (the literal-per-scan price)
    val prov = YqlSql.sql(spark,
      s"SELECT TableName() AS t, k FROM RANGE('$dir', '2024-01-01', '2024-01-03')")
    assert(prov.queryExecution.executedPlan.collectLeaves().length == 3)
  }

  test("AS_TABLE turns a literal struct list into a derived table") {
    val df = YqlSql.sql(spark,
      """$rows = AsList(
        |  AsStruct(1 AS id, 'a' AS tag),
        |  AsStruct(2 AS id, 'b' AS tag));
        |SELECT t.id, t.tag FROM AS_TABLE($rows) AS t
        |JOIN AS_TABLE([AsStruct(1 AS id)]) AS f ON t.id = f.id""".stripMargin)
    assert(df.as[(Int, String)].collect().toSeq == Seq((1, "a")))
    intercept[IllegalArgumentException] {
      YqlSql.sql(spark, "SELECT * FROM AS_TABLE(AsList())")
    }
    intercept[IllegalArgumentException] {
      YqlSql.sql(spark, "SELECT * FROM AS_TABLE(AsList(1, 2))")
    }
  }

  test("scalar CONCAT/LIKE spellings are untouched; errors are clear") {
    // string concat in a projection is NOT a table function
    assert(YqlSql.sql(spark, "SELECT CONCAT('a', 'b') AS x")
      .as[String].head() == "ab")
    // LIKE as an operator survives
    assert(YqlSql.sql(spark, "SELECT 'abc' LIKE 'a%' AS x").as[Boolean].head())
    intercept[IllegalArgumentException] {
      YqlTablePaths.rewrite("SELECT * FROM RANGE('/nonexistent_graft_dir')")
    }
    intercept[IllegalArgumentException] {
      YqlTablePaths.rewrite(s"SELECT * FROM CONCAT('$dir/nope')")
    }
    // non-constant args pass through to Spark (table-valued functions,
    // the builtin range(n)) — no rewrite, no error here
    assert(YqlTablePaths.rewrite("SELECT * FROM EACH(table_names)") ==
      "SELECT * FROM EACH(table_names)")
    assert(YqlTablePaths.rewrite("SELECT id FROM range(10)") ==
      "SELECT id FROM range(10)")
    assert(YqlSql.sql(spark, "SELECT CAST(COUNT(id) AS BIGINT) AS n FROM range(10)")
      .as[Long].head() == 10L)
    // quoted text never triggers a rewrite
    assert(YqlTablePaths.rewrite("SELECT 'FROM RANGE(x)' AS s") ==
      "SELECT 'FROM RANGE(x)' AS s")
  }

  test("relation caches invalidate when a cached path is rewritten") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("tcache").toString

    // Tables.load: the file-stamp check must pick up an overwrite
    spark.range(0, 5).toDF("id").write.mode("overwrite")
      .parquet(s"$dir/orders.parquet")
    assert(graft.sources.Tables.load(spark, dir, "orders").count() == 5)
    Thread.sleep(1100) // distinct mtime second even on coarse filesystems
    spark.range(0, 9).toDF("id").write.mode("overwrite")
      .parquet(s"$dir/orders.parquet")
    assert(graft.sources.Tables.load(spark, dir, "orders").count() == 9,
      "Tables.load served a stale file index after an overwrite")

    // table-path view cache: same contract through the SQL lowering
    val tp = s"$dir/members"
    spark.range(0, 3).toDF("v").write.parquet(s"$tp/a")
    def n(): Long = graft.functions.YqlSql.sql(spark,
      s"SELECT CAST(COUNT(*) AS BIGINT) AS n FROM CONCAT('$tp/a')")
      .head().getLong(0)
    assert(n() == 3)
    Thread.sleep(1100)
    spark.range(0, 7).toDF("v").write.mode("overwrite").parquet(s"$tp/a")
    assert(n() == 7, "table-path view served a stale member scan")
  }
}
