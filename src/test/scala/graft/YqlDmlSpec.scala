package graft

import graft.functions.{YqlScript, YqlSql}

/** Script DML (UPSERT/REPLACE/DELETE/UPDATE, SQLv1.g.in:579,968-969)
  * and script DDL (CREATE/DROP TABLE, :647,:833) over keyed
  * session-catalog tables — the YqlDml execution semantics. */
class YqlDmlSpec extends SparkSpec {

  import spark.implicits._

  private def drop(names: String*): Unit =
    names.foreach(n => graft.functions.YqlDml.dropTableDeep(spark, n))

  test("CREATE TABLE with PRIMARY KEY records key columns; DML round trip") {
    drop("dmlspec_t")
    val df = YqlSql.sql(spark,
      """CREATE TABLE dmlspec_t (k Int64, v Utf8, n Int64, PRIMARY KEY (k));
        |UPSERT INTO dmlspec_t (k, v, n) VALUES (1, 'a', 10), (2, 'b', 20), (3, 'c', 30);
        |UPSERT INTO dmlspec_t (k, v) VALUES (2, 'B'), (4, 'd');
        |SELECT k, v, n FROM dmlspec_t""".stripMargin)
    // k=2: v updated, n KEPT; k=4: new row, unlisted n is null
    assert(df.as[(Long, String, Option[Long])].collect().toSet == Set(
      (1L, "a", Some(10L)), (2L, "B", Some(20L)),
      (3L, "c", Some(30L)), (4L, "d", None)))
    assert(graft.functions.YqlDml.keyColumns(spark, "dmlspec_t") == Seq("k"))
    drop("dmlspec_t")
  }

  test("REPLACE nulls unlisted columns; UPSERT keeps them") {
    drop("dmlspec_r")
    val df = YqlSql.sql(spark,
      """CREATE TABLE dmlspec_r (k Int64, v Utf8, n Int64, PRIMARY KEY (k));
        |UPSERT INTO dmlspec_r VALUES (1, 'a', 10), (2, 'b', 20);
        |REPLACE INTO dmlspec_r (k, v) VALUES (1, 'A'), (9, 'z');
        |SELECT k, v, n FROM dmlspec_r""".stripMargin)
    assert(df.as[(Long, String, Option[Long])].collect().toSet == Set(
      (1L, "A", None), (2L, "b", Some(20L)), (9L, "z", None)))
    drop("dmlspec_r")
  }

  test("DELETE WHERE / DELETE ON / bare DELETE") {
    drop("dmlspec_d")
    val df = YqlSql.sql(spark,
      """CREATE TABLE dmlspec_d (k Int64, v Int64, PRIMARY KEY (k));
        |UPSERT INTO dmlspec_d VALUES (1, 1), (2, 2), (3, 3), (4, 4), (5, 5);
        |DELETE FROM dmlspec_d WHERE v % 2 = 0;
        |DELETE FROM dmlspec_d ON SELECT CAST(5 AS BIGINT) AS k;
        |SELECT k FROM dmlspec_d""".stripMargin)
    assert(df.as[Long].collect().toSet == Set(1L, 3L))
    YqlSql.sql(spark, "DELETE FROM dmlspec_d; SELECT 1 AS one")
    assert(spark.table("dmlspec_d").isEmpty)
    drop("dmlspec_d")
  }

  test("UPDATE SET reads the OLD row (simultaneous assignment); WHERE gates") {
    drop("dmlspec_u")
    val df = YqlSql.sql(spark,
      """CREATE TABLE dmlspec_u (k Int64, a Int64, b Int64, PRIMARY KEY (k));
        |UPSERT INTO dmlspec_u VALUES (1, 10, 100), (2, 20, 200);
        |UPDATE dmlspec_u SET a = b, b = a WHERE k = 1;
        |SELECT k, a, b FROM dmlspec_u""".stripMargin)
    assert(df.as[(Long, Long, Long)].collect().toSet == Set(
      (1L, 100L, 10L), (2L, 20L, 200L)))
    drop("dmlspec_u")
  }

  test("UPDATE ... ON updates matching keys only, never inserts") {
    drop("dmlspec_uo")
    val df = YqlSql.sql(spark,
      """CREATE TABLE dmlspec_uo (k Int64, v Utf8, PRIMARY KEY (k));
        |UPSERT INTO dmlspec_uo VALUES (1, 'a'), (2, 'b');
        |UPDATE dmlspec_uo ON (SELECT CAST(2 AS BIGINT) AS k, 'B' AS v
        |                      UNION ALL
        |                      SELECT CAST(7 AS BIGINT) AS k, 'x' AS v);
        |SELECT k, v FROM dmlspec_uo""".stripMargin)
    assert(df.as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "B")))
    drop("dmlspec_uo")
  }

  test("DML on a non-keyed table raises; key columns are immutable") {
    drop("dmlspec_nk")
    spark.sql("CREATE TABLE dmlspec_nk (k BIGINT, v STRING) USING parquet")
    val e1 = intercept[IllegalArgumentException] {
      YqlSql.sql(spark, "UPDATE dmlspec_nk SET v = 'x' WHERE k = 1; SELECT 1 AS one")
    }
    assert(e1.getMessage.contains("keyed"))
    intercept[IllegalArgumentException] {
      YqlSql.sql(spark, "UPSERT INTO dmlspec_nk VALUES (1, 'a'); SELECT 1 AS one")
    }
    intercept[IllegalArgumentException] {
      YqlSql.sql(spark, "DELETE FROM dmlspec_nk WHERE k = 1; SELECT 1 AS one")
    }
    drop("dmlspec_nk")

    drop("dmlspec_k")
    val e2 = intercept[IllegalArgumentException] {
      YqlSql.sql(spark,
        """CREATE TABLE dmlspec_k (k Int64, v Utf8, PRIMARY KEY (k));
          |UPSERT INTO dmlspec_k VALUES (1, 'a');
          |UPDATE dmlspec_k SET k = 9;
          |SELECT 1 AS one""".stripMargin)
    }
    assert(e2.getMessage.contains("key columns"))
    // UPSERT source missing a key column
    intercept[IllegalArgumentException] {
      YqlSql.sql(spark, "UPSERT INTO dmlspec_k (v) SELECT 'q'; SELECT 1 AS one")
    }
    // DELETE ON source with a non-key column
    intercept[IllegalArgumentException] {
      YqlSql.sql(spark,
        "DELETE FROM dmlspec_k ON SELECT CAST(1 AS BIGINT) AS k, 'a' AS v; SELECT 1 AS one")
    }
    drop("dmlspec_k")
  }

  test("CTAS + DROP TABLE in-script; $bindings substitute in DML sources") {
    drop("dmlspec_c", "dmlspec_c2")
    val df = YqlSql.sql(spark,
      """$lim = 3;
        |CREATE TABLE dmlspec_c AS
        |  SELECT id AS k, id * 10 AS v FROM range(10) WHERE id < $lim;
        |CREATE TABLE IF NOT EXISTS dmlspec_c AS SELECT 99 AS k, 0 AS v;
        |SELECT k, v FROM dmlspec_c""".stripMargin)
    // IF NOT EXISTS: the second CTAS is a no-op
    assert(df.as[(Long, Long)].collect().toSet ==
      Set((0L, 0L), (1L, 10L), (2L, 20L)))
    YqlSql.sql(spark, "DROP TABLE dmlspec_c; SELECT 1 AS one")
    assert(!spark.catalog.tableExists("dmlspec_c"))
    YqlSql.sql(spark, "DROP TABLE IF EXISTS dmlspec_c; SELECT 1 AS one")
    intercept[Exception] {
      YqlSql.sql(spark, "DROP TABLE dmlspec_c; SELECT 1 AS one")
    }
  }

  test("UPSERT with duplicate source keys collapses to one row per key") {
    drop("dmlspec_dup")
    val df = YqlSql.sql(spark,
      """CREATE TABLE dmlspec_dup (k Int64, v Int64, PRIMARY KEY (k));
        |UPSERT INTO dmlspec_dup SELECT CAST(1 AS BIGINT) AS k, CAST(id AS BIGINT) AS v FROM range(5);
        |SELECT CAST(COUNT(k) AS BIGINT) AS n FROM dmlspec_dup""".stripMargin)
    assert(df.as[Long].head() == 1L)
    drop("dmlspec_dup")
  }

  test("parse shapes: malformed DML raises with a clear message") {
    intercept[IllegalArgumentException](
      YqlScript.lower("UPSERT INTO t SET x = 1"))
    intercept[IllegalArgumentException](
      YqlScript.lower("DELETE FROM t HAVING x = 1"))
    intercept[IllegalArgumentException](
      YqlScript.lower("UPDATE t WHERE x = 1"))
    intercept[IllegalArgumentException](
      YqlScript.lower("UPDATE t SET WHERE x = 1"))
    intercept[IllegalArgumentException](
      YqlScript.lower("CREATE TABLE t"))
    intercept[IllegalArgumentException](
      YqlScript.lower("CREATE TABLE t (PRIMARY KEY ())"))
    intercept[IllegalArgumentException](
      YqlScript.lower("DROP TABLE t CASCADE EXTRA"))
    // UPSERT INTO a table named `result` is a write, not INTO RESULT
    assert(YqlScript.lower("UPSERT INTO result SELECT 1 AS k").stmts ==
      Seq(YqlScript.UpsertStmt("result", Nil, "SELECT 1 AS k",
        replace = false)))
  }

  // ——— RETURNING (SQLv1.g.in:577 returning_columns_list) ———

  test("RETURNING: upsert new image, delete old image, update new image") {
    drop("dmlspec_ret")
    // UPSERT RETURNING: written rows' new image (kept column rides along)
    val up = YqlSql.sql(spark,
      """CREATE TABLE dmlspec_ret (k Int64, v Utf8, n Int64, PRIMARY KEY (k));
        |UPSERT INTO dmlspec_ret VALUES (1, 'a', 10), (2, 'b', 20);
        |UPSERT INTO dmlspec_ret (k, v) VALUES (2, 'B'), (3, 'c') RETURNING k, v, n""".stripMargin)
    assert(up.as[(Long, String, Option[Long])].collect().toSet ==
      Set((2L, "B", Some(20L)), (3L, "c", None)))
    // DELETE RETURNING: the deleted rows (old image)
    val del = YqlSql.sql(spark,
      "DELETE FROM dmlspec_ret WHERE k <= 2 RETURNING *")
    assert(del.as[(Long, String, Option[Long])].collect().toSet ==
      Set((1L, "a", Some(10L)), (2L, "B", Some(20L))))
    assert(spark.table("dmlspec_ret").count() == 1)
    // UPDATE RETURNING: new image of the matched rows only
    val upd = YqlSql.sql(spark,
      "UPDATE dmlspec_ret SET v = 'z' WHERE k = 3 RETURNING v")
    assert(upd.columns.toSeq == Seq("v"))
    assert(upd.as[String].collect().toSeq == Seq("z"))
    // unknown RETURNING column raises
    intercept[IllegalArgumentException] {
      YqlSql.sql(spark,
        "DELETE FROM dmlspec_ret WHERE k = 3 RETURNING nope")
    }
    // INSERT RETURNING is rejected with a clear message
    val e = intercept[IllegalArgumentException] {
      YqlScript.lower("INSERT INTO t SELECT 1 AS k RETURNING k")
    }
    assert(e.getMessage.contains("RETURNING"))
    drop("dmlspec_ret")
  }

  test("INSERT OR ABORT/IGNORE conflict policies; BATCH modifier") {
    drop("dmlspec_io")
    val df = YqlSql.sql(spark,
      """CREATE TABLE dmlspec_io (k Int64, v Utf8, PRIMARY KEY (k));
        |INSERT OR IGNORE INTO dmlspec_io VALUES (1, 'a'), (2, 'b');
        |INSERT OR IGNORE INTO dmlspec_io VALUES (2, 'DUP'), (3, 'c') RETURNING k, v;
        |SELECT k, v FROM dmlspec_io""".stripMargin)
    // the conflicting key 2 was skipped, 3 inserted
    assert(df.as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    // ABORT: any existing key fails the statement, nothing written
    val e = intercept[IllegalArgumentException] {
      YqlSql.sql(spark,
        "INSERT OR ABORT INTO dmlspec_io VALUES (3, 'x'), (9, 'y'); SELECT 1 AS one")
    }
    assert(e.getMessage.contains("already exists"))
    assert(spark.table("dmlspec_io").count() == 3)
    // fresh keys pass ABORT
    YqlSql.sql(spark,
      "INSERT OR ABORT INTO dmlspec_io VALUES (9, 'y'); SELECT 1 AS one")
    assert(spark.table("dmlspec_io").count() == 4)
    // BATCH DELETE/UPDATE validate and drop the modifier
    YqlSql.sql(spark,
      "BATCH DELETE FROM dmlspec_io WHERE k = 9; SELECT 1 AS one")
    assert(spark.table("dmlspec_io").count() == 3)
    YqlSql.sql(spark,
      "BATCH UPDATE dmlspec_io SET v = 'Z' WHERE k = 1; SELECT 1 AS one")
    assert(spark.table("dmlspec_io").filter("k = 1").select("v")
      .as[String].head() == "Z")
    intercept[IllegalArgumentException](
      YqlScript.lower("BATCH UPSERT INTO t SELECT 1 AS k"))
    // non-keyed target raises
    drop("dmlspec_io")
    spark.sql("CREATE TABLE dmlspec_io (k BIGINT) USING parquet")
    intercept[IllegalArgumentException] {
      YqlSql.sql(spark,
        "INSERT OR IGNORE INTO dmlspec_io VALUES (1); SELECT 1 AS one")
    }
    drop("dmlspec_io")
  }

  test("DELETE/UPDATE predicates may carry IN-subqueries over views") {
    drop("dmlspec_sq")
    Seq(1L, 3L).toDF("bad").createOrReplaceTempView("dmlspec_badkeys")
    val df = YqlSql.sql(spark,
      """CREATE TABLE dmlspec_sq (k Int64, v Int64, PRIMARY KEY (k));
        |UPSERT INTO dmlspec_sq VALUES (1, 10), (2, 20), (3, 30), (4, 40);
        |DELETE FROM dmlspec_sq WHERE k IN (SELECT bad FROM dmlspec_badkeys);
        |UPDATE dmlspec_sq SET v = v + 1
        |  WHERE k = (SELECT min(bad) + 1 FROM dmlspec_badkeys);
        |SELECT k, v FROM dmlspec_sq""".stripMargin)
    assert(df.as[(Long, Long)].collect().toSet == Set((2L, 21L), (4L, 40L)))
    drop("dmlspec_sq")
  }

  test("self-referencing sources read the pre-write image (staged swap)") {
    drop("dmlspec_self")
    val df = YqlSql.sql(spark,
      """CREATE TABLE dmlspec_self (k Int64, v Int64, PRIMARY KEY (k));
        |UPSERT INTO dmlspec_self VALUES (1, 10), (2, 20);
        |UPSERT INTO dmlspec_self SELECT k, v + 1 AS v FROM dmlspec_self;
        |SELECT k, v FROM dmlspec_self""".stripMargin)
    assert(df.as[(Long, Long)].collect().toSet == Set((1L, 11L), (2L, 21L)))
    // and with RETURNING: the snapshot is of the pre-swap merge, so a
    // self-referencing source cannot observe its own write
    val ret = YqlSql.sql(spark,
      "UPSERT INTO dmlspec_self SELECT k + 10 AS k, v FROM dmlspec_self RETURNING k, v")
    assert(ret.as[(Long, Long)].collect().toSet == Set((11L, 11L), (12L, 21L)))
    assert(spark.table("dmlspec_self").count() == 4)
    drop("dmlspec_self")
  }

  test("ADD INDEX backfills; DML maintains; unique conflicts abort pre-swap") {
    drop("dmlspec_ix")
    val df = YqlSql.sql(spark,
      """CREATE TABLE dmlspec_ix (k Int64, v Int64, PRIMARY KEY (k));
        |UPSERT INTO dmlspec_ix VALUES (1, 10), (2, 20);
        |ALTER TABLE dmlspec_ix ADD INDEX by_v GLOBAL ON (v);
        |UPSERT INTO dmlspec_ix VALUES (3, 30);
        |SELECT v, k FROM dmlspec_ix__idx_by_v""".stripMargin)
    // backfill covered (1, 2); sync maintenance covered (3)
    assert(df.as[(Long, Long)].collect().toSet ==
      Set((10L, 1L), (20L, 2L), (30L, 3L)))
    YqlSql.sql(spark, "DELETE FROM dmlspec_ix WHERE k = 1; SELECT 1 AS one")
    assert(spark.table("dmlspec_ix__idx_by_v").count() == 2)
    // unique index: a conflicting write fails BEFORE the table swap
    YqlSql.sql(spark,
      "ALTER TABLE dmlspec_ix ADD INDEX uv GLOBAL UNIQUE ON (v); SELECT 1 AS one")
    intercept[Exception] {
      YqlSql.sql(spark,
        "UPSERT INTO dmlspec_ix VALUES (9, 20); SELECT 1 AS one")
    }
    assert(spark.table("dmlspec_ix").count() == 2,
      "failed statement must leave the table untouched")
    // duplicate index name / unknown column / unknown index raise
    intercept[IllegalArgumentException] {
      YqlSql.sql(spark,
        "ALTER TABLE dmlspec_ix ADD INDEX uv GLOBAL ON (v); SELECT 1 AS one")
    }
    intercept[IllegalArgumentException] {
      YqlSql.sql(spark,
        "ALTER TABLE dmlspec_ix ADD INDEX zz GLOBAL ON (nope); SELECT 1 AS one")
    }
    intercept[IllegalArgumentException] {
      YqlSql.sql(spark, "ALTER TABLE dmlspec_ix DROP INDEX nope; SELECT 1 AS one")
    }
    // DROP INDEX unregisters + drops its table; DROP TABLE takes the rest
    YqlSql.sql(spark, "ALTER TABLE dmlspec_ix DROP INDEX uv; SELECT 1 AS one")
    assert(!spark.catalog.tableExists("dmlspec_ix__idx_uv"))
    drop("dmlspec_ix")
    assert(!spark.catalog.tableExists("dmlspec_ix__idx_by_v"))
  }

  test("FROM t VIEW idx reads the index table; unknown index raises") {
    drop("dmlspec_vw")
    val df = YqlSql.sql(spark,
      """CREATE TABLE dmlspec_vw (k Int64, v Int64, PRIMARY KEY (k));
        |UPSERT INTO dmlspec_vw VALUES (1, 30), (2, 10), (3, 20);
        |ALTER TABLE dmlspec_vw ADD INDEX by_v GLOBAL ON (v);
        |SELECT v, k FROM dmlspec_vw VIEW by_v WHERE v >= 20""".stripMargin)
    assert(df.as[(Long, Long)].collect().toSet == Set((30L, 1L), (20L, 3L)))
    val e = intercept[IllegalArgumentException] {
      YqlSql.sql(spark, "SELECT v FROM dmlspec_vw VIEW nope")
    }
    assert(e.getMessage.contains("no index"))
    // a string literal containing the words never triggers the rewrite
    assert(YqlSql.sql(spark, "SELECT 'FROM t VIEW x' AS s").as[String]
      .head() == "FROM t VIEW x")
    drop("dmlspec_vw")
  }

  test("statement rendering round-trips the parsed pieces") {
    val l = YqlScript.lower(
      """UPSERT INTO t (k, v) SELECT 1, 2;
        |DELETE FROM t WHERE k = 1;
        |UPDATE t SET v = 3 WHERE k = 2;
        |SELECT 1 AS one""".stripMargin)
    assert(l.stmts.map(_.sql) == Seq(
      "UPSERT INTO t (k, v) SELECT 1, 2",
      "DELETE FROM t WHERE k = 1",
      "UPDATE t SET v = 3 WHERE k = 2",
      "SELECT 1 AS one"))
  }
}
