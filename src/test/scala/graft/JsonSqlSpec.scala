package graft

import graft.functions.YqlSql

/** SQL-standard JSON accessor clause forms (builtins/json.md) — edge
  * and raise paths beyond the yql_sql_json_accessors oracle. */
class JsonSqlSpec extends SparkSpec {

  private def one(sql: String) =
    YqlSql.sql(spark, sql).collect().head

  test("RETURNING casts, lax prefix accepted, DEFAULT fires on empty") {
    spark.sql("SELECT '{\"a\": 7, \"s\": \"x\"}' AS j")
      .createOrReplaceTempView("jt")
    val r = one(
      """SELECT
        |  JSON_VALUE(j, 'lax $.a' RETURNING Int64) AS a,
        |  JSON_VALUE(j, '$.s') AS s,
        |  JSON_VALUE(j, '$.nope' RETURNING Double DEFAULT 2.5 ON EMPTY)
        |    AS d,
        |  JSON_EXISTS(j, '$.a' TRUE ON ERROR) AS e
        |FROM jt""".stripMargin)
    assert(r.getLong(0) == 7L)
    assert(r.getString(1) == "x")
    assert(r.getDouble(2) == 2.5)
    assert(r.getBoolean(3))
  }

  test("ERROR ON EMPTY raises on a missing path") {
    spark.sql("SELECT '{\"a\": 7}' AS j").createOrReplaceTempView("jt")
    val e = intercept[Exception] {
      YqlSql.sql(spark,
        "SELECT JSON_VALUE(j, '$.nope' ERROR ON EMPTY) AS v FROM jt")
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("empty"))
  }

  test("strict-mode paths raise naming the mode") {
    spark.sql("SELECT '{\"a\": 7}' AS j").createOrReplaceTempView("jt")
    val e = intercept[Exception] {
      YqlSql.sql(spark,
        "SELECT JSON_VALUE(j, 'strict $.a') AS v FROM jt").collect()
    }
    assert(e.getMessage.contains("strict"))
  }

  test("JSON_QUERY wrappers: conditional vs unconditional") {
    spark.sql("SELECT '{\"l\": [1,2], \"v\": 3}' AS j")
      .createOrReplaceTempView("jt")
    val r = one(
      """SELECT
        |  JSON_QUERY(j, '$.l' WITH CONDITIONAL ARRAY WRAPPER) AS c,
        |  JSON_QUERY(j, '$.v' WITH CONDITIONAL ARRAY WRAPPER) AS cv,
        |  JSON_QUERY(j, '$.v' WITH UNCONDITIONAL ARRAY WRAPPER) AS u,
        |  JSON_QUERY(j, '$.nope' EMPTY ARRAY ON EMPTY) AS ea
        |FROM jt""".stripMargin)
    assert(r.getString(0) == "[1,2]") // already an array: not rewrapped
    assert(r.getString(1) == "[3]")
    assert(r.getString(2) == "[3]")
    assert(r.getString(3) == "[]")
  }
}
