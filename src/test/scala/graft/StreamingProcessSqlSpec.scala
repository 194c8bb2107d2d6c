package graft

import graft.functions.YqlSql

/** The Streaming:: module's PROCESS USING string spellings
  * (streaming_udf.cpp TStreamingProcess / TStreamingProcessInline) —
  * delimiters, inline scripts, and raise paths beyond the
  * yql_sql_streaming_process oracle. */
class StreamingProcessSqlSpec extends SparkSpec {
  import spark.implicits._

  test("Process: custom output delimiter splits multi-record stdout") {
    Seq("a b", "c d").toDF("value").createOrReplaceTempView("psrc")
    // tr turns spaces into newlines: each input row fans out to two
    val got = YqlSql.sql(spark,
      "PROCESS psrc USING Streaming::Process(TableRows(), 'tr', " +
        "AsList(' ', '\\n'))").as[String].collect().sorted
    assert(got.toSeq == Seq("a", "b", "c", "d"))
  }

  test("ProcessInline: the script text runs from a temp file") {
    Seq("x", "y").toDF("value").createOrReplaceTempView("psrc")
    val got = YqlSql.sql(spark,
      "PROCESS psrc USING Streaming::ProcessInline(TableRows(), " +
        "'tr a-z A-Z')").as[String].collect().sorted
    assert(got.toSeq == Seq("X", "Y"))
  }

  test("raises: non-TableRows stream, multi-column source") {
    Seq("x").toDF("value").createOrReplaceTempView("psrc")
    intercept[Exception] {
      YqlSql.sql(spark,
        "PROCESS psrc USING Streaming::Process(value, 'cat')")
    }
    spark.range(3).selectExpr("id", "CAST(id AS STRING) AS s")
      .createOrReplaceTempView("ptwo")
    val e = intercept[Exception] {
      YqlSql.sql(spark,
        "PROCESS ptwo USING Streaming::Process(TableRows(), 'cat')")
    }
    assert(e.getMessage.contains("single string column"))
  }
}
