package graft

import graft.functions.YqlSql

/** The Compress::/Decompress::/TryDecompress:: and Stat:: module
  * spellings (compress_udf.cpp module triple; stat_udf.h) — raise
  * paths and edge semantics the yql_fn_compress_module /
  * yql_fn_stat_module oracles don't pin. */
class CompressStatModuleSpec extends SparkSpec {

  private def one(sql: String): org.apache.spark.sql.Row =
    YqlSql.sql(spark, sql).collect().head

  test("unbound codecs raise naming the codec") {
    for (call <- Seq("Compress::Brotli('x', 5)", "Decompress::Lzma('x')",
        "TryDecompress::BZip2('x')", "Decompress::Xz('x')")) {
      val e = intercept[Exception] {
        YqlSql.sql(spark, s"SELECT $call AS v").collect()
      }
      val codec = call.split("::")(1).split("\\(")(0).toLowerCase
      assert(e.getMessage.toLowerCase.contains(codec),
        s"raise for $call must name the codec: ${e.getMessage}")
    }
  }

  test("codec arity is checked at analysis") {
    // level is REQUIRED for gzip/zlib/zstd (the reference's ui8 arg)
    val e = intercept[Exception] {
      YqlSql.sql(spark, "SELECT Compress::Gzip('x') AS v").collect()
    }
    assert(e.getMessage.contains("2 argument"))
    // snappy takes no level
    intercept[Exception] {
      YqlSql.sql(spark, "SELECT Compress::Snappy('x', 5) AS v").collect()
    }
  }

  test("decompress of garbage: plain raises, Try returns NULL") {
    intercept[Exception] {
      YqlSql.sql(spark,
        "SELECT Decompress::Gzip(CAST('junk' AS BINARY)) AS v").collect()
    }
    val r = one(
      "SELECT TryDecompress::Zlib(CAST('junk' AS BINARY)) AS v")
    assert(r.isNullAt(0))
  }

  test("roundtrip through all four bound codecs at level extremes") {
    val r = one(
      """SELECT
        |  CAST(Decompress::Gzip(Compress::Gzip('payload', 1)) AS STRING) AS a,
        |  CAST(Decompress::Zlib(Compress::Zlib('payload', 9)) AS STRING) AS b,
        |  CAST(Decompress::Zstd(Compress::Zstd('payload', 19)) AS STRING) AS c,
        |  CAST(Decompress::Snappy(Compress::Snappy('')) AS STRING) AS d
        |""".stripMargin)
    assert(r.getString(0) == "payload")
    assert(r.getString(1) == "payload")
    assert(r.getString(2) == "payload")
    assert(r.getString(3) == "")
  }

  test("Stat::TDigest delta/k parameters must be literals") {
    spark.range(10).selectExpr("CAST(id AS DOUBLE) AS x")
      .createOrReplaceTempView("tdx")
    val e = intercept[Exception] {
      YqlSql.sql(spark,
        "SELECT Stat::TDigest(x, x) AS s FROM tdx").collect()
    }
    assert(e.getMessage.contains("constant"))
    // explicit literal delta/k accepted
    val ok = YqlSql.sql(spark,
      """SELECT Stat::TDigest_GetPercentile(
        |  Stat::TDigest(x, 0.01, 25.0), 0.5) AS p FROM tdx""".stripMargin)
      .collect().head.getDouble(0)
    assert(ok >= 0.0 && ok <= 9.0)
  }

  test("Json2::/DateTime2:: module-name aliases resolve") {
    val r = one(
      """SELECT Json2::Value('{"k": 7}', '$.k') AS v,
        |  DateTime2::GetYear(TIMESTAMP '2024-03-05 10:00:00') AS y
        |""".stripMargin)
    assert(r.getString(0) == "7")
    assert(r.get(1).toString == "2024")
  }
}
