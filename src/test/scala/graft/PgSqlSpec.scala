package graft

import graft.functions.PgSql

/** PG-syntax frontend subset (pg_sql.cpp via the --!syntax_pg
  * translation setting, translation_settings.cpp:131). Shapes follow
  * pg_sql_ut.cpp's read-side cases (Casts, Operators, ParamRefs) —
  * executed end-to-end here, not parse-compared. */
class PgSqlSpec extends SparkSpec {

  private def one(q: String, params: Map[String, String] = Map.empty) =
    PgSql.sql(spark, q, params).head()

  test("syntax marker routes; plain v1 text does not") {
    assert(PgSql.isPg("--!syntax_pg\nSELECT 1"))
    assert(PgSql.isPg("  \n --!SYNTAX_PG \nSELECT 1"))
    assert(!PgSql.isPg("SELECT 1 -- !syntax_pg"))
    assert(!PgSql.isPg("--!syntax_v1\nSELECT 1"))
  }

  test(":: casts: PG type names, chaining, precision args " +
      "(pg_sql_ut Casts)") {
    val r = one(
      """--!syntax_pg
        |SELECT '41'::int4 + 1 AS i, 1::int8 AS b, '2.5'::float8 AS d,
        |  3.14159::numeric(6,2) AS num, 17::text AS t,
        |  'true'::bool AS flag, '2024-05-17'::date AS dt,
        |  42::int4::text::int8 AS chained,
        |  ('1' || '2')::int4 AS parened,
        |  length('abc'::varchar(2)) AS vlen""".stripMargin)
    assert(r.getInt(0) == 42)
    assert(r.getLong(1) == 1L)
    assert(r.getDouble(2) == 2.5)
    assert(r.getDecimal(3).toString == "3.14")
    assert(r.getString(4) == "17")
    assert(r.getBoolean(5))
    assert(r.getDate(6).toString == "2024-05-17")
    assert(r.getLong(7) == 42L)
    assert(r.getInt(8) == 12)
    assert(r.getInt(9) == 3)
  }

  test("string literals: raw by default, E'' decodes escapes, '' " +
      "doubling, \"\" identifiers") {
    val r = one(
      """--!syntax_pg
        |SELECT length('a\nb') AS rawlen, length(E'a\nb') AS elen,
        |  'it''s' AS quoted, E'tab\there' AS tabbed,
        |  'x' AS "Quoted Name"""".stripMargin)
    assert(r.getInt(0) == 4) // backslash-n is TWO raw chars in PG
    assert(r.getInt(1) == 3) // E'' decodes to newline
    assert(r.getString(2) == "it's")
    assert(r.getString(3) == "tab\there")
    assert(r.schema.fieldNames.toSeq.contains("Quoted Name"))
  }

  test("match operators: ~~ ~~* !~~ ~ ~* !~ (pg_sql_ut Operators)") {
    val r = one(
      """--!syntax_pg
        |SELECT 'Hello' ~~ 'He%' AS like_hit,
        |  'Hello' ~~* 'he%' AS ilike_hit,
        |  'Hello' !~~ 'x%' AS nlike,
        |  'abc123' ~ '[0-9]+' AS re_hit,
        |  'ABC' ~* 'abc' AS re_ci,
        |  'abc' !~ '^b' AS re_neg""".stripMargin)
    for (i <- 0 until 6) assert(r.getBoolean(i), s"col $i")
  }

  test("positional parameters $n bind; unbound raises " +
      "(pg_sql_ut ParamRefs)") {
    val r = one("--!syntax_pg\nSELECT $1::int4 + $2::int4 AS s",
      Map("1" -> "20", "$2" -> "22"))
    assert(r.getInt(0) == 42)
    val e = intercept[IllegalArgumentException] {
      PgSql.translate("--!syntax_pg\nSELECT $1 AS x")
    }
    assert(e.getMessage.contains("$1"))
  }

  test("CTE + set op + LIMIT/OFFSET + || over catalog tables") {
    graft.sources.Tables.registerAll(spark, sfDir)
    val df = PgSql.sql(spark,
      """--!syntax_pg
        |WITH r AS (SELECT r_regionkey AS k, r_name FROM region),
        |     n AS (SELECT n_nationkey AS k, n_name FROM nation)
        |SELECT k, r_name || '!' AS nm FROM r
        |UNION ALL
        |SELECT k, n_name FROM n
        |ORDER BY k, nm
        |LIMIT 5 OFFSET 2""".stripMargin)
    val rows = df.collect()
    assert(rows.length == 5)
    assert(rows.map(_.get(0).toString).toSeq ==
      Seq("1", "1", "2", "2", "3"))
  }

  test("function fixups: strpos swaps args, now() maps") {
    val r = one(
      """--!syntax_pg
        |SELECT strpos('graft-engine', 'engine') AS at,
        |  strpos('abc', 'z') AS missing,
        |  (now() > '2020-01-01'::timestamp) AS recent""".stripMargin)
    assert(r.getInt(0) == 7)
    assert(r.getInt(1) == 0)
    assert(r.getBoolean(2))
  }

  test("out-of-subset constructs raise with a named reason") {
    val dml = intercept[IllegalArgumentException] {
      PgSql.translate("--!syntax_pg\nINSERT INTO t VALUES (1)")
    }
    assert(dml.getMessage.contains("INSERT"), dml.getMessage)
    val dollar = intercept[IllegalArgumentException] {
      PgSql.translate("--!syntax_pg\nSELECT $$body$$ AS x")
    }
    assert(dollar.getMessage.contains("dollar"), dollar.getMessage)
    val don = intercept[IllegalArgumentException] {
      PgSql.translate(
        "--!syntax_pg\nSELECT DISTINCT ON (a) a, b FROM t ORDER BY a")
    }
    assert(don.getMessage.contains("DISTINCT ON"), don.getMessage)
    val typ = intercept[IllegalArgumentException] {
      PgSql.translate("--!syntax_pg\nSELECT 'x'::point AS p")
    }
    assert(typ.getMessage.contains("point"), typ.getMessage)
  }

  test("operators and :: inside string literals are untouched") {
    val r = one(
      """--!syntax_pg
        |SELECT 'a::b' AS c1, 'x ~~ y' AS c2, '$1' AS c3""".stripMargin)
    assert(r.getString(0) == "a::b")
    assert(r.getString(1) == "x ~~ y")
    assert(r.getString(2) == "$1")
  }

  test("generate_series in FROM position (incl. step + column alias); " +
      "select-list SRF raises") {
    val rows = PgSql.sql(spark,
      """--!syntax_pg
        |SELECT i * 10 AS x
        |FROM generate_series(2, 4) AS g(i)
        |ORDER BY i""".stripMargin).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(20, 30, 40))
    val joined = PgSql.sql(spark,
      """--!syntax_pg
        |SELECT count(*)::int8 AS n
        |FROM generate_series(1, 3) AS a(i), generate_series(1, 4, 2) AS b(j)
        |WHERE a.i <= b.j""".stripMargin).head()
    // i ∈ {1,2,3}, j ∈ {1,3}; i≤j → (1,1),(1,3),(2,3),(3,3)
    assert(joined.getLong(0) == 4L)
    val srf = intercept[IllegalArgumentException] {
      PgSql.translate("--!syntax_pg\nSELECT a, generate_series(1, 3) FROM t")
    }
    assert(srf.getMessage.contains("generate_series"), srf.getMessage)
  }

  test("extract(epoch from x) maps to fractional seconds; other " +
      "fields pass through to Spark's EXTRACT") {
    val r = one(
      """--!syntax_pg
        |SELECT extract(epoch from '2020-01-01 00:00:01.25'::timestamp) AS ep,
        |  extract(epoch from '1970-01-01'::date) AS zero,
        |  extract(year from '2020-05-17'::date)::int4 AS y""".stripMargin)
    assert(r.getDouble(0) == 1577836801.25)
    assert(r.getDouble(1) == 0.0)
    assert(r.getInt(2) == 2020)
  }
}
