package graft

import graft.functions.YqlSql
import org.apache.spark.sql.Row

/** The struct-builtins family (docs yt/docs/en/yql/builtins/struct.md)
  * over the string surface — every doc example replayed. */
class StructModuleSpec extends SparkSpec {

  import spark.implicits._

  private def one(sql: String): Row =
    YqlSql.sql(spark, sql).head()

  test("AsStruct / AddMember / ExpandStruct build canonical structs") {
    // <|a:1|> + b:2 + c:'3' — members come out in canonical name order
    val r = one(
      """SELECT
        |  AsStruct(1 AS a) AS s,
        |  AddMember(AsStruct(1 AS a), 'b', 2) AS ab,
        |  ExpandStruct(AsStruct(1 AS a), 2 AS b, '3' AS c) AS abc""".stripMargin)
    assert(r.getStruct(0) == Row(1))
    assert(r.getStruct(1) == Row(1, 2))
    assert(r.getStruct(2) == Row(1, 2, "3"))
    assert(r.getStruct(2).schema.fieldNames.toSeq == Seq("a", "b", "c"))
  }

  test("AddMember / ExpandStruct duplicate member is an analysis error") {
    val e = intercept[Exception] {
      one("SELECT AddMember(AsStruct(1 AS a), 'a', 2) AS x")
    }
    assert(e.getMessage.contains("already exists"))
    val e2 = intercept[Exception] {
      one("SELECT ExpandStruct(AsStruct(1 AS a), 2 AS b, 3 AS b) AS x")
    }
    assert(e2.getMessage.contains("duplicate member 'b'"))
  }

  test("TryMember: present, missing, null-valued") {
    val r = one(
      """SELECT
        |  TryMember(AsStruct(1 AS a), 'a', 123) AS hit,
        |  TryMember(AsStruct(1 AS a), 'b', 123) AS miss,
        |  TryMember(AsStruct(CAST(NULL AS INT) AS a), 'a', 123) AS nul
        |""".stripMargin)
    assert(r.getInt(0) == 1 && r.getInt(1) == 123 && r.getInt(2) == 123)
  }

  test("RemoveMember / ForceRemoveMember / RemoveMembers / Force...") {
    val r = one(
      """SELECT
        |  RemoveMember(AsStruct(1 AS a, 2 AS b), 'b') AS a_only,
        |  ForceRemoveMember(AsStruct(1 AS a, 2 AS b), 'z') AS ab,
        |  RemoveMembers(AsStruct(1 AS a, 2 AS b, 3 AS c),
        |    array('a', 'b')) AS c_only,
        |  ForceRemoveMembers(AsStruct(1 AS a, 2 AS b, 3 AS c),
        |    array('a', 'b', 'z')) AS c_only2""".stripMargin)
    assert(r.getStruct(0) == Row(1))
    assert(r.getStruct(1) == Row(1, 2))
    assert(r.getStruct(2) == Row(3) && r.getStruct(3) == Row(3))
    val e = intercept[Exception] {
      one("SELECT RemoveMember(AsStruct(1 AS a), 'z') AS x")
    }
    assert(e.getMessage.contains("is not present"))
  }

  test("ChooseMembers picks fields; missing member errors") {
    val r = one(
      """SELECT ChooseMembers(AsStruct(1 AS a, 2 AS b, 3 AS c),
        |  array('a', 'b')) AS ab""".stripMargin)
    assert(r.getStruct(0) == Row(1, 2))
    intercept[Exception] {
      one("SELECT ChooseMembers(AsStruct(1 AS a), array('z')) AS x")
    }
  }

  test("CombineMembers / FlattenMembers concat with canonical order") {
    val r = one(
      """SELECT
        |  CombineMembers(AsStruct(1 AS a, 2 AS b), AsStruct(3 AS c)) AS abc,
        |  FlattenMembers(AsTuple('foo', AsStruct(1 AS a, 2 AS b)),
        |    AsTuple('bar', AsStruct(3 AS c))) AS pref""".stripMargin)
    assert(r.getStruct(0) == Row(1, 2, 3))
    // (barc:3, fooa:1, foob:2) — the doc example's canonical order
    assert(r.getStruct(1).schema.fieldNames.toSeq ==
      Seq("barc", "fooa", "foob"))
    assert(r.getStruct(1) == Row(3, 1, 2))
    val e = intercept[Exception] {
      one("SELECT CombineMembers(AsStruct(1 AS a), AsStruct(2 AS a)) AS x")
    }
    assert(e.getMessage.contains("duplicate member 'a'"))
  }

  test("StructMembers / GatherMembers; [] on NULL") {
    val r = one(
      """SELECT
        |  StructMembers(AsStruct(1 AS b, 2 AS a)) AS names,
        |  GatherMembers(AsStruct(1 AS b, 2 AS a)) AS pairs,
        |  StructMembers(CASE WHEN 1 = 2
        |    THEN AsStruct(1 AS a) ELSE NULL END) AS empty""".stripMargin)
    assert(r.getSeq[String](0) == Seq("a", "b"))
    assert(r.getSeq[Row](1) == Seq(Row("a", 2), Row("b", 1)))
    assert(r.getSeq[String](2) == Seq.empty)
    intercept[Exception] { // mixed member types
      one("SELECT GatherMembers(AsStruct(1 AS a, 'x' AS b)) AS x")
    }
  }

  test("RenameMembers fans out and keeps the rest; Force ignores missing") {
    val r = one(
      """SELECT
        |  RenameMembers(AsStruct(1 AS a, 2 AS b),
        |    array(AsTuple('a', 'c'), AsTuple('a', 'e'))) AS bce,
        |  ForceRenameMembers(AsStruct(1 AS a, 2 AS b),
        |    array(AsTuple('a', 'c'), AsTuple('d', 'e'))) AS bc""".stripMargin)
    // doc example: (b:2, c:1, e:1)
    assert(r.getStruct(0).schema.fieldNames.toSeq == Seq("b", "c", "e"))
    assert(r.getStruct(0) == Row(2, 1, 1))
    assert(r.getStruct(1).schema.fieldNames.toSeq == Seq("b", "c"))
    assert(r.getStruct(1) == Row(2, 1))
    val e = intercept[Exception] {
      one("""SELECT RenameMembers(AsStruct(1 AS a),
        |  array(AsTuple('z', 'c'))) AS x""".stripMargin)
    }
    assert(e.getMessage.contains("is not present"))
  }

  test("SpreadMembers: last correction wins, unmentioned null") {
    val r = one(
      """SELECT
        |  SpreadMembers(array(AsTuple('a', 1), AsTuple('a', 2)),
        |    array('a', 'b')) AS s,
        |  ForceSpreadMembers(array(AsTuple('a', 1), AsTuple('z', 9)),
        |    array('a', 'b')) AS f""".stripMargin)
    // doc example: (a: 2, b: null)
    assert(r.getStruct(0) == Row(2, null))
    assert(r.getStruct(1) == Row(1, null))
    val e = intercept[Exception] {
      YqlSql.sql(spark,
        """SELECT SpreadMembers(array(AsTuple('z', 1)),
          |  array('a')) AS x""".stripMargin).collect()
    }
    assert(e.getMessage != null)
  }

  test("struct builtins work over real column data") {
    Seq((1, "x", 2.0), (2, "y", 3.0)).toDF("k", "s", "v")
      .createOrReplaceTempView("smt")
    val rows = YqlSql.sql(spark,
      """SELECT k,
        |  AddMember(AsStruct(k AS key, s AS tag), 'val', v) AS m,
        |  TryMember(AsStruct(k AS key), 'other', -1) AS d
        |FROM smt ORDER BY k""".stripMargin).collect()
    assert(rows(0).getStruct(1) == Row(1, "x", 2.0))
    assert(rows(0).getStruct(1).schema.fieldNames.toSeq ==
      Seq("key", "tag", "val"))
    assert(rows(1).getInt(2) == -1)
  }
}
