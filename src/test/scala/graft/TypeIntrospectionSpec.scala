package graft

import graft.functions.YqlSql
import org.apache.spark.sql.Row

/** The type-introspection module (builtins/types.md): type values are
  * canonical YQL type-text strings; constructors/accessors are
  * compile-time text transforms, TypeOf reads the resolved Spark type
  * through the engine's bijection. */
class TypeIntrospectionSpec extends SparkSpec {

  private def one(sql: String): Row = YqlSql.sql(spark, sql).head()

  test("FormatType / ParseType / TypeOf / InstanceOf") {
    val r = one(
      """SELECT FormatType(ParseType('List<Int32>')) AS a,
        |  TypeOf(1) AS b,
        |  TypeOf('x') AS c,
        |  TypeOf([1, 2]) AS d,
        |  TypeOf(AsTuple(1, 'x')) AS e,
        |  TypeOf(<|k: 1|>) AS f,
        |  TypeOf(InstanceOf('Dict<Utf8,Int64>')) AS g""".stripMargin)
    assert(r.getString(0) == "List<Int32>")
    assert(r.getString(1) == "Int32" && r.getString(2) == "Utf8")
    assert(r.getString(3) == "List<Int32>")
    assert(r.getString(4) == "Tuple<Int32,Utf8>")
    assert(r.getString(5) == "Struct<k:Int32>")
    // InstanceOf materializes through parse(), whose containers carry
    // Optional values by default (the engine's nullable-element rule)
    assert(r.getString(6) == "Optional<Dict<Utf8,Optional<Int64>>>")
  }

  test("type constructors: doc examples") {
    val r = one(
      """SELECT OptionalType(DataType('String')) AS a,
        |  ListType(DataType('Int32')) AS b,
        |  DictType(DataType('Utf8'), DataType('Int64')) AS c,
        |  TupleType(DataType('Int32'), DataType('Bool')) AS d,
        |  FormatType(StructType(
        |    DataType('Bool') AS MyBool,
        |    ListType(DataType('String')) AS StringList)) AS e,
        |  VariantType(TupleType(DataType('Int32'), DataType('Bool'))) AS f
        |""".stripMargin)
    assert(r.getString(0) == "Optional<String>")
    assert(r.getString(1) == "List<Int32>")
    assert(r.getString(2) == "Dict<Utf8,Int64>")
    assert(r.getString(3) == "Tuple<Int32,Bool>")
    assert(r.getString(4) == "Struct<MyBool:Bool,StringList:List<String>>")
    assert(r.getString(5) == "Variant<Int32,Bool>")
  }

  test("type accessors and TypeKind") {
    val r = one(
      """SELECT OptionalItemType(ParseType('Optional<Int32>')) AS a,
        |  ListItemType(ParseType('List<Utf8>')) AS b,
        |  DictKeyType(ParseType('Dict<Utf8,Int64>')) AS c,
        |  DictPayloadType(ParseType('Dict<Utf8,Int64>')) AS d,
        |  TupleElementType(ParseType('Tuple<Int32,Bool>'), '1') AS e,
        |  StructMemberType(ParseType('Struct<a:Int32,b:Utf8>'), 'b') AS f,
        |  VariantUnderlyingType(ParseType('Variant<a:Int32,b:Utf8>')) AS g,
        |  TypeKind(ParseType('List<Int32>')) AS k1,
        |  TypeKind(ParseType('Int32')) AS k2,
        |  TypeKind(ParseType('Optional<Utf8>')) AS k3""".stripMargin)
    assert(r.getString(0) == "Int32" && r.getString(1) == "Utf8")
    assert(r.getString(2) == "Utf8" && r.getString(3) == "Int64")
    assert(r.getString(4) == "Bool" && r.getString(5) == "Utf8")
    assert(r.getString(6) == "Struct<a:Int32,b:Utf8>")
    assert(r.getString(7) == "List")
    assert(r.getString(8) == "Data")
    assert(r.getString(9) == "Optional")
  }

  test("TypeHandle family composes through the same canonical text") {
    val r = one(
      """SELECT FormatType(EvaluateType(ParseTypeHandle('List<Int32>')))
        |    AS a,
        |  FormatType(EvaluateType(OptionalTypeHandle(
        |    DataTypeHandle('Bool')))) AS b,
        |  TupleTypeComponents(ParseTypeHandle('Tuple<Int32,Utf8>')) AS c,
        |  EmptyListTypeHandle() AS d""".stripMargin)
    assert(r.getString(0) == "List<Int32>")
    assert(r.getString(1) == "Optional<Bool>")
    assert(r.getSeq[String](2) == Seq("Int32", "Utf8"))
    assert(r.getString(3) == "EmptyList")
  }

  test("ParseType canonicalizes spellings; malformed types raise") {
    val r = one(
      """SELECT ParseType('Double?') AS a,
        |  ParseType('optional<utf8>') AS b""".stripMargin)
    assert(r.getString(0) == "Optional<Double>")
    assert(r.getString(1) == "Optional<Utf8>")
    intercept[Exception] { one("SELECT ParseType('NotAType<>') AS x") }
    intercept[Exception] {
      one("SELECT ListItemType(ParseType('Int32')) AS x")
    }
  }
}
