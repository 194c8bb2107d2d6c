package graft

import graft.functions.YqlSql
import org.apache.spark.sql.Row

/** builtins/basic.md stragglers: optional ops, byte/bit surgery,
  * container constructors and literals, hints, Pickle. */
class BasicOpsSpec extends SparkSpec {

  private def one(sql: String): Row = YqlSql.sql(spark, sql).head()

  test("Just / Unwrap / Nothing") {
    val r = one(
      """SELECT Just('my_string') AS j,
        |  Unwrap(Just(42)) AS u,
        |  Nothing(Optional<Int32>) AS n""".stripMargin)
    assert(r.getString(0) == "my_string" && r.getInt(1) == 42)
    assert(r.isNullAt(2))
    assert(r.schema(2).dataType.simpleString == "int")
    val e = intercept[Exception] {
      one("SELECT Unwrap(IF(1 = 2, 5, NULL), 'custom boom') AS x")
    }
    assert(e.getMessage == null || // wrapped SparkException
      e.toString.contains("boom") || e.getCause != null)
  }

  test("ByteAt: doc examples") {
    val r = one(
      """SELECT ByteAt('foo', 0) AS a, ByteAt('foo', 1) AS b,
        |  ByteAt('foo', 9) AS c""".stripMargin)
    assert(r.getInt(0) == 102 && r.getInt(1) == 111 && r.isNullAt(2))
  }

  test("TestBit / SetBit / ClearBit / FlipBit: doc examples") {
    val r = one(
      """SELECT TestBit(1, 0) AS t, SetBit(8, 0) AS s,
        |  ClearBit(9, 3) AS c, FlipBit(8, 0) AS f,
        |  TestBit(CAST(NULL AS BIGINT), 1) AS n""".stripMargin)
    assert(r.getBoolean(0))
    assert(r.getInt(1) == 9 && r.getInt(2) == 1 && r.getInt(3) == 9)
    assert(r.isNullAt(4))
  }

  test("ToBytes / FromBytes: little-endian round trip") {
    val r = one(
      """SELECT ToBytes(123) AS b,
        |  FromBytes(ToBytes(1234567890), Int32) AS i,
        |  FromBytes(ToBytes(CAST(1234567890 AS BIGINT)), Uint64) AS l,
        |  FromBytes(ToBytes(2.5e0), Double) AS d,
        |  FromBytes(ToBytes(1), Uint64) AS bad""".stripMargin)
    assert(r.getAs[Array[Byte]](0).toSeq == Seq[Byte](123, 0, 0, 0))
    assert(r.getInt(1) == 1234567890)
    assert(r.getLong(2) == 1234567890L)
    assert(r.getDouble(3) == 2.5)
    assert(r.isNullAt(4)) // 4-byte image is not a valid Uint64
  }

  test("AsDict / AsDictStrict / AsSet / AsSetStrict / AsListStrict") {
    val r = one(
      """SELECT AsDict(AsTuple('a', 1), AsTuple('b', 2),
        |    AsTuple('a', 9)) AS d,
        |  AsSet(3, 1, 2, 3) AS s,
        |  AsListStrict(1, 2, 3) AS l""".stripMargin)
    assert(r.getMap[String, Int](0) == Map("a" -> 1, "b" -> 2)) // first wins
    assert(r.getSeq[Int](1) == Seq(1, 2, 3)) // canonical sorted distinct
    assert(r.getSeq[Int](2) == Seq(1, 2, 3))
    intercept[Exception] {
      one("SELECT AsSetStrict(1, 1) AS x")
    }
    intercept[Exception] {
      one("SELECT AsDictStrict(AsTuple('a', 1), AsTuple('a', 2)) AS x")
    }
  }

  test("MAX_OF / MIN_OF / NANVL; AssumeStrict / Likely pass through") {
    val r = one(
      """SELECT MAX_OF(1, 7, 3) AS mx, MIN_OF(1, 7, 3) AS mn,
        |  NANVL(CAST('NaN' AS DOUBLE), 1.5) AS nv,
        |  AssumeStrict(2 + 2) AS a, Likely(1 < 2) AS lk,
        |  EvaluateExpr(3 * 3) AS ev""".stripMargin)
    assert(r.getInt(0) == 7 && r.getInt(1) == 1)
    assert(r.getDouble(2) == 1.5)
    assert(r.getInt(3) == 4 && r.getBoolean(4) && r.getInt(5) == 9)
  }

  test("container literals: struct, list, dict, set") {
    val r = one(
      """SELECT <|a: 1, `complex name`: 2.5e0, b: 'x'|> AS st,
        |  [1, 2, 3] AS li,
        |  {'a': 1, 'b': 2} AS di,
        |  {3, 1, 2} AS se""".stripMargin)
    // canonical member order: a, b, complex name
    assert(r.getStruct(0).schema.fieldNames.toSeq ==
      Seq("a", "b", "complex name"))
    assert(r.getStruct(0) == Row(1, "x", 2.5))
    assert(r.getSeq[Int](1) == Seq(1, 2, 3))
    assert(r.getMap[String, Int](2) == Map("a" -> 1, "b" -> 2))
    assert(r.getSeq[Int](3) == Seq(1, 2, 3))
  }

  test("container literals nest and respect element access") {
    val r = one(
      """SELECT [<|k: 1|>, <|k: 2|>] AS ls,
        |  [10, 20, 30][1] AS idx,
        |  {'a': [1, 2]} AS dl""".stripMargin)
    assert(r.getSeq[Row](0) == Seq(Row(1), Row(2)))
    assert(r.getInt(1) == 20)
    assert(r.getMap[String, scala.collection.Seq[Int]](2)("a").toSeq ==
      Seq(1, 2))
  }

  test("Pickle / StablePickle / Unpickle round trip") {
    val r = one(
      """SELECT Unpickle(Int32, Pickle(7)) AS i,
        |  Unpickle(Utf8, StablePickle('hi')) AS s""".stripMargin)
    assert(r.getInt(0) == 7 && r.getString(1) == "hi")
  }

  test("ListCreate / DictCreate / SetCreate build typed empties") {
    val r = one(
      """SELECT ListCreate(Tuple<Utf8,Double?>) AS lt,
        |  ListCreate(Int32) AS li,
        |  DictCreate(Utf8, Int64) AS d,
        |  SetCreate(Int32) AS s,
        |  ListCollect([1, 2]) AS lc""".stripMargin)
    assert(r.getSeq[Row](0).isEmpty && r.getSeq[Int](1).isEmpty)
    assert(r.schema(0).dataType.simpleString ==
      "array<struct<_1:string,_2:double>>")
    assert(r.getMap[String, Long](2).isEmpty)
    assert(r.getSeq[Int](3).isEmpty)
    assert(r.getSeq[Int](4) == Seq(1, 2))
  }

  test("ListFold / ListFoldMap: (item, state) lambdas") {
    val r = one(
      """SELECT ListFold([1, 2, 3], 100, (x, s) -> s + x) AS folded,
        |  ListFold(ListCreate(Int32), 7, (x, s) -> s + x) AS empty,
        |  ListFoldMap([1, 2, 3], 0,
        |    (x, s) -> AsTuple(x + s, s + x)) AS running""".stripMargin)
    assert(r.getInt(0) == 106)
    assert(r.getInt(1) == 7)
    assert(r.getSeq[Int](2) == Seq(1, 3, 6)) // running prefix sums
  }

  test("ListUnionAll: doc example — union of member sets, nulls fill") {
    val r = one(
      """SELECT ListUnionAll(
        |  AsList(<|value: 1|>, <|value: 2|>),
        |  AsList(<|key: 'a'|>, <|key: 'b'|>)) AS u""".stripMargin)
    val rows = r.getSeq[Row](0)
    assert(r.schema(0).dataType.simpleString ==
      "array<struct<key:string,value:int>>")
    assert(rows == Seq(Row(null, 1), Row(null, 2),
      Row("a", null), Row("b", null)))
  }

  test("ListAggregate / DictAggregate: doc examples") {
    val r = one(
      """SELECT ListAggregate(AsList(1, 2, 3),
        |    AggregationFactory('Sum')) AS s,
        |  ListAggregate(ListCreate(Int32),
        |    AggregationFactory('Count')) AS c0,
        |  ListAggregate(ListCreate(Int32),
        |    AggregationFactory('Sum')) AS s0,
        |  DictAggregate(AsDict(
        |    AsTuple(1, AsList('foo', 'bar')),
        |    AsTuple(2, AsList('baz', 'qwe'))),
        |    AggregationFactory('Max')) AS dm""".stripMargin)
    assert(r.getInt(0) == 6)
    assert(r.getLong(1) == 0L) // empty list counts like an empty table
    assert(r.isNullAt(2))
    assert(r.getMap[Int, String](3) == Map(1 -> "foo", 2 -> "qwe"))
  }

  test("AggregateTransformInput/Output and AggregateFlatten combinators") {
    // the doc examples of basic.md#aggregatetransform / #aggregateflatten
    val r = one(
      """$f = AggregationFactory('sum');
        |$g = AggregateTransformInput($f, ($x) -> (CAST($x AS INT)));
        |$h = AggregateTransformInput($f, ($x) -> ($x * 2));
        |$o = AggregateTransformOutput($f, ($x) -> ($x * 2));
        |SELECT ListAggregate([1, 2, 3], $f) AS plain,
        |  ListAggregate(['1', '2', '3'], $g) AS cast_in,
        |  ListAggregate([1, 2, 3], $h) AS doubled_in,
        |  ListAggregate([1, 2, 3], $o) AS doubled_out""".stripMargin)
    assert(r.getInt(0) == 6 && r.getInt(1) == 6)
    assert(r.getInt(2) == 12 && r.getInt(3) == 12)
    val fl = YqlSql.sql(spark,
      """$i = AggregationFactory('AGGREGATE_LIST_DISTINCT');
        |$j = AggregateFlatten($i);
        |SELECT AggregateBy(x, $j) AS merged FROM (
        |  SELECT [1, 2] AS x UNION ALL SELECT [2, 3] AS x)""".stripMargin)
      .head()
    assert(fl.getSeq[Int](0) == Seq(1, 2, 3))
  }

  test("Variant / AsVariant / Enum / AsEnum / AsTagged / Untag") {
    val r = one(
      """$vt = Variant<foo: Int32, bar: Bool>;
        |SELECT Variant(6, 'foo', $vt) AS v1,
        |  Variant(false, 'bar', $vt) AS v2,
        |  AsVariant(6, 'foo') AS av,
        |  Enum('Foo', Enum<Foo, Bar>) AS e1,
        |  AsEnum('Foo') AS e2,
        |  Untag(AsTagged(42, 'image')) AS t
        |""".stripMargin)
    assert(r.getStruct(0).getAs[String]("__tag") == "foo")
    assert(r.getStruct(0).getAs[Int]("foo") == 6)
    assert(r.getStruct(0).isNullAt(r.getStruct(0).fieldIndex("bar")))
    assert(r.getStruct(1).getAs[String]("__tag") == "bar")
    assert(r.getStruct(1).getAs[Boolean]("bar") == false)
    assert(r.getStruct(2).getAs[Int]("foo") == 6)
    assert(r.getString(3) == "Foo" && r.getString(4) == "Foo")
    assert(r.getInt(5) == 42)
    intercept[Exception] {
      one("SELECT Enum('Baz', Enum<Foo, Bar>) AS x")
    }
    intercept[Exception] {
      one("SELECT Variant(6, 'baz', Variant<foo: Int32>) AS x")
    }
  }

  test("StaticMap / StaticZip: doc examples incl. mixed member types") {
    val r = one(
      """$one = <|k1: 1, k2: 2.0e0|>;
        |$two = <|k1: 3.0e0, k2: 4|>;
        |SELECT StaticMap(<|a: 1, b: 2|>, ($item) -> ($item * 10)) AS m,
        |  StaticZip($one, $two) AS z,
        |  StaticMap(StaticZip($one, $two),
        |    ($tuple) -> ($tuple.0 + $tuple.1)) AS sum,
        |  StaticMap(AsTuple(1, 2), ($item) -> {
        |    RETURN CAST($item AS String); }) AS t""".stripMargin)
    assert(r.getStruct(0) == Row(10, 20))
    // z: k1 = (1, 3.0), k2 = (2.0, 4)
    assert(r.getStruct(1).getStruct(0) == Row(1, 3.0))
    assert(r.getStruct(1).getStruct(1) == Row(2.0, 4))
    // sum: heterogeneous member types — the lambda binds per member
    assert(r.getStruct(2) == Row(4.0, 6.0))
    assert(r.getStruct(3) == Row("1", "2"))
  }

  test("PRAGMA File + FileContent/FilePath/FolderPath/ParseFile") {
    val dir = java.nio.file.Files.createTempDirectory("graft_files_").toFile
    val f1 = new java.io.File(dir, "vals.txt")
    java.nio.file.Files.writeString(f1.toPath, "10\n20\n30\n")
    val f2 = new java.io.File(dir, "hello.txt")
    java.nio.file.Files.writeString(f2.toPath, "hi there")
    val r = one(
      s"""PRAGMA File('my/vals.txt', '${f1.getPath}');
         |PRAGMA File('my/hello.txt', '${f2.getPath}');
         |SELECT FileContent('my/hello.txt') AS c,
         |  FilePath('my/vals.txt') AS p,
         |  ListLength(ParseFile('Int64', 'my/vals.txt')) AS n,
         |  ListAggregate(ParseFile('Int64', 'my/vals.txt'),
         |    AggregationFactory('Sum')) AS s,
         |  FolderPath('my') AS fp""".stripMargin)
    assert(r.getString(0) == "hi there")
    assert(r.getString(1) == f1.getPath)
    assert(r.getInt(2) == 3 && r.getLong(3) == 60L)
    assert(new java.io.File(r.getString(4), "vals.txt").exists())
    assert(new java.io.File(r.getString(4), "hello.txt").exists())
    // IN over a parsed file (the docs' canonical use)
    val rows = YqlSql.sql(spark,
      s"""PRAGMA File('my/vals.txt', '${f1.getPath}');
         |SELECT x FROM (SELECT explode(array(5, 10, 25, 30)) AS x)
         |WHERE x IN ParseFile('Int64', 'my/vals.txt')""".stripMargin)
      .collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(10, 30))
    // URLs raise: zero-egress engine
    val e = intercept[Exception] {
      one("PRAGMA File('a.txt', 'http://example.invalid/x'); SELECT 1 AS a")
    }
    assert(e.getMessage.contains("zero-egress"))
  }

  test("Digest:: long tail: published test vectors") {
    val r = one(
      """SELECT Digest::Crc32c('123456789') AS crc,
        |  Digest::Fnv64('a') AS f64,
        |  Digest::Fnv32('a') AS f32,
        |  Digest::SipHash(CAST(506097522914230528 AS BIGINT),
        |    CAST(1084818905618843912 AS BIGINT), '') AS sip,
        |  Digest::SuperFastHash('') AS sfh0,
        |  Digest::IntHash64(1) AS ih,
        |  Digest::NumericHash(1) AS nh,
        |  length(Digest::Md5Raw('abc')) AS raw_len,
        |  Digest::Md5HalfMix('abc') AS hm""".stripMargin)
    // CRC32C("123456789") = 0xE3069283 (RFC 3720 test vector)
    assert(r.getLong(0) == 0xe3069283L)
    // FNV-1 64/32 of "a" (multiply-then-xor — util/digest/fnv.h)
    assert(r.getLong(1) == 0xaf63bd4c8601b7beL)
    assert(r.getLong(2) == 0x050c5d7eL)
    // SipHash-2-4 reference vector: key bytes 00..0f, empty input
    assert(r.getLong(3) == 0x726fdb47dd0e0e31L)
    assert(r.getLong(4) == 0L) // SuperFastHash("") = 0 by definition
    // the two integer mixers replay the reference formulas (spec
    // replays them independently below)
    def intHash64(x0: Long): Long = {
      var x = x0 ^ 0x4cf2d2baae6da887L
      x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
      x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
      x ^= x >>> 33; x
    }
    assert(r.getLong(5) == intHash64(1L))
    assert(r.getLong(6) != 1L && r.getLong(6) == {
      var k = 1L
      k += ~(k << 32); k ^= (k >>> 22); k += ~(k << 13); k ^= (k >>> 8)
      k += (k << 3); k ^= (k >>> 15); k += ~(k << 27); k ^= (k >>> 31); k
    })
    assert(r.getInt(7) == 16)
    // HalfMix folds md5[i]^md5[i+8] — recompute from the raw digest
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest("abc".getBytes)
    var hm = 0L
    for (i <- 3 to 0 by -1) {
      hm |= ((d(i) ^ d(8 + i)) & 0xffL) << ((3 - i) << 3)
      hm |= ((d(4 + i) ^ d(12 + i)) & 0xffL) << ((7 - i) << 3)
    }
    assert(r.getLong(8) == hm)
  }

  test("?? coalesce operator: grammar precedence (SQLv1 neq_subexpr)") {
    val r = one(
      """SELECT NULL ?? 7 AS a,
        |  1 ?? 2 ?? 3 AS chain,
        |  IF(1 = 2, 5, NULL) ?? 0 > 1 AS cmp, -- (x ?? 0) > 1 = false
        |  1 + IF(1 = 2, 5, NULL) ?? 100 AS arith, -- (1 + x) ?? 100
        |  NVL(NULL, 'n') AS nvl_alias,
        |  TRUE AND IF(1 = 2, TRUE, NULL) ?? FALSE AS bools
        |""".stripMargin)
    assert(r.getInt(0) == 7 && r.getInt(1) == 1)
    assert(!r.getBoolean(2))
    assert(r.getInt(3) == 100)
    assert(r.getString(4) == "n")
    assert(!r.getBoolean(5)) // AND binds LOOSER than ??
  }

  test("AddTimezone / RemoveTimezone shift the instant") {
    val r = one(
      """SELECT AddTimezone(TIMESTAMP'2024-01-01 00:00:00',
        |  'Europe/Moscow') AS plus,
        |  RemoveTimezone(AddTimezone(TIMESTAMP'2024-01-01 00:00:00',
        |    'Europe/Moscow'), 'Europe/Moscow') AS back""".stripMargin)
    assert(r.getTimestamp(0).toString.startsWith("2024-01-01 03:00"))
    assert(r.getTimestamp(1).toString.startsWith("2024-01-01 00:00"))
  }

  test("TableRow(): the whole row as a struct (basic.md#tablerow)") {
    import graft.functions.YqlSql
    spark.range(3).selectExpr("id", "id * 2 AS b")
      .createOrReplaceTempView("tr_src")
    val r = YqlSql.sql(spark,
      "SELECT TableRow() AS r, TableRow().b AS b2 FROM tr_src WHERE id = 1")
      .collect().head
    assert(r.getStruct(0).getLong(0) == 1L)
    assert(r.getStruct(0).getLong(1) == 2L)
    assert(r.getLong(1) == 2L)
    val e = intercept[Exception] {
      YqlSql.sql(spark, "SELECT TableRow(1) AS r FROM tr_src").collect()
    }
    assert(e.getMessage.contains("no arguments"))
  }

  test("operation metadata + straggler raises (basic.md)") {
    import graft.functions.YqlSql
    spark.range(1).createOrReplaceTempView("md_src")
    val r = YqlSql.sql(spark,
      "SELECT CurrentOperationId() AS op, CurrentAuthenticatedUser() AS u " +
        "FROM md_src").collect().head
    assert(r.getString(0).nonEmpty && r.getString(1).nonEmpty)
    for ((fn, word) <- Seq("TableRecordIndex()" -> "scan order",
        "WeakField(id, 'Int64')" -> "strong",
        "JoinTableRow()" -> "TableRow")) {
      val e = intercept[Exception] {
        YqlSql.sql(spark, s"SELECT $fn AS v FROM md_src").collect()
      }
      assert(e.getMessage.contains(word), s"$fn: ${e.getMessage}")
    }
  }
}
