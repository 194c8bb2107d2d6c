package graft

import org.apache.spark.sql.Row
import graft.ql.SelectRows

/** The reference's own QL test corpus, ported verbatim where the
  * semantics are observable through the string surface: the
  * integration tests (yt/yt/tests/integration/dynamic_tables/
  * test_query.py), the evaluate/prepare unit corpus
  * (yt/yt/library/query/unittests/ql_query_ut.cpp — simple scans,
  * comparisons, joins, group-bys incl. the coordinated multi-partition
  * family, WITH TOTALS modes, the YPath accessor family, regexes,
  * transforms, UDFs, query options and the TQueryPrepareTest error
  * surface), and the expression error tests (ql_expressions_ut.cpp).
  * Same fixtures, same QL strings through [[SelectRows]], same
  * expected rows; each test cites its reference source.
  */
class ReferenceCorpusSpec extends SparkSpec {
  import spark.implicits._

  // _sample_data (test_query.py:64-76), key-sorted single tablet
  private lazy val t = (1 to 9).map(i => (i.toLong, 10L * i))
    .toDF("a", "b").repartition(1).sortWithinPartitions("a")

  private def q(ql: String) = SelectRows(spark, ql, Map("//tmp/t" -> t))

  test("test_simple: 'a, b from [t]' returns every row") {
    assert(q("a, b from [//tmp/t]").count() == 9)
  }

  test("test_project1: '2 * a + b - 1 as s'") {
    val expected = (1 to 9).map(i => 2L * i + 10L * i - 1)
    val got = q("2 * a + b - 1 as s from [//tmp/t]").as[Long].collect().sorted
    assert(got.toSeq == expected.sorted)
    val limited = q("2 * a + b - 1 as s from [//tmp/t] limit 1000").as[Long].collect()
    assert(limited.sorted.toSeq == expected.sorted)
  }

  test("test_group_by1: 'sum(b) as s ... group by 1 as k' → one global group") {
    val got = q("sum(b) as s from [//tmp/t] group by 1 as k")
      .select("s").as[Long].collect()
    assert(got.toSeq == Seq(450L))
  }

  test("test_group_by2: 'k, sum(b) as s ... group by a % 2 as k'") {
    val got = q("k, sum(b) as s from [//tmp/t] group by a % 2 as k")
      .orderBy("k").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((0L, 200L), (1L, 250L)))
  }

  test("test_response_parameters query shape: totals + limit") {
    val got = q("sum(1) as c from [//tmp/t] group by b with totals limit 10")
    assert(got.count() == 10) // 9 groups + totals row
  }

  test("test_limit: limit without order reads in key order") {
    val got = q("* from [//tmp/t] limit 1").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 10L)))
  }

  test("test_order_by: where + order by + limit / offset-limit") {
    // deterministic stand-in for the reference's shuffled values
    val rnd = new scala.util.Random(7)
    val vs = rnd.shuffle((0 until 300).toList)
    val data = (0 until 100).map(i => (i.toLong, vs(i).toLong, (i * 37 % 1000).toLong))
    val ot = data.toDF("k", "v", "u")
    val filtered = data.filter(_._3 > 500).sortBy(_._2)
    val expect10 = filtered.take(10).map(r => (r._1, r._2))
    val got = SelectRows(spark,
      "k, v from [//tmp/ot] where u > 500 order by v limit 10",
      Map("//tmp/ot" -> ot)).as[(Long, Long)].collect()
    assert(got.toSeq == expect10)

    val expectOff = filtered.slice(20, 30).map(r => (r._1, r._2))
    val got2 = SelectRows(spark,
      "k, v from [//tmp/ot] where u > 500 order by v offset 20 limit 10",
      Map("//tmp/ot" -> ot)).as[(Long, Long)].collect()
    assert(got2.toSeq == expectOff)
  }

  // test_join fixtures (test_query.py:625-662)
  private lazy val jl = Seq(
    (1L, 2L, 80L), (1L, 3L, 71L), (1L, 4L, 62L), (2L, 1L, 53L),
    (2L, 2L, 44L), (2L, 3L, 35L), (2L, 4L, 26L), (3L, 1L, 17L)
  ).toDF("a", "b", "c")
  private lazy val jr = Seq(
    (1L, 2L, 80L), (1L, 3L, 71L), (1L, 4L, 62L), (2L, 1L, 53L),
    (2L, 2L, 44L), (2L, 3L, 35L), (2L, 4L, 26L), (3L, 1L, 17L)
  ).toDF("d", "e", "c").select("c", "d", "e")

  test("test_join: USING with filter and tuple-IN (test_query.py:677-687)") {
    val cat = Map("//tmp/jl" -> jl, "//tmp/jr" -> jr)
    val all = SelectRows(spark,
      "* from [//tmp/jl] join [//tmp/jr] using c where a < 4", cat)
    assert(all.count() == 8)
    // every joined row matches a=d, b=e (the fixture is built that way)
    assert(all.where("a = d AND b = e").count() == 8)

    val one = SelectRows(spark,
      "* from [//tmp/jl] join [//tmp/jr] using c where (a, b) IN ((2, 1))", cat)
      .select("a", "b", "c", "d", "e").collect()
    assert(one.toSeq == Seq(Row(2L, 1L, 53L, 2L, 1L)))
  }

  test("test_join2: expression and tuple ON keys with integer division (test_query.py:516-529)") {
    val tt = (0L until 100L).map(Tuple1(_)).toDF("a")
    val tj = (0L until 100L).map(i => (i / 10, i % 10, i)).toDF("b", "c", "v")
    val cat = Map("//tmp/t" -> tt, "//tmp/j" -> tj)

    // on (a + 0) = b: each a in 0..9 matches the 10 rows with b = a
    val exprOn = SelectRows(spark,
      "a, b, c, v from [//tmp/t] join [//tmp/j] on (a + 0) = b where a < 10", cat)
    assert(exprOn.count() == 100)
    assert(exprOn.where("a = b").count() == 100)

    // tuple ON with QL integer division: (a / 10, a % 10) = (b, c)
    val tupleOn = SelectRows(spark,
      "a, b, c, v from [//tmp/t] join [//tmp/j] on (a / 10, a % 10) = (b, c)", cat)
    assert(tupleOn.count() == 100)
    assert(tupleOn.where("v = a").count() == 100, "v == a iff / divides integrally")

    val pinned = SelectRows(spark,
      "a, b, c, v from [//tmp/t] join [//tmp/j] on (a / 10, a % 10) = (b, c) where a = 36",
      cat).select("a", "b", "c", "v").collect()
    assert(pinned.toSeq == Seq(Row(36L, 3L, 6L, 36L)))
  }

  test("null equality matches nulls (test_query.py:882 `where c = null`)") {
    val t = Seq((1L, Some(5L)), (2L, None), (3L, Some(7L)), (4L, None))
      .toDF("a", "c")
    val got = SelectRows(spark,
      "a from [//tmp/n] where c = null order by a limit 10",
      Map("//tmp/n" -> t)).as[Long].collect()
    assert(got.toSeq == Seq(2L, 4L))
  }

  test("QL division: integral on int64, float on double") {
    val t = Seq((7L, 2.0), (9L, 4.0)).toDF("i", "d")
    val got = SelectRows(spark,
      "i / 2 AS ii, d / 2 AS dd, i / 2.0 AS mixed FROM [//tmp/dv] ORDER BY i LIMIT 5",
      Map("//tmp/dv" -> t)).collect()
    assert(got.toSeq == Seq(Row(3L, 1.0, 3.5), Row(4L, 2.0, 4.5)))
  }

  test("test_having (test_query.py:312): HAVING filters aggregated groups") {
    val ht = (0 until 100).map(i => (i.toLong, i.toLong * 10)).toDF("a", "b")
    val got = SelectRows(spark,
      "k, avg(a) as aa, min(b) as mb, avg(b) as ab from [//tmp/h] " +
        "group by a % 2 as k having mb < 5",
      Map("//tmp/h" -> ht)).collect()
    assert(got.toSeq == Seq(Row(0L, 49.0, 0L, 490.0)))
  }

  test("test_offset (test_query.py:1625): offset without order reads in key order") {
    val ot = (0 until 11).map(i => (i.toLong, i.toLong)).toDF("a", "b")
      .repartition(1).sortWithinPartitions("a")
    val got = SelectRows(spark, "* from [//tmp/o] offset 8 limit 1",
      Map("//tmp/o" -> ot)).collect()
    assert(got.toSeq == Seq(Row(8L, 8L)))
  }

  test("test_multi_between (test_query.py:1587): prefix-tuple multi-range BETWEEN") {
    val mt = (0 until 100).map(i => (i.toLong / 10, i.toLong % 10, i.toLong))
      .toDF("a", "b", "c")
    val got = SelectRows(spark,
      """* from [//tmp/m] where
          (a, b) between (
              (1) and (1, 2),
              (2, 3) and (2, 4),
              (3, 5) and (3),
              4 and 5
          )""",
      Map("//tmp/m" -> mt)).select("c").as[Long].collect().sorted
    val expected = ((10 until 13) ++ (23 until 25) ++ (35 until 40) ++
      (40 until 60)).map(_.toLong)
    assert(got.toSeq == expected)
  }

  test("test_select_with_case_operator (test_query.py:1853): searched and simple CASE") {
    val ct = Seq((0L, 0L), (3L, 2L), (1L, 2L)).toDF("a", "b")
    val cat = Map("//tmp/c" -> ct)
    val searched = SelectRows(spark,
      "case when a = 0 then 'aaa' when 15/a = 5 then 'bbb' else 'ccc' end as m " +
        "from [//tmp/c] order by m limit 3", cat).as[String].collect()
    assert(searched.toSeq == Seq("aaa", "bbb", "ccc"))
    val simple = SelectRows(spark,
      "case a when 0 then b when 1 then b + b * b else 2 end as m " +
        "from [//tmp/c] order by m limit 3", cat).as[Long].collect()
    assert(simple.toSeq == Seq(0L, 2L, 6L))
  }

  test("test_select_with_canonical_null_relations default branch (test_query.py:1911): null != 0 is TRUE") {
    val nt = Seq((0L, Some(0L)), (1L, Some(2L)), (3L, None)).toDF("a", "b")
    val got = SelectRows(spark, "a from [//tmp/nn] where b != 0 limit 3",
      Map("//tmp/nn" -> nt)).as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 3L), "default null relations: null != 0 must match")
  }

  test("default null relations: null is the smallest value in <, <=, >, >=") {
    val nt = Seq((0L, Some(0L)), (1L, Some(2L)), (3L, None)).toDF("a", "b")
    val cat = Map("//tmp/nc" -> nt)
    def ids(ql: String): Seq[Long] =
      SelectRows(spark, ql, cat).as[Long].collect().sorted.toSeq
    // null < 1 → true (null smallest); 0 < 1 → true
    assert(ids("a from [//tmp/nc] where b < 1 limit 10") == Seq(0L, 3L))
    // null <= null → true; everything <= 2
    assert(ids("a from [//tmp/nc] where b <= 2 limit 10") == Seq(0L, 1L, 3L))
    // b > 0: only 2 qualifies; null > 0 is false
    assert(ids("a from [//tmp/nc] where b > 0 limit 10") == Seq(1L))
    // b >= 0: null fails, values pass
    assert(ids("a from [//tmp/nc] where b >= 0 limit 10") == Seq(0L, 1L))
  }

  test("test_array_join (test_query.py:2008): multi ARRAY JOIN zips positionally with null padding") {
    val at = Seq(
      (1L, Some(Seq(1L, 2L, 3L)), Seq("1", "2", "3")),
      (2L, Some(Seq(5L, 6L)), Seq("5")),
      (3L, Some(Seq(7L)), Seq("7", "8")),
      (4L, None, Seq.empty[String])
    ).toDF("key", "nestedA", "nestedB")
    val cat = Map("//tmp/aj" -> at)
    val inner = SelectRows(spark,
      "key, flattenedA, flattenedB from [//tmp/aj] " +
        "array join nestedA as flattenedA, nestedB as flattenedB limit 100",
      cat).collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        r.getString(2))).sortBy(t => (t._1, String.valueOf(t._2)))
    assert(inner.toSeq == Seq(
      (1L, 1L, "1"), (1L, 2L, "2"), (1L, 3L, "3"),
      (2L, 5L, "5"), (2L, 6L, null),
      (3L, 7L, "7"), (3L, null, "8")).sortBy(t => (t._1, String.valueOf(t._2))))
    val left = SelectRows(spark,
      "key, flattenedA, flattenedB from [//tmp/aj] " +
        "left array join nestedA as flattenedA, nestedB as flattenedB limit 100",
      cat)
    assert(left.count() == 8) // +1: key 4 survives with null/null
    assert(left.where("key = 4 AND flattenedA IS NULL AND flattenedB IS NULL")
      .count() == 1)
  }

  test("test_select_with_placeholders (test_query.py:1740): typed {name} substitution incl. tuple values") {
    val pt = Seq(
      (1L, 0L, 1L, "a"), (2L, 0L, 5L, "f"), (3L, 1L, 3L, "a"),
      (4L, 1L, 1L, "d"), (5L, 1L, 3L, "d"), (6L, 0L, 1L, "a"),
      (7L, 0L, 1L, "a"), (8L, 1L, 5L, "f")
    ).toDF("a", "b", "c", "d")
    val cat = Map("//tmp/p" -> pt)
    val expected = Seq(Row(3L, 1L, 3L, "a"), Row(5L, 1L, 3L, "d"),
      Row(8L, 1L, 5L, "f"))
    val viaTuple = SelectRows(spark,
      "a, b, c, d from [//tmp/p] where b = {first} and (c, d) > {second} " +
        "order by a limit 3",
      cat, Map("first" -> 1L, "second" -> Seq(2L, "b"))).collect()
    assert(viaTuple.toSeq == expected)
    val viaScalars = SelectRows(spark,
      "a, b, c, d from [//tmp/p] where b = {first} and (c, d) > ({second}, {third}) " +
        "order by a limit 3",
      cat, Map("first" -> 1L, "second" -> 2L, "third" -> "b")).collect()
    assert(viaScalars.toSeq == expected)
  }

  test("test_subquery (test_query.py:2463): nested FROM, projection narrowing, agg-of-agg") {
    val st = Seq(
      (0L, 4L, "Cecil"), (0L, 5L, "Quarantine"), (0L, 6L, "Boulevard"),
      (0L, 7L, "Limbo"), (1L, 4L, "Genos"), (1L, 5L, "Alpha"),
      (1L, 6L, "Enigma"), (1L, 7L, "Diaspora")
    ).toDF("k_1", "k_2", "v").repartition(1).sortWithinPartitions("k_1", "k_2")
    val cat = Map("//tmp/sq" -> st)
    assert(SelectRows(spark,
      "* FROM (SELECT * FROM (SELECT * FROM (SELECT * FROM [//tmp/sq] limit 100) limit 100) limit 100)",
      cat).count() == 8)
    assert(SelectRows(spark,
      "k_1 FROM (SELECT * FROM [//tmp/sq] limit 1)", cat)
      .as[Long].collect().toSeq == Seq(0L))
    assert(SelectRows(spark,
      "k_2 FROM (SELECT k_1, k_2 FROM [//tmp/sq] limit 1)", cat)
      .as[Long].collect().toSeq == Seq(4L))
    // agg of agg: min over per-k_1 minima, max over per-k_2 maxima
    assert(SelectRows(spark,
      "min(v) as v FROM (SELECT min(v) as v from [//tmp/sq] group by k_1) group by 1",
      cat).select("v").as[String].collect().toSeq == Seq("Alpha"))
    assert(SelectRows(spark,
      "max(v) as v FROM (SELECT max(v) as v from [//tmp/sq] group by k_2) group by 1",
      cat).select("v").as[String].collect().toSeq == Seq("Quarantine"))
    assert(SelectRows(spark,
      "k_1, max(v) as v FROM (SELECT min(k_1) as k_1, min(v) as v from [//tmp/sq] group by k_2) group by k_1",
      cat).collect().toSeq == Seq(Row(0L, "Diaspora")))
  }

  test("test_composite_types (test_query.py:2162): struct member access through the string surface") {
    val rows = (0 until 100).map(i => (i.toLong, (i, i * 2)))
    val ct = rows.toDF("key", "value")
    val got = SelectRows(spark,
      "t.key as k, t.value._1 as v from [//tmp/cmp] as t limit 100",
      Map("//tmp/cmp" -> ct)).as[(Long, Long)].collect().sorted
    assert(got.toSeq == (0 until 100).map(i => (i.toLong, i.toLong)))
  }

  test("test_join_common_prefix (test_query.py:697): LEFT JOIN USING on the full key") {
    val jlt = Seq((1L, 2L, 80L), (1L, 3L, 71L), (1L, 4L, 62L), (2L, 1L, 53L),
      (2L, 2L, 44L), (2L, 3L, 35L), (2L, 4L, 26L), (3L, 1L, 17L))
      .toDF("a", "b", "c")
    val jrt = Seq((1L, 2L, 80L), (1L, 4L, 62L), (2L, 1L, 53L), (2L, 3L, 35L),
      (3L, 1L, 17L)).toDF("a", "b", "d")
    val got = SelectRows(spark,
      "* from [//tmp/cpl] left join [//tmp/cpr] using a, b",
      Map("//tmp/cpl" -> jlt, "//tmp/cpr" -> jrt))
      .select("a", "b", "c", "d")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).sorted
    assert(got.toSeq == Seq(
      (1L, 2L, 80L, 80L), (1L, 3L, 71L, -1L), (1L, 4L, 62L, 62L),
      (2L, 1L, 53L, 53L), (2L, 2L, 44L, -1L), (2L, 3L, 35L, 35L),
      (2L, 4L, 26L, -1L), (3L, 1L, 17L, 17L)))
  }

  test("test_join_common_prefix3 (test_query.py:782): qualified tuple ON keys") {
    val jlt = (1 to 8).map(i => (1L, i.toLong)).toDF("a", "c")
    val perm = Seq(2L, 4L, 3L, 1L, 5L, 8L, 7L, 6L)
    val jrt = perm.zipWithIndex.map { case (c, ix) => (1L, ix + 1L, c) }
      .toDF("a", "b", "c")
    val got = SelectRows(spark,
      "l.a, l.c, r.b from [//tmp/c3l] as l left join [//tmp/c3r] as r " +
        "on (l.a, l.c) = (r.a, r.c) where l.a = 1",
      Map("//tmp/c3l" -> jlt, "//tmp/c3r" -> jrt))
      .as[(Long, Long, Long)].collect().sorted
    // r.b is the position of l.c in the permutation
    val expected = (1 to 8).map(i => (1L, i.toLong, perm.indexOf(i.toLong) + 1L))
    assert(got.toSeq == expected)
  }

  test("test_join_common_prefix2 (test_query.py:752): literal element in the ON tuple") {
    val jlt = Seq((1L, 3L)).toDF("a", "c")
    val jrt = Seq((1L, 2L, 4L)).toDF("a", "b", "d")
    val got = SelectRows(spark,
      "l.a, l.c, r.b, r.d from [//tmp/c2l] as l left join [//tmp/c2r] as r " +
        "on (l.a, 2) = (r.a, r.b) where l.a = 1",
      Map("//tmp/c2l" -> jlt, "//tmp/c2r" -> jrt)).collect()
    assert(got.toSeq == Seq(Row(1L, 3L, 2L, 4L)))
  }

  test("test_group_by_primary_prefix (test_query.py:219): group by key prefix + expression alias") {
    val data = (0 until 100).map(i => (i / 10L, i % 10L, i.toLong))
    val tt = data.toDF("a", "b", "v")
    val expected = data.groupBy(r => (r._1, r._3 % 2))
      .map { case ((k, x), rows) => (k, x, rows.map(_._2).sum) }.toSeq.sorted
    val got = SelectRows(spark,
      "k, x, sum(b) as s from [//tmp/gpp] group by a as k, v % 2 as x",
      Map("//tmp/gpp" -> tt)).as[(Long, Long, Long)].collect().sorted
    assert(got.toSeq == expected)
  }

  test("test_group_by_disjoint (test_query.py:256): join using + group by prefix") {
    val tt = (0 until 10).map(i => (i.toLong, 0L)).toDF("a", "dummy")
    val tj = (0 until 100).map(i => (i / 10L, i % 10L, i.toLong)).toDF("a", "b", "v")
    val expected = (0 until 100).map(i => (i / 10L, i % 10L, i.toLong))
      .groupBy(r => (r._1, r._3 % 2))
      .map { case ((k, x), rows) => (k, x, rows.map(_._2).sum) }.toSeq.sorted
    val got = SelectRows(spark,
      "k, x, sum(b) as s from [//tmp/gdt] join [//tmp/gdj] using a group by a as k, v % 2 as x",
      Map("//tmp/gdt" -> tt, "//tmp/gdj" -> tj)).as[(Long, Long, Long)].collect().sorted
    assert(got.toSeq == expected)
  }

  test("test_join_via_in (test_query.py:562): ON equality + constant predicate") {
    val jlt = Seq((1L, 1L), (2L, 3L), (3L, 6L), (4L, 1L), (5L, 3L), (6L, 6L))
      .toDF("a", "b")
    val jrt = Seq((1L, 2L, "a"), (2L, 1L, "b"), (2L, 2L, "c"), (2L, 3L, "d"),
      (2L, 4L, "e"), (2L, 5L, "f"), (2L, 6L, "g"), (3L, 1L, "h"))
      .toDF("c", "d", "e")
    val got = SelectRows(spark,
      "* from [//tmp/vjl] join [//tmp/vjr] on b = d and c = 2",
      Map("//tmp/vjl" -> jlt, "//tmp/vjr" -> jrt))
      .select("a", "b", "c", "d", "e")
      .as[(Long, Long, Long, Long, String)].collect().sorted
    assert(got.toSeq == Seq(
      (1L, 1L, 2L, 1L, "b"), (2L, 3L, 2L, 3L, "d"), (3L, 6L, 2L, 6L, "g"),
      (4L, 1L, 2L, 1L, "b"), (5L, 3L, 2L, 3L, "d"), (6L, 6L, 2L, 6L, "g")))
  }

  test("test_join_many (test_query.py:886): chained USING joins + IN filter") {
    val ta = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "a"), (5L, "b"), (6L, "c"))
      .toDF("a", "c")
    val tb = Seq((100L, "a", "X"), (200L, "b", "Y"), (300L, "c", "X"),
      (400L, "a", "Y"), (500L, "b", "X"), (600L, "c", "Y")).toDF("b", "c", "d")
    val tc = Seq(("X", 1234L), ("Y", 5678L)).toDF("d", "e")
    val got = SelectRows(spark,
      "a, c, b, d, e from [//tmp/ma] join [//tmp/mb] using c join [//tmp/mc] using d where a in (2,3,4)",
      Map("//tmp/ma" -> ta, "//tmp/mb" -> tb, "//tmp/mc" -> tc))
      .as[(Long, String, Long, String, Long)].collect().sorted
    assert(got.toSeq == Seq(
      (2L, "b", 200L, "Y", 5678L), (2L, "b", 500L, "X", 1234L),
      (3L, "c", 300L, "X", 1234L), (3L, "c", 600L, "Y", 5678L),
      (4L, "a", 100L, "X", 1234L), (4L, "a", 400L, "Y", 5678L)))
  }

  test("test_yt_22385 (test_query.py:947): repeated self-join with ON expressions") {
    val tt = Seq((0L, 1L), (1L, 2L)).toDF("a", "b")
    val got = SelectRows(spark,
      "t1.a, t1.b, t2.b, t3.b from [//tmp/y22] t1 " +
        "join [//tmp/y22] t2 on (t1.a + 0) = (t2.a) " +
        "join [//tmp/y22] t3 on (t1.a + 0) = (t3.a)",
      Map("//tmp/y22" -> tt)).as[(Long, Long, Long, Long)].collect().sorted
    assert(got.toSeq == Seq((0L, 1L, 1L, 1L), (1L, 2L, 2L, 2L)))
  }

  test("test_aggregate_string_capture (test_query.py:1371): min(lower()) over 2047 rows, group by constant") {
    val data = (1 until 2048).map(j => Tuple1("A" + j + "BCD"))
    val got = SelectRows(spark,
      "min(lower(a)) as m from [//tmp/asc] group by 1",
      Map("//tmp/asc" -> data.toDF("a"))).as[String].collect()
    assert(got.toSeq == Seq("a1000bcd"))
  }

  test("test_array_join_descartes (test_query.py:2124): chained ARRAY JOINs multiply") {
    val tt = Seq(
      (1L, Seq(1L, 2L, 3L), Seq("1", "2", "3")),
      (2L, Seq(5L, 6L), Seq("5")),
      (3L, Seq(7L), Seq("7", "8")),
      (4L, null, Seq.empty[String])
    ).toDF("key", "nestedA", "nestedB")
    val got = SelectRows(spark,
      "key, flattenedA, flattenedB from [//tmp/dsc] " +
        "array join nestedA as flattenedA array join nestedB as flattenedB limit 100",
      Map("//tmp/dsc" -> tt)).as[(Long, Long, String)].collect().sorted
    val expected = Seq(
      (1L, 1L, "1"), (1L, 1L, "2"), (1L, 1L, "3"),
      (1L, 2L, "1"), (1L, 2L, "2"), (1L, 2L, "3"),
      (1L, 3L, "1"), (1L, 3L, "2"), (1L, 3L, "3"),
      (2L, 5L, "5"), (2L, 6L, "5"),
      (3L, 7L, "7"), (3L, 7L, "8"))
    assert(got.toSeq == expected)
  }

  test("test_array_join_with_table_join (test_query.py:2043): ARRAY JOIN interleaved with table JOIN") {
    val ta = Seq(
      (1L, Seq[java.lang.Long](1L, null, 3L)),
      (2L, Seq[java.lang.Long](5L, 6L)),
      (3L, Seq[java.lang.Long](7L)),
      (4L, Seq.empty[java.lang.Long])).toDF("key", "nestedA")
    val tb = Seq(
      (1L, Seq("1", "2", "3")), (2L, Seq("5")), (3L, Seq("7", "8")),
      (4L, Seq.empty[String])).toDF("key", "nestedB")
    val cat = Map("//tmp/aja" -> ta, "//tmp/ajb" -> tb)
    val got = SelectRows(spark,
      "key, flattenedA, flattenedB from [//tmp/aja] " +
        "array join nestedA as flattenedA " +
        "join [//tmp/ajb] using key " +
        "array join nestedB as flattenedB limit 100", cat)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2))).sorted
    val expected = Seq(
      (1L, -1L, "1"), (1L, -1L, "2"), (1L, -1L, "3"),
      (1L, 1L, "1"), (1L, 1L, "2"), (1L, 1L, "3"),
      (1L, 3L, "1"), (1L, 3L, "2"), (1L, 3L, "3"),
      (2L, 5L, "5"), (2L, 6L, "5"),
      (3L, 7L, "7"), (3L, 7L, "8")).sorted
    assert(got.toSeq == expected)

    // aliased variant: qualified refs through the folded subselect
    val got2 = SelectRows(spark,
      "A.key as k, flattenedA, flattenedB from [//tmp/ajb] AS B " +
        "array join B.nestedB as flattenedB " +
        "join [//tmp/aja] AS A on B.key = A.key " +
        "array join A.nestedA as flattenedA limit 100", cat)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2))).sorted
    assert(got2.toSeq == expected)
  }

  test("test_any_to_yson_string (test_query.py:1653): canonical Any back to text YSON") {
    val data = (0 until 11).map(i => (i.toLong, s"""{"x":$i}"""))
    val got = SelectRows(spark,
      "a, any_to_yson_string(b) as b_str from [//tmp/a2y] where a = 7",
      Map("//tmp/a2y" -> data.toDF("a", "b"))).as[(Long, String)].collect()
    assert(got.toSeq == Seq((7L, """{"x"=7;}""")))
  }

  test("test_ql_corpus shapes (test_query.py:2690): bare-constant projections") {
    assert(q("0 from [//tmp/t]").as[Int].collect().toSeq == Seq.fill(9)(0))
    assert(q("42 from [//tmp/t]").distinct().as[Int].collect().toSeq == Seq(42))
    val got = q("a + 42 from [//tmp/t] where a > 0")
    assert(got.as[Long].collect().sorted.toSeq == (1 to 9).map(_ + 42L))
  }

  test("test_filter_ranges (test_query.py:1786): tuple IN and BETWEEN range shapes") {
    val rows = Seq((1L, 1L, 1L, 1L), (3L, 3L, 3L, 3L), (5L, 5L, 5L, 5L))
    val tt = rows.toDF("a", "b", "c", "d")
    def check(expected: Seq[(Long, Long, Long, Long)], predicate: String): Unit = {
      val got = SelectRows(spark, s"* from [//tmp/fr] where $predicate",
        Map("//tmp/fr" -> tt)).as[(Long, Long, Long, Long)].collect().sorted
      assert(got.toSeq == expected, predicate)
    }
    check(rows.take(1), "(a) in ((1), (2))")
    check(rows.take(1), "(a, b) in ((1, 1), (1, 2), (2, 1))")
    check(rows.take(2), "(a, b, c) in ((1, 1, 1), (2, 2, 2), (3, 3, 3))")
    check(rows.take(1), "(a) between (1) and (2)")
    check(rows.take(1), "(a, b) between ((1) and (1, 2))")
    check(Nil, "(a, b) between (1, 2) and (2, 1)")
    check(Nil, "(a, b) between ((2) and (2, 1))")
    check(rows.drop(1), """(a, b, c) between (
                 (3, 3, 2) and (3, 3, 4),
                 (5, 3) and (5, 4),
                 (5, 5, 5) and (5, 6))""")
  }

  test("test_join_range_inference_uses_predicate (test_query.py:2407): USING + AND foreign predicate") {
    val tt = Seq((0L, 0L, 0L)).toDF("k0", "k1", "v0")
    val tj = Seq((0L, 0L, 0L, 1L), (0L, 0L, 10L, 1L)).toDF("k0", "k1", "k2", "v1")
    val cat = Map("//tmp/rit" -> tt, "//tmp/rij" -> tj)
    val got = SelectRows(spark,
      "k0, k1, k2, v1 from [//tmp/rit] join [//tmp/rij] using k0, k1 and k2 = 0",
      cat).as[(Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq((0L, 0L, 0L, 1L)))

    val got2 = SelectRows(spark,
      "D.k0 as k0, D.k1 as k1, D.k2 as k2, D.v1 as v1 from [//tmp/rit] T " +
        "join [//tmp/rij] D on (T.k0, T.k1) = (D.k0, D.k1) AND D.k2 = 0",
      cat).as[(Long, Long, Long, Long)].collect()
    assert(got2.toSeq == Seq((0L, 0L, 0L, 1L)))
  }

  test("test_push_down_group_by_primary_key (test_query.py:2521): LEFT JOIN + hint + group on primary key") {
    val tt = (0 until 10).map(i => (i.toLong, 0L)).toDF("k", "v")
    val td = (0 until 66).map(i => (i / 10L, i % 10L, i.toLong))
      .toDF("k", "k_extra", "clicks")
    val expected: Seq[(Long, Option[Long])] =
      (0 until 7).map(k => (k.toLong,
        Some((0 until 66).filter(_ / 10 == k).map(_.toLong).sum))) ++
        (7 until 10).map(k => (k.toLong, None: Option[Long]))
    val got = SelectRows(spark,
      """k, sum(D.clicks) AS sum FROM [//tmp/pdt] T
        LEFT JOIN [//tmp/pdd] D WITH HINT "{push_down_group_by=%true}" on T.k = D.k
        GROUP BY T.k AS k
        ORDER BY sum DESC LIMIT 2000""",
      Map("//tmp/pdt" -> tt, "//tmp/pdd" -> td))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).sortBy(_._1)
    assert(got.toSeq == expected.sortBy(_._1))
  }

  test("test_select_from_ordered_table (test_query.py:2332): [$tablet_index]/[$row_index] system columns") {
    val ot = (0 until 10).map(i => (0L, i.toLong, i.toLong))
      .toDF("$tablet_index", "$row_index", "value")
    val cat = Map("//tmp/ord" -> ot)
    val expected = (0 until 10).map(i => (0L, i.toLong, i.toLong))

    // full scan
    val full = SelectRows(spark, "* from [//tmp/ord] limit 10", cat)
      .as[(Long, Long, Long)].collect().sorted
    assert(full.toSeq == expected)

    // prefix scan
    val pre = SelectRows(spark,
      "* from [//tmp/ord] where [$tablet_index] in (0) limit 10", cat)
      .as[(Long, Long, Long)].collect().sorted
    assert(pre.toSeq == expected)

    // full key scan
    val one = SelectRows(spark,
      "* from [//tmp/ord] where ([$tablet_index], [$row_index]) in ((0,0))", cat)
      .as[(Long, Long, Long)].collect()
    assert(one.toSeq == Seq((0L, 0L, 0L)))

    // join on common key
    val joined = SelectRows(spark,
      "* from [//tmp/ord] join [//tmp/ord] using [$tablet_index], [$row_index], value limit 10",
      cat).as[(Long, Long, Long)].collect().sorted
    assert(joined.toSeq == expected)

    // join on common key prefix through aliases
    val prefix = SelectRows(spark,
      "A.value as v from [//tmp/ord] A join [//tmp/ord] B on " +
        "(A.[$tablet_index], A.value) = (B.[$tablet_index], B.[$row_index]) limit 10",
      cat).as[Long].collect().sorted
    assert(prefix.toSeq == (0L until 10L))

    // join on foreign key prefix with a literal element
    val lit0 = SelectRows(spark,
      "A.value as v from [//tmp/ord] A join [//tmp/ord] B on " +
        "(0, A.value) = (B.[$tablet_index], B.[$row_index]) limit 10",
      cat).as[Long].collect().sorted
    assert(lit0.toSeq == (0L until 10L))
  }

  test("SimpleInWithNull (ql_query_ut.cpp:2561): null members in the IN rowset match nulls") {
    val tt = Seq(
      (None, Some(1L)), (Some(2L), None), (Some(2L), Some(1L)), (None, None)
    ).map { case (a, b) => (a.map(Long.box).orNull, b.map(Long.box).orNull) }
      .toDF("a", "b")
    val got = SelectRows(spark,
      "a, b FROM [//tmp/inn] where (a, b) in ((null, 1), (2, null))",
      Map("//tmp/inn" -> tt)).collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).sorted
    assert(got.toSeq == Seq((-1L, 1L), (2L, -1L)))

    // scalar IN with a null member
    val one = SelectRows(spark,
      "a FROM [//tmp/inn] where a in (null)", Map("//tmp/inn" -> tt))
    assert(one.count() == 2)
  }

  test("ArrayJoinWithPredicate (ql_query_ut.cpp:5262): predicate filters unnested rows, LEFT keeps empty parents") {
    val tt = Seq(
      (1L, Seq(1L, 2L, 3L, 4L), Seq(-1L, -2L, -3L)),
      (3L, Seq(5L, 6L, 7L), Seq(-5L, -6L, -7L, -8L)),
      (5L, Seq(9L), Seq(-9L))
    ).toDF("key", "nestedA", "nestedB")
    val got = SelectRows(spark,
      "key, flattenedA, flattenedB FROM [//tmp/ajp] " +
        "LEFT ARRAY JOIN nestedA AS flattenedA, nestedB AS flattenedB " +
        "AND flattenedA IN (1, 2, 3, 4, 5)",
      Map("//tmp/ajp" -> tt)).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) Long.MinValue else r.getLong(1),
        if (r.isNullAt(2)) Long.MinValue else r.getLong(2))).sorted
    val N = Long.MinValue
    assert(got.toSeq == Seq(
      (1L, 1L, -1L), (1L, 2L, -2L), (1L, 3L, -3L), (1L, 4L, N),
      (3L, 5L, -5L), (5L, N, N)).sorted)
  }

  test("QuotedColumnNames / SelectKeyword (ql_query_ut.cpp:9439): backtick identifiers and keyword columns") {
    val weird = "column ]]] \n \t B ’ ` "
    val t1 = Seq(4L, 10L).toDF(weird)
    val got = SelectRows(spark,
      "`column ]]] \\n \\t \\x42 \\u2019 \\` ` FROM `//tmp/q1`",
      Map("//tmp/q1" -> t1)).as[Long].collect().sorted
    assert(got.toSeq == Seq(4L, 10L))

    val t2 = Seq(4L, 10L).toDF("where")
    val got2 = SelectRows(spark, "`where` FROM [//tmp/q2]",
      Map("//tmp/q2" -> t2)).as[Long].collect().sorted
    assert(got2.toSeq == Seq(4L, 10L))
  }

  test("UnaryNullOperations (ql_query_ut.cpp:9501): unary minus / bitwise-not of the entity literal") {
    assert(q("* from [//tmp/t] where a != (-#)").count() == 9)
    assert(q("* from [//tmp/t] where a != ~#").count() == 9)
  }

  test("test_cardinality (test_query.py:1397): HLL within 5% incl. totals row") {
    // 20000 distinct values inserted 4x over — 10000 distinct per parity
    val ct = (0 until 20000).flatMap(i => Seq.fill(4)(i.toLong)).toDF("a")
    val got = SelectRows(spark,
      "cardinality(a) as b from [//tmp/card] group by a % 2 as k with totals",
      Map("//tmp/card" -> ct))
      .select("b").as[Long].collect().sorted
    assert(got.length == 3)
    assert(got(0) > 9500 && got(0) < 10500, got.toSeq)  // parity groups
    assert(got(1) > 9500 && got(1) < 10500, got.toSeq)
    assert(got(2) > 19000 && got(2) < 21000, got.toSeq) // totals row
  }

  // ---- typed Any ordering (ql_query_ut.cpp CompareAny family) ----
  // Any carrier is canonical JSON; the schemas tag columns with the
  // `any` logical type so SelectRows routes comparisons through
  // any_compare / any_sort_key (QLEmitter's CompareAny lowering).

  private def anyTagged(rows: Seq[Seq[Any]], cols: (String, graft.types.YtTypes.YtType)*) = {
    import graft.types.YtTypes._
    import scala.jdk.CollectionConverters._
    val schema = YtSchema(cols.map { case (n, t) => YtColumn(n, t) }).toStructType
    spark.createDataFrame(rows.map(r => Row(r: _*)).asJava, schema)
  }

  test("CompareAny (ql_query_ut.cpp:7500): <,>,<=,>=,=,!= over Any pairs") {
    import graft.types.YtTypes.YtAny
    // (a, b, a<b) — a=b when the flag is false, exactly the reference rows
    val rows = Seq(
      ("false", "true", true), ("false", "false", false),
      ("1", "2", true), ("1", "1", false),
      ("1", "2", true), ("1", "1", false),          // the uint pairs
      ("1.0", "2.0", true), ("1.0", "1.0", false),
      ("\"x\"", "\"y\"", true), ("\"x\"", "\"x\"", false),
      ("[1,2,3]", "[1,3,4]", true), ("[1,2,3]", "[1,2,3]", false))
    val df = anyTagged(rows.map(r => Seq(r._1, r._2)), "a" -> YtAny, "b" -> YtAny)
    val got = SelectRows(spark,
      "a < b as r1, a > b as r2, a <= b as r3, a >= b as r4, a = b as r5, a != b as r6 from [//tmp/cmpany]",
      Map("//tmp/cmpany" -> df))
      .as[(Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)].collect()
    got.zip(rows).foreach { case (r, (a, b, lt)) =>
      assert(r == (lt, false, true, !lt, !lt, lt), s"$a vs $b")
    }
  }

  test("CompareAnyMixed (ql_query_ut.cpp:7554): Any column vs typed column") {
    import graft.types.YtTypes._
    val ql = "a < b as r1, a > b as r2, a <= b as r3, a >= b as r4, " +
      "a = b as r5, a != b as r6, a < b = b > a and a > b = b < a as r7 from [//tmp/cmpmix]"
    def check(df: org.apache.spark.sql.DataFrame): Unit = {
      val got = SelectRows(spark, ql, Map("//tmp/cmpmix" -> df))
        .as[(Boolean, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)].collect()
      assert(got.toSeq == Seq(
        (true, false, true, false, false, true, true),
        (false, false, true, true, true, false, true)))
    }
    check(anyTagged(Seq(Seq("false", true), Seq("false", false)),
      "a" -> YtAny, "b" -> YtBoolean))
    check(anyTagged(Seq(Seq("1", 2L), Seq("1", 1L)),
      "a" -> YtAny, "b" -> YtInt64))
    check(anyTagged(Seq(Seq("1", 2L), Seq("1", 1L)),
      "a" -> YtAny, "b" -> YtUint64))
    check(anyTagged(Seq(Seq("1.0", 2.0), Seq("1.0", 1.0)),
      "a" -> YtAny, "b" -> YtDouble))
    check(anyTagged(Seq(Seq("\"x\"", "y"), Seq("\"x\"", "x")),
      "a" -> YtAny, "b" -> YtUtf8))
  }

  test("ToAnyAndCompare (ql_query_ut.cpp:7617): to_any(a) = a for every scalar type") {
    import graft.types.YtTypes._
    def check(df: org.apache.spark.sql.DataFrame): Unit =
      assert(SelectRows(spark, "to_any(a) = a as r from [//tmp/toany]",
        Map("//tmp/toany" -> df)).as[Boolean].collect().toSeq == Seq(true))
    check(anyTagged(Seq(Seq(false)), "a" -> YtBoolean))
    check(anyTagged(Seq(Seq(1L)), "a" -> YtInt64))
    check(anyTagged(Seq(Seq(1.0)), "a" -> YtDouble))
    check(anyTagged(Seq(Seq("x")), "a" -> YtUtf8))
  }

  test("OrderByAny / GroupByAny (ql_query_ut.cpp:10444,10466): typed sort + group on Any") {
    import graft.types.YtTypes.YtAny
    val lists = Seq("[1,2,3]", "[2,4,5]", "[2,3,4]", "[0]",
      "[2,3,4]", "[2,4,5]", "[1,2,3]", "[0]", "[0]", "[1,2,3]")
    val expected = Seq("[0]", "[1,2,3]", "[2,3,4]", "[2,4,5]")
    val ordered = anyTagged(lists.take(4).map(Seq(_)), "a" -> YtAny)
    assert(SelectRows(spark, "a from [//tmp/anyord] order by a limit 4",
      Map("//tmp/anyord" -> ordered)).as[String].collect().toSeq == expected)
    val grouped = anyTagged(lists.map(Seq(_)), "a" -> YtAny)
    assert(SelectRows(spark, "a from [//tmp/anygrp] group by a order by a limit 4",
      Map("//tmp/anygrp" -> grouped)).as[String].collect().toSeq == expected)
  }

  test("FilterNulls1/2 (ql_query_ut.cpp:2213): null fails b > 0, is_null rescues it") {
    val ft = Seq((4L, Some(5L)), (6L, None), (10L, Some(11L))).toDF("a", "b")
    val cat = Map("//tmp/fn" -> ft)
    val strict = SelectRows(spark, "a, b from [//tmp/fn] where b > 0", cat)
      .as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(strict.toSeq == Seq((4L, Some(5L)), (10L, Some(11L))))
    val rescued = SelectRows(spark,
      "a, b from [//tmp/fn] where b > 0 or is_null(b)", cat)
      .as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(rescued.map(_._1).toSeq == Seq(4L, 6L, 10L))
  }

  test("Greatest (ql_query_ut.cpp:10303): variadic incl. 1-arg, ints and strings") {
    val gt = Seq((1L, 1.0, "a"), (-10L, -10.0, "xa"), (1333L, 1333.3, "abac"))
      .toDF("a", "c", "e")
    val cat = Map("//tmp/gr" -> gt)
    val ints = SelectRows(spark,
      "greatest(a) as r1, greatest(5, a) as r2, greatest(0, 7, a) as r3 from [//tmp/gr]", cat)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(ints.toSeq == Seq((-10L, 5L, 7L), (1L, 5L, 7L), (1333L, 1333L, 1333L)))
    val strs = SelectRows(spark,
      "greatest(e) as r1, greatest('ada', e) as r2 from [//tmp/gr]", cat)
      .as[(String, String)].collect().sortBy(_._1)
    assert(strs.toSeq == Seq(("a", "ada"), ("abac", "ada"), ("xa", "xa")))
  }

  test("IsPrefixStrings / IsSubstrStrings (ql_query_ut.cpp:2840): needle-first argument order") {
    val st = Seq("foobar", "barfoo", "abc", "baz foo bar", "baz fo bar", "xyz", "baz")
      .toDF("s")
    val cat = Map("//tmp/ps" -> st)
    assert(SelectRows(spark,
      """s from [//tmp/ps] where is_prefix("foo", s)""", cat)
      .as[String].collect().toSeq == Seq("foobar"))
    val subs = SelectRows(spark,
      """s from [//tmp/ps] where is_substr("foo", s) or is_substr(s, "XX baz YY")""", cat)
      .as[String].collect().sorted
    assert(subs.toSeq == Seq("barfoo", "baz", "baz foo bar", "foobar"))
  }

  test("GroupByBool / StringAgg (ql_query_ut.cpp:2885,8530): boolean group keys, min/max over strings") {
    val bt = (1 to 9).map(i => (i.toLong, 10L * i)).toDF("a", "b")
    val got = SelectRows(spark,
      "x, sum(b) as t from [//tmp/gb] where a > 1 group by a % 2 = 1 as x",
      Map("//tmp/gb" -> bt)).as[(Boolean, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((false, 200L), (true, 240L)))
    val sa = Seq("one", "two", "three", "four", "fo").toDF("a")
    val mm = SelectRows(spark,
      "min(a) as b, max(a) as c from [//tmp/sa] group by 1",
      Map("//tmp/sa" -> sa)).as[(String, String)].collect()
    assert(mm.toSeq == Seq(("fo", "two")))
  }

  test("MultipleBetweenAndString (ql_query_ut.cpp:2451): string prefix-tuple range list") {
    val rows = Seq(("1", "10"), ("1", "30"), ("2", "20"), ("2", "30"), ("2", "40"),
      ("2", "50"), ("3", "30"), ("3", "50"), ("3", "60"), ("4", "5"), ("5", "5"),
      ("6", "5"), ("10", "11"), ("15", "11"))
    val got = SelectRows(spark,
      """a, b from [//tmp/sb] where
          (a, b) between (
              ("1") and ("1", "20"),
              ("2", "30") and ("2", "40"),
              ("3", "50") and ("3"),
              "4" and "5"
          )""",
      Map("//tmp/sb" -> rows.toDF("a", "b"))).as[(String, String)].collect().sorted
    assert(got.toSeq == Seq(("1", "10"), ("2", "30"), ("2", "40"), ("3", "50"),
      ("3", "60"), ("4", "5"), ("5", "5")).sorted)
  }

  test("TwoLeftJoinOneToMany (ql_query_ut.cpp:6504): chained LEFT JOINs fan out 2x3") {
    val phrases = Seq((49353617L, 4098243503L)).toDF("cid", "pid")
    val tagGroup = Seq((4098243503L, 39139420L), (4098243503L, 39139421L))
      .toDF("pid", "tag_id")
    val stat = Seq(
      (49353617L, 4098243503L, 1579813200L),
      (49353617L, 4098243503L, 1580072400L),
      (49353617L, 4098243503L, 1580158800L)).toDF("ExportID", "GroupExportID", "UpdateTime")
    val got = SelectRows(spark,
      """TG.tag_id as tag_id, S.UpdateTime as UpdateTime
         FROM [//tmp/phrases] AS P
         LEFT JOIN [//tmp/tag_group] AS TG ON P.pid = TG.pid
         LEFT JOIN [//tmp/stat] AS S ON (P.cid, P.pid) = (S.ExportID, S.GroupExportID)""",
      Map("//tmp/phrases" -> phrases, "//tmp/tag_group" -> tagGroup,
        "//tmp/stat" -> stat)).as[(Long, Long)].collect().sorted
    assert(got.toSeq == Seq(
      (39139420L, 1579813200L), (39139420L, 1580072400L), (39139420L, 1580158800L),
      (39139421L, 1579813200L), (39139421L, 1580072400L), (39139421L, 1580158800L)))
  }

  test("AverageAgg2/3 (ql_query_ut.cpp:8464): avg per group, null-only group yields null") {
    val at = Seq((3L, 3L, 1L), (53L, 2L, 3L), (8L, 5L, 32L), (24L, 7L, 4L),
      (33L, 4L, 9L), (33L, 3L, 43L), (23L, 0L, 0L), (33L, 8L, 2L)).toDF("a", "b", "c")
    val got = SelectRows(spark,
      "avg(a) as r1, x, max(c) as r2, avg(c) as r3, min(a) as r4 from [//tmp/av] group by b % 2 as x",
      Map("//tmp/av" -> at)).as[(Double, Long, Long, Double, Long)].collect().sortBy(_._2)
    assert(got.toSeq == Seq((35.5, 0L, 9L, 3.5, 23L), (17.0, 1L, 43L, 20.0, 3L)))

    val nt = Seq((Some(3.0), 1L), (None, 1L), (None, 0L), (Some(7.0), 1L)).toDF("a", "b")
    val got3 = SelectRows(spark, "b, avg(a) as x from [//tmp/av3] group by b",
      Map("//tmp/av3" -> nt)).as[(Long, Option[Double])].collect().sortBy(_._1)
    assert(got3.toSeq == Seq((0L, None), (1L, Some(5.0))))
  }

  test("Casts (ql_query_ut.cpp:8715): int64/double/uint64 casts with null passthrough") {
    val ct = Seq(
      (Some(3L), Some(34L), None: Option[Double]),
      (None, None, Some(1.23)),
      (Some(12L), None, None),
      (None, Some(0L), Some(1.0)),
      (Some(5L), None, None)).toDF("a", "b", "c")
    val got = SelectRows(spark,
      "int64(a) as r1, double(b) as r2, uint64(c) as r3 from [//tmp/cast]",
      Map("//tmp/cast" -> ct))
      .as[(Option[Long], Option[Double], Option[Long])].collect()
    assert(got.toSeq.sortBy(_.toString) == Seq(
      (Some(3L), Some(34.0), None), (None, None, Some(1L)), (Some(12L), None, None),
      (None, Some(0.0), Some(1L)), (Some(5L), None, None)).sortBy(_.toString))
  }

  test("CompositeMemberAccessorListAndDict (ql_query_ut.cpp:7961): deep struct/list/dict paths") {
    val base = Seq(
      (Seq(1, 2, 3), Map("i" -> 1, "j" -> 2, "k" -> 3), Map("a" -> "b", "c" -> "d")),
      (Seq(2), Map("i" -> 2), Map.empty[String, String]),
      (Seq(3), Map("i" -> 3), Map.empty[String, String]),
      (Seq.empty[Int], Map.empty[String, Int], Map.empty[String, String]))
      .toDF("list", "d1", "dict")
      .selectExpr(
        "named_struct('a', named_struct('b', named_struct('list', list, 'dict', d1))) as struct",
        "dict")
    val cat = Map("//tmp/cm" -> base)
    def ints(ql: String): Seq[Option[Int]] =
      SelectRows(spark, ql, cat).as[Option[Int]].collect().toSeq.sortBy(_.getOrElse(Int.MaxValue))
    assert(SelectRows(spark,
      "t.dict['a'] as a, t.dict['c'] as c from [//tmp/cm] as t where t.dict['a'] = 'b'", cat)
      .as[(String, String)].collect().toSeq == Seq(("b", "d")))
    assert(ints("t.struct.a.b.list[0] as c from [//tmp/cm] as t") ==
      Seq(Some(1), Some(2), Some(3), None))
    assert(ints("t.struct.a.b.dict['i'] as c from [//tmp/cm] as t") ==
      Seq(Some(1), Some(2), Some(3), None))
    assert(ints("t.struct.a.b.list[1+1] as c from [//tmp/cm] as t") ==
      Seq(Some(3), None, None, None))
    assert(ints("t.struct.a.b.dict[concat('k', '')] as c from [//tmp/cm] as t") ==
      Seq(Some(3), None, None, None))
    assert(ints("t.struct.a.b.list[0-1] as c from [//tmp/cm] as t") ==
      Seq(None, None, None, None))
    assert(ints("t.struct.a.b.dict[concat('not_', 'exists')] as c from [//tmp/cm] as t") ==
      Seq(None, None, None, None))
  }

  test("ComplexWithNull (ql_query_ut.cpp): null group key forms its own group, null arithmetic propagates") {
    val rows = (1 to 9).map(i => (Some(i.toLong), Some(10L * i))) ++
      Seq((Some(10L), None), (None, Some(1L)), (None, Some(2L)), (None, Some(3L)))
    val ct = rows.toDF("a", "b")
    val got = SelectRows(spark,
      "x, sum(b) + x as t, sum(b) as y from [//tmp/cn] group by a % 2 as x",
      Map("//tmp/cn" -> ct))
      .as[(Option[Long], Option[Long], Option[Long])].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (None, None, Some(6L)),
      (Some(0L), Some(200L), Some(200L)),
      (Some(1L), Some(251L), Some(250L))))
  }

  test("ArgMin (ql_query_ut.cpp:8556): argmin over Any values through the string surface") {
    import graft.types.YtTypes._
    val rows = Seq(
      Seq("[1,2,3]", 5.55, 1L), Seq("true", 4.44, 1L), Seq("""{"x":1}""", 3.33, 2L),
      Seq("\"aleph\"", 4.44, 2L), Seq("0", 1.11, 1L), Seq(null, 6.66, 2L))
    val df = anyTagged(rows, "v" -> YtAny, "d" -> YtDouble, "k" -> YtInt64)
    val got = SelectRows(spark, "k, argmin(v, d) as c from [//tmp/am] group by k",
      Map("//tmp/am" -> df)).as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "0"), (2L, """{"x":1}""")))
  }

  test("test_computed_column_simple (test_query.py): computed key populated on write, filter by source key") {
    import org.apache.spark.sql.functions.col
    val spec = graft.plans.ComputedColumns.Spec("key", "hash", (k: org.apache.spark.sql.Column) => k * 33)
    val base = (0 until 100).map(i => (i.toLong, 2L * i)).toDF("key", "value")
    val ct = graft.plans.ComputedColumns.withComputed(base, spec)
      .select(col("hash"), col("key"), col("value"))
    val cat = Map("//tmp/cc" -> ct)
    val one = SelectRows(spark, "* from [//tmp/cc] where key = 42", cat)
      .as[(Long, Long, Long)].collect()
    assert(one.toSeq == Seq((42L * 33, 42L, 84L)))
    val range = SelectRows(spark, "* from [//tmp/cc] where key >= 10 and key < 80", cat)
      .as[(Long, Long, Long)].collect().sortBy(_._2)
    assert(range.toSeq == (10 until 80).map(i => (i.toLong * 33, i.toLong, 2L * i)))
  }

  test("test_join_different_types (test_query.py): USING join coerces int16 vs int32 keys") {
    val tt = (0 until 5).map(i => (i.toShort, i.toString)).toDF("key", "value")
    val tj = (0 until 10).map(i => (i, s"${i}_$i")).toDF("key", "value_value")
    val got = SelectRows(spark, "* from [//tmp/tt] join [//tmp/tj] using key",
      Map("//tmp/tt" -> tt, "//tmp/tj" -> tj))
      .selectExpr("cast(key as int) as key", "value", "value_value")
      .as[(Int, String, String)].collect().sortBy(_._1)
    assert(got.toSeq == (0 until 5).map(i => (i, i.toString, s"${i}_$i")))
  }

  test("Multijoin (ql_query_ut.cpp): 3-way USING fan-out + LEFT vs empty table") {
    val x = Seq(Tuple1(0L)).toDF("a")
    val y = Seq((0L, 1L), (0L, 2L)).toDF("a", "b")
    val z = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "c")
    val q2 = Seq.empty[(Long, Long)].toDF("a", "d")
    val got = SelectRows(spark,
      "a, b, c from [//tmp/x] join [//tmp/y] using a join [//tmp/z] using a left join [//tmp/q] using a",
      Map("//tmp/x" -> x, "//tmp/y" -> y, "//tmp/z" -> z, "//tmp/q" -> q2))
      .as[(Long, Long, Long)].collect().sortBy(r => (r._3, r._2))
    assert(got.toSeq == Seq((0L, 1L, 1L), (0L, 2L, 1L), (0L, 1L, 2L),
      (0L, 2L, 2L), (0L, 1L, 3L), (0L, 2L, 3L)))
  }

  test("JoinNonPrefixColumns (ql_query_ut.cpp): USING on a non-key column, null payload survives") {
    val left = Seq(("a", None: Option[String]), ("b", None), ("c", None)).toDF("x", "y")
    val right = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("a", "x")
    val got = SelectRows(spark,
      "x, a, y from [//tmp/jnl] join [//tmp/jnr] using x",
      Map("//tmp/jnl" -> left, "//tmp/jnr" -> right))
      .as[(String, Long, Option[String])].collect().sortBy(_._2)
    assert(got.toSeq == Seq(("a", 1L, None), ("b", 2L, None), ("c", 3L, None)))
  }

  test("ListExprToAny (ql_query_ut.cpp): to_any over a typed list column keeps the carrier form") {
    val lt = Seq(Tuple1(Seq(1, 2, 3))).toDF("a")
    val got = SelectRows(spark, "to_any(a) as b from [//tmp/lta]",
      Map("//tmp/lta" -> lt)).as[String].collect()
    assert(got.toSeq == Seq("[1,2,3]"))
  }

  test("SimpleIn / BigIn (ql_query_ut.cpp:2500,2523): mixed-type IN coercion, 50-member rowset") {
    val it = Seq(4L, -10L, 15L).map(Tuple1(_)).toDF("a")
    val cat = Map("//tmp/in" -> it)
    assert(SelectRows(spark, "a from [//tmp/in] where a in (4.0, -10)", cat)
      .as[Long].collect().sorted.toSeq == Seq(-10L, 4L))
    assert(SelectRows(spark, "a from [//tmp/in] where a not in (4.0, -10)", cat)
      .as[Long].collect().toSeq == Seq(15L))

    val bt = Seq(4L, 10L, 15L, 17L, 18L, 22L, 31L).map(Tuple1(_)).toDF("a")
    val big = (0 until 50).map(_ * 2).mkString(", ")
    assert(SelectRows(spark, s"a from [//tmp/bin] where a in ($big)",
      Map("//tmp/bin" -> bt)).as[Long].collect().sorted.toSeq ==
      Seq(4L, 10L, 18L, 22L))
  }

  test("ComplexAlias (ql_query_ut.cpp): qualified refs through a table alias in group key and aggregate") {
    val rows = Seq((10L, Some("x")), (20L, Some("y")), (30L, Some("x")), (40L, Some("x")),
      (42L, None), (50L, Some("x")), (60L, Some("y")), (70L, Some("z")), (72L, None),
      (80L, Some("y")), (85L, None), (90L, Some("z")))
    val got = SelectRows(spark,
      "x, sum(p.a) as t from [//tmp/ca] as p where p.a > 10 group by p.s as x",
      Map("//tmp/ca" -> rows.toDF("a", "s")))
      .as[(Option[String], Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((None, 199L), (Some("x"), 120L), (Some("y"), 160L),
      (Some("z"), 160L)))
  }

  test("GroupByWithLimitFirst (ql_query_ut.cpp): first() aggregate reads the first row per key order") {
    val ft = (0 until 10).map(i => (1L, i.toLong)).toDF("a", "b")
      .repartition(1).sortWithinPartitions("a", "b")
    val got = SelectRows(spark, "first(b) as f from [//tmp/gf] group by a limit 1",
      Map("//tmp/gf" -> ft)).as[Long].collect()
    assert(got.toSeq == Seq(0L))
  }

  test("test_nan filters (test_query.py:1484): is_nan / is_null / guarded compare") {
    val nan = Double.NaN
    val dt = Seq((1.0, Some(nan)), (2.0, Some(2.0)), (3.0, None)).toDF("a", "b")
    val cat = Map("//tmp/d" -> dt)
    def ids(ql: String): Seq[Double] =
      SelectRows(spark, ql, cat).select("a").as[Double].collect().sorted.toSeq
    assert(ids("* from [//tmp/d] where is_nan(b)") == Seq(1.0))
    assert(ids("* from [//tmp/d] where is_null(b)") == Seq(3.0))
    assert(ids("* from [//tmp/d] where if(is_nan(b), false, b > 0)") == Seq(2.0))
  }

  test("HavingClause1/2/3 (ql_query_ut.cpp:4741): HAVING over keys and non-projected aggregates") {
    val ht = Seq((1L, 10L), (1L, 10L), (2L, 20L), (2L, 20L)).toDF("a", "b")
    val cat = Map("//tmp/h" -> ht)
    val h1 = SelectRows(spark,
      "a as x, sum(b) as t FROM [//tmp/h] group by a having a = 1", cat)
      .as[(Long, Long)].collect()
    assert(h1.toSeq == Seq((1L, 20L)))
    val h2 = SelectRows(spark,
      "a as x, sum(b) as t FROM [//tmp/h] group by a having sum(b) = 20", cat)
      .as[(Long, Long)].collect()
    assert(h2.toSeq == Seq((1L, 20L)))
    // HAVING references an aggregate absent from the projection
    val h3 = SelectRows(spark,
      "a as x FROM [//tmp/h] group by a having sum(b) = 20", cat)
      .as[Long].collect()
    assert(h3.toSeq == Seq(1L))
  }

  test("GroupByTotalsOrderBy (ql_query_ut.cpp:6678): totals over ALL groups, order+limit on group rows only") {
    val rnd = new scala.util.Random(11)
    val vals = (0 until 2000).map(_ => rnd.nextInt(90000) + 10000L) ++
      (0 until 2000).map(i => 10000L - i)
    val rows = vals.map(v => (v, v * 10))
    val tt = rows.toDF("a", "b")
    val grouped = rows.groupBy(_._1 % 200)
      .map { case (k, rs) => (k, rs.map(_._2).sum) }
    val totalSum = rows.map(_._2).sum
    val expectGroups = grouped.toSeq.sortBy(_._2).take(50)
    val got = SelectRows(spark,
      "x, sum(b) as y FROM [//tmp/gt] group by a % 200 as x with totals order by y limit 50",
      Map("//tmp/gt" -> tt)).collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1)))
    assert(got.length == 51, s"expected 50 group rows + totals, got ${got.length}")
    val (totals, groups) = got.partition(_._1 == -1L)
    assert(totals.toSeq == Seq((-1L, totalSum)))
    assert(groups.sortBy(_._2).toSeq == expectGroups.sortBy(_._2))
  }

  test("GroupByWithTotalsAndLimit (ql_query_ut.cpp:4562): totals reflects every group, not the limited page") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 1000).map(_ => rnd.nextInt(9000) + 1000L).map(k => (k, k * 10)) ++
      (0 until 1000).map(i => (1000L - i, (1000L - i) * 10))
    val tt = rows.toDF("a", "b")
    val grouped = rows.groupBy(_._1 % 127).map { case (k, rs) => (k, rs.map(_._2).sum) }
    val totalSum = rows.map(_._2).sum
    val got = SelectRows(spark,
      "x, sum(b) as y FROM [//tmp/gl] group by a % 127 as x with totals limit 20",
      Map("//tmp/gl" -> tt)).collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1)))
    assert(got.length == 21, s"expected 20 group rows + totals, got ${got.length}")
    got.foreach { case (k, v) =>
      if (k == -1L) assert(v == totalSum) else assert(v == grouped(k))
    }
  }

  test("GroupByWithTotalsEmpty (ql_query_ut.cpp:4304): empty input yields no totals row") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val got = SelectRows(spark,
      "x, sum(b) as t FROM [//tmp/e] group by a % 2 as x with totals",
      Map("//tmp/e" -> empty))
    assert(got.count() == 0)
  }

  test("GroupByWithTotalsNulls (ql_query_ut.cpp:4275): null group key is an error under totals") {
    val nt = Seq((Some(1L), 10L), (None, 20L))
      .map { case (a, b) => (a.map(Long.box).orNull, b) }.toDF("a", "b")
    val ex = intercept[Exception] {
      SelectRows(spark, "x, sum(b) as t FROM [//tmp/n] group by a % 2 as x with totals",
        Map("//tmp/n" -> nt)).collect()
    }
    def causes(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(t => t.getMessage +: causes(t.getCause))
    assert(causes(ex).exists(m => m != null && m.contains("forbidden in group key")),
      s"wrong error: ${ex.getMessage}")
  }

  test("DoubleSum (ql_query_ut.cpp:4856): double sum skips nulls, sum(1) counts every row") {
    val dt = Seq(Some(1.0), Some(1.0), None)
      .map(v => Tuple1(v.map(Double.box).orNull)).toDF("a")
    val got = SelectRows(spark,
      "sum(a) as x, sum(1) as t FROM [//tmp/ds] group by 1",
      Map("//tmp/ds" -> dt)).as[(Double, Long)].collect()
    assert(got.toSeq == Seq((2.0, 3L)))
  }

  test("ComplexStrings (ql_query_ut.cpp:4880): nullable + empty string group keys are distinct groups") {
    val rows = Seq(
      (10L, Some("x")), (20L, Some("y")), (30L, Some("x")), (40L, Some("x")),
      (42L, None), (50L, Some("x")), (60L, Some("y")), (70L, Some("z")),
      (72L, None), (80L, Some("y")), (85L, None), (90L, Some("z")),
      (11L, Some("")))
    val st = rows.map { case (a, s) => (a, s.orNull) }.toDF("a", "s")
    val got = SelectRows(spark,
      "x, sum(a) as t FROM [//tmp/cs] where a > 10 group by s as x",
      Map("//tmp/cs" -> st)).collect()
      .map(r => (if (r.isNullAt(0)) "<null>" else r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(("", 11L), ("<null>", 199L), ("x", 120L),
      ("y", 160L), ("z", 160L)))
  }

  test("ComplexStringsLower (ql_query_ut.cpp:4921): lower() inside IN") {
    val st = Seq(("XyZ", "one"), ("aB1C", "two"), ("cs1dv", "three"),
      ("HDs", "four"), ("kIu", "five"), ("trg1t", "six")).toDF("a", "s")
    val got = SelectRows(spark,
      "s FROM [//tmp/cl] where lower(a) in ('xyz','ab1c','hds','kiu')",
      Map("//tmp/cl" -> st)).as[String].collect().sorted
    assert(got.toSeq == Seq("five", "four", "one", "two"))
  }

  test("If (ql_query_ut.cpp:4953): if() over a group alias, double() cast of an aggregate") {
    val it = (1 to 9).map(i => (i.toLong, 10L * i)).toDF("a", "b")
    val got = SelectRows(spark,
      "if(q = 4, 'a', 'b') as x, double(sum(b)) + 1.0 as t FROM [//tmp/if] " +
        "group by if(a % 2 = 0, 4, 5) as q",
      Map("//tmp/if" -> it)).as[(String, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(("a", 201.0), ("b", 251.0)))
  }

  test("JoinWithLimit (ql_query_ut.cpp:5649): limit over an inner USING join") {
    val left = (1L to 7L).map(Tuple1(_)).toDF("a")
    val right = Seq(7L, 5L, 3L, 1L).map(Tuple1(_)).toDF("a")
    val got = SelectRows(spark,
      "a as x FROM [//tmp/jl] join [//tmp/jr] using a limit 4",
      Map("//tmp/jl" -> left, "//tmp/jr" -> right)).as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 3L, 5L, 7L))
  }

  test("LeftJoinWithCondition (ql_query_ut.cpp:6325): WHERE with null-match vs join predicate") {
    val left = Seq(1L, 2L, 3L, 4L).map(Tuple1(_)).toDF("a")
    val right = Seq((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 1L),
      (2L, 1L, 1L), (2L, 3L, 1L), (3L, 1L, 1L)).toDF("a", "b", "c")
    val cat = Map("//tmp/ll" -> left, "//tmp/lr" -> right)
    def run(ql: String): Seq[(Long, Long)] =
      SelectRows(spark, ql, cat).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .sortBy(_._1).toSeq
    // WHERE b = 2 or b = # filters the JOINED stream with QL null-match
    // equality: unmatched left rows (b null) survive, matched rows only
    // when b = 2
    assert(run("a, sum(c) as s FROM [//tmp/ll] left join [//tmp/lr] using a " +
      "where b = 2 or b = # group by a") == Seq((1L, 1L), (4L, -1L)))
    // `USING a AND b = 2` filters the FOREIGN side BEFORE the join:
    // every left row survives, only a=1 finds a b=2 partner
    assert(run("a, sum(c) as s FROM [//tmp/ll] left join [//tmp/lr] using a " +
      "and b = 2 group by a") ==
      Seq((1L, 1L), (2L, -1L), (3L, -1L), (4L, -1L)))
  }

  test("Complex / Complex2 (ql_query_ut.cpp:4423): group alias used in post-aggregation arithmetic") {
    val got = q("x, sum(b) + x as t FROM [//tmp/t] where a > 1 group by a % 2 as x")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((0L, 200L), (1L, 241L)))
    val got2 = q("x, q, sum(b) + x as t FROM [//tmp/t] where a > 1 group by a % 2 as x, 0 as q")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got2.toSeq == Seq((0L, 0L, 200L), (1L, 0L, 241L)))
  }

  test("TypeInference (ql_query_ut.cpp:5093): int/double group key coercion, uint64 arithmetic chain") {
    val got = q("if(int64(q) = 4, 'a', 'b') as x, double(sum(uint64(b) * 1)) + 1 as t " +
      "FROM [//tmp/t] group by if(a % 2 = 0, double(4), 5) as q")
      .as[(String, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(("a", 201.0), ("b", 251.0)))
  }

  test("GroupByWithAvgCoordinated (ql_query_ut.cpp:3239): avg merges exactly across partitions") {
    val at = (0 until 6).map(i => (i.toLong, i.toLong)).toDF("k", "v").repartition(3)
    val got = SelectRows(spark, "avg(v) as av FROM [//tmp/avg] group by k",
      Map("//tmp/avg" -> at)).as[Double].collect().sorted
    assert(got.toSeq == Seq(0.0, 1.0, 2.0, 3.0, 4.0, 5.0))
  }

  test("CoordinatedMaxGroupBy (ql_query_ut.cpp): max + argmax across partitions") {
    val rows = Seq(
      (1L, 2L, "britney"), (2L, 3L, "camilla"), (3L, 2L, "frida"),
      (4L, 3L, "evelyn"), (5L, 1L, "agnes"), (6L, 2L, "evelyn"),
      (7L, 1L, "daisy"), (8L, 2L, "camilla"), (9L, 1L, "daisy"),
      (10L, 3L, "camilla"), (11L, 1L, "frida"))
    val mt = rows.toDF("id", "revision", "person").repartition(3)
    val got = SelectRows(spark,
      "person, max(revision) as r FROM [//tmp/mx] group by person",
      Map("//tmp/mx" -> mt)).as[(String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(("agnes", 1L), ("britney", 2L), ("camilla", 3L),
      ("daisy", 1L), ("evelyn", 3L), ("frida", 2L)))
  }

  test("OrderBy (ql_query_ut.cpp:6588): expression sort keys, offset pages, NaN sort key raises") {
    val rnd = new scala.util.Random(3)
    val vals = (0 until 2000).map(_ => rnd.nextInt(90000) + 10000L) ++
      (0 until 2000).map(i => 10000L - i)
    val rows = vals.map(v => (v, v * 10))
    val ot = rows.toDF("a", "b")
    val cat = Map("//tmp/ob" -> ot)
    val sortedRows = rows.sorted
    val p1 = SelectRows(spark, "* FROM [//tmp/ob] order by a * a limit 100", cat)
      .as[(Long, Long)].collect()
    assert(p1.toSeq == sortedRows.take(100))
    val p2 = SelectRows(spark, "* FROM [//tmp/ob] order by a * a offset 100 limit 100", cat)
      .as[(Long, Long)].collect()
    assert(p2.toSeq == sortedRows.slice(100, 200))
    val p3 = SelectRows(spark, "* FROM [//tmp/ob] order by a * 3 - 1 desc limit 100", cat)
      .as[(Long, Long)].collect()
    assert(p3.toSeq == sortedRows.reverse.take(100))
    // NaN sort key → "Comparison with NaN" (0.0 / 0.0 at a = 0)
    val nt = (0 until 10).map(i => ((i % 3).toLong, (10 - i).toLong)).toDF("a", "b")
    val ex = intercept[Exception] {
      SelectRows(spark, "* FROM [//tmp/nn] order by 0.0 / double(a) limit 100",
        Map("//tmp/nn" -> nt)).collect()
    }
    def causes(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(t => String.valueOf(t.getMessage) +: causes(t.getCause))
    assert(causes(ex).exists(_.contains("Comparison with NaN")), ex.toString)
  }

  test("OrderByWithHugeLimit / OrderByWithSmallLimit (ql_query_ut.cpp:6646): Long.MaxValue-ish and zero limits") {
    val st = Seq(3L, 2L, 1L).map(Tuple1(_)).toDF("a")
    val cat = Map("//tmp/sl" -> st)
    val all = SelectRows(spark,
      "a FROM [//tmp/sl] order by a limit 9223372036854775805", cat)
      .as[Long].collect()
    assert(all.toSeq == Seq(1L, 2L, 3L))
    val none = SelectRows(spark, "a FROM [//tmp/sl] order by a limit 0", cat)
    assert(none.count() == 0)
  }

  test("MakeList / MakeEntity / MakeMapSuccess (ql_query_ut.cpp:8768): mixed-type Any builders") {
    import graft.types.YtTypes._
    val vt = anyTagged(
      Seq(Seq("""{"hello":"world"}""", null)),
      "v_any" -> YtAny, "v_null" -> YtAny)
    val cat = Map("//tmp/mk" -> vt)
    val lst = SelectRows(spark,
      "make_list(1, 2u, %true, 3.14, 'abc', v_any, v_null) as x FROM [//tmp/mk]",
      cat).as[String].collect()
    assert(lst.toSeq == Seq("""[1,2,true,3.14,"abc",{"hello":"world"},null]"""))
    val ent = SelectRows(spark, "make_list(make_entity()) as x FROM [//tmp/mk]", cat)
      .as[String].collect()
    assert(ent.toSeq == Seq("[null]"))
    val mp = SelectRows(spark,
      "make_map('k_int', 1, 'k_uint', 2u, 'k_bool', %true, 'k_double', 3.14, " +
        "'k_string', 'abc', 'k_any', v_any, 'k_null', v_null) as x FROM [//tmp/mk]",
      cat).as[String].collect()
    assert(mp.toSeq == Seq("""{"k_int":1,"k_uint":2,"k_bool":true,"k_double":3.14,""" +
      """"k_string":"abc","k_any":{"hello":"world"},"k_null":null}"""))
  }

  test("MakeMapFailure (ql_query_ut.cpp:8807): odd arity / non-string key raise") {
    val vt = Seq(Tuple1(1L)).toDF("a")
    val cat = Map("//tmp/mf" -> vt)
    intercept[Exception] {
      SelectRows(spark, "make_map('a') as x FROM [//tmp/mf]", cat).collect()
    }
    intercept[Exception] {
      SelectRows(spark, "make_map(1, 1) as x FROM [//tmp/mf]", cat).collect()
    }
  }

  test("GroupByOrderBy2 (ql_query_ut.cpp:3102): multi-key group pages, computed order key with ties") {
    val rows = Seq(
      (1L, "a", 1L, 1L), (2L, "a", 2L, 2L), (3L, "b", 3L, 3L),
      (4L, "a", 4L, 1L), (5L, "b", 1L, 2L), (6L, "a", 2L, 3L),
      (7L, "b", 3L, 1L), (8L, "b", 4L, 2L), (9L, "a", 1L, 3L))
    val gt = rows.toDF("a", "b", "c", "d")
    val cat = Map("//tmp/g2" -> gt)
    val p1 = SelectRows(spark,
      "sum(a) as t, b, c FROM [//tmp/g2] group by b, c order by b, c limit 6",
      cat).as[(Long, String, Long)].collect()
    assert(p1.toSeq == Seq((10L, "a", 1L), (8L, "a", 2L), (4L, "a", 4L),
      (5L, "b", 1L), (10L, "b", 3L), (8L, "b", 4L)))
    val p2 = SelectRows(spark,
      "b, c, d, c + d as s FROM [//tmp/g2] group by b, c, d order by s, b, c limit 9",
      cat).as[(String, Long, Long, Long)].collect()
    assert(p2.toSeq == Seq(
      ("a", 1L, 1L, 2L), ("b", 1L, 2L, 3L),
      ("a", 1L, 3L, 4L), ("a", 2L, 2L, 4L), ("b", 3L, 1L, 4L),
      ("a", 2L, 3L, 5L), ("a", 4L, 1L, 5L),
      ("b", 3L, 3L, 6L), ("b", 4L, 2L, 6L)))
  }

  test("GroupByOrderBy3 (ql_query_ut.cpp:3183): where+group+order+limit, incl. empty result") {
    val gt = (1 to 9).map(i => (i.toLong, ((i - 1) % 3).toLong)).toDF("a", "b")
    val cat = Map("//tmp/g3" -> gt)
    val one = SelectRows(spark,
      "sum(a) as t, b FROM [//tmp/g3] where b = 0 group by b order by b limit 3",
      cat).as[(Long, Long)].collect()
    assert(one.toSeq == Seq((12L, 0L)))
    val none = SelectRows(spark,
      "sum(a) as t, b FROM [//tmp/g3] where b = 4 group by b order by b limit 3", cat)
    assert(none.count() == 0)
  }

  test("GroupByWithNoKeyColumnsInTableSchema (ql_query_ut.cpp:4096): partial groups merge across partitions") {
    val rows = Seq((0L, 0L), (1L, 1L), (2L, 1L), (2L, 1L), (3L, 1L), (3L, 1L),
      (3L, 1L), (4L, 1L), (4L, 1L), (4L, 1L), (4L, 1L))
    val gt = rows.toDF("a", "b").repartition(4)
    val got = SelectRows(spark,
      "a, sum(b) as b from [//tmp/nk] group by a limit 1000",
      Map("//tmp/nk" -> gt)).as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == (0 to 4).map(i => (i.toLong, i.toLong)))
  }

  test("GroupByWithIdenticalOrderKey (ql_query_ut.cpp:4141): constant-per-group order key, limit 1") {
    val gt = Seq((0L, 1L, 42L), (1L, 2L, 1L), (2L, 2L, 42L), (3L, 1L, 1L))
      .toDF("k0", "v1", "v2").repartition(2)
    val got = SelectRows(spark,
      "min(v2) as m from [//tmp/ik] group by v1 order by (v1-v1) limit 1",
      Map("//tmp/ik" -> gt)).as[Long].collect()
    assert(got.toSeq == Seq(1L))
  }

  test("GroupByAlias (ql_query_ut.cpp:4167): select alias shadows the column in GROUP BY, raw column in aggregates") {
    val got = q("a % 3 as a, sum(a + b) as b FROM [//tmp/t] group by a")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((0L, 180L), (1L, 123L), (2L, 156L)))
  }

  test("ComplexBigResult (ql_query_ut.cpp:4496): 10k-group aggregation") {
    val bt = (0 until 10000).map(i => (i.toLong, i * 10L)).toDF("a", "b")
    val got = SelectRows(spark,
      "x, sum(b) + x as t FROM [//tmp/big] where a > 1 group by a as x",
      Map("//tmp/big" -> bt))
    assert(got.count() == 9998)
    val sums = got.agg(org.apache.spark.sql.functions.sum("t")).as[Long].head()
    assert(sums == (2 until 10000).map(i => i * 10L + i).sum)
  }

  test("JoinWithComplexEvaluatedColumn (ql_query_ut.cpp:5514): tuple ON join over non-aligned key names") {
    val a = Seq((1L, 1L, -1L), (1L, 2L, -2L), (2L, 1L, -3L), (2L, 2L, -4L))
      .toDF("ak1", "ak2", "av0")
    val b = Seq((2L, 1L, 1L, 1L, -1L), (2L, 1L, 2L, 1L, -3L),
      (3L, 1L, 1L, 2L, -2L), (3L, 1L, 2L, 2L, -4L))
      .toDF("bk0", "bk1", "bk2", "bk3", "bv0")
    val got = SelectRows(spark,
      "(av0 + bv0) as x FROM [//tmp/ja] join [//tmp/jb] on (ak1, ak2) = (bk1, bk3)",
      Map("//tmp/ja" -> a, "//tmp/jb" -> b)).as[Long].collect().sorted
    assert(got.toSeq == Seq(-6L, -4L, -4L, -2L))
  }

  test("TArithmeticNullTest / FunctionNullArgument (ql_expressions_ut.cpp:1259,1039): QL null semantics as projected values") {
    val one = Seq(Tuple1(1L)).toDF("a")
    val cat = Map("//tmp/x1" -> one)
    def eval(expr: String): Any = {
      val r = SelectRows(spark, s"$expr as v FROM [//tmp/x1]", cat).collect()(0)
      if (r.isNullAt(0)) null else r.get(0)
    }
    // equality with null is NULL-MATCHING, not three-valued
    assert(eval("# = #") == true)
    assert(eval("1 = #") == false)
    assert(eval("1 != #") == true)
    // and/or keep SQL three-valued logic
    assert(eval("# or %true") == true)
    assert(eval("# or %false") == null)
    assert(eval("# and %false") == false)
    assert(eval("# and %true") == null)
    // arithmetic propagates null
    assert(eval("1 + #") == null)
    // booleans order false < true
    assert(eval("%false < %true") == true)
    // if() propagates a null condition (NOT the else branch)
    assert(eval("if(a = 2, 1, 2)") == 2L)
    assert(eval("if(# and %true, 1, 2)") == null)
  }

  test("Udf / ZeroArgumentUdf / UdfNullPropagation (ql_query_ut.cpp:6737): user functions in QL strings") {
    // the extension surface: Scala UDFs registered on the session stand
    // in for the reference's compiled UDF modules
    spark.udf.register("abs_udf", (x: java.lang.Long) =>
      if (x == null) null else java.lang.Long.valueOf(math.abs(x)))
    spark.udf.register("seventyfive", () => 75L)
    val ut = Seq((Some(1L), Some(10L)), (Some(-2L), Some(20L)),
      (Some(9L), Some(90L)), (Some(-10L), None))
      .map { case (a, b) => (a.map(Long.box).orNull, b.map(Long.box).orNull) }
      .toDF("a", "b")
    val cat = Map("//tmp/u" -> ut)
    val got = SelectRows(spark, "abs_udf(a) as x FROM [//tmp/u]", cat)
      .as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L, 9L, 10L))
    // zero-argument UDF inside WHERE
    val st = Seq(1L, 2L, 75L, 10L, 75L, 10L).map(Tuple1(_)).toDF("a")
    val z = SelectRows(spark, "a FROM [//tmp/z] where a = seventyfive()",
      Map("//tmp/z" -> st)).as[Long].collect()
    assert(z.toSeq == Seq(75L, 75L))
    // null propagation through the UDF
    val nt = Seq((Some(1L), None), (Some(-2L), Some(-20L)),
      (Some(9L), None), (None, Some(-10L)))
      .map { case (a, b) => (a.map(Long.box).orNull, b.map(Long.box).orNull) }
      .toDF("a", "b")
    val np = SelectRows(spark, "abs_udf(b) as x FROM [//tmp/np]",
      Map("//tmp/np" -> nt)).collect()
      .map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).sorted
    assert(np.toSeq == Seq(-1L, -1L, 10L, 20L))
  }

  test("CompositeMemberAccessorStruct/2 (ql_query_ut.cpp:7800): deep struct paths, null cascade, group by deep path") {
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(StructField("struct", StructType(Seq(
      StructField("a", StructType(Seq(
        StructField("b", StructType(Seq(StructField("c", LongType))))))),
      StructField("d", StringType))))))
    def aVal(c: java.lang.Long) = Row(Row(c))     // a = {b = {c}}
    val rows = Seq(
      Row(Row(aVal(1L), "a")), Row(Row(aVal(2L), "b")), Row(Row(aVal(3L), "c")),
      Row(Row(Row(null), "d")),            // a.b.c = null
      Row(Row(null, "e")),                 // a = null
      Row(Row(null, null)))
    val st = spark.createDataFrame(rows.asJava, schema)
    val cat = Map("//tmp/cms" -> st)
    val got = SelectRows(spark,
      "t.struct.a.b.c as c, t.struct.d as d from [//tmp/cms] as t", cat)
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        if (r.isNullAt(1)) "<null>" else r.getString(1))).sortBy(_._2)
    assert(got.toSeq == Seq((-1L, "<null>"), (1L, "a"), (2L, "b"), (3L, "c"),
      (-1L, "d"), (-1L, "e")).sortBy(_._2))
    // deep path as a group key, both alias directions
    val g1 = SelectRows(spark,
      "t.struct.a.b.c as c from [//tmp/cms] as t group by c", cat)
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).sorted
    assert(g1.toSeq == Seq(-1L, 1L, 2L, 3L))
    val g2 = SelectRows(spark,
      "c from [//tmp/cms] as t group by t.struct.a.b.c as c", cat)
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).sorted
    assert(g2.toSeq == Seq(-1L, 1L, 2L, 3L))
    // struct subtree through the Any carrier
    val anyC = SelectRows(spark,
      "try_get_int64(to_any(t.struct.a.b), '/c') as c from [//tmp/cms] as t", cat)
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).sorted
    assert(anyC.toSeq == Seq(-1L, -1L, -1L, 1L, 2L, 3L))
  }

  test("JoinManySimple (ql_query_ut.cpp:5889): chained USING joins on different keys") {
    val a = Seq((2L, "b"), (3L, "c"), (4L, "a")).toDF("a", "c")
    val b = Seq((100L, "a", "X"), (200L, "b", "Y"), (300L, "c", "X"),
      (400L, "a", "Y"), (500L, "b", "X"), (600L, "c", "Y")).toDF("b", "c", "d")
    val c = Seq(("X", 1234L), ("Y", 5678L)).toDF("d", "e")
    val got = SelectRows(spark,
      "a, c, b, d, e from [//tmp/ja2] join [//tmp/jb2] using c join [//tmp/jc2] using d",
      Map("//tmp/ja2" -> a, "//tmp/jb2" -> b, "//tmp/jc2" -> c))
      .as[(Long, String, Long, String, Long)].collect().sortBy(r => (r._1, r._3))
    assert(got.toSeq == Seq(
      (2L, "b", 200L, "Y", 5678L), (2L, "b", 500L, "X", 1234L),
      (3L, "c", 300L, "X", 1234L), (3L, "c", 600L, "Y", 5678L),
      (4L, "a", 100L, "X", 1234L), (4L, "a", 400L, "Y", 5678L)))
  }

  test("JoinMany (ql_query_ut.cpp:6429): 3-table chain joined through different keys + group by") {
    val p = (1 to 9).map(i => (i.toLong, 10L * i)).toDF("a", "b")
    val s = (1 to 9).map(i => (10L * i, i.toLong)).toDF("b", "c")
    val t3 = (1 to 9).map(i => (i.toLong, 10L * i)).toDF("c", "d")
    val got = SelectRows(spark,
      "sum(a) as x, sum(d) as y, z FROM [//tmp/p] join [//tmp/s] using b " +
        "join [//tmp/t3] using c group by c % 2 as z",
      Map("//tmp/p" -> p, "//tmp/s" -> s, "//tmp/t3" -> t3))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((20L, 200L, 0L), (25L, 250L, 1L)))
  }

  test("GroupByWithTotals + having modes through the string surface (ql_query_ut.cpp:4335)") {
    // placement decides the mode: `with totals ... having` = BeforeHaving
    // (totals over all groups), `having ... with totals` = AfterHaving
    val ht = Seq((1L, 10L), (1L, 20L), (2L, 100L), (3L, 5L), (3L, 5L)).toDF("a", "b")
    val cat = Map("//tmp/tm" -> ht)
    val before = SelectRows(spark,
      "x, sum(b) as t FROM [//tmp/tm] group by a as x with totals having sum(b) >= 30",
      cat).collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1))).sorted
    // groups: 1→30, 2→100, 3→10; surviving: 1, 2; totals over ALL: 140
    assert(before.toSeq == Seq((-1L, 140L), (1L, 30L), (2L, 100L)))
    val after = SelectRows(spark,
      "x, sum(b) as t FROM [//tmp/tm] group by a as x having sum(b) >= 30 with totals",
      cat).collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1))).sorted
    assert(after.toSeq == Seq((-1L, 130L), (1L, 30L), (2L, 100L)))
  }

  // ---- YPath accessor family (ql_query_ut.cpp:6997-7463) ----
  // The reference passes the ypath as a TABLE COLUMN, not a literal;
  // fixtures write YSON rows, carried here as canonical JSON. An
  // entity-valued Any cell (`yson=#` in TSource) is a storage-level
  // NULL, exactly like a missing cell.

  private def ypathFixture(rows: Seq[(String, String)]) = {
    import graft.types.YtTypes._
    anyTagged(rows.map { case (y, p) =>
      Seq(if (y == null) null else graft.sources.Yson.parseToJson(y), p)
    }, "yson" -> YtAny, "ypath" -> YtUtf8)
  }
  private val ypDoc = "{b={c=4};d=[1;2]}"

  test("YPathTryGetInt64 (ql_query_ut.cpp:6997): column-valued path, null on miss") {
    val df = ypathFixture(Seq(
      (ypDoc, "/b/c"), (ypDoc, "/d/1"), (null, null),
      (ypDoc, "/b/d"), (ypDoc, null), (null, "/d/1")))
    val got = SelectRows(spark,
      "try_get_int64(yson, ypath) as result from [//tmp/yp]",
      Map("//tmp/yp" -> df)).as[Option[Long]].collect()
    assert(got.toSeq == Seq(Some(4L), Some(2L), None, None, None, None))
  }

  test("YPathTryGetUint64 (ql_query_ut.cpp:7093): unsigned through the carrier") {
    val df = ypathFixture(Seq(
      ("{b={c=4u};d=[1;2]}", "/b/c"), ("{b={c=4};d=[1;2u]}", "/d/1"),
      (null, null), (ypDoc, "/b/d"), (ypDoc, null), (null, "/d/1")))
    val got = SelectRows(spark,
      "try_get_uint64(yson, ypath) as result from [//tmp/yp]",
      Map("//tmp/yp" -> df)).as[Option[Long]].collect()
    assert(got.toSeq == Seq(Some(4L), Some(2L), None, None, None, None))
  }

  test("YPathTryGetDouble (ql_query_ut.cpp:7184): `4.` YSON doubles") {
    val df = ypathFixture(Seq(
      ("{b={c=4.};d=[1;2]}", "/b/c"), ("{b={c=4};d=[1;2.]}", "/d/1"),
      (null, null), (ypDoc, "/b/d"), (ypDoc, null), (null, "/d/1")))
    val got = SelectRows(spark,
      "try_get_double(yson, ypath) as result from [//tmp/yp]",
      Map("//tmp/yp" -> df)).as[Option[Double]].collect()
    assert(got.toSeq == Seq(Some(4.0), Some(2.0), None, None, None, None))
  }

  test("YPathTryGetBoolean (ql_query_ut.cpp:7275): %true/%false leaves") {
    val df = ypathFixture(Seq(
      ("{b={c=%true};d=[1;2]}", "/b/c"), ("{b={c=4};d=[1;%false]}", "/d/1"),
      (null, null), (ypDoc, "/b/d"), (ypDoc, null), (null, "/d/1")))
    val got = SelectRows(spark,
      "try_get_boolean(yson, ypath) as result from [//tmp/yp]",
      Map("//tmp/yp" -> df)).as[Option[Boolean]].collect()
    assert(got.toSeq == Seq(Some(true), Some(false), None, None, None, None))
  }

  test("YPathTryGetString (ql_query_ut.cpp:7366): string leaves unquoted") {
    val df = ypathFixture(Seq(
      ("{b={c=\"hello\"};d=[1;2]}", "/b/c"),
      ("{b={c=4};d=[1;\"world\"]}", "/d/1"),
      (null, null), (ypDoc, "/b/d"), (ypDoc, null), (null, "/d/1")))
    val got = SelectRows(spark,
      "try_get_string(yson, ypath) as result from [//tmp/yp]",
      Map("//tmp/yp" -> df)).as[Option[String]].collect()
    assert(got.toSeq == Seq(Some("hello"), Some("world"), None, None, None, None))
  }

  test("YPathGetInt64 (ql_query_ut.cpp:7031): null inputs pass through, values read") {
    val df = ypathFixture(Seq(
      (ypDoc, "/b/c"), (ypDoc, "/d/1"), (null, null),
      (ypDoc, null), (null, "/d/1")))
    val got = SelectRows(spark,
      "get_int64(yson, ypath) as result from [//tmp/yp]",
      Map("//tmp/yp" -> df)).as[Option[Long]].collect()
    assert(got.toSeq == Seq(Some(4L), Some(2L), None, None, None))
  }

  test("YPathGetInt64Fail (ql_query_ut.cpp:7063): get_* raises on a missing path, " +
    "malformed ypaths raise for get_* AND try_get_*") {
    // missing path with both inputs present: get_* errors, try_get_* nulls
    val miss = ypathFixture(Seq((ypDoc, "/b/d")))
    val failed = intercept[Exception] {
      SelectRows(spark, "get_int64(yson, ypath) as result from [//tmp/yp]",
        Map("//tmp/yp" -> miss)).collect()
    }
    assert(failed.getMessage != null)
    // malformed paths (`//d/1` empty segment, `/@d/1` attribute step)
    // raise even under try_get_* (the reference's Fail rows cover both)
    for (bad <- Seq("//d/1", "/@d/1"); fn <- Seq("try_get_int64", "get_int64")) {
      val df = ypathFixture(Seq((ypDoc, bad)))
      intercept[Exception] {
        SelectRows(spark, s"$fn(yson, ypath) as result from [//tmp/yp]",
          Map("//tmp/yp" -> df)).collect()
      }
    }
    // `/d1` is well-formed but missing: null under try, error under get
    val d1 = ypathFixture(Seq((ypDoc, "/d1")))
    val tryGot = SelectRows(spark,
      "try_get_int64(yson, ypath) as result from [//tmp/yp]",
      Map("//tmp/yp" -> d1)).as[Option[Long]].collect()
    assert(tryGot.toSeq == Seq(None))
    // divergence: the reference's malformed-YSON rows error inside the
    // accessor; our carrier rejects malformed YSON earlier, at
    // yson_string_to_any time (parse → null carrier)
    assert(graft.sources.Yson.parseToJson("{b={c=4}d=[1;2}}") == null)
  }

  test("YPathGetString/Uint64/Double/Boolean + Fail variants (ql_query_ut.cpp:7100-7460): typed get_* family") {
    val fixtures = Seq(
      ("get_string", "{b={c=\"hello\"};d=[1;\"world\"]}", (r: org.apache.spark.sql.Row) => r.getString(0) == "hello"),
      ("get_uint64", "{b={c=4u};d=[1;2]}", (r: org.apache.spark.sql.Row) => r.getLong(0) == 4L),
      ("get_double", "{b={c=4.};d=[1;2]}", (r: org.apache.spark.sql.Row) => r.getDouble(0) == 4.0),
      ("get_boolean", "{b={c=%true};d=[1;2]}", (r: org.apache.spark.sql.Row) => r.getBoolean(0)))
    for ((fn, doc, check) <- fixtures) {
      val ok = ypathFixture(Seq((doc, "/b/c"), (null, null), (doc, null), (null, "/b/c")))
      val got = SelectRows(spark, s"$fn(yson, ypath) as result from [//tmp/yp]",
        Map("//tmp/yp" -> ok)).collect()
      assert(check(got.head), s"$fn value row")
      assert(got.tail.forall(_.isNullAt(0)), s"$fn null-input rows")
      // missing path with both inputs present raises (the *Fail tests)
      val miss = ypathFixture(Seq((doc, "/b/missing")))
      intercept[Exception] {
        SelectRows(spark, s"$fn(yson, ypath) as result from [//tmp/yp]",
          Map("//tmp/yp" -> miss)).collect()
      }
    }
  }

  test("YPathGetAny (ql_query_ut.cpp:7463): nested get_any, null-matching equality") {
    import graft.types.YtTypes._
    val rows = Seq(
      ("{b={c=\"here\"};d=[1;2]}", "/b", "/c", "here"),
      ("{b={c=4};d=[1;\"there\"]}", "/d", "/1", "there"),
      (null, null, null, null),
      (ypDoc, null, null, null),
      (null, "/d/1", null, null))
    val df = anyTagged(rows.map { case (y, p0, p1, v) =>
      Seq(if (y == null) null else graft.sources.Yson.parseToJson(y), p0, p1, v)
    }, "yson" -> YtAny, "ypath0" -> YtUtf8, "ypath1" -> YtUtf8,
      "value" -> YtUtf8)
    val got = SelectRows(spark,
      "get_any(get_any(yson, ypath0), ypath1) = value as result from [//tmp/yp]",
      Map("//tmp/yp" -> df)).as[Boolean].collect()
    assert(got.toSeq == Seq(true, true, true, true, true))
  }

  test("TQueryEvaluateYsonLengthTest.GetAny (ql_query_ut.cpp:9751): yson_length over get_any, entity Any is NULL") {
    import graft.types.YtTypes._
    // `any=#` writes a storage NULL into the Any column
    val df = anyTagged(Seq(
      Seq(graft.sources.Yson.parseToJson("{a=[1;2;3;4]}")),
      Seq(null)), "any" -> YtAny)
    val got = SelectRows(spark,
      "yson_length(try_get_any(any, '/a')) as length from [//tmp/yl]",
      Map("//tmp/yl" -> df)).as[Option[Long]].collect()
    assert(got.toSeq == Seq(Some(4L), None))
  }

  test("YsonStringToAny (ql_query_ut.cpp:7662): YSON text → Any carrier across scalars, maps, lists") {
    val cases = Seq(
      "1" -> "1",
      "1u" -> "1",
      "1.0" -> "1.0",
      "abc" -> "\"abc\"",
      "%true" -> "true",
      "{}" -> "{}",
      "{b=1}" -> "{\"b\":1}",
      "{b=1u}" -> "{\"b\":1}",
      "{b=1.0}" -> "{\"b\":1.0}",
      "{b=abc}" -> "{\"b\":\"abc\"}",
      "{b=%true}" -> "{\"b\":true}",
      "{b=[]}" -> "{\"b\":[]}",
      "{b=[1;2;3]}" -> "{\"b\":[1,2,3]}",
      "{b=[1;abc;3.14;%false]}" -> "{\"b\":[1,\"abc\",3.14,false]}",
      "{b=[1;2;3];c=42u}" -> "{\"b\":[1,2,3],\"c\":42}",
      "[]" -> "[]",
      "[1]" -> "[1]",
      "[1u]" -> "[1]",
      "[1.0]" -> "[1.0]",
      "[abc]" -> "[\"abc\"]",
      "[%true]" -> "[true]",
      "[[]]" -> "[[]]",
      "[[1;2;3]]" -> "[[1,2,3]]",
      "[[1;abc;3.14;%false]]" -> "[[1,\"abc\",3.14,false]]",
      "[[1;2;3];42u]" -> "[[1,2,3],42]")
    val df = cases.map(_._1).toDF("a")
    val got = SelectRows(spark,
      "yson_string_to_any(a) as r from [//tmp/ys]",
      Map("//tmp/ys" -> df)).as[String].collect()
    assert(got.toSeq == cases.map(_._2))
  }

  test("AnyToYsonString (ql_query_ut.cpp:6970): Any carrier → reference text YSON") {
    import graft.types.YtTypes._
    val ysons = Seq("{}", "{a=42;}", "{a={b=c}}", "{a={b=3.14};d=[1;2];e=#}")
    val df = anyTagged(
      ysons.map(y => Seq(graft.sources.Yson.parseToJson(y))), "any" -> YtAny)
    val got = SelectRows(spark,
      "any_to_yson_string(any) as result from [//tmp/ay]",
      Map("//tmp/ay" -> df)).as[String].collect()
    assert(got.toSeq == Seq(
      "{}",
      "{\"a\"=42;}",
      "{\"a\"={\"b\"=\"c\";};}",
      "{\"a\"={\"b\"=3.14;};\"d\"=[1;2;];\"e\"=#;}"))
  }

  // ---- regex family (ql_query_ut.cpp:6851-6968, RE2 surface) ----
  // Subjects come as a nullable column; a null subject is NOT a match
  // (expected %false), while replace/extract propagate null.

  private def strRows(vs: Seq[Option[String]]) = {
    import graft.types.YtTypes._
    anyTagged(vs.map(v => Seq(v.orNull)), "a" -> YtUtf8)
  }

  test("RegexFullMatch (ql_query_ut.cpp:6876): anchored match, null subject is false") {
    val df = strRows(Seq(Some("hello"), Some("hell"), None))
    val got = SelectRows(spark,
      "regex_full_match('hel[a-z]', a) as x from [//tmp/re]",
      Map("//tmp/re" -> df)).as[Boolean].collect()
    assert(got.toSeq == Seq(false, true, false))
  }

  test("RegexPartialMatch (ql_query_ut.cpp:6902): unanchored, null subject is false") {
    val df = strRows(Seq(Some("xx"), Some("x43x"), None))
    val got = SelectRows(spark,
      "regex_partial_match('[0-9]+', a) as x from [//tmp/re]",
      Map("//tmp/re" -> df)).as[Boolean].collect()
    assert(got.toSeq == Seq(false, true, false))
  }

  test("RegexReplaceFirst (ql_query_ut.cpp:6928): first occurrence only, null propagates") {
    val df = strRows(Seq(Some("x43x43x"), None))
    val got = SelectRows(spark,
      "regex_replace_first('[0-9]+', a, '_') as x from [//tmp/re]",
      Map("//tmp/re" -> df)).as[Option[String]].collect()
    assert(got.toSeq == Seq(Some("x_x43x"), None))
  }

  test("RegexReplaceAll (ql_query_ut.cpp:6942): every occurrence, null propagates") {
    val df = strRows(Seq(Some("x43x43x"), None))
    val got = SelectRows(spark,
      "regex_replace_all('[0-9]+', a, '_') as x from [//tmp/re]",
      Map("//tmp/re" -> df)).as[Option[String]].collect()
    assert(got.toSeq == Seq(Some("x_x_x"), None))
  }

  test("RegexExtract (ql_query_ut.cpp:6956): RE2 rewrite template over the leftmost match") {
    val df = strRows(Seq(Some("Send root@ya.com an email."), None))
    val got = SelectRows(spark,
      "regex_extract('([a-z]*)@(.*).com', a, '\\\\1 at \\\\2') as x from [//tmp/re]",
      Map("//tmp/re" -> df)).as[Option[String]].collect()
    assert(got.toSeq == Seq(Some("root at ya"), None))
  }

  test("RegexEscape (ql_query_ut.cpp:6964): metacharacters quoted") {
    val df = strRows(Seq(Some("1.5"), None))
    val got = SelectRows(spark,
      "regex_escape(a) as x from [//tmp/re]",
      Map("//tmp/re" -> df)).as[Option[String]].collect()
    assert(got.toSeq == Seq(Some("1\\.5"), None))
  }

  test("RegexParseError (ql_query_ut.cpp:6851): malformed pattern raises") {
    val df = strRows(Seq(Some("hello"), Some("hell"), None))
    intercept[Exception] {
      SelectRows(spark,
        "regex_full_match('hel[a-z)', a) as x from [//tmp/re]",
        Map("//tmp/re" -> df)).collect()
    }
  }

  // ---- prepare/typecheck error surface (TQueryPrepareTest) ----
  // GetSampleTableSchema (ql_helpers.cpp:44): int64 keys k/l/m, data
  // int64 a/b/c, strings s/u. A QL error is a raised exception; the
  // reference checks prepare-time diagnostics, we accept analysis- or
  // run-time as long as the query NEVER silently succeeds.

  private lazy val sampleT = {
    import graft.types.YtTypes._
    anyTagged(
      Seq(Seq(1L, 2L, 3L, 4L, 5L, 6L, "x", "y"),
        Seq(2L, 3L, 4L, 5L, 6L, 7L, "z", "w")),
      "k" -> YtInt64, "l" -> YtInt64, "m" -> YtInt64,
      "a" -> YtInt64, "b" -> YtInt64, "c" -> YtInt64,
      "s" -> YtUtf8, "u" -> YtUtf8)
  }
  private def expectError(ql: String,
      cat: Map[String, org.apache.spark.sql.DataFrame] = Map("//t" -> sampleT)): Unit = {
    intercept[Exception] { SelectRows(spark, ql, cat).collect() }
    ()
  }

  test("BadSyntax (ql_query_ut.cpp): unparseable input raises") {
    expectError("bazzinga mu ha ha ha")
  }

  test("BadColumnNameInFilter / BadColumnNameInProject: undefined references raise") {
    expectError("k from [//t] where bar = 1")
    expectError("foo from [//t]")
  }

  test("BadTypecheck: int64 compared against a string literal raises") {
    expectError("k from [//t] where a > 'xyz'")
  }

  test("BadTableName: reference to a table not in the catalog raises") {
    expectError("k from [//nonexistent/table]")
  }

  test("MisuseAggregateFunction: nested aggregate and aggregate without GROUP BY raise") {
    expectError("sum(sum(a)) from [//t] group by k")
    expectError("sum(a) from [//t]")
    expectError("argmin(a, a) from [//t]")
  }

  test("WronglyTypedAggregate: avg over a string column raises") {
    expectError("avg(s) from [//t] group by 1")
  }

  test("GreatestError (ql_query_ut.cpp:8841): null argument fails type inference") {
    expectError("greatest(a, null) from [//t]")
    expectError("greatest(null, a) from [//t]")
  }

  test("IncorrectDivision: INT_MIN/-1, INT_MIN%-1 and %0 raise") {
    expectError("* from [//t] where a = -9223372036854775808 / -1")
    expectError("* from [//t] where a = -9223372036854775808 % -1")
    expectError("* from [//t] where a = 42 % 0")
  }

  test("FailedTypeInference: bare NULL projection raises") {
    expectError("null from [//t]")
  }

  test("ResultSchemaCollision: duplicate output alias raises") {
    expectError("a as x, b as x FROM [//t] WHERE k > 3")
  }

  test("JoinColumnCollision: unqualified shared column and * over a USING join raise") {
    val cat = Map("//t" -> sampleT, "//s2" -> sampleT)
    expectError("a, b from [//t] join [//s2] using b", cat)
    expectError("* from [//t] join [//s2] using b", cat)
  }

  // ---- simple evaluate family (ql_query_ut.cpp:1976-2600) ----

  private lazy val ab45 = Seq((4L, 5L), (10L, 11L)).toDF("a", "b")

  test("SelectAll (ql_query_ut.cpp): * projects every column unchanged") {
    val got = q2("* FROM [//tmp/ab]", ab45).as[(Long, Long)].collect()
    assert(got.toSeq == Seq((4L, 5L), (10L, 11L)))
  }
  private def q2(ql: String, df: org.apache.spark.sql.DataFrame) =
    SelectRows(spark, ql, Map("//tmp/ab" -> df))

  test("SimpleAlias (ql_query_ut.cpp): an alias may shadow its source column") {
    val got = q2("a * a as a, b FROM [//tmp/ab]", ab45).as[(Long, Long)].collect()
    assert(got.toSeq == Seq((16L, 5L), (100L, 11L)))
  }

  test("KeywordAlias (ql_query_ut.cpp:226): reserved words cannot alias") {
    // the reference list minus `transform` (a function name here, not
    // a reserved token — our grammar parses transform(...) as a call)
    val kws = Seq("select", "from", "where", "having", "offset", "limit",
      "join", "array", "using", "asc", "desc", "left", "as", "on", "and",
      "or", "is", "not", "null", "between", "in", "like", "ilike", "rlike",
      "regexp", "escape", "false", "true", "case", "when", "then", "else",
      "end", "inf")
    for (kw <- kws) expectError(s"k as $kw from [//t]")
  }

  test("AdditionPrecedence (ql_query_ut.cpp): IN / BETWEEN bind looser than +") {
    val got = q2("1 + 2 in (3, 4, 5) as r1, 1 + 2 between 3 and 4 as r2 FROM [//tmp/ab] limit 1",
      ab45).as[(Boolean, Boolean)].collect()
    assert(got.toSeq == Seq((true, true)))
  }

  test("SimpleCmpInt / SimpleCmpString (ql_query_ut.cpp): the comparison table") {
    val gotI = q2("a < b as r1, a > b as r2, a <= b as r3, a >= b as r4, a = b as r5 FROM [//tmp/ab]",
      Seq((4L, 5L), (6L, 6L)).toDF("a", "b"))
      .as[(Boolean, Boolean, Boolean, Boolean, Boolean)].collect()
    assert(gotI.toSeq == Seq((true, false, true, false, false),
      (false, false, true, true, true)))
    val gotS = q2("a < b as r1, a > b as r2, a <= b as r3, a >= b as r4, a = b as r5 FROM [//tmp/ab]",
      Seq(("a", "aa"), ("aa", "aa")).toDF("a", "b"))
      .as[(Boolean, Boolean, Boolean, Boolean, Boolean)].collect()
    assert(gotS.toSeq == Seq((true, false, true, false, false),
      (false, false, true, true, true)))
  }

  test("SimpleBetweenAnd (ql_query_ut.cpp): scalar between") {
    val df = Seq((4L, 5L), (10L, 11L), (15L, 11L)).toDF("a", "b")
    val got = q2("a, b FROM [//tmp/ab] where a between 9 and 11", df)
      .as[(Long, Long)].collect()
    assert(got.toSeq == Seq((10L, 11L)))
  }

  test("SimpleOffsetLimit (ql_query_ut.cpp): limit pages in read order, offset skips") {
    val df = (0L to 8L).toDF("a").repartition(1).sortWithinPartitions("a")
    assert(q2("a FROM [//tmp/ab] limit 5", df).as[Long].collect().toSeq ==
      Seq(0L, 1L, 2L, 3L, 4L))
    assert(q2("a FROM [//tmp/ab] offset 5 limit 1", df).as[Long].collect().toSeq ==
      Seq(5L))
  }

  test("TruePredicate / FalsePredicate (ql_query_ut.cpp): constant WHERE") {
    assert(q2("* FROM [//tmp/ab] where true", ab45).count() == 2)
    assert(q2("* FROM [//tmp/ab] where false", ab45).count() == 0)
  }

  test("Strings (ql_query_ut.cpp): \\xNN and \\0 escapes in string literals") {
    val got = q2("'\\x0F\\xC7\\x84~\\0@\\0\\0<\\0\\0@\\x99l`\\x16' as result FROM [//tmp/ab] limit 1",
      ab45).as[String].collect().head
    assert(got == "\u000F\u00C7\u0084~\u0000@\u0000\u0000<\u0000\u0000@\u0099l`\u0016")
  }

  test("SimpleStrings / SimpleStrings2 (ql_query_ut.cpp): string scan + equality filter") {
    val df = Seq(("foo", "x"), ("bar", "y"), ("baz", "x"), ("olala", "z")).toDF("s", "u")
    assert(q2("s FROM [//tmp/ab]", df).as[String].collect().toSeq ==
      Seq("foo", "bar", "baz", "olala"))
    assert(q2("s, u FROM [//tmp/ab] where u = 'x'", df).as[(String, String)].collect().toSeq ==
      Seq(("foo", "x"), ("baz", "x")))
  }

  test("SimpleWithNull / SimpleWithNull2 (ql_query_ut.cpp): null cells scan and null arithmetic") {
    val df = Seq[(Long, Option[Long], Option[Long])](
      (4L, Some(5L), None), (10L, Some(11L), Some(9L)), (16L, None, None))
      .toDF("a", "b", "c")
    val got = q2("a, b, c FROM [//tmp/ab] where a > 3", df)
      .as[(Long, Option[Long], Option[Long])].collect()
    assert(got.toSeq == Seq((4L, Some(5L), None), (10L, Some(11L), Some(9L)),
      (16L, None, None)))

    val df2 = Seq[(Long, Option[Long], Option[Long])](
      (1L, Some(2L), Some(3L)), (4L, None, None), (5L, Some(5L), None),
      (7L, None, Some(8L)), (10L, Some(1L), None), (10L, None, Some(1L)))
      .toDF("a", "b", "c")
    val got2 = q2("a, b + c as x FROM [//tmp/ab] where a < 10", df2)
      .as[(Long, Option[Long])].collect()
    assert(got2.toSeq == Seq((1L, Some(5L)), (4L, None), (5L, None), (7L, None)))
  }

  test("FilterNulls2 (ql_query_ut.cpp): is_null keeps the null rows a > filter drops") {
    val df = Seq[(Long, Option[Long])]((4L, Some(5L)), (6L, None), (10L, Some(11L)))
      .toDF("a", "b")
    val got = q2("a, b FROM [//tmp/ab] where b > 0 or is_null(b)", df)
      .as[(Long, Option[Long])].collect()
    assert(got.toSeq == Seq((4L, Some(5L)), (6L, None), (10L, Some(11L))))
  }

  test("MultipleBetweenAnd (ql_query_ut.cpp): tuple BETWEEN over a multi-range list") {
    val df = Seq((1L, 10L), (1L, 30L), (2L, 20L), (2L, 30L), (2L, 40L),
      (2L, 50L), (3L, 30L), (3L, 50L), (3L, 60L), (4L, 5L), (5L, 5L),
      (6L, 5L), (10L, 11L), (15L, 11L)).toDF("a", "b")
    val got = q2(
      """a, b from [//tmp/ab] where (a, b) between (
           (1) and (1, 20),
           (2, 30) and (2, 40),
           (3, 50) and (3),
           4 and 5
         )""", df).as[(Long, Long)].collect().sorted
    assert(got.toSeq == Seq((1L, 10L), (2L, 30L), (2L, 40L), (3L, 50L),
      (3L, 60L), (4L, 5L), (5L, 5L)))
  }

  test("MultipleBetweenAnd2 (ql_query_ut.cpp): prefix bounds over a dense grid") {
    val rows = (0 until 100).map(i => (i / 10L, i % 10L))
    val df = rows.toDF("a", "b")
    val expected = (rows.slice(10, 13) ++ rows.slice(23, 25) ++
      rows.slice(35, 40) ++ rows.slice(40, 60)).sorted
    val got = q2(
      """a, b from [//tmp/ab] where (a, b) between (
           (1) and (1, 2),
           (2, 3) and (2, 4),
           (3, 5) and (3),
           4 and 5
         )""", df).as[(Long, Long)].collect().sorted
    assert(got.toSeq == expected)
  }

  test("OffsetLimit / OrderByWithoutLimit / OrderByWithNegativeLimit: bound-less paging raises") {
    expectError("* from [//t] offset 5")
    expectError("* from [//t] order by a")
    expectError("* from [//t] order by a limit -1")
  }

  // ---- join evaluate family (ql_query_ut.cpp:5360-6520) ----

  test("JoinEmpty (ql_query_ut.cpp): disjoint keys join to nothing, agg over it is empty") {
    val left = Seq((1L, 10L), (3L, 30L), (5L, 50L), (7L, 70L), (9L, 90L)).toDF("a", "b")
    val right = Seq((20L, 2L), (40L, 4L), (60L, 6L), (80L, 8L)).toDF("b", "c")
    val got = SelectRows(spark,
      "sum(a) as x, sum(b) as y, z FROM [//left] join [//right] using b group by c % 2 as z",
      Map("//left" -> left, "//right" -> right))
    assert(got.count() == 0)
  }

  test("JoinSimple2-5 (ql_query_ut.cpp): USING join multiplicities (1:1, dup left, dup right, 3x3)") {
    def join(l: Seq[Long], r: Seq[Long]): Seq[Long] =
      SelectRows(spark, "a as x FROM [//left] join [//right] using a",
        Map("//left" -> l.toDF("a"), "//right" -> r.toDF("a")))
        .as[Long].collect().toSeq.sorted
    assert(join(Seq(1L, 2L), Seq(2L, 1L)) == Seq(1L, 2L))          // JoinSimple2
    assert(join(Seq(1L, 1L), Seq(2L, 1L)) == Seq(1L, 1L))          // JoinSimple3
    assert(join(Seq(1L, 2L), Seq(1L, 1L)) == Seq(1L, 1L))          // JoinSimple4
    assert(join(Seq(1L, 1L, 1L), Seq(1L, 1L, 1L)) == Seq.fill(9)(1L)) // JoinSimple5
  }

  test("LeftJoin (ql_query_ut.cpp): unmatched left rows keep nulls") {
    val left = (1L to 9L).map(i => (i, 10 * i)).toDF("a", "b")
    val right = Seq(1L, 3L, 5L, 8L, 9L).map(c => (10 * c, c)).toDF("b", "c")
    val got = SelectRows(spark,
      "a, b, c FROM [//left] left join [//right] using b",
      Map("//left" -> left, "//right" -> right))
      .as[(Long, Long, Option[Long])].collect().sortBy(_._1)
    val expected = (1L to 9L).map { i =>
      (i, 10 * i, if (Set(1L, 3L, 5L, 8L, 9L)(i)) Some(i) else None)
    }
    assert(got.toSeq == expected)
  }

  test("JoinWithLimit2 (ql_query_ut.cpp:5800): aliased ON join, limit sweep") {
    val left = Seq((1L, 1L, 30L), (1L, 2L, 20L), (2L, 3L, 10L),
      (2L, 4L, 30L), (3L, 5L, 20L), (4L, 6L, 10L)).toDF("a", "ut", "b")
    val right = Seq((10L, 100L), (20L, 200L), (30L, 300L)).toDF("b", "c")
    val cat = Map("//left" -> left, "//right" -> right)
    val full = SelectRows(spark,
      "a.ut as ut, b.c as c, a.b as ab, b.b as bb FROM [//left] a join [//right] b on a.b = b.b limit 6",
      cat).as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(full.toSeq == Seq((1L, 300L, 30L, 30L), (2L, 200L, 20L, 20L),
      (3L, 100L, 10L, 10L), (4L, 300L, 30L, 30L), (5L, 200L, 20L, 20L),
      (6L, 100L, 10L, 10L)))
    for (limit <- 1 to 5) {
      val page = SelectRows(spark,
        s"a.ut as ut, b.c as c, a.b as ab, b.b as bb FROM [//left] a join [//right] b on a.b = b.b limit $limit",
        cat).collect()
      assert(page.length == limit)
    }
  }

  test("JoinWithLimit3 (ql_query_ut.cpp:5849): LEFT JOIN USING keeps every left row under limit") {
    val pubs = Seq(
      "5903739ad7d0a6e07ad1fb93", "5908961de3cda81ba288b664",
      "5909bd2dd7d0a68351e66077", "5912f1e27ddde8c264b56f0c",
      "5912f1f88e557d5b22ff7077", "591446067ddde805266009b5",
      "591464507ddde805266009b8", "591468bce3cda8db9996fa89",
      "5914c6678e557dcf3bf713cf", "5915869a7ddde805266009bb",
      "5918c7f8e3cda83873187c37", "591939f67ddde8632415d4ce",
      "59195b327ddde8632415d4d1")
    val left = pubs.zipWithIndex.map { case (p, i) => (p, i.toLong) }
      .toDF("publisherId", "itemId")
    val right = Seq("591446067ddde805266009b5" -> 1504706169L,
      "591468bce3cda8db9996fa89" -> 1504706172L,
      "5914c6678e557dcf3bf713cf" -> 1504706178L,
      "5918c7f8e3cda83873187c37" -> 1504706175L).toDF("publisherId", "timestamp")
    val cat = Map("//publishers" -> left, "//draft" -> right)
    val full = SelectRows(spark,
      "publisherId FROM [//publishers] LEFT JOIN [//draft] USING publisherId LIMIT 13",
      cat).as[String].collect().sorted
    assert(full.toSeq == pubs.sorted)
    for (limit <- Seq(1, 4, 9)) {
      assert(SelectRows(spark,
        s"publisherId FROM [//publishers] LEFT JOIN [//draft] USING publisherId LIMIT $limit",
        cat).count() == limit)
    }
  }

  test("JoinGroupByWithLimit (ql_query_ut.cpp:5940): join + group + totals + limit, totals cover ALL groups") {
    val rnd = new scala.util.Random(20260813L)
    val K = 31L
    val limit = 20
    var leftRows = Vector.empty[Long]
    var rightRows = Vector.empty[(Long, Long)]
    val grouped = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    var totalSum = 0L
    for (i <- 0 until 1000) {
      val key = i.toLong
      val value = key * 10
      var joined = true
      if (rnd.nextBoolean()) leftRows :+= key else joined = false
      if (rnd.nextBoolean()) rightRows :+= (key, value) else joined = false
      if (joined) { grouped(key % K) += value; totalSum += value }
    }
    val got = SelectRows(spark,
      s"x, sum(b) as y FROM [//left] join [//right] using a group by a % $K as x with totals limit $limit",
      Map("//left" -> leftRows.toDF("a"), "//right" -> rightRows.toDF("a", "b")))
      .collect()
    assert(got.length == limit + 1)
    got.foreach { r =>
      if (!r.isNullAt(0)) assert(r.getLong(1) == grouped(r.getLong(0)))
      else assert(r.getLong(1) == totalSum)
    }
  }

  test("uint64-ness survives a FROM subquery projection") {
    import graft.types.YtTypes._
    val df = anyTagged(Seq(Seq(1L), Seq(-1L), Seq(100L)), "u" -> YtUint64)
    val got = SelectRows(spark,
      "x from (u as x from [//tmp/u64s]) where x > 100u",
      Map("//tmp/u64s" -> df)).as[Long].collect().toSet
    // -1L bits = u64 max: unsigned keeps it, signed would drop it
    assert(got == Set(-1L))
  }

  test("ConvertFromAny (ql_expressions_ut.cpp): numeric casts of non-numeric Any carriers raise") {
    import graft.types.YtTypes._
    // int64(any) where the carrier holds a string / boolean raises
    // ("Cannot convert value"); ANSI casts carry the same contract
    for (carrier <- Seq("\"hello\"", "%true")) {
      val df = anyTagged(Seq(Seq(graft.sources.Yson.parseToJson(carrier))),
        "any" -> YtAny)
      intercept[Exception] {
        SelectRows(spark, "int64(any) as r from [//tmp/cfa]",
          Map("//tmp/cfa" -> df)).collect()
      }
    }
    // a numeric carrier converts
    val ok = anyTagged(Seq(Seq("1")), "any" -> YtAny)
    assert(SelectRows(spark, "int64(any) as r from [//tmp/cfa]",
      Map("//tmp/cfa" -> ok)).as[Long].collect().toSeq == Seq(1L))
  }

  // ---- uint64 column semantics through the string surface ----

  test("uint64 columns route unsigned: comparisons, division, modulo, ORDER BY (row_base.h Uint64)") {
    import graft.types.YtTypes._
    // bits: -1L = 18446744073709551615 (u64 max), -2L = u64 max - 1
    val df = anyTagged(Seq(
      Seq(1L, 2L), Seq(-1L, 2L), Seq(-2L, 2L), Seq(100L, 3L)),
      "u" -> YtUint64, "d" -> YtUint64)
    val cat = Map("//tmp/u64" -> df)
    // unsigned comparison: u64 max > 100 (signed would say -1 < 100)
    val cmp = SelectRows(spark,
      "u from [//tmp/u64] where u > 100u", cat).as[Long].collect().toSet
    assert(cmp == Set(-1L, -2L))
    // unsigned division: (u64 max - 1) / 2 = Long.MaxValue
    val div = SelectRows(spark,
      "u / d as q from [//tmp/u64] where u = 18446744073709551614u", cat)
      .as[Long].collect()
    assert(div.toSeq == Seq(Long.MaxValue))
    // unsigned modulo of u64 max by 3
    val mod = SelectRows(spark,
      "u % d as m from [//tmp/u64] where u = 18446744073709551615u", cat)
      .as[Long].collect()
    assert(mod.toSeq == Seq(java.lang.Long.remainderUnsigned(-1L, 2L)))
    // ORDER BY sorts in unsigned order: u64 max last
    val ord = SelectRows(spark,
      "u from [//tmp/u64] order by u limit 10", cat).as[Long].collect()
    assert(ord.toSeq == Seq(1L, 100L, -2L, -1L))
  }

  // ---- expression error surface (ql_expressions_ut.cpp TExpressionErrorTest) ----

  test("Int64/UInt64 division and modulo by zero, INT_MIN/-1 on column values raise") {
    val dz = Seq((1L, 0L)).toDF("i1", "i2")
    for (op <- Seq("/", "%")) {
      intercept[Exception] {
        q2(s"i1 $op i2 as r FROM [//tmp/ab]", dz).collect()
      }
    }
    val ovf = Seq((Long.MinValue, -1L)).toDF("i1", "i2")
    for (op <- Seq("/", "%")) {
      intercept[Exception] {
        q2(s"i1 $op i2 as r FROM [//tmp/ab]", ovf).collect()
      }
    }
    // unsigned: u64 carrier division by zero raises too
    intercept[Exception] {
      q2("1u / 0u as r FROM [//tmp/ab]", dz).collect()
    }
  }

  // ---- test_query.py integration remainder ----

  test("test_null (test_query.py): `where a = null` matches the null key row") {
    val df = Seq[(Option[Long], Long)]((None, 0L), (Some(1L), 1L)).toDF("a", "b")
    val got = q2("* from [//tmp/ab] where a = null", df)
      .as[(Option[Long], Long)].collect()
    assert(got.toSeq == Seq((None, 0L)))
  }

  test("test_merging_group_by (test_query.py:2460): avg/min merge across 20 tablet partitions") {
    val df = (0 until 100).map(i => (i.toLong, 10L * i)).toDF("a", "b")
      .repartition(20)
    val got = q2(
      """k, avg(a) as aa, min(b) as mb, avg(b) as ab
         from [//tmp/ab] group by a % 2 as k order by k limit 2""", df)
      .as[(Long, Double, Long, Double)].collect()
    assert(got.toSeq == Seq((0L, 49.0, 0L, 490.0), (1L, 50.0, 10L, 500.0)))
  }

  test("test_computed_column_modulo (test_query.py:2700): source-key predicates on a modular computed key") {
    val rows = (0 until 1000).map(i => (i % 2L, i.toLong, i.toLong, 2L * i))
    val df = rows.toDF("hash", "key1", "key2", "value")
    val cat = Map("//tmp/cc" -> df)
    def expected(ks: Seq[Int]) = ks.map(i => (i % 2L, i.toLong, i.toLong, 2L * i))
    val q1 = SelectRows(spark, "* from [//tmp/cc] where key2 = 42", cat)
      .as[(Long, Long, Long, Long)].collect()
    assert(q1.toSeq == expected(Seq(42)))
    val q2r = SelectRows(spark, "* from [//tmp/cc] where key1 >= 10 and key1 < 80", cat)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(q2r.toSeq == expected(10 until 80))
    val q3 = SelectRows(spark, "* from [//tmp/cc] where key1 in (10, 20, 30)", cat)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(q3.toSeq == expected(Seq(10, 20, 30)))
    val q4 = SelectRows(spark,
      "* from [//tmp/cc] where key1 in (10, 20, 30) and key2 in (30, 40)", cat)
      .as[(Long, Long, Long, Long)].collect()
    assert(q4.toSeq == expected(Seq(30)))
  }

  test("test_full_scan (test_query.py): allow_full_scan=false rejects unfiltered scans") {
    intercept[Exception] {
      SelectRows(spark, "* from [//tmp/ab]", Map("//tmp/ab" -> ab45),
        SelectRows.Options(allowFullScan = false)).collect()
    }
    // a filtered query is fine
    assert(SelectRows(spark, "* from [//tmp/ab] where a > 1",
      Map("//tmp/ab" -> ab45),
      SelectRows.Options(allowFullScan = false)).count() == 2)
  }

  // ---- remaining evaluate/limit/totals cases ----

  test("CardinalityAggregateTotals (ql_query_ut.cpp): HLL flows into the totals row") {
    val df = (0 until 4).flatMap(_ => 0 until 2000).map(_.toLong % 2000).toDF("a")
    val got = q2(
      "cardinality(a) < 2020 as upper, cardinality(a) > 1980 as lower from [//tmp/ab] group by 1 with totals",
      df).as[(Boolean, Boolean)].collect()
    assert(got.length == 2 && got.forall(_ == (true, true)))
  }

  test("OutputRowLimit2/3 + JoinRowLimit (ql_query_ut.cpp): output limits truncate results, not aggregation") {
    // a single global group is never truncated by a larger limit
    val big = (0 until 10000).map(_.toLong).toDF("a")
    val one = SelectRows(spark, "sum(1) as x FROM [//tmp/orl] group by 0 as q",
      Map("//tmp/orl" -> big), SelectRows.Options(outputRowLimit = Some(100)))
      .as[Long].collect()
    assert(one.toSeq == Seq(10000L))
    // 20 groups truncate to 10
    val twenty = (0 until 20).map(_.toLong).toDF("a")
    val page = SelectRows(spark, "a FROM [//tmp/orl2] group by a",
      Map("//tmp/orl2" -> twenty), SelectRows.Options(outputRowLimit = Some(10)))
      .as[Long].collect()
    assert(page.length == 10 && page.forall(v => v >= 0 && v < 20))
    // join output truncates to 4
    val joined = SelectRows(spark,
      "a as x FROM [//jl] join [//jr] using a",
      Map("//jl" -> (1L to 6L).toDF("a"), "//jr" -> (1L to 6L).toDF("a")),
      SelectRows.Options(outputRowLimit = Some(4))).collect()
    assert(joined.length == 4)
  }

  test("BigTransform (ql_query_ut.cpp): a 100-branch transform map") {
    val from = (-50 until 50).mkString(", ")
    val to = (-50 until 50).map(-_).mkString(", ")
    val got = q2(s"transform(a, ($from), ($to)) as x FROM [//tmp/ab]",
      Seq(4L, -10L, 7L, 60L).toDF("a")).as[Option[Long]].collect()
    assert(got.toSeq == Seq(Some(-4L), Some(10L), Some(-7L), None))
  }

  test("TooBigQuery2 (ql_query_ut.cpp): a deep OR chain exceeds the depth limit") {
    val disjuncts = (0 until 100).map(i =>
      s"(a = $i and s = 'u-$i')").mkString(" or ")
    expectError(s"k from [//t] where $disjuncts")
  }

  test("GroupByDisjointTotalsLimit (ql_query_ut.cpp): totals sum every group under a limited page") {
    val rows = (0 until 100).map(i => (i / 10L, i % 10L, i.toLong))
    val df = rows.toDF("a", "b", "v")
    val grouped = rows.groupBy(r => (r._1, r._2 % 3))
      .map { case (k, rs) => k -> rs.map(_._3).sum }
    val totalSum = rows.map(_._3).sum
    val got = q2(
      "x, y, sum(v) as s FROM [//tmp/ab] group by a as x, b % 3 as y with totals limit 20",
      df).collect()
    assert(got.length == 21)
    got.foreach { r =>
      if (r.isNullAt(0)) assert(r.getLong(2) == totalSum)
      else assert(grouped((r.getLong(0), r.getLong(1))) == r.getLong(2))
    }
  }

  test("AnyInNull / BadWhere (ql_query_ut.cpp:244): entity IN rowsets and tuple WHERE predicates raise") {
    import graft.types.YtTypes._
    val df = anyTagged(Seq(Seq("1")), "any_value" -> YtAny)
    intercept[Exception] {
      SelectRows(spark, "* from [//tmp/ain] where any_value in (#)",
        Map("//tmp/ain" -> df)).collect()
    }
    expectError("* from [//t] where (a = 1, b = 2)")
  }

  // ---- ARRAY JOIN + composite accessor remainder ----

  test("ArrayJoinSimple (ql_query_ut.cpp:5100): zipped lists pad with null; LEFT keeps empty parents") {
    val df = Seq(
      (1L, Seq(1L, 2L, 3L, 4L), Seq(-1L, -2L, -3L)),
      (3L, Seq(5L, 6L, 7L), Seq(-5L, -6L, -7L, -8L)),
      (5L, Seq.empty[Long], Seq.empty[Long])).toDF("a", "nestedA", "nestedB")
    val inner = q2(
      "a, flattenedA, flattenedB FROM [//tmp/ab] ARRAY JOIN nestedA AS flattenedA, nestedB AS flattenedB",
      df).as[(Long, Option[Long], Option[Long])].collect().toSeq
      .sortBy(r => (r._1, r._2.getOrElse(Long.MaxValue)))
    assert(inner == Seq(
      (1L, Some(1L), Some(-1L)), (1L, Some(2L), Some(-2L)),
      (1L, Some(3L), Some(-3L)), (1L, Some(4L), None),
      (3L, Some(5L), Some(-5L)), (3L, Some(6L), Some(-6L)),
      (3L, Some(7L), Some(-7L)), (3L, None, Some(-8L)))
      .sortBy(r => (r._1, r._2.getOrElse(Long.MaxValue))))
    val left = q2(
      "a, flattenedA, flattenedB FROM [//tmp/ab] LEFT ARRAY JOIN nestedA AS flattenedA, nestedB AS flattenedB",
      df).as[(Long, Option[Long], Option[Long])].collect()
    assert(left.length == 9 && left.count(_._1 == 5L) == 1)
  }

  test("ArrayJoinWithTableJoin (ql_query_ut.cpp:5300): ARRAY JOIN before and after a table JOIN") {
    val a = Seq((1L, Seq(2L, 3L)), (6L, Seq(4L, 5L)), (9L, Seq.empty[Long]))
      .toDF("key", "nestedA")
    val b = Seq((1L, Seq(-2L, -3L)), (6L, Seq(-4L, -5L)), (9L, Seq.empty[Long]))
      .toDF("key", "nestedB")
    val got = SelectRows(spark,
      """key, flattenedA, flattenedB
         FROM [//a]
         ARRAY JOIN nestedA AS flattenedA
         JOIN [//b] USING key
         ARRAY JOIN nestedB AS flattenedB""",
      Map("//a" -> a, "//b" -> b))
      .as[(Long, Long, Long)].collect().sorted
    assert(got.toSeq == Seq(
      (1L, 2L, -3L), (1L, 2L, -2L), (1L, 3L, -3L), (1L, 3L, -2L),
      (6L, 4L, -5L), (6L, 4L, -4L), (6L, 5L, -5L), (6L, 5L, -4L)).sorted)
  }

  test("CompositeMemberAccessorTuple (ql_query_ut.cpp:7900): positional tuple paths, null cascade, group keys") {
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    // YtTuple lowers to a struct with positional fields _1.._n
    val schema = StructType(Seq(StructField("tuple", StructType(Seq(
      StructField("_1", StructType(Seq(
        StructField("b", StructType(Seq(StructField("c", LongType))))))),
      StructField("_2", StringType))))))
    val rows = Seq(
      Row(Row(Row(Row(1L)), "a")), Row(Row(Row(Row(2L)), "b")),
      Row(Row(Row(Row(3L)), "c")), Row(Row(Row(null), "d")))
    val df = spark.createDataFrame(rows.asJava, schema)
    val cat = Map("//tmp/cmt" -> df)
    val got = SelectRows(spark,
      "t.tuple.0.b.c as c, t.tuple.1 as d from [//tmp/cmt] as t", cat)
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(1)))
      .sortBy(_._2)
    assert(got.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c"), (-1L, "d")))
    val viaAny = SelectRows(spark,
      "try_get_int64(to_any(t.tuple.0.b), '/c') as c from [//tmp/cmt] as t", cat)
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).sorted
    assert(viaAny.toSeq == Seq(-1L, 1L, 2L, 3L))
    val g1 = SelectRows(spark,
      "t.tuple.0.b.c as c from [//tmp/cmt] as t group by c", cat)
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).sorted
    assert(g1.toSeq == Seq(-1L, 1L, 2L, 3L))
    val g2 = SelectRows(spark,
      "c from [//tmp/cmt] as t group by t.tuple.0.b.c as c", cat)
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).sorted
    assert(g2.toSeq == Seq(-1L, 1L, 2L, 3L))
  }

  test("CompositeMemberAccessorDifferentTypes (ql_query_ut.cpp:7600): every simple type reads through a struct path") {
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(StructField("struct", StructType(Seq(
      StructField("i64", LongType), StructField("ui64", LongType),
      StructField("dbl", DoubleType), StructField("flag", BooleanType),
      StructField("str", StringType), StructField("any", StringType,
        nullable = true, new MetadataBuilder()
          .putString(graft.types.YtTypes.YtTypeKey, "any").build()))))))
    val rows = (1 to 4).map { i =>
      Row(Row(i.toLong, 4L + i, 1.0 / (1 << i), i % 2 == 1, "s" + i,
        s"""{"a":{"b":$i}}"""))
    }
    val df = spark.createDataFrame(rows.asJava, schema)
    val cat = Map("//tmp/cmd" -> df)
    assert(SelectRows(spark, "t.struct.i64 as x from [//tmp/cmd] as t limit 4", cat)
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    assert(SelectRows(spark, "t.struct.ui64 as x from [//tmp/cmd] as t limit 4", cat)
      .as[Long].collect().sorted.toSeq == Seq(5L, 6L, 7L, 8L))
    assert(SelectRows(spark, "t.struct.dbl as x from [//tmp/cmd] as t limit 4", cat)
      .as[Double].collect().sorted.toSeq == Seq(0.0625, 0.125, 0.25, 0.5))
    assert(SelectRows(spark, "t.struct.flag as x from [//tmp/cmd] as t limit 4", cat)
      .as[Boolean].collect().count(identity) == 2)
    assert(SelectRows(spark, "t.struct.str as x from [//tmp/cmd] as t limit 4", cat)
      .as[String].collect().sorted.toSeq == Seq("s1", "s2", "s3", "s4"))
    assert(SelectRows(spark,
      "try_get_int64(t.struct.any, '/a/b') as x from [//tmp/cmd] as t limit 4", cat)
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  // ---- coordinated group-by family (ql_query_ut.cpp:3275-4095) ----
  // The reference streams per-tablet partial aggregates into a
  // coordinator merge; Spark's partial/final HashAggregate pair is the
  // same contract. Fixtures repartition across several partitions so
  // every assertion crosses a real merge boundary.

  test("GroupByCoordinatedWithAggregates1/2 (ql_query_ut.cpp:3623): partial sums merge across partitions under paging") {
    val df = Seq((0L, 0L, 0L), (1L, 0L, 1L), (2L, 0L, 2L), (3L, 0L, 3L),
      (3L, 1L, 4L), (4L, 0L, 5L)).toDF("k1", "k2", "v").repartition(2)
    val sums = Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 7L, 4L -> 5L)
    val page = q2("k1, sum(v) as sv from [//tmp/ab] group by k1 offset 1 limit 5", df)
      .as[(Long, Long)].collect()
    // divergence: the reference pages groups in key order; Spark's
    // page membership is plan-dependent — assert size + map membership
    assert(page.length == 4)
    page.foreach { case (k, sv) => assert(sums(k) == sv) }

    val df2 = Seq((1L, 1L, 1L, 42L), (1L, 2L, 2L, 1L), (1L, 3L, 2L, 1L),
      (1L, 4L, 1L, 0L)).toDF("k0", "k1", "v2", "v3").repartition(2)
    val mins = Map((1L, 1L) -> 0L, (1L, 2L) -> 1L)
    val one = q2("k0, v2, min(v3) as mv from [//tmp/ab] group by k0, v2 limit 1", df2)
      .as[(Long, Long, Long)].collect()
    assert(one.length == 1)
    one.foreach { case (k0, v2, mv) => assert(mins((k0, v2)) == mv) }
  }

  test("GroupByNoLimitCoordinated (ql_query_ut.cpp:4047): unpaged multi-key groups merge exactly") {
    val rows = (0 until 100).map(i => (i / 10L, i % 10L, i.toLong))
    val df = rows.toDF("a", "b", "v").repartition(3)
    val expected = rows.groupBy(r => (r._1, r._3 % 2))
      .map { case ((k, x), rs) => (k, x, rs.map(_._2).sum) }.toSeq.sorted
    val got = q2("k, x, sum(b) as s from [//tmp/ab] group by a as k, v % 2 as x", df)
      .as[(Long, Long, Long)].collect().sorted
    assert(got.toSeq == expected)
  }

  test("GroupByOrderByCoordinated1-4 (ql_query_ut.cpp:3060): ordered group pages across partitions") {
    val df = Seq(
      (1L, 0L, 11L, 3L), (2L, 1L, 12L, 2L), (3L, 2L, 13L, 1L),
      (4L, 0L, 14L, 3L), (5L, 1L, 15L, 2L), (6L, 2L, 16L, 1L),
      (7L, 0L, 17L, 3L), (8L, 1L, 18L, 2L), (9L, 2L, 19L, 1L))
      .toDF("a", "b", "c", "d").repartition(3)
    assert(q2("m from [//tmp/ab] group by a % 3 as m order by m limit 3", df)
      .as[Long].collect().toSeq == Seq(0L, 1L, 2L))
    assert(q2("d from [//tmp/ab] group by d order by d limit 3", df)
      .as[Long].collect().toSeq == Seq(1L, 2L, 3L))
    assert(q2("a, b from [//tmp/ab] group by a, b order by a, b limit 5", df)
      .as[(Long, Long)].collect().toSeq ==
      Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 0L), (5L, 1L)))
    assert(q2("a, b from [//tmp/ab] group by a, b order by a, b offset 2 limit 5", df)
      .as[(Long, Long)].collect().toSeq ==
      Seq((3L, 2L), (4L, 0L), (5L, 1L), (6L, 2L), (7L, 0L)))
    assert(q2("a from [//tmp/ab] group by a order by a limit 5", df)
      .as[Long].collect().toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(q2("a from [//tmp/ab] group by a order by a offset 2 limit 5", df)
      .as[Long].collect().toSeq == Seq(3L, 4L, 5L, 6L, 7L))
  }

  test("BigJoin1/2 (ql_query_ut.cpp): 220 chained joins exceed MaxJoinNumber") {
    val joins = (1 until 220).map(i =>
      s"join [//a_$i] as a_$i on (a_0.b) = (a_$i.a)").mkString(" ")
    expectError(s"a_0.a from [//a_0] as a_0 $joins limit 1")
  }

  test("GroupByCoordinatedWithTotals NoLimit/WithLimit × NoPrimaryKey/PrimaryKeyPrefix InGroupKey (ql_query_ut.cpp:3794-4044)") {
    val rnd = new scala.util.Random(4711L)
    val rows = (0L until 100L).map(pk => (pk, rnd.nextInt(20).toLong, rnd.nextInt(100).toLong))
    val expected = rows.groupBy(_._2).map { case (gk, rs) => gk -> rs.map(_._3).sum }
    val total = rows.map(_._3).sum
    // non-key group column, multi-partition merge
    for (groupCol <- Seq("gk", "pk")) {
      val df = rows.toDF("pk", "gk", "v").repartition(6)
      val noLimit = q2(s"$groupCol, sum(v) as v from [//tmp/ab] group by $groupCol with totals", df)
        .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getLong(1)))
      val expectedFor: Map[Option[Long], Long] =
        if (groupCol == "gk") expected.map { case (k, v) => (Some(k): Option[Long]) -> v } +
          ((None: Option[Long]) -> total)
        else rows.map(r => (Some(r._1): Option[Long]) -> r._3).toMap +
          ((None: Option[Long]) -> total)
      assert(noLimit.length == expectedFor.size)
      noLimit.foreach { case (k, v) => assert(expectedFor(k) == v, s"group $k") }
      // a limited page: every returned group matches, totals cover ALL
      val page = q2(s"$groupCol, sum(v) as v from [//tmp/ab] group by $groupCol with totals limit 5", df)
        .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getLong(1)))
      assert(page.length == 6)
      page.foreach { case (k, v) => assert(expectedFor(k) == v, s"page group $k") }
    }
  }

  test("GroupByCoordinatedWithTotalsTotalRowCount (ql_query_ut.cpp:3840): every group aggregates even under limit+totals") {
    val rnd = new scala.util.Random(99L)
    val rows = (0 until 100).map(_ => (rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
    val df = rows.toDF("k", "v").repartition(4)
    val distinctV = rows.map(_._2).distinct.size
    // the totals row sums sum(1) over ALL groups = total row count —
    // proof the limit never short-circuits grouping
    val got = q2("sum(1) as c from [//tmp/ab] group by v with totals limit 10", df)
      .collect()
    assert(got.length == 11)
    val totalsRow = got.map(_.getLong(0)).max
    assert(totalsRow == rows.length.toLong || distinctV <= 10)
  }

  test("CoordinatedArgMaxGroupBy (ql_query_ut.cpp:8955): argmax merges across partitions, totals row included") {
    val df = Seq((1L, 1L, "daisy", 4L), (2L, 2L, "britney", 2L),
      (3L, 1L, "agnes", 3L), (4L, 1L, "evelyn", 5L),
      (5L, 2L, "daisy", 1L), (6L, 2L, "agnes", 6L))
      .toDF("id", "revision", "person", "date").repartition(3)
    val got = q2(
      "revision, argmax(person, date) as argmax_person FROM [//tmp/ab] " +
        "group by revision with totals order by revision limit 100", df)
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(1)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((-1L, "agnes"), (1L, "evelyn"), (2L, "agnes")))
  }

  test("GroupByWithAvgFullCoordinated (ql_query_ut.cpp:3275): per-group HLL is exact at small cardinalities") {
    val rows = for {
      k0 <- 1 until 100
      identical <- 0 until 3
      value <- 0 until k0
    } yield (k0.toLong, value.toLong)
    val df = rows.toDF("k0", "v").repartition(5)
    val got = q2("cardinality(v) as av FROM [//tmp/ab] group by k0", df)
      .as[Long].collect().sorted
    assert(got.toSeq == (1L until 100L))
  }

  // ---- user-function surface (ql_query_ut.cpp:6650-6960) ----

  test("UdfException (ql_query_ut.cpp): a throwing user function fails the query") {
    spark.udf.register("throw_if_negative_udf", (x: java.lang.Long) => {
      if (x != null && x < 0) sys.error(s"Argument was negative ($x)")
      x
    })
    intercept[Exception] {
      SelectRows(spark, "throw_if_negative_udf(a) as r from [//tmp/ue]",
        Map("//tmp/ue" -> Seq(-3L).toDF("a"))).collect()
    }
  }

  test("UdfNullPropagation2 (ql_query_ut.cpp): any null argument nulls the result") {
    spark.udf.register("exp_udf", (x: java.lang.Long, y: java.lang.Long) =>
      if (x == null || y == null) null
      else java.lang.Long.valueOf(math.pow(x.toDouble, y.toDouble).toLong))
    val df = Seq[(Option[Long], Option[Long])](
      (Some(1L), None), (Some(2L), Some(10L)), (None, Some(9L)), (None, None))
      .map { case (a, b) => (a.map(Long.box).orNull, b.map(Long.box).orNull) }
      .toDF("a", "b")
    val got = SelectRows(spark, "exp_udf(a, b) as x FROM [//tmp/un]",
      Map("//tmp/un" -> df)).collect()
      .map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).sorted
    assert(got.toSeq == Seq(-1L, -1L, -1L, 1024L))
  }

  test("UdfStringArgument / UdfStringResult (ql_query_ut.cpp): string in, string out") {
    spark.udf.register("strtol_udf", (s: String) =>
      if (s == null) null else java.lang.Long.valueOf(if (s.isEmpty) 0L else s.toLong))
    spark.udf.register("tolower_udf", (s: String) =>
      if (s == null) null else s.toLowerCase)
    val n = SelectRows(spark, "strtol_udf(a) as x FROM [//tmp/us]",
      Map("//tmp/us" -> Seq[(String, Long)](("123", 0), ("50", 1), ("", 2), (null, 3))
        .toDF("a", "i"))).collect()
      .map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).sorted
    assert(n.toSeq == Seq(-1L, 0L, 50L, 123L))
    val s = SelectRows(spark, "tolower_udf(a) as x FROM [//tmp/us2]",
      Map("//tmp/us2" -> Seq[(String, Long)](("HELLO", 0), ("HeLlO", 1), ("", 2), (null, 3))
        .toDF("a", "i"))).collect()
      .map(r => if (r.isNullAt(0)) "<null>" else r.getString(0)).sorted
    assert(s.toSeq == Seq("", "<null>", "hello", "hello"))
  }

  test("VarargUdf (ql_query_ut.cpp): variadic user function inside IN") {
    spark.udf.register("sum_udf", (xs: Seq[Long]) => xs.sum)
    // Scala UDFs are fixed-arity — the vararg surface lowers through
    // an array constructor, same calling convention for the QL string
    val got = SelectRows(spark,
      "a as x FROM [//tmp/uv] where sum_udf(make_list(7, 3, a)) in (11u, 12)",
      Map("//tmp/uv" -> Seq(1L, 2L).toDF("a"))).as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L))
  }

  test("ComplexWithAliases (ql_query_ut.cpp:4460): group alias referenced in a post-agg expression") {
    val df = (1L to 9L).map(i => (i, 10 * i)).toDF("a", "b")
    val got = q2("a % 2 as x, sum(b) + x as t FROM [//tmp/ab] where a > 1 group by x", df)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((0L, 200L), (1L, 241L)))
  }

  test("SubqueryAliases (ql_query_ut.cpp:300): aliases re-alias through a FROM subquery") {
    val got = q2("b as c from (SELECT a as b from [//tmp/ab])",
      Seq("x", "y").toDF("a")).as[String].collect().sorted
    assert(got.toSeq == Seq("x", "y"))
  }

  test("BigQuery (ql_query_ut.cpp): a 1000-member IN list prepares and runs") {
    val inList = (0 until 1000).mkString(", ")
    val got = q2(s"a from [//tmp/ab] where a in ($inList)",
      Seq(5L, 2000L).toDF("a")).as[Long].collect()
    assert(got.toSeq == Seq(5L))
  }

  // ---- query options (TQueryOptions surface) ----

  test("InputRowLimit (ql_query_ut.cpp): reads stop after N rows, filter applies to those") {
    val df = (1L to 9L).map(i => (i, 10 * i)).toDF("a", "b")
      .repartition(1).sortWithinPartitions("a")
    val got = SelectRows(spark,
      "a, b FROM [//tmp/lim] where uint64(a) > 1 and uint64(a) < 9",
      Map("//tmp/lim" -> df),
      SelectRows.Options(inputRowLimit = Some(3)))
      .as[(Long, Long)].collect().sorted
    assert(got.toSeq == Seq((2L, 20L), (3L, 30L)))
  }

  test("OutputRowLimit (ql_query_ut.cpp): result truncates at N rows") {
    val df = (1L to 9L).map(i => (i, 10 * i)).toDF("a", "b")
      .repartition(1).sortWithinPartitions("a")
    val got = SelectRows(spark,
      "a, b FROM [//tmp/lim] where a > 1 and a < 9",
      Map("//tmp/lim" -> df),
      SelectRows.Options(outputRowLimit = Some(3)))
      .collect()
    assert(got.length == 3)
  }

  test("TooBigQuery (ql_query_ut.cpp): 50 chained additions exceed the depth limit") {
    val deep = "k from [//t] where a " +
      (0 until 50).map(i => s"+ $i").mkString(" ") + " > 0"
    expectError(deep)
  }

  test("FilterNulls3 (ql_query_ut.cpp): canonical null relations are SQL 3VL") {
    val df = Seq[(Long, Option[Long])]((4L, Some(5L)), (6L, None), (10L, Some(11L)))
      .toDF("a", "b")
    // canonical: a < b is NULL when b is null → IS NOT NULL drops row 2
    val got = SelectRows(spark,
      "a, b FROM [//tmp/fn3] where a < b is not null",
      Map("//tmp/fn3" -> df),
      SelectRows.Options(useCanonicalNullRelations = true))
      .as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(got.toSeq == Seq((4L, Some(5L)), (10L, Some(11L))))
    // default QL relations: a < b is boolean-total → every row survives
    val dflt = SelectRows(spark,
      "a, b FROM [//tmp/fn3] where a < b is not null",
      Map("//tmp/fn3" -> df)).collect()
    assert(dflt.length == 3)
  }

  // ---- group-by / aggregate / transform family ----

  test("GroupByString (ql_query_ut.cpp): string group keys, ordered page") {
    val df = Seq((42L, "d"), (1L, "a"), (2L, "b"), (3L, "c"), (42L, "d"),
      (4L, "a"), (5L, "b"), (6L, "c"), (7L, "a"), (8L, "b"), (9L, "c"))
      .toDF("a", "s")
    val got = q2("sum(a) as t, s FROM [//tmp/ab] group by s order by s limit 3", df)
      .as[(Long, String)].collect()
    assert(got.toSeq == Seq((12L, "a"), (15L, "b"), (18L, "c")))
  }

  test("AverageAgg / AverageAgg3 (ql_query_ut.cpp): avg merges, null cells skipped") {
    val got = q2("avg(a) as x from [//tmp/ab] group by 1",
      Seq(3L, 53L, 8L, 24L, 33L).toDF("a")).as[Double].collect()
    assert(got.toSeq == Seq(24.2))
    val df = Seq[(Option[Double], Long)](
      (Some(3.0), 1L), (None, 1L), (None, 0L), (Some(7.0), 1L)).toDF("a", "b")
    val got3 = q2("b, avg(a) as x from [//tmp/ab] group by b", df)
      .as[(Long, Option[Double])].collect().sortBy(_._1)
    assert(got3.toSeq == Seq((0L, None), (1L, Some(5.0))))
  }

  test("HavingClause2/3 (ql_query_ut.cpp): aggregate predicates after grouping") {
    val df = Seq((1L, 10L), (1L, 10L), (2L, 20L), (2L, 20L)).toDF("a", "b")
    val got = q2("a as x, sum(b) as t FROM [//tmp/ab] group by a having sum(b) = 20", df)
      .as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 20L)))
    val got3 = q2("a as x, sum(b) as t FROM [//tmp/ab] group by a having sum(b) > 20", df)
      .as[(Long, Long)].collect()
    assert(got3.toSeq == Seq((2L, 40L)))
  }

  test("GroupByWithLimitFirstString (ql_query_ut.cpp): first() under a group limit") {
    // divergence: the reference reads key-ordered tablets, so LIMIT 1
    // deterministically surfaces group a=0; a Spark LIMIT without
    // ORDER BY may pick any group — assert the page shape and that
    // first() returns that group's first b in read order
    val df = (0 until 10).map(i => (i % 3L, i.toString, i.toLong))
      .toDF("a", "b", "c").repartition(1).sortWithinPartitions("c")
    val got = q2("first(b) as f FROM [//tmp/ab] group by a limit 1", df)
      .as[String].collect()
    assert(got.length == 1 && Set("0", "1", "2")(got.head))
  }

  test("GroupByOrderBy (ql_query_ut.cpp:3060): group page ordered by key desc") {
    val df = (1 to 9).map(i => (i.toLong, (i - 1) % 3L)).toDF("a", "b")
    val got = q2("sum(a) as t, b FROM [//tmp/ab] group by b order by b desc limit 3", df)
      .as[(Long, Long)].collect()
    assert(got.toSeq == Seq((18L, 2L), (15L, 1L), (12L, 0L)))
  }

  test("CardinalityAggregate (ql_query_ut.cpp): HLL estimate within ±1% on 2000 distinct") {
    val df = (0 until 4).flatMap(_ => 0 until 2000).map(_.toLong % 2000).toDF("a")
    val got = q2(
      "cardinality(a) < 2020 as upper, cardinality(a) > 1980 as lower from [//tmp/ab] group by 1",
      df).as[(Boolean, Boolean)].collect()
    assert(got.toSeq == Seq((true, true)))
  }

  test("ListExpr / DecimalExpr (ql_query_ut.cpp): typed list and decimal columns scan through") {
    val lst = Seq(Tuple1(Seq(1, 2, 3))).toDF("a")
    assert(q2("a FROM [//tmp/ab]", lst).as[Seq[Int]].collect().head == Seq(1, 2, 3))
    val dec = Seq(Tuple1(new java.math.BigDecimal("108.10"))).toDF("a")
      .select(org.apache.spark.sql.functions.col("a")
        .cast(org.apache.spark.sql.types.DecimalType(5, 2)).as("a"))
    assert(q2("a FROM [//tmp/ab]", dec).collect().head.getDecimal(0) ==
      new java.math.BigDecimal("108.10"))
  }

  test("ListHasIntersection (ql_query_ut.cpp:8860): Any lists, entities never match") {
    import graft.types.YtTypes._
    val pairs = Seq(
      ("[1;2;3]", "[4;6;2;#]", true),
      ("[\"a\"; \"b\"]", "[\"a\"]", true),
      ("[1;2;3]", "[4;6]", false),
      ("[%true]", "[]", false),
      ("[#]", "[#]", false),
      ("[1;#;3]", "[#;2;#]", false))
    val df = anyTagged(pairs.map { case (a, b, _) =>
      Seq(graft.sources.Yson.parseToJson(a), graft.sources.Yson.parseToJson(b))
    }, "a" -> YtAny, "b" -> YtAny)
    val cat = Map("//tmp/lhi" -> df)
    val fwd = SelectRows(spark,
      "list_has_intersection(a, b) as has_intersection from [//tmp/lhi]", cat)
      .as[Boolean].collect()
    assert(fwd.toSeq == pairs.map(_._3))
    val rev = SelectRows(spark,
      "list_has_intersection(b, a) as has_intersection from [//tmp/lhi]", cat)
      .as[Boolean].collect()
    assert(rev.toSeq == pairs.map(_._3))
  }

  test("SimpleTransform / SimpleTransform2 / WithDefault (ql_query_ut.cpp): scalar and tuple TRANSFORM") {
    val a = Seq(4L, -10L, 15L).toDF("a")
    val got = q2("transform(a, (4.0, -10), (13, 17)) as x FROM [//tmp/ab]", a)
      .as[Option[Long]].collect()
    assert(got.toSeq == Seq(Some(13L), Some(17L), None))

    val ab = Seq[(Long, Option[String])]((4L, Some("p")), (-10L, Some("q")),
      (-10L, Some("s")), (15L, None)).toDF("a", "b")
    val got2 = q2("transform((a, b), ((4.0, 'p'), (-10, 's')), (13, 17)) as x FROM [//tmp/ab]", ab)
      .as[Option[Long]].collect()
    assert(got2.toSeq == Seq(Some(13L), None, Some(17L), None))

    val got3 = q2(
      "transform((a, b), ((4.0, 'p'), (-10, 's')), (13, 17), a + 1) as x FROM [//tmp/ab]", ab)
      .as[Option[Long]].collect()
    assert(got3.toSeq == Seq(Some(13L), Some(-9L), Some(17L), Some(16L)))
  }

  test("CompositeMemberAccessorWithIncorrectPath (ql_query_ut.cpp): missing members raise") {
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(StructField("struct", StructType(Seq(
      StructField("a", StructType(Seq(
        StructField("b", StructType(Seq(StructField("c", LongType))))))),
      StructField("d", StringType),
      StructField("tuple", ArrayType(LongType)))))))
    val rows = Seq(
      Row(Row(Row(Row(1L)), "a", Seq(1L))),
      Row(Row(Row(Row(2L)), null, Seq(2L))))
    val st = spark.createDataFrame(rows.asJava, schema)
    val cat = Map("//tmp/cmip" -> st)
    for (bad <- Seq(
      "t.struct.not_exists as n from [//tmp/cmip] as t",
      "t.struct.a.b.not_exists as n from [//tmp/cmip] as t",
      "t.struct.d[1] as n from [//tmp/cmip] as t")) {
      intercept[Exception] { SelectRows(spark, bad, cat).collect() }
    }
  }

  test("IsNull (ql_query_ut.cpp:4824): is_null() as a WHERE predicate") {
    val rows = Seq[(Option[Long], Option[Long])](
      (Some(1L), Some(10L)), (Some(2L), Some(20L)), (Some(9L), Some(90L)),
      (Some(10L), None), (None, Some(1L)), (None, Some(2L)), (None, Some(3L)))
    val df = rows.toDF("a", "b")
    val got = SelectRows(spark, "b FROM [//tmp/in] where is_null(a)",
      Map("//tmp/in" -> df)).as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L, 3L))
  }

  test("SimpleTransformWithDefault (ql_query_ut.cpp:2688): tuple TRANSFORM falls " +
      "through to the default expression") {
    val df = Seq[(Option[Long], Option[String])](
      (Some(4L), Some("p")), (Some(-10L), Some("q")),
      (Some(-10L), Some("s")), (Some(15L), None)).toDF("a", "b")
    val got = SelectRows(spark,
      "transform((a, b), ((4.0, 'p'), (-10, 's')), (13, 17), a + 1) as x FROM [//tmp/td]",
      Map("//tmp/td" -> df)).as[Long].collect().sorted
    assert(got.toSeq == Seq(-9L, 13L, 16L, 17L))
  }

  test("TypeV1Propagation (ql_query_ut.cpp:8863): an int32 column surfaces as int64") {
    val df = Seq(5).toDF("a") // IntegerType source column
    val got = SelectRows(spark, "a FROM [//tmp/tv]", Map("//tmp/tv" -> df))
    assert(got.schema("a").dataType == org.apache.spark.sql.types.LongType)
    assert(got.as[Long].collect().toSeq == Seq(5L))
    // arithmetic runs in 64-bit: int32 operands cannot overflow at 2^31
    val big = Seq(1 << 30).toDF("a")
    val sum = SelectRows(spark, "a + a as s FROM [//tmp/tv32]",
      Map("//tmp/tv32" -> big)).as[Long].collect()
    assert(sum.toSeq == Seq(1L << 31))
  }

  test("UnversionedValueUdf/2 (ql_query_ut.cpp:6914): user functions observe " +
      "null vs empty-string distinctly") {
    spark.udf.register("is_null_udf", (x: String) => x == null)
    spark.udf.register("string_equals_42_udf",
      (x: String) => x != null && x == "42")
    val df = Seq(Some("Hello"), Some(""), None).toDF("a")
    val got = SelectRows(spark, "is_null_udf(a) as x FROM [//tmp/uv]",
      Map("//tmp/uv" -> df)).as[Boolean].collect()
    assert(got.count(identity) == 1 && got.length == 3)
    val df2 = Seq(Some("Hello"), Some(""), Some("42"), None).toDF("a")
    val got2 = SelectRows(spark, "string_equals_42_udf(a) as x FROM [//tmp/uv2]",
      Map("//tmp/uv2" -> df2)).as[Boolean].collect()
    assert(got2.count(identity) == 1 && got2.length == 4)
  }

  test("BigbHash (ql_query_ut.cpp:8219): empty id → 0, y-prefixed numeric uid → " +
      "the uid, everything else hashes — exact reference vectors") {
    // all eight pinned uint64 outputs of the reference's own test:
    // the uid branches verbatim, the fallback bit-exact via
    // IntHash64(CityHash64(uid)) ^ CityHash64("shard")
    val df = Seq("y12345", "y12345b", "p12345", "gaid/12345", "idfa/12345",
      "12345", "", "y").toDF("A")
    val got = SelectRows(spark, "A, bigb_hash(A) as x FROM [//tmp/bb]",
      Map("//tmp/bb" -> df)).as[(String, Long)].collect().toMap
    def u(s: String): Long = java.lang.Long.parseUnsignedLong(s)
    assert(got("y12345") == 12345L)
    assert(got("y12345b") == u("4325840212205223962"))
    assert(got("p12345") == u("7036960256067388486"))
    assert(got("gaid/12345") == u("17724055447702487579"))
    assert(got("idfa/12345") == u("5977914593781245279"))
    assert(got("12345") == u("1820233801294503536"))
    assert(got("") == 0L)
    assert(got("y") == u("15359751383596667256"))
    // "y" + digits too large for uint64 must hash, not overflow-parse
    val big = SelectRows(spark, "bigb_hash(A) as x FROM [//tmp/bb2]",
      Map("//tmp/bb2" -> Seq("y99999999999999999999999").toDF("A")))
      .as[Long].collect()
    assert(big.length == 1)
    // u64 max parses on the raw-bits carrier: 18446744073709551615 ≡ -1L
    val top = SelectRows(spark, "bigb_hash(A) as x FROM [//tmp/bb3]",
      Map("//tmp/bb3" -> Seq("y18446744073709551615").toDF("A")))
      .as[Long].collect()
    assert(top.toSeq == Seq(-1L))
  }

  test("CompositeMemberAccessorStructPositionalEncoding (ql_query_ut.cpp:7871): " +
      "deep paths, struct subtrees, deep group keys") {
    // the reference stores this fixture with POSITIONAL struct
    // encoding ([[[1]];a]) and reads the Any subtree with '/0'; our
    // Any carrier is canonically named JSON (as in the reference's own
    // CompositeMemberAccessorTuple, which uses '/c' on named storage),
    // so the storage-positional '/0' block reads by name here
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(StructField("struct", StructType(Seq(
      StructField("a", StructType(Seq(StructField("b", StructType(Seq(
        StructField("c", IntegerType))))))),
      StructField("d", StringType))))))
    val rows = Seq(
      Row(Row(Row(Row(1)), "a")), Row(Row(Row(Row(2)), "b")),
      Row(Row(Row(Row(3)), "c")), Row(Row(null, "d")))
    val st = spark.createDataFrame(rows.asJava, schema)
    val cat = Map("//tmp/cpe" -> st)
    val b1 = SelectRows(spark,
      "t.struct.a.b.c as c, t.struct.d as d from [//tmp/cpe] as t", cat)
      .collect().map(r => (if (r.isNullAt(0)) -1 else r.getInt(0), r.getString(1)))
    assert(b1.sortBy(_._2).toSeq ==
      Seq((1, "a"), (2, "b"), (3, "c"), (-1, "d")))
    // struct subtree projection keeps the composite type
    val b2 = SelectRows(spark, "t.struct.a.b as b from [//tmp/cpe] as t", cat)
    assert(b2.schema("b").dataType.isInstanceOf[StructType])
    val cs = b2.collect().map(r =>
      if (r.isNullAt(0)) -1 else r.getStruct(0).getInt(0)).sorted
    assert(cs.toSeq == Seq(-1, 1, 2, 3))
    // subtree through the Any carrier (named-path divergence above)
    val b3 = SelectRows(spark,
      "try_get_int64(to_any(t.struct.a.b), '/c') as c from [//tmp/cpe] as t", cat)
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).sorted
    assert(b3.toSeq == Seq(-1L, 1L, 2L, 3L))
    // deep path as a group key, both placements
    // composite access keeps int32 even as a group key (the reference's
    // result split is Int32 here, unlike plain-column TypeV1Propagation)
    for (g <- Seq(
      "t.struct.a.b.c as c from [//tmp/cpe] as t group by c",
      "c from [//tmp/cpe] as t group by t.struct.a.b.c as c")) {
      val got = SelectRows(spark, g, cat)
        .collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).sorted
      assert(got.toSeq == Seq(-1, 1, 2, 3), g)
    }
  }

  test("GroupByOrderByCoordinatedWithPrimaryKeyPrefix (ql_query_ut.cpp:3491): " +
      "ordered groups on a key-prefix group key across partitions") {
    val df = Seq((1L, 1L, 0L), (1L, 2L, 0L), (2L, 3L, 0L), (3L, 4L, 0L),
      (4L, 5L, 0L), (5L, 6L, 0L), (6L, 7L, 0L), (6L, 8L, 0L), (7L, 9L, 0L),
      (8L, 10L, 0L), (9L, 11L, 0L)).toDF("k1", "k2", "v").repartition(2)
    val got = q2("k1 from [//tmp/ab] group by k1 order by k1 limit 1000", df)
      .as[Long].collect()
    assert(got.toSeq == (1L to 9L))
  }

  test("GroupByOrderByCoordinatedWithAggregates (ql_query_ut.cpp:3513): " +
      "aggregates over ordered group pages") {
    val rows = Seq(
      ("a", 0L, 1L, 1L), ("a", 1L, 2L, 2L), ("a", 2L, 4L, 4L),
      ("a", 3L, 2L, 6L), ("a", 4L, 1L, 9L),
      ("b", 5L, 3L, 3L), ("b", 6L, 1L, 5L),
      ("b", 7L, 3L, 7L), ("b", 8L, 4L, 8L))
    val df = rows.toDF("k1", "k2", "v1", "v2").repartition(4)
    val g1 = q2("k1, v1, sum(v2) as s from [//tmp/ab] group by k1, v1 " +
      "order by k1, v1 limit 1000", df).as[(String, Long, Long)].collect()
    assert(g1.toSeq == Seq(("a", 1L, 10L), ("a", 2L, 8L), ("a", 4L, 4L),
      ("b", 1L, 5L), ("b", 3L, 10L), ("b", 4L, 8L)))
    val g2 = q2("k1, sum(1) as s from [//tmp/ab] group by k1, k2 " +
      "order by k1, k2 limit 6", df).as[(String, Long)].collect()
    assert(g2.toSeq == Seq(("a", 1L), ("a", 1L), ("a", 1L), ("a", 1L),
      ("a", 1L), ("b", 1L)))
    val g3 = q2("k1, sum(1) as s from [//tmp/ab] group by k1 " +
      "order by k1 limit 3", df).as[(String, Long)].collect()
    assert(g3.toSeq == Seq(("a", 5L), ("b", 4L)))
    val g4 = q2("sum(1) as s from [//tmp/ab] group by 1000+1 limit 0", df)
    assert(g4.count() == 0L)
  }

  test("DataWeightRead (ql_query_ut.cpp:9515): the data-weight statistic " +
      "counts 1/row + 8/int64 + 1/bool + byte-length/string") {
    import org.apache.spark.sql.functions.sum
    val df = Seq((4L, true, "abc"), (10L, false, "defg")).toDF("a", "b", "c")
    val w = df.agg(sum(graft.types.YtTypes.dataWeight(df)))
      .collect().head.getLong(0)
    assert(w == 27L) // (1+8+1+3) + (1+8+1+4)
    // nulls weigh zero
    val dn = Seq[(Option[Long], Option[String])]((None, None)).toDF("a", "c")
    val wn = dn.agg(sum(graft.types.YtTypes.dataWeight(dn)))
      .collect().head.getLong(0)
    assert(wn == 1L)
  }

  test("test_merging_group_by2 (test_query.py:383): grouped max over 20 shards, " +
      "ordered page") {
    val df = (0 until 100).map(i => (i.toLong, i.toString)).toDF("a", "b")
      .repartition(20)
    val got = SelectRows(spark,
      "k, max(b) as m from [//tmp/mg] group by a % 2 as k order by k limit 2",
      Map("//tmp/mg" -> df)).as[(Long, String)].collect()
    assert(got.toSeq == Seq((0L, "98"), (1L, "99")))
  }

  test("test_join_common_prefix_limit (test_query.py:840): left-join null filter " +
      "+ BETWEEN + LIMIT") {
    val jl = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (5L, 2L), (6L, 3L),
      (7L, 4L), (8L, 1L)).toDF("a", "b")
    val jr = Seq((1L, 80L), (3L, 62L), (4L, 53L), (6L, 17L)).toDF("a", "c")
    val got = SelectRows(spark,
      "* from [//tmp/jl] left join [//tmp/jr] using a " +
        "where c = null and a between 2 and 7 limit 2",
      Map("//tmp/jl" -> jl, "//tmp/jr" -> jr))
      .select("a", "b").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((2L, 3L), (5L, 2L)))
  }

  test("test_types (test_query.py:974): int64/boolean/string/uint64 row through " +
      "a string filter") {
    import graft.types.YtTypes._
    import scala.jdk.CollectionConverters._
    val schema = YtSchema(Seq(YtColumn("a", YtInt64), YtColumn("b", YtBoolean),
      YtColumn("c", YtUtf8), YtColumn("d", YtUint64))).toStructType
    val df = spark.createDataFrame(Seq(
      Row(10L, false, "hello", 32L), Row(20L, true, "world", 64L)).asJava, schema)
    val got = SelectRows(spark,
      "a, b, c, d from [//tmp/ty] where c = \"hello\"",
      Map("//tmp/ty" -> df)).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == 10L && !r.getBoolean(1) &&
      r.getString(2) == "hello" && r.getLong(3) == 32L)
  }

  test("test_inefficient_join (test_query.py:533): allow_join_without_index=false " +
      "rejects joins that skip the foreign key") {
    import graft.types.YtTypes._
    import scala.jdk.CollectionConverters._
    val jl = spark.createDataFrame(Seq(Row(1L, 10L)).asJava,
      YtSchema(Seq(YtColumn("a", YtInt64, sortOrder = Some("ascending")),
        YtColumn("b", YtInt64))).toStructType)
    val jr = spark.createDataFrame(Seq(Row(1L, 10L)).asJava,
      YtSchema(Seq(YtColumn("c", YtInt64, sortOrder = Some("ascending")),
        YtColumn("d", YtInt64))).toStructType)
    val cat = Map("//tmp/ijl" -> jl, "//tmp/ijr" -> jr)
    val strict = SelectRows.Options(allowJoinWithoutIndex = false)
    val err = intercept[IllegalArgumentException] {
      SelectRows(spark, "* from [//tmp/ijl] join [//tmp/ijr] on b = d",
        cat, strict)
    }
    assert(err.getMessage.contains("Foreign table key is not used"))
    // joining THROUGH the foreign key passes the check
    val ok = SelectRows(spark, "* from [//tmp/ijl] join [//tmp/ijr] on b = c",
      cat, strict)
    assert(ok.count() == 0L) // b=10 has no match in c — shape, not rows
    // and the default (allow) accepts the keyless join
    assert(SelectRows(spark, "* from [//tmp/ijl] join [//tmp/ijr] on b = d",
      cat).count() == 1L)
  }

  test("test_join_nonv1_types (test_query.py:1714): a join equation on a " +
      "nonsimple (v3) column raises") {
    import graft.types.YtTypes._
    import scala.jdk.CollectionConverters._
    val tt = spark.createDataFrame(
      Seq(Row("a", new java.math.BigDecimal("1.00"))).asJava,
      YtSchema(Seq(YtColumn("a", YtString, sortOrder = Some("ascending")),
        YtColumn("b", YtDecimal(3, 2)))).toStructType)
    val tj = Seq(("x", "c")).toDF("b", "c")
    val err = intercept[IllegalArgumentException] {
      SelectRows(spark, "* from [//tmp/nv] join [//tmp/nvj] using b",
        Map("//tmp/nv" -> tt, "//tmp/nvj" -> tj))
    }
    assert(err.getMessage.contains("nonsimple"))
  }

  test("test_yson_string_to_any (test_query.py:2377): Any range bounds and " +
      "equality built from YSON text") {
    import graft.types.YtTypes.YtAny
    val rows = Seq(
      Seq("[0,1,2]", "0"), Seq("[1,2,3]", "1"), Seq("[2,3,4]", "\"two\""),
      Seq("[3,4,5]", "\"three\""), Seq("[4,5,6]", "4"))
    val df = anyTagged(rows, "k" -> YtAny, "v" -> YtAny)
    val got = SelectRows(spark,
      """v from [//tmp/ysa] where
        |(k >= yson_string_to_any('[1;2;4]')) and
        |(k <= yson_string_to_any('[3;4;5]')) and
        |(v = yson_string_to_any('two') or v = yson_string_to_any('three'))
        |limit 3""".stripMargin,
      Map("//tmp/ysa" -> df)).as[String].collect().sorted
    assert(got.toSeq == Seq("\"three\"", "\"two\""))
  }

  test("FormatTimestamp TooSmall/TooLarge/InvalidFormat " +
      "(ql_expressions_ut.cpp:2756-2796): bounds and format-length errors") {
    val one = Seq(1L).toDF("x")
    val cat = Map("//tmp/one" -> one)
    val tooSmall = intercept[Exception] {
      SelectRows(spark,
        "format_timestamp(-62135596801, '') as r from [//tmp/one]", cat).collect()
    }
    assert(tooSmall.getMessage.contains("smaller than minimal"))
    val tooLarge = intercept[Exception] {
      SelectRows(spark,
        "format_timestamp(253402300800, 'yyyyMMdd') as r from [//tmp/one]", cat)
        .collect()
    }
    assert(tooLarge.getMessage.contains("greater than maximal"))
    val longFmt = intercept[Exception] {
      SelectRows(spark,
        "format_timestamp(0, '11111111112222222222333333333344') as r from [//tmp/one]",
        cat).collect()
    }
    assert(longFmt.getMessage.contains("Format string is too long"))
    // in-range seconds format (Java pattern syntax, documented deviation)
    val ok = SelectRows(spark,
      "format_timestamp(0, 'yyyy-MM-dd') as r from [//tmp/one]", cat)
      .as[String].collect()
    assert(ok.toSeq == Seq("1970-01-01"))
  }

  test("Int64/UInt64 Division/ModuloByZero + IntMinByMinusOne " +
      "(ql_expressions_ut.cpp:2806-2906): arithmetic error surface") {
    val df = Seq((1L, 0L)).toDF("i1", "i2")
    val cat = Map("//tmp/dz" -> df)
    for (q <- Seq("i1 / i2 as r from [//tmp/dz]",
                  "i1 % i2 as r from [//tmp/dz]")) {
      val e = intercept[Exception] { SelectRows(spark, q, cat).collect() }
      assert(e.getMessage.contains("Division by zero"), q)
    }
    // uint64 columns route through u64_div/u64_mod — same error
    import graft.types.YtTypes._
    import scala.jdk.CollectionConverters._
    val u = spark.createDataFrame(Seq(Row(1L, 0L)).asJava,
      YtSchema(Seq(YtColumn("u1", YtUint64), YtColumn("u2", YtUint64)))
        .toStructType)
    val ucat = Map("//tmp/udz" -> u)
    for (q <- Seq("u1 / u2 as r from [//tmp/udz]",
                  "u1 % u2 as r from [//tmp/udz]")) {
      val e = intercept[Exception] { SelectRows(spark, q, ucat).collect() }
      assert(e.getMessage.contains("Division by zero"), q)
    }
    val intMin = intercept[Exception] {
      SelectRows(spark,
        "i1 / i2 as r from [//tmp/im]",
        Map("//tmp/im" -> Seq((Long.MinValue, -1L)).toDF("i1", "i2"))).collect()
    }
    assert(intMin.getMessage.contains("INT_MIN"))
  }

  test("ListContainsAny (ql_expressions_ut.cpp:2922): list_contains over " +
      "non-list Any operands is a type error") {
    val e = intercept[Exception] {
      SelectRows(spark,
        "list_contains(to_any(\"a\"), to_any(42)) as r from [//tmp/one]",
        Map("//tmp/one" -> Seq(1L).toDF("x"))).collect()
    }
    assert(e != null) // reference text: "Wrong type for argument"
  }

  test("ConcatenateOperator (ql_expressions_ut.cpp:2936): || is string-only") {
    val df = Seq((1L, 2L, "s")).toDF("i1", "i2", "s1")
    val cat = Map("//tmp/cc" -> df)
    for (q <- Seq("1 || 2 as r from [//tmp/cc]",
                  "i1 || i2 as r from [//tmp/cc]")) {
      val e = intercept[Exception] { SelectRows(spark, q, cat).collect() }
      assert(e.getMessage.contains("Type mismatch"), q)
    }
    // and the string form still concatenates
    val ok = SelectRows(spark, "s1 || s1 as r from [//tmp/cc]", cat)
      .as[String].collect()
    assert(ok.toSeq == Seq("ss"))
  }

  test("ErrorConvertStringToNumericTest (ql_expressions_ut.cpp:3066): " +
      "parse_int64 of a non-numeric string raises") {
    val e = intercept[Exception] {
      SelectRows(spark, "parse_int64(s) as r from [//tmp/pe]",
        Map("//tmp/pe" -> Seq("hello").toDF("s"))).collect()
    }
    assert(e != null) // reference text: "Cannot convert value"
  }

  test("GroupByBool (ql_query_ut.cpp:2885): boolean expression as group key") {
    val df = (1 to 9).map(i => (i.toLong, 10L * i)).toDF("a", "b")
    val got = SelectRows(spark,
      "x, sum(b) as t FROM [//tmp/gb] where a > 1 group by a % 2 = 1 as x",
      Map("//tmp/gb" -> df)).as[(Boolean, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((false, 200L), (true, 240L)))
  }

  test("CardinalityAggregateTotals2 (ql_query_ut.cpp:8644): HLL under " +
      "HAVING with totals; inline aliases; totals-row null comparisons") {
    // 12 blocks: block i holds a=0..1000·(i%3+1)-1 with b=i%3+1 — so
    // group b=k has k·1000 distinct a values, repeated across 4 blocks
    val rows = for {
      i <- 0 until 12
      j <- 0 until 1000 * (i % 3 + 1)
    } yield (j.toLong, (i % 3 + 1).toLong)
    val df = rows.toDF("a", "b")
    // b=1 (1000 distinct) fails HAVING; b=2 and b=3 survive; the totals
    // row merges the HLL over ALL groups (≈3000 distinct) and its
    // null b makes the comparisons hit QL's null-equal relations → true
    val got = SelectRows(spark,
      "(int64(cardinality(a)) - b * 1000 as x) >= (-b * 10) and x <= (b * 10) as result, " +
        "(int64(cardinality(a)) - 3000) between -30 and 30 as total, b " +
        "from [//tmp/ct] group by b having cardinality(a) > 1500 with totals",
      Map("//tmp/ct" -> df))
      .as[(Option[Boolean], Option[Boolean], Option[Long])].collect()
      .sortBy(_._3.getOrElse(Long.MaxValue))
    assert(got.length == 3)
    assert(got(0) == ((Some(true), Some(false), Some(2L))))
    assert(got(1) == ((Some(true), Some(true), Some(3L))))
    assert(got(2) == ((Some(true), Some(true), None)))
  }

  test("GroupByOrderByCoordinated1 (ql_query_ut.cpp:3327): group+order paging across 3 tablets") {
    val rows = Seq(
      (1L, 0L, 11L, 3L), (2L, 1L, 12L, 2L), (3L, 2L, 13L, 1L),
      (4L, 0L, 14L, 3L), (5L, 1L, 15L, 2L), (6L, 2L, 16L, 1L),
      (7L, 0L, 17L, 3L), (8L, 1L, 18L, 2L), (9L, 2L, 19L, 1L))
    val df = rows.toDF("a", "b", "c", "d").repartition(3)
    def q(ql: String) = SelectRows(spark, ql, Map("//t" -> df))
    assert(q("m from [//t] group by a % 3 as m order by m limit 3")
      .as[Long].collect().toSeq == Seq(0L, 1L, 2L))
    assert(q("d from [//t] group by d order by d limit 3")
      .as[Long].collect().toSeq == Seq(1L, 2L, 3L))
    assert(q("a, b from [//t] group by a, b order by a, b limit 5")
      .as[(Long, Long)].collect().toSeq ==
      Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 0L), (5L, 1L)))
    assert(q("a, b from [//t] group by a, b order by a, b offset 2 limit 5")
      .as[(Long, Long)].collect().toSeq ==
      Seq((3L, 2L), (4L, 0L), (5L, 1L), (6L, 2L), (7L, 0L)))
  }

  test("HavingClause1-3 (ql_query_ut.cpp:4741): HAVING on key, on aggregate, aggregate not projected") {
    val df = Seq((1L, 10L), (1L, 10L), (2L, 20L), (2L, 20L)).toDF("a", "b")
    val g1 = SelectRows(spark,
      "a as x, sum(b) as t FROM [//t] group by a having a = 1",
      Map("//t" -> df)).as[(Long, Long)].collect()
    assert(g1.toSeq == Seq((1L, 20L)))
    val g2 = SelectRows(spark,
      "a as x, sum(b) as t FROM [//t] group by a having sum(b) = 20",
      Map("//t" -> df)).as[(Long, Long)].collect()
    assert(g2.toSeq == Seq((1L, 20L)))
    // the HAVING aggregate need not be projected
    val g3 = SelectRows(spark,
      "a as x FROM [//t] group by a having sum(b) = 20",
      Map("//t" -> df)).as[Long].collect()
    assert(g3.toSeq == Seq(1L))
  }

  test("OrderByAny (ql_query_ut.cpp:10444): Any lists sort in composite order") {
    import graft.types.YtTypes.YtAny
    val df = anyTagged(
      Seq(Seq("[1,2,3]"), Seq("[2,4,5]"), Seq("[2,3,4]"), Seq("[0]")),
      "a" -> YtAny)
    val got = SelectRows(spark,
      "a from [//tmp/oba] order by a limit 10", Map("//tmp/oba" -> df))
      .as[String].collect()
    assert(got.toSeq == Seq("[0]", "[1,2,3]", "[2,3,4]", "[2,4,5]"))
  }

  test("QuotedColumnNames (ql_query_ut.cpp:9439): backtick escapes; reserved word as column") {
    val weird = "column ]]] \n \t B ’ ` "
    val df1 = Seq(4L, 10L).toDF(weird)
    val got1 = SelectRows(spark,
      "`column ]]] \\n \\t \\x42 \\u2019 \\` ` FROM `//t`",
      Map("//t" -> df1)).as[Long].collect().sorted
    assert(got1.toSeq == Seq(4L, 10L))
    val df2 = Seq(4L, 10L).toDF("where")
    val got2 = SelectRows(spark, "`where` FROM `//t`", Map("//t" -> df2))
      .as[Long].collect().sorted
    assert(got2.toSeq == Seq(4L, 10L))
  }

  test("SimpleCmpInt (ql_query_ut.cpp:2282): the int comparison matrix") {
    val df = Seq((4L, 5L), (6L, 6L)).toDF("a", "b")
    val got = SelectRows(spark,
      "a < b as r1, a > b as r2, a <= b as r3, a >= b as r4, a = b as r5 FROM [//t]",
      Map("//t" -> df))
      .as[(Boolean, Boolean, Boolean, Boolean, Boolean)].collect()
    assert(got.toSeq == Seq(
      (true, false, true, false, false),
      (false, false, true, true, true)))
  }

  test("PartialSortMergeJoin (ql_query_ut.cpp:5491): tuple ON join over two keys") {
    val left = Seq((1L, 2L, 1L), (1L, 3L, 2L), (1L, 1L, 3L), (1L, 4L, 4L),
      (2L, 4L, 5L), (2L, 3L, 6L)).toDF("a", "b", "c")
    val right = Seq((1L, 2L, 1L), (1L, 3L, 2L), (1L, 1L, 3L), (1L, 4L, 4L),
      (2L, 4L, 5L), (2L, 3L, 6L)).toDF("d", "e", "f")
    val got = SelectRows(spark,
      "a, b, c, d, e, f FROM [//left] join [//right] on (a, b) = (d, e)",
      Map("//left" -> left, "//right" -> right))
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._3)
    assert(got.toSeq == Seq(
      (1L, 2L, 1L, 1L, 2L, 1L), (1L, 3L, 2L, 1L, 3L, 2L),
      (1L, 1L, 3L, 1L, 1L, 3L), (1L, 4L, 4L, 1L, 4L, 4L),
      (2L, 4L, 5L, 2L, 4L, 5L), (2L, 3L, 6L, 2L, 3L, 6L)))
  }

  test("Lazy (ql_query_ut.cpp:9939): CASE branches short-circuit — guarded " +
      "division never raises") {
    val df = Seq(0L, 3L, 1L).toDF("a").repartition(1)
    // searched CASE: `15/a = 5` sits behind `a = 0`, so a=0 never divides
    val got1 = q2("""case
        when a = 0    then 'aaa'
        when 15 / a = 5 then 'bbb'
        else               'ccc'
      end as m from [//tmp/ab]""", df).as[String].collect()
    assert(got1.toSeq == Seq("aaa", "bbb", "ccc"))
    // entity conditions are never-true; null THEN flows through; the
    // negative branch divides only when reached
    val got2 = q2("""case
        when boolean(#) then 0
        when a = 0      then int64(#)
        when a > 0      then 15 / a
        else            -15 / a
      end as m from [//tmp/ab]""", df).as[java.lang.Long].collect()
    assert(got2.toSeq == Seq(null, 5L, 15L))
    // simple CASE: the ELSE `1/a` evaluates only when every WHEN missed
    val got3 = q2("""case a * a
        when 2 - 2     then 'a'
        when (1+1+1)*a then 'b'
        when a * a     then 'c'
        else                numeric_to_string(1 / a)
      end as m from [//tmp/ab]""", df).as[String].collect()
    assert(got3.toSeq == Seq("a", "b", "c"))
  }

  test("CardinalityAggregateTotals3 (ql_query_ut.cpp:8679): HLL windows " +
      "through HAVING and the totals row") {
    val rows = for (i <- 0 until 16; j <- 0 until 500)
      yield (j + 1000L * (i % 3), (i % 3).toLong)
    val df = rows.toDF("a", "b").repartition(4)
    // groups b=1,2 pass min(a) > 400 with ~500 distinct a each; the
    // totals row re-estimates over BOTH surviving groups (~1000)
    val got = q2(
      "int64(cardinality(a)) between 490 and 510 as result, " +
        "int64(cardinality(a)) between 990 and 1010 as total, b " +
        "from [//tmp/ab] group by b having min(a) > 400 with totals", df)
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1),
        if (r.isNullAt(2)) null else r.getLong(2)))
    assert(got.length == 3)
    val (totalsRow, groupRows) = got.partition(_._3 == null)
    assert(totalsRow.toSeq == Seq((false, true, null)))
    assert(groupRows.toSet == Set((true, false, 1L), (true, false, 2L)))
  }

  test("GroupByCoordinatedWithAggregates3 (ql_query_ut.cpp:3698): sums are " +
      "complete for every paged group across 3 partitions") {
    val df = (0 until 100).map(i => (i / 10L, i % 10L, i.toLong))
      .toDF("k1", "k2", "v1").repartition(3)
    val sums = (0 until 100).groupBy(_ / 10)
      .map { case (k, is) => (k.toLong, is.map(_.toLong).sum) }
    // divergence (as GroupByCoordinatedWithAggregates1/2): the reference
    // pages groups in key order; our page membership is plan-dependent —
    // assert page size and that every emitted sum is the COMPLETE sum
    for ((qstr, n) <- Seq(
        ("k1, sum(v1) as s from [//tmp/ab] group by k1 limit 1", 1),
        ("k1, sum(v1) as s from [//tmp/ab] group by k1 limit 2", 2),
        ("k1, sum(v1) as s from [//tmp/ab] group by k1 offset 1 limit 1", 1))) {
      val page = q2(qstr, df).as[(Long, Long)].collect()
      assert(page.length == n, qstr)
      page.foreach { case (k, s) => assert(sums(k) == s, qstr) }
    }
  }

  test("GroupByCoordinatedWithAggregates4 (ql_query_ut.cpp:3746): a null " +
      "group key aggregates once across partitions") {
    val rows: Seq[(java.lang.Long, Long, Long)] = Seq(
      (null, 1L, 9L), (null, 2L, 8L), (null, 3L, 7L), (null, 4L, 6L),
      (null, 5L, 5L), (null, 6L, 4L), (null, 7L, 3L),
      (null, 8L, 2L), (null, 9L, 1L), (0L: java.lang.Long, 0L, 0L),
      (0L: java.lang.Long, 1L, 5L))
    val df = rows.toDF("k0", "k1", "k2").repartition(3)
    // the reference loops 10× to shake out merge nondeterminism
    for (_ <- 0 until 3) {
      val got = q2("k0, min(k2) as mk from [//tmp/ab] group by k0", df)
        .collect().map(r =>
          (if (r.isNullAt(0)) null else r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((null, 1L), (0L, 0L)))
    }
  }

  test("JoinRowLimit2 (ql_query_ut.cpp:5606): OutputRowLimit truncates the " +
      "join fan-out") {
    val left = Seq(1L, 1L).toDF("a")
    val right = Seq(1L, 1L, 1L).toDF("a")
    val got = SelectRows(spark, "a as x FROM [//left] join [//right] using a",
      Map("//left" -> left, "//right" -> right),
      SelectRows.Options(outputRowLimit = Some(5)))
      .as[Long].collect()
    assert(got.length == 5)
    assert(got.forall(_ == 1L))
  }

  test("SelectColumns (ql_query_ut.cpp:476): the read schema prunes to the " +
      "referenced columns at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_selcols").toString
    (1 to 20).map(i => (i.toLong, i.toLong, i * 2L, i * 3L, i * 4L))
      .toDF("h", "a", "b", "c", "d")
      .write.mode("overwrite").parquet(dir)
    val pq = spark.read.parquet(dir)
    val full = SelectRows(spark, "* from [//tmp/sc]", Map("//tmp/sc" -> pq))
    assert(full.columns.toSeq == Seq("h", "a", "b", "c", "d"))
    val narrow = SelectRows(spark, "d, c, a from [//tmp/sc]", Map("//tmp/sc" -> pq))
    assert(narrow.columns.toSeq == Seq("d", "c", "a"))
    // the PHYSICAL scan reads only the referenced columns
    val scan = narrow.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("ReadSchema") &&
      !scan.matches("(?s).*ReadSchema:[^\\n]*[hb]:bigint.*"),
      s"scan not pruned:\n$scan")
  }

  test("FarmHash (ql_query_ut.cpp:8192): exact reference output vectors") {
    // rows (a=3, b="hello", c=true) and (a=54, b=null, c=false) →
    // x=13185060272037541714u and x=1607147011416532415u — the pinned
    // uint64 outputs of the reference's own evaluate test, bit-exact
    val df = Seq(
      (3L, Option("hello"), true),
      (54L, None: Option[String], false)).toDF("a", "b", "c")
    val got = q2("farm_hash(a, b, c) as x FROM [//tmp/ab]", df)
      .as[Long].collect()
    assert(got.toSeq == Seq(
      java.lang.Long.parseUnsignedLong("13185060272037541714"),
      java.lang.Long.parseUnsignedLong("1607147011416532415")))
  }

  test("test_bad_limits (test_query.py:1557): a disjunction of multi-key " +
      "range shapes evaluates correctly") {
    // 20 tablet pivots in the reference; the predicate mixes point,
    // half-open and full-prefix ranges over a 3-column key — the shape
    // that used to break key-range inference ("bad limits")
    val df = (0 until 100).map(i => (i.toLong, i.toLong, i.toLong, i.toString))
      .toDF("a", "b", "c", "x").repartition(4)
    val got = q2("x from [//tmp/ab] where (a = 18 and b = 10 and c >= 70) " +
      "or (a = 18 and b >= 10) or (a >= 18)", df)
      .as[String].collect().map(_.toInt).sorted
    assert(got.toSeq == (18 until 100))
  }

  test("OrderByPrimaryKeyPrefix (ql_query_ut.cpp:857): ORDER BY on the " +
      "declared key prefix elides the sort") {
    import graft.types.YtTypes._
    import scala.jdk.CollectionConverters._
    val rows = (0 until 50).map(i => Row(i / 10L, i.toLong, i % 10L, i * 7L))
    val schema = YtSchema(Seq(
      YtColumn("hash", YtInt64, sortOrder = Some("ascending")),
      YtColumn("a", YtInt64, sortOrder = Some("ascending")),
      YtColumn("b", YtInt64, sortOrder = Some("ascending")),
      YtColumn("v", YtInt64))).toStructType
    // rows are generated in key order; no sort in the fixture lineage
    // (a sortWithinPartitions here would put a Sort node in every plan
    // and defeat the elision assert)
    val df = spark.createDataFrame(rows.asJava, schema).coalesce(1)
    val cat = Map("//tmp/obk" -> df)
    def planOf(ql: String) = SelectRows(spark, ql, cat)
      .queryExecution.executedPlan.toString
    def sorted(plan: String): Boolean =
      plan.contains("TakeOrderedAndProject") || plan.contains("Sort ")
    // key-prefix orderings elide the sort: the scan already yields key
    // order and the page is a plain limit/offset
    assert(!sorted(planOf("* from [//tmp/obk] order by hash, a limit 10")))
    assert(!sorted(planOf("* from [//tmp/obk] order by hash, a, b limit 10")))
    assert(!sorted(planOf("* from [//tmp/obk] order by hash, a offset 5 limit 5")))
    // a non-prefix ordering keeps the sort
    assert(sorted(planOf("* from [//tmp/obk] order by a, b limit 10")))
    // a DESC key breaks the prefix match and keeps the sort
    assert(sorted(planOf("* from [//tmp/obk] order by hash desc limit 10")))
    // elided results still come back in key order
    val got = SelectRows(spark,
      "a, v from [//tmp/obk] order by hash, a offset 5 limit 5", cat)
      .as[(Long, Long)].collect()
    assert(got.toSeq == (5 until 10).map(i => (i.toLong, i * 7L)))
  }

  test("test_keys_coordination (test_query.py:463): join keyed on the " +
      "foreign table's key prefix, plain and computed forms") {
    // //tmp/t sharded at [3],[6]; //tmp/j at [3,6],[6,6] — coordination
    // of key ranges across pivots is the reference's concern; ours is
    // that both join spellings produce the identical full result
    val tt = (0 until 10).map(i => (i.toLong, Option.empty[Long]))
      .toDF("a", "dummy").repartition(3)
    val tj = (0 until 100).map(i => (i / 10L, i % 10L, i.toLong))
      .toDF("b", "c", "v").repartition(3)
    val cat = Map("//tmp/t" -> tt, "//tmp/j" -> tj)
    val expected = (0 until 100).map(i => (i / 10L, i / 10L, i % 10L, i.toLong))
    val plain = SelectRows(spark,
      "a, b, c, v from [//tmp/t] join [//tmp/j] on a = b", cat)
      .as[(Long, Long, Long, Long)].collect().sorted
    assert(plain.toSeq == expected)
    val computed = SelectRows(spark,
      "a, b, c, v from [//tmp/t] join [//tmp/j] on (a + 0) = b", cat)
      .as[(Long, Long, Long, Long)].collect().sorted
    assert(computed.toSeq == expected)
  }

  test("test_yt_2375 (test_query.py:1433): output_row_limit truncates " +
      "without raising unless fail_on_incomplete_result") {
    val df = (0 until 1000).map(i => (i.toLong, 10L * i)).toDF("key", "value")
    val cat = Map("//tmp/t" -> df)
    // fail_on_incomplete_result=%false: should not raise
    val got = SelectRows(spark, "value from [//tmp/t]", cat,
      SelectRows.Options(outputRowLimit = Some(1)))
    assert(got.count() == 1)
    // the client default raises on a truncated result
    val ex = intercept[Exception] {
      SelectRows(spark, "value from [//tmp/t]", cat,
        SelectRows.Options(outputRowLimit = Some(1),
          failOnIncompleteResult = true)).collect()
    }
    assert(ex.getMessage.contains("incomplete") ||
      Option(ex.getCause).exists(_.getMessage.contains("incomplete")))
    // a result inside the limit passes the guard untouched
    val ok = SelectRows(spark, "value from [//tmp/t] where key < 5", cat,
      SelectRows.Options(outputRowLimit = Some(10),
        failOnIncompleteResult = true))
    assert(ok.count() == 5)
  }

  test("test_udf/test_udaf/test_udf_fc/test_empty_udf (test_query.py:1166-1307): " +
      "session-registered user functions resolve in the QL surface") {
    // the JVM session registry replaces the cypress .bc registry: a
    // registered Scala function is visible to the QL string by name,
    // an unregistered name fails the query (test_empty_udf's broken
    // registration), and an Aggregator-backed UDAF aggregates
    spark.udf.register("abs_udf", (x: Long) => math.abs(x))
    val got = q("abs_udf(-2 * a) as s from [//tmp/t]")
      .as[Long].collect().sorted
    assert(got.toSeq == (1 to 9).map(2L * _))
    // unregistered → analysis failure, not silent null
    intercept[Exception] { q("no_such_udf(-2 * a) as s from [//tmp/t]").collect() }
    // UDAF (test_udaf: avg_udaf over _sample_data a=1..9 → 5.0)
    import org.apache.spark.sql.expressions.Aggregator
    import org.apache.spark.sql.Encoders
    val avg = new Aggregator[java.lang.Long, (Long, Long), Double] {
      def zero = (0L, 0L)
      def reduce(b: (Long, Long), x: java.lang.Long) =
        if (x == null) b else (b._1 + x, b._2 + 1)
      def merge(a: (Long, Long), b: (Long, Long)) = (a._1 + b._1, a._2 + b._2)
      def finish(r: (Long, Long)) = if (r._2 == 0) Double.NaN else r._1.toDouble / r._2
      def bufferEncoder = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
      def outputEncoder = Encoders.scalaDouble
    }
    spark.udf.register("avg_udaf", org.apache.spark.sql.functions.udaf(avg))
    val x = q("avg_udaf(a) as x from [//tmp/t] group by 1")
      .select("x").as[Double].collect()
    assert(x.toSeq == Seq(5.0))
    // test_udf_fc: a function carrying its own context (closure state)
    val scale = 2L
    spark.udf.register("udf_fc", (x: Long) => x * scale / 2)
    val fc = q("udf_fc(2 * a) as s from [//tmp/t]").as[Long].collect().sorted
    assert(fc.toSeq == (1 to 9).map(2L * _))
  }

  test("test_read_without_merge_sorted (test_query.py:1933): unmerged " +
      "reads keep per-store states, aggregate deltas fold within a store") {
    import graft.operators.DynTable
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("key1", LongType), StructField("key2", StringType),
      StructField("store", LongType), StructField("ts", LongType),
      StructField("op", StringType), StructField("agg", BooleanType),
      StructField("value1", LongType), StructField("value2", StringType),
      StructField("aggr", LongType)))
    val up = DynTable.OpUpsert
    // store 0 (flushed): the full row for key 1 and a value1-only
    // write for key 2; store 1 (active): two aggregate writes for key 1
    val log = spark.createDataFrame(Seq(
      Row(1L, "2", 0L, 1L, up, true, 0L, "value", 0L),
      Row(2L, null, 0L, 2L, up, true, 2L, null, null),
      Row(1L, "2", 1L, 3L, up, true, 2L, "new_value", 1L),
      Row(1L, "2", 1L, 4L, up, true, 2L, "new_value", 2L)).asJava, schema)
    // phase 1: only store 0 exists
    val phase1 = DynTable.readUnmerged(
      log.where(org.apache.spark.sql.functions.col("store") === 0),
      Seq("key1", "key2"), Map("aggr" -> "sum"), withTimestamps = true)
    val p1 = phase1.select("key1", "value2").as[(Long, Option[String])]
      .collect().sorted
    assert(p1.toSeq == Seq((1L, Some("value")), (2L, None)))
    // $timestamp:value2 reads a version for the written cell, entity
    // (null) for the never-written one
    val ts1 = phase1.select("key1", "$timestamp:value2")
      .as[(Long, Option[Long])].collect().toMap
    assert(ts1(1L).isDefined && ts1(2L).isEmpty)
    // phase 2: both stores — three unmerged states, the active store's
    // aggregate deltas folded together (1+2=3) but NOT onto the
    // flushed base 0
    val phase2 = DynTable.readUnmerged(log, Seq("key1", "key2"),
      Map("aggr" -> "sum"))
    val p2 = phase2.select("key1", "value2", "aggr")
      .as[(Long, Option[String], Option[Long])].collect()
      .sortBy(r => (r._1, r._3))
    assert(p2.toSeq == Seq(
      (1L, Some("value"), Some(0L)),
      (1L, Some("new_value"), Some(3L)),
      (2L, None, None)))
    // the merged read folds across stores: 0 + 1 + 2 = 3 on one row
    val merged = DynTable.readWithAggregates(log.drop("store"),
      Seq("key1", "key2"), Map("aggr" -> "sum"))
    val m = merged.select("key1", "aggr").as[(Long, Option[Long])]
      .collect().sorted
    assert(m.toSeq == Seq((1L, Some(3L)), (2L, None)))
  }

  // ——— coordinated group-by corpus (ql_query_ut.cpp:3327-4115) ———
  // The reference evaluates these across several sorted tablets
  // (EvaluateCoordinatedGroupBy); the observable contract is that a
  // group key leading with the declared key prefix yields KEY-ORDERED
  // results with no ORDER BY, and OFFSET/LIMIT page in that order.
  // Here "tablets" are partitions of a key-tagged DataFrame.

  /** Key-sorted fixture: the first `nKeys` columns carry ascending
    * YtSortOrderKey metadata (all int64), split across partitions. */
  private def keyedInt64(names: Seq[String], nKeys: Int,
      rows: Seq[Seq[Any]], parts: Int = 3) = {
    import graft.types.YtTypes._
    import scala.jdk.CollectionConverters._
    val schema = YtSchema(names.zipWithIndex.map { case (n, i) =>
      YtColumn(n, YtInt64,
        sortOrder = if (i < nKeys) Some("ascending") else None)
    }).toStructType
    spark.createDataFrame(rows.map(Row.fromSeq).asJava, schema)
      .repartition(parts)
  }

  test("GroupByOrderByCoordinated1 (ql_query_ut.cpp:3327): key-prefix " +
      "group keys page in key order with and without ORDER BY") {
    val rows = (1 to 9).map(i =>
      Seq(i.toLong, ((i - 1) % 3).toLong, (i + 10).toLong, (3 - (i - 1) % 3).toLong))
    val cat = Map("//t" -> keyedInt64(Seq("a", "b", "c", "d"), 2, rows))
    def rq(ql: String) = SelectRows(spark, ql, cat)
    // Simple: expression group key + explicit order
    assert(rq("m from [//t] group by a % 3 as m order by m limit 3")
      .as[Long].collect().toSeq == Seq(0L, 1L, 2L))
    // No primary key inside group key
    assert(rq("d from [//t] group by d order by d limit 3")
      .as[Long].collect().toSeq == Seq(1L, 2L, 3L))
    // Full primary key inside group key
    assert(rq("a, b from [//t] group by a, b order by a, b limit 5")
      .as[(Long, Long)].collect().toSeq ==
      Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 0L), (5L, 1L)))
    // Full primary key inside group key, offset
    assert(rq("a, b from [//t] group by a, b order by a, b offset 2 limit 5")
      .as[(Long, Long)].collect().toSeq ==
      Seq((3L, 2L), (4L, 0L), (5L, 1L), (6L, 2L), (7L, 0L)))
    // Primary key prefix inside group key
    assert(rq("a from [//t] group by a order by a limit 5")
      .as[Long].collect().toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    // Primary key prefix, offset
    assert(rq("a from [//t] group by a order by a offset 2 limit 5")
      .as[Long].collect().toSeq == Seq(3L, 4L, 5L, 6L, 7L))
    // Primary key prefix, NO SORTING, limit — key order is implicit
    assert(rq("a from [//t] group by a limit 5")
      .as[Long].collect().toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    // Primary key prefix, NO SORTING, offset + limit
    assert(rq("a from [//t] group by a offset 2 limit 5")
      .as[Long].collect().toSeq == Seq(3L, 4L, 5L, 6L, 7L))
    // Primary key suffix: not a leading prefix, needs the explicit sort
    assert(rq("b from [//t] group by b order by b limit 5")
      .as[Long].collect().toSeq == Seq(0L, 1L, 2L))
    assert(rq("b from [//t] group by b order by b offset 2 limit 5")
      .as[Long].collect().toSeq == Seq(2L))
  }

  test("GroupByOrderByCoordinated2 (ql_query_ut.cpp:3405): offset/limit " +
      "sweep over a single-key group-by, including past-the-end pages") {
    val dataLength = 100
    val rows = (0 until dataLength).map(i => Seq(i.toLong))
    val cat = Map("//t" -> keyedInt64(Seq("a"), 1, rows, parts = 5))
    for ((offset, limit) <- Seq((0, 7), (5, 10), (95, 20), (150, 10), (0, 200))) {
      val got = SelectRows(spark,
        s"a from [//t] group by a order by a offset $offset limit $limit", cat)
        .as[Long].collect().toSeq
      val expected = (offset until math.min(offset + limit, dataLength))
        .map(_.toLong)
      assert(got == expected, s"offset=$offset limit=$limit")
    }
  }

  test("GroupByOrderByCoordinated3 (ql_query_ut.cpp:3440): key-range " +
      "predicates compose with grouped paging (=, OR, IN forms)") {
    val rows = (1 to 9).map(i => Seq(i.toLong, ((i - 1) % 3).toLong))
    val cat = Map("//t" -> keyedInt64(Seq("a", "b"), 2, rows))
    def rq(ql: String) = SelectRows(spark, ql, cat).as[(Long, Long)].collect().toSeq
    val b0 = Seq((12L, 0L))
    assert(rq("sum(a) as s, b FROM [//t] where b = 0 group by b order by b limit 3") == b0)
    assert(rq("sum(a) as s, b FROM [//t] where b in (0) group by b order by b limit 3") == b0)
    val b01 = Seq((12L, 0L), (15L, 1L))
    assert(rq("sum(a) as s, b FROM [//t] where b = 0 or b = 1 group by b order by b limit 3") == b01)
    assert(rq("sum(a) as s, b FROM [//t] where b in (0, 1) group by b order by b limit 3") == b01)
    val b012 = Seq((12L, 0L), (15L, 1L), (18L, 2L))
    assert(rq("sum(a) as s, b FROM [//t] where b = 0 or b = 1 or b = 2 group by b order by b limit 3") == b012)
    assert(rq("sum(a) as s, b FROM [//t] where b in (0, 1, 2) group by b order by b limit 3") == b012)
  }

  test("GroupByOrderByCoordinated4 (ql_query_ut.cpp:3478): reordered key " +
      "columns in group+order (the Group By + Order By regression)") {
    val rows = Seq(Seq(1L, 2L, 5L), Seq(1L, 3L, 6L), Seq(1L, 3L, 8L), Seq(1L, 4L, 7L))
    val cat = Map("//t" -> keyedInt64(Seq("k1", "k2", "k3"), 3, rows, parts = 4))
    val got = SelectRows(spark,
      "k1, k3, k2 from [//t] where k1 in (1) group by k1, k3, k2 " +
        "order by k1, k3, k2 limit 10000", cat)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 5L, 2L), (1L, 6L, 3L), (1L, 7L, 4L), (1L, 8L, 3L)))
  }

  test("GroupByOrderByCoordinatedWithPrimaryKeyPrefix (ql_query_ut.cpp:3497)") {
    val ks = Seq(1L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L,
      6L -> 7L, 6L -> 8L, 7L -> 9L, 8L -> 10L, 9L -> 11L)
    val rows = ks.map { case (k1, k2) => Seq(k1, k2, 0L) }
    val cat = Map("//t" -> keyedInt64(Seq("k1", "k2", "v"), 2, rows, parts = 2))
    val got = SelectRows(spark,
      "k1 from [//t] group by k1 order by k1 limit 1000", cat)
      .as[Long].collect().toSeq
    assert(got == (1L to 9L))
  }

  test("GroupByOrderByCoordinatedWithAggregates (ql_query_ut.cpp:3520): " +
      "string keys, mixed prefixes, constant group keys under every limit") {
    import graft.types.YtTypes._
    import scala.jdk.CollectionConverters._
    val schema = YtSchema(Seq(
      YtColumn("k1", YtUtf8, sortOrder = Some("ascending")),
      YtColumn("k2", YtInt64, sortOrder = Some("ascending")),
      YtColumn("v1", YtInt64), YtColumn("v2", YtInt64))).toStructType
    val rows = Seq(
      Row("a", 0L, 1L, 1L), Row("a", 1L, 2L, 2L), Row("a", 2L, 4L, 4L),
      Row("a", 3L, 2L, 6L), Row("a", 4L, 1L, 9L),
      Row("b", 5L, 3L, 3L), Row("b", 6L, 1L, 5L),
      Row("b", 7L, 3L, 7L), Row("b", 8L, 4L, 8L))
    val cat = Map("//t" ->
      spark.createDataFrame(rows.asJava, schema).repartition(4))
    // group by (k1, v1): key-prefix leads → implicit (k1, v1) order
    val g1 = SelectRows(spark,
      "k1, v1, sum(v2) as s from [//t] group by k1, v1 order by k1, v1 limit 1000",
      cat).as[(String, Long, Long)].collect().toSeq
    assert(g1 == Seq(("a", 1L, 10L), ("a", 2L, 8L), ("a", 4L, 4L),
      ("b", 1L, 5L), ("b", 3L, 10L), ("b", 4L, 8L)))
    // project k1 only while grouping by the full key; order pages rows
    val g2 = SelectRows(spark,
      "k1, sum(1) as s from [//t] group by k1, k2 order by k1, k2 limit 6",
      cat).as[(String, Long)].collect().toSeq
    assert(g2 == Seq(("a", 1L), ("a", 1L), ("a", 1L), ("a", 1L), ("a", 1L),
      ("b", 1L)))
    // key-prefix group with small limit
    val g3 = SelectRows(spark,
      "k1, sum(1) as s from [//t] group by k1 order by k1 limit 3", cat)
      .as[(String, Long)].collect().toSeq
    assert(g3 == Seq(("a", 5L), ("b", 4L)))
    // constant group key: limit 0 = empty, any limit >= 1 = one row
    assert(SelectRows(spark,
      "sum(1) as s from [//t] group by 1000+1 limit 0", cat).count() == 0)
    for (i <- Seq(1, 2, 14)) {
      val got = SelectRows(spark,
        s"sum(1) as s from [//t] group by 1000+1 limit $i", cat)
        .as[Long].collect().toSeq
      assert(got == Seq(9L), s"limit $i")
    }
  }

  test("GroupByCoordinatedWithAggregates1-3 (ql_query_ut.cpp:3623,3697): " +
      "aggregates page in implicit key order under offset/limit") {
    // Aggregates1: two tablets, group by k1, offset 1 limit 5
    val rows1 = Seq(Seq(0L, 0L, 0L), Seq(1L, 0L, 1L), Seq(2L, 0L, 2L),
      Seq(3L, 0L, 3L), Seq(3L, 1L, 4L), Seq(4L, 0L, 5L))
    val cat1 = Map("//t" -> keyedInt64(Seq("k1", "k2", "v"), 2, rows1, parts = 2))
    val got1 = SelectRows(spark,
      "k1, sum(v) as sv from [//t] group by k1 offset 1 limit 5", cat1)
      .as[(Long, Long)].collect().toSeq
    assert(got1 == Seq((1L, 1L), (2L, 2L), (3L, 7L), (4L, 5L)))

    // Aggregates2: key + non-key group columns, limit 1 picks the
    // first (k0, v2) group in key-then-first-group order
    val rows2 = Seq(Seq(1L, 1L, 1L, 42L), Seq(1L, 2L, 2L, 1L),
      Seq(1L, 3L, 2L, 1L), Seq(1L, 4L, 1L, 0L))
    val cat2 = Map("//t" -> keyedInt64(Seq("k0", "k1", "v2", "v3"), 2, rows2, parts = 2))
    val got2 = SelectRows(spark,
      "k0, v2, min(v3) as mv from [//t] group by k0, v2 limit 1", cat2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got2 == Seq((1L, 1L, 0L)))

    // Aggregates3: 100 rows over keys k1 = i/10, three tablets
    val rows3 = (0 until 100).map(i => Seq((i / 10).toLong, (i % 10).toLong, i.toLong))
    val cat3 = Map("//t" -> keyedInt64(Seq("k1", "k2", "v1"), 2, rows3, parts = 3))
    def rq3(ql: String) = SelectRows(spark, ql, cat3).as[(Long, Long)].collect().toSeq
    assert(rq3("k1, sum(v1) as s from [//t] group by k1 limit 1") == Seq((0L, 45L)))
    assert(rq3("k1, sum(v1) as s from [//t] group by k1 limit 2") ==
      Seq((0L, 45L), (1L, 145L)))
    assert(rq3("k1, sum(v1) as s from [//t] group by k1 offset 1 limit 1") ==
      Seq((1L, 145L)))
  }

  test("GroupByCoordinatedWithAggregates4 (ql_query_ut.cpp:3746): null " +
      "group key sorts first (null = smallest), stable across runs") {
    val rows = Seq(
      Seq(null, 1L, 9L), Seq(null, 2L, 8L), Seq(null, 3L, 7L), Seq(null, 4L, 6L),
      Seq(null, 5L, 5L), Seq(null, 6L, 4L), Seq(null, 7L, 3L),
      Seq(null, 8L, 2L), Seq(null, 9L, 1L), Seq(0L, 0L, 0L), Seq(0L, 1L, 5L))
    val cat = Map("//t" -> keyedInt64(Seq("k0", "k1", "k2"), 3, rows, parts = 3))
    for (_ <- 0 until 3) {
      val got = SelectRows(spark,
        "k0, min(k2) as mk from [//t] group by k0", cat)
        .as[(Option[Long], Long)].collect().toSeq
      assert(got == Seq((None, 1L), (Some(0L), 0L)))
    }
  }

  test("GroupByCoordinatedWithTotals (ql_query_ut.cpp:3794,3932): totals " +
      "span ALL groups for a non-key group key, under any limit") {
    // deterministic stand-in for the reference's randomized fixture
    val rows = (0 until 100).map(pk =>
      Seq(pk.toLong, (pk * 7 % 20).toLong, (pk * 13 % 100).toLong))
    val sums: Map[Long, Long] = rows.groupBy(_(1).asInstanceOf[Long])
      .map { case (gk, rs) => gk -> rs.map(_(2).asInstanceOf[Long]).sum }
    val total = rows.map(_(2).asInstanceOf[Long]).sum
    val cat = Map("//t" -> keyedInt64(Seq("pk", "gk", "v"), 1, rows, parts = 4))
    // no limit: every group + the totals row
    val noLimit = SelectRows(spark,
      "gk, sum(v) as v from [//t] group by gk with totals", cat)
      .as[(Option[Long], Long)].collect()
    assert(noLimit.length == sums.size + 1)
    noLimit.foreach {
      case (Some(gk), v) => assert(v == sums(gk))
      case (None, v) => assert(v == total)
    }
    // with limit: limited group rows, but totals still span all groups
    // (the non-key group key forces a full scan regardless)
    for (limit <- Seq(1, 5, 19, 50)) {
      val got = SelectRows(spark,
        s"gk, sum(v) as v from [//t] group by gk with totals limit $limit", cat)
        .as[(Option[Long], Long)].collect()
      assert(got.length == math.min(sums.size, limit) + 1, s"limit=$limit")
      got.foreach {
        case (Some(gk), v) => assert(v == sums(gk))
        case (None, v) => assert(v == total, s"limit=$limit totals row")
      }
    }
  }

  test("GroupByCoordinatedWithTotalsWithLimitPrimaryKeyPrefixInGroupKey " +
      "(ql_query_ut.cpp:3988): key-prefix totals cover only the paged " +
      "groups — the coordinator short-circuits the scan") {
    val rows = (0 until 100).map(i =>
      Seq((i / 10).toLong, (i % 10).toLong, (i * 13 % 100).toLong))
    val cat = Map("//t" -> keyedInt64(Seq("k0", "k1", "v"), 2, rows, parts = 4))
    val sums: Map[Long, Long] = rows.groupBy(_(0).asInstanceOf[Long])
      .map { case (k0, rs) => k0 -> rs.map(_(2).asInstanceOf[Long]).sum }
    for (limit <- 1 to 10) {
      val got = SelectRows(spark,
        s"k0, sum(v) as v from [//t] group by k0 with totals limit $limit", cat)
        .as[(Option[Long], Long)].collect()
      assert(got.length == math.min(10, limit) + 1, s"limit=$limit")
      val expectedTotal = (0L until limit.toLong).filter(_ < 10)
        .map(sums).sum
      got.foreach {
        case (Some(k0), v) => assert(k0 < limit && v == sums(k0), s"limit=$limit")
        case (None, v) => assert(v == expectedTotal, s"limit=$limit totals row")
      }
    }
  }

  test("GroupByCoordinatedWithTotalsNoLimitPrimaryKeyPrefixInGroupKey " +
      "(ql_query_ut.cpp:3932): unlimited key-prefix totals span every group") {
    val rows = (0 until 100).map(i =>
      Seq((i / 10).toLong, (i % 10).toLong, (i * 31 % 100).toLong))
    val cat = Map("//t" -> keyedInt64(Seq("k0", "k1", "v"), 2, rows, parts = 4))
    val sums: Map[Long, Long] = rows.groupBy(_(0).asInstanceOf[Long])
      .map { case (k0, rs) => k0 -> rs.map(_(2).asInstanceOf[Long]).sum }
    val total = rows.map(_(2).asInstanceOf[Long]).sum
    val got = SelectRows(spark,
      "k0, sum(v) as v from [//t] group by k0 with totals", cat)
      .as[(Option[Long], Long)].collect()
    assert(got.length == sums.size + 1)
    got.foreach {
      case (Some(k0), v) => assert(v == sums(k0))
      case (None, v) => assert(v == total)
    }
  }

  test("BigTransform (ql_query_ut.cpp:2608): a 100-pair transform list " +
      "maps every branch, unmatched values null out") {
    val t = Seq(4L, -10L, 7L, 60L).map(Tuple1(_)).toDF("a")
    val from = (-50 until 50).mkString(", ")
    val to = (-50 until 50).map(-_).mkString(", ")
    val got = SelectRows(spark,
      s"transform(a, ($from), ($to)) as x FROM [//t]", Map("//t" -> t))
      .as[Option[Long]].collect()
    assert(got.toSet == Set(Some(-4L), Some(10L), Some(-7L), None))
  }

  test("GroupByNoLimitCoordinated + GroupByWithNoKeyColumnsInTableSchema " +
      "(ql_query_ut.cpp:4048,4098): mixed key/value group keys") {
    val rows = (0 until 100).map(i =>
      Seq((i / 10).toLong, (i % 10).toLong, i.toLong))
    val cat = Map("//t" -> keyedInt64(Seq("a", "b", "v"), 2, rows, parts = 3))
    val expected = (0 until 100).groupBy(i => (i / 10, i % 2))
      .map { case ((k, x), is) => (k.toLong, x.toLong, is.map(_ % 10).sum.toLong) }
      .toSeq.sorted
    val got = SelectRows(spark,
      "k, x, sum(b) as s from [//t] group by a as k, v % 2 as x", cat)
      .as[(Long, Long, Long)].collect().toSeq
    // key-prefix leading group item → implicit (k, x) order
    assert(got == expected)

    // no key columns in the schema: order is unspecified, values exact
    val flat = Seq(0L -> 0L, 1L -> 1L, 2L -> 1L, 2L -> 1L, 3L -> 1L, 3L -> 1L,
      3L -> 1L, 4L -> 1L, 4L -> 1L, 4L -> 1L, 4L -> 1L)
      .map { case (a, b) => Seq(a, b) }
    val cat2 = Map("//t" -> keyedInt64(Seq("a", "b"), 0, flat, parts = 4))
    val got2 = SelectRows(spark,
      "a, sum(b) as b from [//t] group by a", cat2)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got2 == Seq((0L, 0L), (1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)))
  }

  // ——— simple evaluate corpus (ql_query_ut.cpp) ———

  test("AverageAgg/2/3 (ql_query_ut.cpp:8439-8527): avg over groups, " +
      "mixed aggregates, null cells and all-null groups") {
    val t1 = Seq(3L, 53L, 8L, 24L, 33L).map(Tuple1(_)).toDF("a")
    val r1 = SelectRows(spark, "avg(a) as x from [//t] group by 1",
      Map("//t" -> t1)).as[Double].collect()
    assert(r1.toSeq == Seq(24.2))

    val t2 = Seq((3L, 3L, 1L), (53L, 2L, 3L), (8L, 5L, 32L), (24L, 7L, 4L),
      (33L, 4L, 9L), (33L, 3L, 43L), (23L, 0L, 0L), (33L, 8L, 2L))
      .toDF("a", "b", "c")
    val r2 = SelectRows(spark,
      "avg(a) as r1, x, max(c) as r2, avg(c) as r3, min(a) as r4 " +
        "from [//t] group by b % 2 as x", Map("//t" -> t2))
      .as[(Double, Long, Long, Double, Long)].collect().sortBy(_._2).reverse
    assert(r2.toSeq == Seq((17.0, 1L, 43L, 20.0, 3L), (35.5, 0L, 9L, 3.5, 23L)))

    val t3 = Seq((Some(3.0), 1L), (None, 1L), (None, 0L), (Some(7.0), 1L))
      .toDF("a", "b")
    val r3 = SelectRows(spark, "b, avg(a) as x from [//t] group by b",
      Map("//t" -> t3)).as[(Long, Option[Double])].collect().sortBy(_._1)
    assert(r3.toSeq == Seq((0L, None), (1L, Some(5.0))))
  }

  test("StringAgg (ql_query_ut.cpp:8530): min/max over strings") {
    val t = Seq("one", "two", "three", "four", "fo").map(Tuple1(_)).toDF("a")
    val got = SelectRows(spark,
      "min(a) as b, max(a) as c from [//t] group by 1", Map("//t" -> t))
      .as[(String, String)].collect()
    assert(got.toSeq == Seq(("fo", "two")))
  }

  test("HavingClause1-3 (ql_query_ut.cpp:4741-4821): having over keys, " +
      "aggregates, and aggregates not in the projection") {
    val t = Seq((1L, 10L), (1L, 10L), (2L, 20L), (2L, 20L)).toDF("a", "b")
    val cat = Map("//t" -> t)
    assert(SelectRows(spark,
      "a as x, sum(b) as t FROM [//t] group by a having a = 1", cat)
      .as[(Long, Long)].collect().toSeq == Seq((1L, 20L)))
    assert(SelectRows(spark,
      "a as x, sum(b) as t FROM [//t] group by a having sum(b) = 20", cat)
      .as[(Long, Long)].collect().toSeq == Seq((1L, 20L)))
    assert(SelectRows(spark,
      "a as x FROM [//t] group by a having sum(b) = 20", cat)
      .as[Long].collect().toSeq == Seq(1L))
  }

  test("Complex/Complex2 (ql_query_ut.cpp:4423,4457): group-key reuse " +
      "inside projected arithmetic, constant group keys") {
    val t = (1 to 9).map(i => (i.toLong, 10L * i)).toDF("a", "b")
    val cat = Map("//t" -> t)
    val got = SelectRows(spark,
      "x, sum(b) + x as t FROM [//t] where a > 1 group by a % 2 as x", cat)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((0L, 200L), (1L, 241L)))
    val got2 = SelectRows(spark,
      "x, q, sum(b) + x as t FROM [//t] where a > 1 group by a % 2 as x, 0 as q",
      cat).as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got2.toSeq == Seq((0L, 0L, 200L), (1L, 0L, 241L)))
  }

  test("SimpleIn/BigIn (ql_query_ut.cpp:2498,2523): IN with double " +
      "literals against int64, NOT IN, 50-element lists") {
    val t = Seq((4L, 5L), (-10L, 11L), (15L, 11L)).toDF("a", "b")
    val cat = Map("//t" -> t)
    assert(SelectRows(spark, "a, b FROM [//t] where a in (4.0, -10)", cat)
      .as[(Long, Long)].collect().sorted.toSeq == Seq((-10L, 11L), (4L, 5L)))
    assert(SelectRows(spark, "a, b FROM [//t] where a not in (4.0, -10)", cat)
      .as[(Long, Long)].collect().toSeq == Seq((15L, 11L)))

    val big = Seq(4L, 10L, 15L, 17L, 18L, 22L, 31L).map(Tuple1(_)).toDF("a")
    val inList = (0 until 50).map(_ * 2).mkString(", ")
    assert(SelectRows(spark, s"a FROM [//t] where a in ($inList)",
      Map("//t" -> big)).as[Long].collect().sorted.toSeq ==
      Seq(4L, 10L, 18L, 22L))
  }

  test("SimpleTransform (ql_query_ut.cpp:2583): scalar transform with " +
      "double from-list matching int64 values") {
    val t = Seq(4L, -10L, 15L).map(Tuple1(_)).toDF("a")
    val got = SelectRows(spark,
      "transform(a, (4.0, -10), (13, 17)) as x FROM [//t]", Map("//t" -> t))
      .as[Option[Long]].collect()
    assert(got.toSet == Set(Some(13L), Some(17L), None))
  }

  test("SimpleCmpString (ql_query_ut.cpp:2314): lexicographic string " +
      "comparison operators") {
    val t = Seq(("a", "aa"), ("aa", "aa")).toDF("a", "b")
    val got = SelectRows(spark,
      "a < b as r1, a > b as r2, a <= b as r3, a >= b as r4, a = b as r5 " +
        "FROM [//t]", Map("//t" -> t))
      .as[(Boolean, Boolean, Boolean, Boolean, Boolean)].collect()
      .sortBy(_._1).reverse
    assert(got.toSeq == Seq(
      (true, false, true, false, false),
      (false, false, true, true, true)))
  }

  test("SimpleWithNull/2 (ql_query_ut.cpp:2720,2744): null cells pass " +
      "projection, null arithmetic propagates") {
    val t = Seq((4L, Some(5L), None), (10L, Some(11L), Some(9L)),
      (16L, None, None)).toDF("a", "b", "c")
    val got = SelectRows(spark, "a, b, c FROM [//t] where a > 3",
      Map("//t" -> t)).as[(Long, Option[Long], Option[Long])].collect().sortBy(_._1)
    assert(got.toSeq == Seq((4L, Some(5L), None), (10L, Some(11L), Some(9L)),
      (16L, None, None)))

    val t2 = Seq((1L, Some(2L), Some(3L)), (4L, None, None),
      (5L, Some(5L), None), (7L, None, Some(8L)), (10L, Some(1L), None),
      (10L, None, Some(1L))).toDF("a", "b", "c")
    val got2 = SelectRows(spark, "a, b + c as x FROM [//t] where a < 10",
      Map("//t" -> t2)).as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(got2.toSeq == Seq((1L, Some(5L)), (4L, None), (5L, None), (7L, None)))
  }

  test("FilterNulls1 (ql_query_ut.cpp:2213): a null cell fails a " +
      "comparison predicate") {
    val t = Seq((4L, Some(5L)), (6L, None), (10L, Some(11L))).toDF("a", "b")
    val got = SelectRows(spark, "a, b FROM [//t] where b > 0",
      Map("//t" -> t)).as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((4L, 5L), (10L, 11L)))
  }

  test("IsPrefixStrings/IsSubstrStrings (ql_query_ut.cpp:2840,2859)") {
    val t = Seq("foobar", "bar", "baz").map(Tuple1(_)).toDF("s")
    assert(SelectRows(spark, "s FROM [//t] where is_prefix(\"foo\", s)",
      Map("//t" -> t)).as[String].collect().toSeq == Seq("foobar"))
    val t2 = Seq("foobar", "barfoo", "abc", "baz foo bar", "baz fo bar",
      "xyz", "baz").map(Tuple1(_)).toDF("s")
    val got = SelectRows(spark,
      "s FROM [//t] where is_substr(\"foo\", s) or is_substr(s, \"XX baz YY\")",
      Map("//t" -> t2)).as[String].collect().sorted
    assert(got.toSeq == Seq("barfoo", "baz", "baz foo bar", "foobar"))
  }

  test("SelectKeyword (ql_query_ut.cpp:9468): the optional SELECT keyword " +
      "in either case") {
    val t = Seq((4L, "four"), (10L, "ten")).toDF("a", "b")
    val cat = Map("//t" -> t)
    for (ql <- Seq("select a, b from [//t]", "SELECT a, b FROM [//t]",
        "select * from [//t]", "SELECT * FROM [//t]"))
      assert(SelectRows(spark, ql, cat).as[(Long, String)].collect()
        .sorted.toSeq == Seq((4L, "four"), (10L, "ten")), ql)
  }

  test("OrderByWithSmallLimit (ql_query_ut.cpp:6663): limit 0 yields " +
      "zero rows") {
    val t = Seq(3L, 2L, 1L).map(Tuple1(_)).toDF("a")
    assert(SelectRows(spark, "a FROM [//t] order by a limit 0",
      Map("//t" -> t)).count() == 0)
  }

  test("GroupByWithTotals (ql_query_ut.cpp:4202): boolean group keys, " +
      "totals position relative to HAVING selects the totals base") {
    val t = (1 to 9).map(i => (i.toLong, 10L * i)).toDF("a", "b")
    val cat = Map("//t" -> t)
    // no aggregates: totals row is all-null
    val plain = SelectRows(spark,
      "x FROM [//t] where a > 1 group by a % 2 = 1 as x with totals", cat)
      .as[Option[Boolean]].collect()
    assert(plain.length == 3 && plain.count(_.isEmpty) == 1)
    def rows(ql: String) = SelectRows(spark, ql, cat)
      .as[(Option[Boolean], Long)].collect()
      .sortBy(r => (r._1.isEmpty, r._1.getOrElse(false))).toSeq
    assert(rows("x, sum(b) as t FROM [//t] where a > 1 group by a % 2 = 1 as x with totals") ==
      Seq((Some(false), 200L), (Some(true), 240L), (None, 440L)))
    // having BEFORE totals → AfterHaving: totals over passing groups
    assert(rows("x, sum(b) as t FROM [//t] where a > 1 group by a % 2 = 1 as x having t > 200 with totals") ==
      Seq((Some(true), 240L), (None, 240L)))
    // totals BEFORE having → BeforeHaving: totals over all groups
    assert(rows("x, sum(b) as t FROM [//t] where a > 1 group by a % 2 = 1 as x with totals having t > 200") ==
      Seq((Some(true), 240L), (None, 440L)))
    assert(rows("x, sum(b) as t FROM [//t] where a > 1 group by a % 2 = 1 as x with totals having t < 220") ==
      Seq((Some(false), 200L), (None, 440L)))
  }

  test("JoinSimple2-5 (ql_query_ut.cpp:5349-5510): USING joins with " +
      "duplicate keys multiply rows") {
    def join(left: Seq[Long], right: Seq[Long]): Seq[Long] =
      SelectRows(spark, "a as x FROM [//left] join [//right] using a",
        Map("//left" -> left.map(Tuple1(_)).toDF("a"),
            "//right" -> right.map(Tuple1(_)).toDF("a")))
        .as[Long].collect().sorted.toSeq
    assert(join(Seq(1L, 2L), Seq(2L, 1L)) == Seq(1L, 2L))          // JoinSimple2
    assert(join(Seq(1L, 1L), Seq(2L, 1L)) == Seq(1L, 1L))          // JoinSimple3
    assert(join(Seq(1L, 2L), Seq(1L, 1L)) == Seq(1L, 1L))          // JoinSimple4
    assert(join(Seq(1L, 1L, 1L), Seq(1L, 1L, 1L)) == Seq.fill(9)(1L)) // JoinSimple5
  }

  test("SortMergeJoin (ql_query_ut.cpp:6014): equi-join on the leading " +
      "keys of two sorted tables") {
    val left = keyedInt64(Seq("a", "b"), 1,
      Seq(1L, 3L, 5L, 7L, 9L).map(a => Seq(a, a * 10L)), parts = 2)
    val right = keyedInt64(Seq("c", "d"), 1,
      Seq(1L, 2L, 4L, 5L, 7L, 8L).map(c => Seq(c, c * 10L)), parts = 2)
    val got = SelectRows(spark,
      "a, b, d FROM [//left] join [//right] on a = c",
      Map("//left" -> left, "//right" -> right))
      .as[(Long, Long, Long)].collect().sorted
    assert(got.toSeq == Seq((1L, 10L, 10L), (5L, 50L, 50L), (7L, 70L, 70L)))
  }

  test("GroupByTotalsOrderBy (ql_query_ut.cpp:6678): totals row computed " +
      "over ALL groups while ORDER BY an aggregate pages the group rows") {
    // deterministic stand-in for the randomized fixture: 2000 rows,
    // b = a*10, grouped by a % 200, totals over everything
    val data = (0 until 2000).map(i => ((i * 37 + 11) % 997).toLong)
      .map(a => (a, a * 10))
    val t = data.toDF("a", "b")
    val grouped = data.groupBy(_._1 % 200)
      .map { case (x, rs) => (x, rs.map(_._2).sum) }.toSeq
    val expect = grouped.sortBy(r => (r._2, r._1)).take(50)
    val totalSum = data.map(_._2).sum
    val got = SelectRows(spark,
      "x, sum(b) as y FROM [//t] group by a % 200 as x with totals " +
        "order by y limit 50", Map("//t" -> t))
      .as[(Option[Long], Long)].collect()
    val (totals, groups) = got.partition(_._1.isEmpty)
    assert(totals.map(_._2).toSeq == Seq(totalSum), "one totals row, all groups")
    assert(groups.length == 50)
    assert(groups.map(_._2).sorted.toSeq == expect.map(_._2).sorted)
  }

  test("IsNull/DoubleSum/OrderByWithHugeLimit (ql_query_ut.cpp:4824," +
      "4856,6644): null filters, double sums over null cells, int64 limits") {
    val t = Seq((Some(1L), Some(10L)), (Some(2L), Some(20L)),
      (Some(9L), Some(90L)), (Some(10L), None),
      (None, Some(1L)), (None, Some(2L)), (None, Some(3L))).toDF("a", "b")
    assert(SelectRows(spark, "b FROM [//t] where is_null(a)",
      Map("//t" -> t)).as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))

    val d = Seq(Some(1.0), Some(1.0), None).map(Tuple1(_)).toDF("a")
    val got = SelectRows(spark,
      "sum(a) as x, sum(1) as t FROM [//t] group by 1", Map("//t" -> d))
      .as[(Double, Long)].collect()
    assert(got.toSeq == Seq((2.0, 3L)))

    val h = Seq(3L, 2L, 1L).map(Tuple1(_)).toDF("a")
    assert(SelectRows(spark,
      "a FROM [//t] order by a limit 9223372036854775805", Map("//t" -> h))
      .as[Long].collect().toSeq == Seq(1L, 2L, 3L))
  }

  test("CompositeMemberAccessorStruct/2 (ql_query_ut.cpp:7791,7837): " +
      "nested struct paths, missing members null out, group by a path") {
    import graft.types.YtTypes._
    import scala.jdk.CollectionConverters._
    val inner = YtStructT(Seq("b" -> YtStructT(Seq("c" -> YtInt32))))
    val schema = YtSchema(Seq(
      YtColumn("struct", YtStructT(Seq("a" -> inner, "d" -> YtUtf8))))).toStructType
    def s(c: Any, d: String) = Row(Row(Row(Row(c)), d))
    val rows = Seq(s(1, "a"), s(2, "b"), s(3, "c"),
      Row(Row(Row(null), "d"))) // struct={a={};d=d}: missing b
    val df = spark.createDataFrame(rows.asJava, schema)
    val cat = Map("//t" -> df)
    val got = SelectRows(spark,
      "t.struct.a.b.c as c, t.struct.d as d from [//t] as t", cat)
      .as[(Option[Int], String)].collect().sortBy(_._2)
    assert(got.toSeq == Seq((Some(1), "a"), (Some(2), "b"), (Some(3), "c"),
      (None, "d")))
    // group by the nested path, both spellings
    val g1 = SelectRows(spark,
      "c from [//t] as t group by t.struct.a.b.c as c", cat)
      .as[Option[Int]].collect().toSet
    assert(g1 == Set(Some(1), Some(2), Some(3), None))

    // Struct2: progressively absent ancestors all null out
    val schema2 = YtSchema(Seq(
      YtColumn("struct", YtStructT(Seq("a" -> inner))))).toStructType
    val rows2 = Seq(
      Row(Row(Row(Row(1)))),        // full
      Row(Row(Row(Row(null)))),     // b={}
      Row(Row(Row(null))),          // a={}
      Row(Row(null)),               // struct={}
      Row(null))                    // struct=#
    val df2 = spark.createDataFrame(rows2.asJava, schema2)
    val got2 = SelectRows(spark,
      "t.struct.a.b.c as c from [//t2] as t", Map("//t2" -> df2))
      .as[Option[Int]].collect()
    assert(got2.count(_.isDefined) == 1 && got2.length == 5)
  }

  test("OrderByWithNegativeLimit/BadTableName/IncorrectDivision/" +
      "SubqueryAliases (TQueryPrepareTest, ql_query_ut.cpp:1040,157,452,1080)") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    val cat = Map("//t" -> df)
    // limit -1: a parse error, not a plan
    intercept[Exception] {
      SelectRows(spark, "* from [//t] order by a limit -1", cat).collect()
    }
    // unknown table path
    val e2 = intercept[Exception] {
      SelectRows(spark, "a from [//bad/table]", cat).collect()
    }
    assert(e2.getMessage.contains("//bad/table") ||
      e2.getMessage.toLowerCase.contains("table"), e2.getMessage)
    // INT_MIN / -1 raises the reference's error
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    val e3 = intercept[Exception] {
      SelectRows(spark,
        "a from [//t] where a = -9223372036854775807 / -1 - 1 " +
          "or a = (a - a - 9223372036854775807 - 1) / -1", cat).collect()
    }
    assert(messages(e3).exists(_.contains("INT_MIN")), e3.toString)
    // subquery projection aliases chain
    val got = SelectRows(spark,
      "b as c from (select a as b from [//t])", cat)
      .as[Long].collect()
    assert(got.toSeq == Seq(1L))
  }

  // ——— ExplainQuery surface (test_explain.py; explain.cpp) ———

  private def explainTable(cols: Seq[(String, Option[String], Option[String])],
      rows: Seq[Seq[Any]]) = {
    import graft.types.YtTypes._
    import scala.jdk.CollectionConverters._
    val schema = YtSchema(cols.map { case (n, sort, expr) =>
      YtColumn(n, YtInt64, sortOrder = sort, expression = expr)
    }).toStructType
    spark.createDataFrame(rows.map(Row.fromSeq).asJava, schema)
  }

  test("test_explain_query_group_by_primary_key (test_explain.py:33): " +
      "common_prefix_with_primary_key only under a full evaluable key walk") {
    val asc = Some("ascending")
    val t = explainTable(Seq(
      ("hash", asc, Some("int64(farm_hash(a))")),
      ("a", asc, None), ("b", asc, None), ("c", None, None)),
      Seq(Seq(0L, 1L, 2L, 3L)))
    val cat = Map("//tmp/t" -> t)
    def cp(ql: String) =
      graft.ql.Explain(spark, ql, cat).commonPrefixWithPrimaryKey
    assert(cp("a from [//tmp/t] group by hash, a, b") == Some(3))
    // hash evaluates from the grouped a → the walk covers the key;
    // only the two grouped refs count
    assert(cp("a from [//tmp/t] group by a, b") == Some(2))
    // b neither grouped nor computed → walk stops short → absent
    assert(cp("a from [//tmp/t] group by a, c") == None)
  }

  test("test_explain_sort_merge_join (test_explain.py:48): per-join " +
      "foreign/common key prefixes with the sorted-stream running cap") {
    val asc = Some("ascending")
    val first = explainTable(Seq(
      ("hash", asc, Some("int64(farm_hash(cid))")),
      ("cid", asc, None), ("pid", asc, None),
      ("__shard__", None, None), ("PhraseID", None, None)),
      Seq(Seq(0L, 1L, 2L, 3L, 4L)))
    val second = explainTable(Seq(
      ("ExportIDHash", asc, Some("int64(farm_hash(ExportID))")),
      ("ExportID", asc, None), ("GroupExportID", asc, None),
      ("PhraseID", asc, None), ("UpdateTime", asc, None),
      ("value", None, None)),
      Seq(Seq(0L, 1L, 2L, 3L, 4L, 5L)))
    val third = explainTable(Seq(
      ("hash", asc, Some("int64(farm_hash(pid))")),
      ("pid", asc, None), ("__shard__", asc, None), ("value", None, None)),
      Seq(Seq(0L, 2L, 3L, 6L)))
    val fourth = explainTable(Seq(
      ("hash", asc, Some("int64(farm_hash(cid))")),
      ("cid", asc, None), ("__shard__", asc, None), ("ExportID", None, None)),
      Seq(Seq(0L, 1L, 3L, 1L)))
    val cat = Map("//tmp/first" -> first, "//tmp/second" -> second,
      "//tmp/third" -> third, "//tmp/fourth" -> fourth)
    def prefixes(ql: String): (Seq[Int], Seq[Int]) = {
      val js = graft.ql.Explain(spark, ql, cat).joins
      (js.map(_.foreignKeyPrefix), js.map(_.commonKeyPrefix))
    }

    val q1 = """S.value as sv, P.value as pv from [//tmp/first] D
      left join [//tmp/fourth] C on D.cid = C.cid
      left join [//tmp/second] S on (D.cid, D.pid, uint64(D.PhraseID)) = (S.ExportID, S.GroupExportID, S.PhraseID)
      left join [//tmp/third] P on (D.pid, D.__shard__) = (P.pid, P.__shard__)"""
    assert(prefixes(q1) == (Seq(2, 4, 3), Seq(2, 2, 0)), q1)

    val q2 = """D.cid as c1 from [//tmp/first] D
      left join [//tmp/fourth] C on (D.cid, D.__shard__) = (C.cid, C.__shard__)
      left join [//tmp/second] S on (D.cid, D.pid, uint64(D.PhraseID)) = (S.ExportID, S.GroupExportID, S.PhraseID)
      left join [//tmp/third] P on (D.pid, D.__shard__) = (P.pid, P.__shard__)"""
    assert(prefixes(q2) == (Seq(3, 4, 3), Seq(2, 2, 0)), q2)

    // S first: its own common prefix (3) is no longer capped
    val q3 = """D.cid as c1 from [//tmp/first] D
      left join [//tmp/second] S on (D.cid, D.pid, uint64(D.PhraseID)) = (S.ExportID, S.GroupExportID, S.PhraseID)
      left join [//tmp/fourth] C on (D.cid, D.__shard__) = (C.cid, C.__shard__)
      left join [//tmp/third] P on (D.pid, D.__shard__) = (P.pid, P.__shard__)"""
    assert(prefixes(q3) == (Seq(4, 3, 3), Seq(3, 2, 0)), q3)
  }

  test("test_explain_order_by_primary_key_prefix + where_expression " +
      "(test_explain.py:155,170): ordered scans and the lowered WHERE") {
    val asc = Some("ascending")
    val t = explainTable(Seq(
      ("hash", asc, Some("int64(farm_hash(a))")),
      ("a", asc, None), ("b", asc, None), ("c", None, None)),
      Seq(Seq(0L, 1L, 2L, 3L)))
    val cat = Map("//tmp/t" -> t)
    def ex(ql: String) = graft.ql.Explain(spark, ql, cat)
    assert(ex("* from [//tmp/t] order by hash, a limit 10").isOrderedScan)
    assert(ex("* from [//tmp/t] order by hash, a, b limit 10").isOrderedScan)
    assert(!ex("* from [//tmp/t] order by a, b limit 10").isOrderedScan)

    val w = ex("* from [//tmp/t] where a < b and b > c").whereExpression
    assert(w.isDefined && w.get.contains("a < b") && w.get.contains("b > c"), w)
  }

  test("ListExpr/DecimalExpr (ql_query_ut.cpp:8879,8847): list and " +
      "decimal columns survive a scan projection") {
    import graft.types.YtTypes._
    import scala.jdk.CollectionConverters._
    val listSchema = YtSchema(Seq(YtColumn("a", YtList(YtInt32)))).toStructType
    val lt = spark.createDataFrame(
      Seq(Row(Seq(1, 2, 3))).asJava, listSchema)
    val got = SelectRows(spark, "a FROM [//t]", Map("//t" -> lt))
      .as[Seq[Int]].collect()
    assert(got.toSeq == Seq(Seq(1, 2, 3)))

    val decSchema = YtSchema(Seq(YtColumn("a", YtDecimal(5, 2)))).toStructType
    val dt = spark.createDataFrame(
      Seq(Row(new java.math.BigDecimal("108.10"))).asJava, decSchema)
    val gotD = SelectRows(spark, "a FROM [//t]", Map("//t" -> dt))
      .collect().map(_.get(0).toString)
    assert(gotD.toSeq == Seq("108.10"))
  }

  // ——— round-5 ports: remaining join / coordinated-group-by families ———

  test("Join (ql_query_ut.cpp:6203): USING / ON / aliased-ON forms agree " +
      "on a join grouped by a foreign expression") {
    val left = (1L to 9L).map(i => (i, i * 10L)).toDF("a", "b")
    val right = (1L to 9L).map(i => (i * 10L, i)).toDF("b", "c")
    val cat = Map("//left" -> left, "//right" -> right)
    val expected = Set((25L, 1L), (20L, 0L))
    for (ql <- Seq(
      "sum(a) as x, z FROM [//left] join [//right] using b group by c % 2 as z",
      "sum(l.a) as x, z FROM [//left] as l join [//right] as r on (l.b) = (r.b) group by r.c % 2 as z")) {
      val got = SelectRows(spark, ql, cat).as[(Long, Long)].collect().toSet
      assert(got == expected, ql)
    }
  }

  test("HavingClause3 (ql_query_ut.cpp:4797): HAVING on an aggregate " +
      "not in the projection") {
    val df = Seq((1L, 10L), (1L, 10L), (2L, 20L), (2L, 20L)).toDF("a", "b")
    val got = q2("a as x FROM [//tmp/ab] group by a having sum(b) = 20", df)
      .as[Long].collect()
    assert(got.toSeq == Seq(1L))
  }

  test("GroupByCoordinatedWithTotalsNoLimitNoPrimaryKeyInGroupKey " +
      "(ql_query_ut.cpp:3794): non-key group keys + totals across partitions") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 100L).map(pk =>
      (pk, rnd.nextInt(20).toLong, rnd.nextInt(100).toLong))
    val expected: Map[Option[Long], Long] =
      rows.groupBy(r => Option(r._2)).map { case (k, rs) => k -> rs.map(_._3).sum } +
        (Option.empty[Long] -> rows.map(_._3).sum)
    val df = rows.toDF("pk", "gk", "v").repartition(7)
    val got = q2("gk, sum(v) as v from [//tmp/ab] group by gk with totals", df)
      .collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val key = if (r.isNullAt(0)) Option.empty[Long] else Some(r.getLong(0))
      assert(r.getLong(1) == expected(key), s"group $key")
    }
  }

  test("GroupByCoordinatedWithTotalsWithLimitNoPrimaryKeyInGroupKey " +
      "(ql_query_ut.cpp:3944): the totals row rides above the limit and " +
      "totals ALL groups at every page size") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 100L).map(pk =>
      (pk, rnd.nextInt(20).toLong, rnd.nextInt(100).toLong))
    val expected: Map[Option[Long], Long] =
      rows.groupBy(r => Option(r._2)).map { case (k, rs) => k -> rs.map(_._3).sum } +
        (Option.empty[Long] -> rows.map(_._3).sum)
    val nGroups = expected.size - 1
    val df = rows.toDF("pk", "gk", "v").repartition(5)
    for (limit <- Seq(1, 2, 5, 19, 20, 21, 50)) {
      val got = q2(
        s"gk, sum(v) as v from [//tmp/ab] group by gk with totals limit $limit", df)
        .collect()
      assert(got.length == math.min(nGroups + 1, limit + 1), s"limit $limit")
      got.foreach { r =>
        val key = if (r.isNullAt(0)) Option.empty[Long] else Some(r.getLong(0))
        assert(r.getLong(1) == expected(key), s"limit $limit group $key")
      }
    }
  }

  test("UnversionedValueUdf2 (ql_query_ut.cpp): a registered scalar UDF " +
      "resolves through the string surface; null input yields false, not null") {
    spark.udf.register("string_equals_42_udf",
      (s: String) => s != null && s == "42")
    val df = Seq(Option("Hello"), Some(""), Some("42"), None).toDF("a")
    val got = SelectRows(spark, "string_equals_42_udf(a) as x FROM [//t]",
      Map("//t" -> df)).as[Boolean].collect()
    assert(got.toSeq == Seq(false, false, true, false))
  }

  test("EmptySplit (ql_query_ut.cpp:1170): `where %false` folds to an " +
      "empty relation — the coordinator reads zero splits") {
    val got = q2("a from [//tmp/ab] where %false", ab45)
    assert(got.count() == 0)
    val opt = got.queryExecution.optimizedPlan.toString
    assert(opt.contains("LocalRelation") || opt.contains("Empty"),
      "WHERE false must fold the scan away:\n" + opt.take(400))
  }
}
