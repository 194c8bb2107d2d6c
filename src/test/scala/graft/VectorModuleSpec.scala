package graft

import graft.functions.YqlSql

/** Vector:: module (udfs/common/vector/vector_udf.cpp): positional
  * accumulator semantics — Emplace sets in-range indexes and
  * push_backs out-of-range ones, Swap is a no-op out of range,
  * GetResult yields the list. */
class VectorModuleSpec extends SparkSpec {

  test("Create/Emplace/GetResult: append and in-place set") {
    val r = YqlSql.sql(spark,
      """SELECT
        |  Vector::GetResult(Vector::Emplace(Vector::Emplace(
        |    Vector::Create(4), 0, 10), 1, 20)) AS built,
        |  Vector::Emplace(AsList(10, 20), 0, 99) AS set0,
        |  Vector::Emplace(AsList(10, 20), 5, 30) AS pushed""".stripMargin)
      .head()
    assert(r.getSeq[Int](0) == Seq(10, 20))
    // index 0 < size → in-place set (vector_udf.cpp Emplace)
    assert(r.getSeq[Int](1) == Seq(99, 20))
    // index beyond size → push_back
    assert(r.getSeq[Int](2) == Seq(10, 20, 30))
  }

  test("Swap: in-range swaps, out-of-range is a no-op") {
    val r = YqlSql.sql(spark,
      """SELECT
        |  Vector::Swap(AsList(1, 2, 3), 0, 2) AS sw,
        |  Vector::Swap(AsList(1, 2, 3), 0, 9) AS oob""".stripMargin)
      .head()
    assert(r.getSeq[Int](0) == Seq(3, 2, 1))
    assert(r.getSeq[Int](1) == Seq(1, 2, 3))
  }

  test("accumulator chain over table values") {
    import spark.implicits._
    Seq((0, 5), (1, 6), (2, 7)).toDF("i", "v")
      .createOrReplaceTempView("vv")
    // reverse-placement: emplace each value at (2 - i), folded with
    // aggregate() — the reference's usual Vector:: shape (a fold that
    // threads the resource through Emplace calls). aggregate()'s zero
    // must carry the element type (no ARRAY<VOID> coercion in Spark's
    // fold), so the empty vector casts — the SQL-level stand-in for
    // the reference's type-aware Create.
    val r = YqlSql.sql(spark,
      """SELECT Vector::GetResult(
        |  aggregate(collect_list(named_struct('i', i, 'v', v)),
        |    CAST(Vector::Create(3) AS ARRAY<INT>),
        |    (acc, x) -> Vector::Emplace(acc, CAST(2 - x.i AS INT),
        |      x.v))) AS out
        |FROM vv""".stripMargin).head()
    // faithful to the reference's surprising Emplace: an out-of-range
    // index PUSHES AT THE END, it does not grow to the index — so
    // (i=0→idx2, size 0) pushes 5, (i=1→idx1, size 1) pushes 6,
    // (i=2→idx0, size 2) SETS slot 0 → [7, 6]
    assert(r.getSeq[Int](0) == Seq(7, 6))
  }
}
