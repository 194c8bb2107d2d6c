package graft

import graft.functions.YqlSql

/** The aggregate spelling zoo (builtins/aggregation.md): SOME, the
  * HLL trio, AGGREGATE_LIST/AGG_LIST[_DISTINCT], TOPFREQ/MODE, the
  * STDDEV/VARIANCE alias family, CORRELATION/COVARIANCE (NULL
  * counts as 0), and the NULL-poisoning BOOL_* trio. */
class AggSpellingsSpec extends SparkSpec {

  import spark.implicits._

  test("SOME / HLL / AGGREGATE_LIST spellings") {
    Seq("a", "a", "b", "c").toDF("v").createOrReplaceTempView("sp1")
    val r = YqlSql.sql(spark,
      """SELECT
        |  SOME(v) AS some_v,
        |  HLL(v) AS hll_v,
        |  HyperLogLog(v, 16) AS hll16,
        |  CountDistinctEstimate(v) AS cde,
        |  sort_array(AGGREGATE_LIST(v)) AS al,
        |  sort_array(AGGREGATE_LIST(DISTINCT v)) AS ald,
        |  sort_array(AGG_LIST_DISTINCT(v)) AS ald2,
        |  size(AGGREGATE_LIST(v, 2)) AS lim
        |FROM sp1""".stripMargin).head()
    assert(Set("a", "b", "c")(r.getString(0)))
    assert(r.getLong(1) == 3L && r.getLong(2) == 3L && r.getLong(3) == 3L)
    assert(r.getSeq[String](4) == Seq("a", "a", "b", "c"))
    assert(r.getSeq[String](5) == Seq("a", "b", "c"))
    assert(r.getSeq[String](6) == Seq("a", "b", "c"))
    assert(r.getInt(7) == 2)
  }

  test("HLL precision must be a literal in [4, 18]") {
    Seq("a").toDF("v").createOrReplaceTempView("sp2")
    val e = intercept[Exception] {
      YqlSql.sql(spark, "SELECT HLL(v, 99) AS x FROM sp2").collect()
    }
    assert(e.getMessage.contains("[4, 18]"))
  }

  test("STDDEV/VARIANCE alias zoo agrees with Spark's canonical names") {
    Seq(1.0, 2.0, 3.0, 4.0).toDF("x").createOrReplaceTempView("sp3")
    val r = YqlSql.sql(spark,
      """SELECT
        |  STDDEV_POPULATION(x) AS a, POPULATION_STDDEV(x) AS b,
        |  STDDEVPOP(x) AS c, STDDEV_SAMPLE(x) AS d, STDDEVSAMP(x) AS e,
        |  VARIANCE_POPULATION(x) AS f, VARPOP(x) AS g,
        |  VARIANCE_SAMPLE(x) AS h, VARSAMP(x) AS i,
        |  stddev_pop(x) AS sp, stddev_samp(x) AS ss,
        |  var_pop(x) AS vp, var_samp(x) AS vs
        |FROM sp3""".stripMargin).head()
    assert(r.getDouble(0) == r.getDouble(9)) // pop stddev aliases
    assert(r.getDouble(1) == r.getDouble(9))
    assert(r.getDouble(2) == r.getDouble(9))
    assert(r.getDouble(3) == r.getDouble(10)) // sample stddev aliases
    assert(r.getDouble(4) == r.getDouble(10))
    assert(r.getDouble(5) == r.getDouble(11)) // pop variance aliases
    assert(r.getDouble(6) == r.getDouble(11))
    assert(r.getDouble(7) == r.getDouble(12)) // sample variance aliases
    assert(r.getDouble(8) == r.getDouble(12))
  }

  test("CORRELATION/COVARIANCE count NULL as 0 (docs: do not skip)") {
    // (1,1) (2,null→0) (3,3): Spark corr would skip the middle pair
    Seq((1.0, Some(1.0)), (2.0, None), (3.0, Some(3.0)))
      .toDF("x", "y").createOrReplaceTempView("sp4")
    val r = YqlSql.sql(spark,
      """SELECT CORRELATION(x, y) AS c, CORR(x, y) AS c2,
        |  COVARIANCE(x, y) AS cs, COVARIANCE_POPULATION(x, y) AS cp
        |FROM sp4""".stripMargin).head()
    // exact replay with y=(1,0,3): means (2, 4/3)
    val exp = {
      val xs = Seq(1.0, 2.0, 3.0); val ys = Seq(1.0, 0.0, 3.0)
      val mx = 2.0; val my = 4.0 / 3.0
      val cov = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
      val sx = math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum)
      val sy = math.sqrt(ys.map(b => (b - my) * (b - my)).sum)
      (cov / (sx * sy), cov / 2.0, cov / 3.0)
    }
    assert(math.abs(r.getDouble(0) - exp._1) < 1e-12)
    assert(math.abs(r.getDouble(1) - exp._1) < 1e-12)
    assert(math.abs(r.getDouble(2) - exp._2) < 1e-12)
    assert(math.abs(r.getDouble(3) - exp._3) < 1e-12)
  }

  test("CORRELATION accepts the AggregationFactory one-Tuple form") {
    Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0))
      .toDF("x", "y").createOrReplaceTempView("sp5")
    val r = YqlSql.sql(spark,
      """SELECT AGGREGATE_BY(AsTuple(x, y),
        |  AggregationFactory("CORRELATION")) AS c FROM sp5""".stripMargin)
      .head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
  }

  test("BOOL_AND/BOOL_OR/BOOL_XOR poison on NULL, unlike Spark's") {
    Seq((1, Some(true)), (2, Some(true)), (3, None: Option[Boolean]))
      .toDF("k", "b").createOrReplaceTempView("sp6")
    val r = YqlSql.sql(spark,
      """SELECT BOOL_AND(b) AS ba, BOOL_OR(b) AS bo, BOOL_XOR(b) AS bx,
        |  BOOL_AND(k > 0) AS ba2, BOOL_OR(k > 2) AS bo2,
        |  BOOL_XOR(k % 2 = 1) AS bx2
        |FROM sp6""".stripMargin).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    assert(r.getBoolean(3) && r.getBoolean(4))
    assert(!r.getBoolean(5)) // two odd keys → even number of trues
  }

  test("TOPFREQ/MODE: exact regime, ties by (freq desc, value asc)") {
    Seq("b", "b", "b", "a", "a", "c", "d", "d")
      .toDF("v").createOrReplaceTempView("sp7")
    val rows = YqlSql.sql(spark,
      """SELECT x.Value AS v, x.Frequency AS f
        |FROM (SELECT TOPFREQ(v, 3, 100) AS tf FROM sp7)
        |LATERAL VIEW explode(tf) ex AS x""".stripMargin).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("b", 3L), ("a", 2L), ("d", 2L)))
    val mode = YqlSql.sql(spark,
      "SELECT element_at(MODE(v), 1).Value AS m FROM sp7").head()
    assert(mode.getString(0) == "b")
  }

  test("TOPFREQ bounded buffer: heavy hitter survives compression") {
    // 500 distinct light values + one value at frequency 400 with a
    // buffer of 16: Misra-Gries keeps the heavy hitter on top
    val data = (1 to 500).map(i => s"light_$i") ++
      Seq.fill(400)("heavy")
    data.toDF("v").repartition(4).createOrReplaceTempView("sp8")
    val r = YqlSql.sql(spark,
      """SELECT element_at(TOPFREQ(v, 1, 16), 1).Value AS top,
        |  element_at(TOPFREQ(v, 1, 16), 1).Frequency AS f
        |FROM sp8""".stripMargin).head()
    assert(r.getString(0) == "heavy")
    // frequency is a lower bound in the compressed regime
    assert(r.getLong(1) <= 400L && r.getLong(1) > 0L)
  }
}
