package graft

import graft.functions.YqlSql

/** Histogram:: post-processing module (histogram_udf.cpp:18-28 method
  * maps, 614 Print, 711 ToCdf, 782 Normalize) over the struct-shaped
  * HISTOGRAM aggregate. */
class HistogramModuleSpec extends SparkSpec {

  import spark.implicits._

  private def ev(): Unit =
    Seq(1.0, 1.0, 2.0, 2.0, 2.0, 4.0).toDF("v").createOrReplaceTempView("hv")

  test("struct shape: kind/bins/min/max/weightssum") {
    ev()
    val r = YqlSql.sql(spark,
      "SELECT HISTOGRAM(v) AS h FROM hv").head().getStruct(0)
    assert(r.getAs[String]("kind") == "AdaptiveWard")
    val bins = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("bins")
    assert(bins.map(b => (b.getDouble(0), b.getDouble(1))) ==
      Seq((1.0, 2.0), (2.0, 3.0), (4.0, 1.0)))
    assert(r.getAs[Double]("min") == 1.0 && r.getAs[Double]("max") == 4.0)
    assert(r.getAs[Double]("weightssum") == 6.0)
  }

  test("GetSum family: exact-bound edges and interpolation") {
    ev()
    val r = YqlSql.sql(spark,
      """SELECT
        |  Histogram::GetSumAboveBound(HISTOGRAM(v), 0.5) AS all_above,
        |  Histogram::GetSumBelowBound(HISTOGRAM(v), 4.5) AS all_below,
        |  Histogram::GetSumAboveBound(HISTOGRAM(v), 1.5) AS ab,
        |  Histogram::GetSumInRange(HISTOGRAM(v), 3.0, 2.0) AS empty_rng
        |FROM hv""".stripMargin).head()
    // bound below min → full sum; above max → full sum
    assert(r.getDouble(0) == 6.0 && r.getDouble(1) == 6.0)
    // bound 1.5 between bins (1,2) and (2,3): 3/2 + 5/2 * 0.5/1 + 1
    assert(r.getDouble(2) == 1.5 + 1.25 + 1.0)
    assert(r.getDouble(3) == 0.0) // left > right → 0 by contract
  }

  test("CalcBound zero-sum / oversum edges match the reference") {
    ev()
    val r = YqlSql.sql(spark,
      """SELECT
        |  Histogram::CalcUpperBound(HISTOGRAM(v), 0.0) AS ub0,
        |  Histogram::CalcLowerBound(HISTOGRAM(v), 0.0) AS lb0,
        |  Histogram::CalcUpperBound(HISTOGRAM(v), 99.0) AS ub_all,
        |  Histogram::CalcLowerBound(HISTOGRAM(v), 99.0) AS lb_all
        |FROM hv""".stripMargin).head()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 4.0)
    assert(r.getDouble(2) == 4.0 && r.getDouble(3) == 1.0)
  }

  test("Normalize: default area 100, cdf mode appends Cdf to kind") {
    ev()
    val r = YqlSql.sql(spark,
      """SELECT
        |  Histogram::Normalize(HISTOGRAM(v)).weightssum AS ws,
        |  Histogram::Normalize(HISTOGRAM(v), 10.0, true) AS hc
        |FROM hv""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 100.0) < 1e-9)
    val hc = r.getStruct(1)
    assert(hc.getAs[String]("kind") == "AdaptiveWardCdf")
    // cdf normalization scales by the LAST bin's frequency (1.0):
    // 10*2/1, 10*3/1, 10*1/1
    val f = hc.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("bins")
      .map(_.getDouble(1))
    assert(f == Seq(20.0, 30.0, 10.0))
  }

  test("ToCumulativeDistributionFunction: running sums; Print renders") {
    ev()
    val r = YqlSql.sql(spark,
      """SELECT
        |  Histogram::ToCumulativeDistributionFunction(HISTOGRAM(v)) AS c,
        |  Histogram::Print(HISTOGRAM(v)) AS p,
        |  Histogram::Print(HISTOGRAM(v), 4) AS p4
        |FROM hv""".stripMargin).head()
    val c = r.getStruct(0)
    assert(c.getAs[String]("kind") == "AdaptiveWardCdf")
    assert(c.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("bins")
      .map(_.getDouble(1)) == Seq(2.0, 5.0, 6.0))
    // WeightsSum accumulates the partial sums: 2 + 5 + 6
    assert(c.getAs[Double]("weightssum") == 13.0)
    val p = r.getString(1)
    assert(p.startsWith(
      "Kind: AdaptiveWard Bins: 3 WeightsSum: 6.000 Min: 1.000 Max: 4.000"))
    assert(p.linesIterator.size == 4)
    // 4-bar render: bin (2.0, f=3=max) fully filled
    assert(r.getString(2).contains("████ P: 2.000 F: 3.000"))
    // bin (4.0, f=1): floor(4*1/3)=1 filled bar
    assert(r.getString(2).contains("█░░░ P: 4.000 F: 1.000"))
  }

  test("per-group aggregation with post-processing; adaptive cap") {
    // 150 distinct values → compaction kicks in; totals stay exact
    (1 to 150).map(_.toDouble).toDF("v").createOrReplaceTempView("hw")
    val r = YqlSql.sql(spark,
      """SELECT Histogram::GetSumInRange(HISTOGRAM(v), -10.0, 1000.0) AS t,
        |  Histogram::Print(AdaptiveDistanceHistogram(v), 0) AS pd
        |FROM hw""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 150.0) < 1e-6)
    assert(r.getString(1).contains("Kind: AdaptiveDistance Bins: 100"))
  }
}
