package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/** 100 TB plan contracts for the TPC-H pack: the dimension sides
  * broadcast (nation/part at any realistic scale; AQE picks them from
  * size), date/flag filters reach the parquet scan as pushed filters,
  * and the fact scans prune to the referenced columns only. */
class TpchPlanSpec extends SparkSpec {

  // sf0.01: at sf0.001 some band predicates match zero rows and AQE
  // legitimately collapses the join to an EmptyRelation — the contract
  // is about the populated plan
  private def run(name: String) = {
    val df = graft.queries.Yql.defs(name)(spark, "/root/testdata/sf0.01")
    df.collect() // finalize the adaptive plan
    PlanTest.finalNodes(df)
  }

  test("q10: nation broadcasts; date + returnflag filters pushed to scans") {
    val nodes = run("yql_tpch_q10")
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "expected the nation dimension to broadcast")
    val scans = nodes.collect { case s: FileSourceScanExec => s }
    val lineitemScan = scans.find(_.metadata.get("Location")
      .exists(_.contains("lineitem"))).get
    assert(lineitemScan.metadata("PushedFilters").contains("l_returnflag"),
      s"returnflag not pushed: ${lineitemScan.metadata("PushedFilters")}")
    val ordersScan = scans.find(_.metadata.get("Location")
      .exists(_.contains("orders"))).get
    assert(ordersScan.metadata("PushedFilters").contains("o_orderdate"),
      s"orderdate not pushed: ${ordersScan.metadata("PushedFilters")}")
    // column pruning: the lineitem read schema carries only the
    // referenced columns, not all 11
    assert(lineitemScan.requiredSchema.fieldNames.toSet ==
      Set("l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"),
      lineitemScan.requiredSchema.fieldNames.mkString(","))
  }

  test("q19: part broadcasts; disjunctive bands stay distributed") {
    val nodes = run("yql_tpch_q19")
    assert(nodes.exists(_.isInstanceOf[BroadcastExchangeExec]),
      "expected the part side to broadcast")
    val scans = nodes.collect { case s: FileSourceScanExec => s }
    val li = scans.find(_.metadata.get("Location")
      .exists(_.contains("lineitem"))).get
    assert(li.requiredSchema.fieldNames.toSet ==
      Set("l_partkey", "l_quantity", "l_extendedprice", "l_discount"),
      li.requiredSchema.fieldNames.mkString(","))
  }

  test("q6: single-pass scan-aggregate, every predicate pushed") {
    val nodes = run("yql_tpch_q6")
    val scans = nodes.collect { case s: FileSourceScanExec => s }
    assert(scans.size == 1)
    val pushed = scans.head.metadata("PushedFilters")
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(pushed.contains(c), s"$c not pushed: $pushed")
  }
}
