package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec, SortMergeJoinExec}

/** Plan contracts for the script-DML merge passes: the shapes that
  * must hold when the target is 100 TB, checked on the real physical
  * plans (AQE-final). */
class YqlDmlPlanSpec extends SparkSpec {

  import spark.implicits._

  private def allNodes(root: SparkPlan): Seq[SparkPlan] = {
    val visited = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    def go(p: SparkPlan): Seq[SparkPlan] = {
      if (!visited.add(p)) Seq.empty
      else {
        val children: Seq[SparkPlan] = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case _: ReusedExchangeExec => Seq.empty
          case other => other.children
        }
        p +: (children ++ p.subqueries).flatMap(go)
      }
    }
    go(root)
  }

  test("UPSERT merge: one full-outer SMJ, key-only exchanges, no cartesian") {
    val cur = (0L until 10000L).map(k => (k, k * 2, s"v$k"))
      .toDF("k", "n", "v")
    val src = (5000L until 15000L).map(k => (k, k + 1)).toDF("k", "n")
    val (image, written) =
      graft.functions.YqlDml.upsertImage(cur, src, Seq("k"), replace = false)
    // semantics spot-check first (also drives AQE to the final plan):
    // overlap takes src n, keeps v; new keys null v
    val rows = image.collect()
    assert(rows.length == 15000)
    val byK = rows.map(r => r.getLong(0) -> (r.get(1), r.get(2))).toMap
    assert(byK(0L) == ((0L, "v0")))
    assert(byK(7000L) == ((7001L, "v7000")))
    assert(byK(14000L) == ((14001L, null)))
    written.collect()
    // the RETURNING subset filters on source existence, so Catalyst
    // NARROWS its full outer to a right outer — assert the elimination
    for ((df, wantType) <- Seq(image -> "FullOuter", written -> "RightOuter")) {
      val nodes = allNodes(df.queryExecution.executedPlan)
      val banned = nodes.collect {
        case c: CartesianProductExec => c
        case b: BroadcastNestedLoopJoinExec => b
      }
      assert(banned.isEmpty, s"nested-loop/cartesian in plan")
      // exactly one full-outer EQUI join. AQE picks the strategy by
      // size: broadcast-hash when the deduped source fits (the ideal
      // 100 TB plan — the table side never shuffles), else a key-local
      // sort-merge / shuffled-hash pair of key exchanges.
      val joins = nodes.collect {
        case j: SortMergeJoinExec => j.joinType
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
          j.joinType
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
          j.joinType
      }
      assert(joins.length == 1 && joins.head.toString == wantType,
        s"expected one $wantType equi join, got $joins")
      // whatever shuffles exist partition on (a function of) the key —
      // the source dedup and, in the shuffled strategies, the join
      // exchanges. Nothing ever shuffles on a non-key.
      val shuffles = nodes.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.length <= 3,
        s"expected at most 3 key exchanges, got ${shuffles.length}")
      shuffles.foreach { s =>
        assert(s.outputPartitioning.toString.contains("k#"),
          s"exchange not keyed on k: ${s.outputPartitioning}")
      }
    }
  }

  test("PARTITION BY HASH buckets the table; the table side of a merge never shuffles") {
    graft.functions.YqlDml.dropTableDeep(spark, "dmlplan_bk")
    graft.functions.YqlSql.sql(spark,
      """CREATE TABLE dmlplan_bk (k Int64, v Int64, PRIMARY KEY (k))
        |PARTITION BY HASH (k)
        |WITH (UNIFORM_PARTITIONS = 4, AUTO_PARTITIONING_BY_SIZE = 'ENABLED');
        |UPSERT INTO dmlplan_bk
        |  SELECT CAST(id AS BIGINT) AS k, id * 2 AS v FROM range(5000);
        |SELECT 1 AS one""".stripMargin)
    // hash-partition keys are forced NOT NULL, recorded as the
    // keys_nonnull property (parquet reads erase DDL nullability) —
    // what lets the merge join reuse the bucket distribution
    assert(graft.functions.YqlDml.keysNonNull(spark, "dmlplan_bk"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val src = spark.range(2500, 7500)
        .select(org.apache.spark.sql.functions.col("id").as("k"),
          (org.apache.spark.sql.functions.col("id") * 3).as("v"))
      val (image, _) = graft.functions.YqlDml.upsertImage(
        spark.table("dmlplan_bk"), src, Seq("k"), replace = false,
        nonNullKeys = true)
      assert(image.count() == 7500)
      val nodes = allNodes(image.queryExecution.executedPlan)
      // the bucketed table's scan sits under NO exchange: only the
      // source side shuffles (to the bucket count)
      val shuffles = nodes.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.nonEmpty, "expected the source side to shuffle")
      shuffles.foreach { sh =>
        val leaves = allNodes(sh).collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }
        assert(leaves.forall(!_.toString.contains("dmlplan_bk")),
          "the bucketed table side must not shuffle")
      }
      val scan = nodes.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.toString.contains("dmlplan_bk") => f
      }
      assert(scan.nonEmpty && scan.head.bucketedScan,
        "expected a bucketed scan of the keyed table")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    graft.functions.YqlDml.dropTableDeep(spark, "dmlplan_bk")
  }

  test("DELETE WHERE is a single filtered pass; DELETE ON a keyed anti join") {
    val cur = (0L until 1000L).map(k => (k, k * 2)).toDF("k", "n")
    val remaining = cur.filter(!(org.apache.spark.sql.functions.col("k") % 7 === 0))
    remaining.collect()
    assert(allNodes(remaining.queryExecution.executedPlan).collect {
      case s: ShuffleExchangeExec => s }.isEmpty,
      "predicate DELETE must not shuffle")
    val keysDf = Seq(1L, 2L).toDF("k")
    val anti = cur.join(keysDf, Seq("k"), "left_anti")
    anti.collect()
    val banned = allNodes(anti.queryExecution.executedPlan).collect {
      case c: CartesianProductExec => c
      case b: BroadcastNestedLoopJoinExec => b
    }
    assert(banned.isEmpty, "nested-loop/cartesian in DELETE ON plan")
  }
}
