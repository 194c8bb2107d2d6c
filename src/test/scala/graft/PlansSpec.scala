package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import graft.plans.{ComputedColumns, SecondaryIndex}

/** Custom Catalyst rules: computed-column derived-predicate pruning and
  * secondary-index reads (SURVEY.md §4.1 custom pieces a+b).
  */
class PlansSpec extends SparkSpec {
  import spark.implicits._

  test("derived predicate rule prunes partitions keyed by a computed column") {
    val dir = Files.createTempDirectory("cc").toFile.getAbsolutePath
    val spec = ComputedColumns.Spec("k", "hk", c => pmod(c, lit(8L)))
    val data = (0L until 800L).map(i => (i, s"v$i")).toDF("k", "v")
    ComputedColumns.withComputed(data, spec)
      .write.partitionBy("hk").mode("overwrite").parquet(dir)

    ComputedColumns.register(spec)
    ComputedColumns.install(spark)
    try {
      val q = spark.read.parquet(dir).where(col("k") === 123L)
      assert(q.collect().map(_.getString(1)).toSeq == Seq("v123"))

      // the scan must carry a partition filter on hk = 123 % 8 = 3
      val scans = q.queryExecution.executedPlan.collect {
        case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
          case s: FileSourceScanExec => s }
        case s: FileSourceScanExec => Seq(s)
      }.flatten
      assert(scans.nonEmpty)
      assert(scans.head.partitionFilters.exists(_.references.exists(_.name == "hk")),
        s"no hk partition filter in: ${scans.head.partitionFilters}")

      // and IN-lists map through the function image
      val q2 = spark.read.parquet(dir).where(col("k").isin(5L, 13L))
      assert(q2.count() == 2)
    } finally ComputedColumns.clear()
  }

  test("secondary index: predicate on indexed column answers via index + semi-join") {
    val primary = (0L until 1000L).map(i => (i, s"s${i % 7}", i * 2))
      .toDF("pk", "tag", "payload")
    val index = SecondaryIndex.build(primary, Seq("tag"), Seq("pk"))
    val got = SecondaryIndex.query(primary, index, Seq("pk"), "tag = 's3'")
    val want = primary.where("tag = 's3'")
    assert(got.count() == want.count())
    assert(got.agg(sum("payload")).first().getLong(0) ==
      want.agg(sum("payload")).first().getLong(0))
    // plan uses a broadcast semi-join (keys looked up, primary not shuffled)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"), plan)
  }
}
