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

  private def partitionFilterOn(q: org.apache.spark.sql.DataFrame, part: String): Boolean = {
    val scans = q.queryExecution.executedPlan.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
        case s: FileSourceScanExec => s }
      case s: FileSourceScanExec => Seq(s)
    }.flatten
    scans.nonEmpty &&
      scans.head.partitionFilters.exists(_.references.exists(_.name == part))
  }

  test("range predicates prune partitions on a hash-computed key (range inferrer)") {
    val dir = Files.createTempDirectory("ccr").toFile.getAbsolutePath
    val spec = ComputedColumns.Spec("k", "hk", c => pmod(c, lit(8L)))
    val data = (0L until 800L).map(i => (i, s"v$i")).toDF("k", "v")
    ComputedColumns.withComputed(data, spec)
      .write.partitionBy("hk").mode("overwrite").parquet(dir)
    ComputedColumns.register(spec)
    ComputedColumns.install(spark)
    try {
      val q = spark.read.parquet(dir).where(col("k").between(100L, 120L))
      assert(q.count() == 21)
      assert(partitionFilterOn(q, "hk"), "BETWEEN must derive an hk partition filter")

      val q2 = spark.read.parquet(dir).where(col("k") >= 795L && col("k") < 799L)
      assert(q2.count() == 4)
      assert(partitionFilterOn(q2, "hk"), ">=/< must derive an hk partition filter")

      // beyond the enumeration cap the rule stays silent; still correct
      val q3 = spark.read.parquet(dir).where(col("k") >= 100L)
      assert(q3.count() == 700)
      assert(!partitionFilterOn(q3, "hk"), "unbounded range must not derive")
    } finally ComputedColumns.clear()
  }

  test("monotone computed key derives an interval image beyond the enumeration cap (Divide0-6/Far)") {
    val dir = Files.createTempDirectory("ccd").toFile.getAbsolutePath
    // hash := key / 100 — the reference's divide inferrer shape
    val spec = ComputedColumns.Spec("k", "hk", (c: org.apache.spark.sql.Column) =>
      (c / 100L).cast("long"), monotone = true)
    val data = (0L until 10000L).map(i => (i, s"v$i")).toDF("k", "v")
    ComputedColumns.withComputed(data, spec)
      .write.partitionBy("hk").mode("overwrite").parquet(dir)
    ComputedColumns.register(spec)
    ComputedColumns.install(spark)
    try {
      // 5000-wide source range: enumeration (cap 1024) is impossible,
      // the monotone image [30, 80] must prune partitions instead
      val q = spark.read.parquet(dir).where(col("k") >= 3000L && col("k") <= 8000L)
      assert(q.count() == 5001)
      assert(partitionFilterOn(q, "hk"),
        "wide monotone range must derive an hk interval filter")
      // a HALF-bounded range still cannot derive (no interval image)
      val q2 = spark.read.parquet(dir).where(col("k") >= 3000L)
      assert(q2.count() == 7000)
      assert(!partitionFilterOn(q2, "hk"))
    } finally ComputedColumns.clear()
  }

  test("range predicates prune partitions on a range-computed key (bucketed ranges)") {
    val dir = Files.createTempDirectory("ccb").toFile.getAbsolutePath
    val spec = ComputedColumns.Spec("k", "rk",
      (c: org.apache.spark.sql.Column) => floor(c / lit(100L)).cast("long"))
    val data = (0L until 1000L).map(i => (i, i * 3)).toDF("k", "payload")
    ComputedColumns.withComputed(data, spec)
      .write.partitionBy("rk").mode("overwrite").parquet(dir)
    ComputedColumns.register(spec)
    ComputedColumns.install(spark)
    try {
      val q = spark.read.parquet(dir).where(col("k").between(250L, 450L))
      assert(q.count() == 201)
      assert(partitionFilterOn(q, "rk"), "range image {2,3,4} must reach the scan")
    } finally ComputedColumns.clear()
  }

  test("multi-column computed key: cross product of pinned sources derives (key trie)") {
    val dir = Files.createTempDirectory("ccm").toFile.getAbsolutePath
    val spec = ComputedColumns.Spec(Seq("k1", "k2"), "hk",
      (cs: Seq[org.apache.spark.sql.Column]) =>
        pmod(cs(0) * lit(31L) + cs(1), lit(16L)))
    val data = (0L until 1000L).map(i => (i % 10, i % 7, i)).toDF("k1", "k2", "id")
    ComputedColumns.withComputed(data, spec)
      .write.partitionBy("hk").mode("overwrite").parquet(dir)
    ComputedColumns.register(spec)
    ComputedColumns.install(spark)
    try {
      val q = spark.read.parquet(dir)
        .where(col("k1") === 3L && col("k2").isin(5L, 6L))
      val want = data.where(col("k1") === 3L && col("k2").isin(5L, 6L)).count()
      assert(q.count() == want)
      assert(partitionFilterOn(q, "hk"),
        "k1=3 × k2∈{5,6} must enumerate hk images")

      // a range on one source composes with a point on the other
      val q2 = spark.read.parquet(dir)
        .where(col("k1").between(2L, 4L) && col("k2") === 1L)
      val want2 = data.where(col("k1").between(2L, 4L) && col("k2") === 1L).count()
      assert(q2.count() == want2)
      assert(partitionFilterOn(q2, "hk"), "range × point must enumerate")
    } finally ComputedColumns.clear()
  }

  test("unfolded index: list membership answered by per-element index rows") {
    val primary = Seq(
      (1L, Seq("a", "b")), (2L, Seq("b", "c")), (3L, Seq("d"))
    ).toDF("pk", "tags")
    val idx = SecondaryIndex.buildUnfolded(primary, "tags", Seq("pk"))
    val got = SecondaryIndex.query(primary, idx, Seq("pk"), "tags = 'b'")
      .select("pk").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L))
  }

  test("unique index: duplicate indexed value fails the build (UniqueIndexConflict)") {
    val ok = Seq((1L, "x"), (2L, "y")).toDF("pk", "u")
    val built = SecondaryIndex.buildUnique(ok, Seq("u"), Seq("pk"))
    assert(built.count() == 2)
    val dup = Seq((1L, "x"), (2L, "x")).toDF("pk", "u")
    val e = intercept[Exception] {
      SecondaryIndex.buildUnique(dup, Seq("u"), Seq("pk")).collect()
    }
    assert(e.getMessage.contains("unique index conflict") ||
      Option(e.getCause).exists(_.getMessage.contains("unique index conflict")),
      e.toString)
  }

  test("predicated index: query answers pred AND index predicate") {
    val primary = Seq((1L, 10L, "F"), (2L, 10L, "O"), (3L, 20L, "F"))
      .toDF("pk", "ck", "status")
    val idx = SecondaryIndex.buildPredicated(primary, Seq("ck"), Seq("pk"),
      col("status") === "F")
    val got = SecondaryIndex.query(primary, idx, Seq("pk"), "ck = 10")
      .select("pk").as[Long].collect()
    assert(got.toSeq == Seq(1L), "O-status row must be excluded by the index predicate")
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

  // ---- range-inference shapes reach the parquet scan ----
  // The reference canonicalizes WHERE predicates into key-range unions
  // (key_trie.cpp, ql_range_inference_ut.cpp: NotEqual, Multiple
  // Disjuncts/Conjuncts, RangesProduct, PrefixQuery, Redundant
  // Condition). Spark-side the same contract is "the lowered predicate
  // reaches PushedFilters on the scan" — data skipping then prunes
  // row groups exactly where the reference prunes key ranges.

  private def pushedFilters(df: org.apache.spark.sql.DataFrame): String = {
    df.count()
    val plans = df.queryExecution.executedPlan.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
    }.flatten
    plans.map(_.metadata.getOrElse("PushedFilters", "[]")).mkString(";")
  }

  test("range inference shapes push to the scan: point, not-equal, disjunct union, tuple product") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val cat = Map("//tmp/li" -> li)
    def qf(where: String): String = pushedFilters(graft.ql.SelectRows(
      spark, s"l_orderkey from [//tmp/li] where $where", cat))

    // PrefixQuery / Lookup: point predicate (QL `=` null-matches, so
    // it pushes as the equally-prunable EqualNullSafe)
    assert(qf("l_orderkey = 1").contains("EqualNullSafe(l_orderkey,1)"))
    // NotEqual → the complement still reaches the scan
    assert(qf("l_linenumber != 3").contains("Not(EqualNullSafe(l_linenumber,3)"))
    // MultipleDisjuncts → Or of ranges pushed whole
    val disj = qf("l_quantity < 5.0 or l_quantity > 45.0")
    assert(disj.contains("Or(") && disj.contains("l_quantity"), disj)
    // MultipleConjuncts / RedundantCondition → folded conjunction
    val conj = qf("l_orderkey >= 10 and l_orderkey >= 10 and l_orderkey < 500")
    assert(conj.contains("GreaterThanOrEqual(l_orderkey,10)") &&
      conj.contains("LessThan(l_orderkey,500)"), conj)
    // RangesProduct: tuple BETWEEN multi-range list lowers to a
    // pushable Or(And(...)) over both key positions
    val prod = qf("(l_orderkey, l_linenumber) between ((1) and (100, 2), (200, 1) and (300))")
    assert(prod.contains("l_orderkey") && prod.contains("Or("), prod)
  }

  test("PredicatePushDown (ql_distributed_ut.cpp): per-side predicates reach their scans through a join") {
    // the reference splits `a1 = 5 and b1 != 2 and a2 + b1 > 9` into
    // per-side WHERE clauses plus a join residual; Catalyst's
    // PushPredicateThroughJoin lands each conjunct on its own scan
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
    val df = graft.ql.SelectRows(spark,
      "l_partkey + o_custkey as x from [//tmp/li] join [//tmp/ord] " +
        "on (l_orderkey) = (o_orderkey) " +
        "where l_orderkey = 5 and o_custkey != 2 and l_partkey + o_custkey > 9",
      Map("//tmp/li" -> li, "//tmp/ord" -> ord))
    val pf = pushedFilters(df)
    assert(pf.contains("EqualNullSafe(l_orderkey,5)"), pf)
    assert(pf.contains("Not(EqualNullSafe(o_custkey,2))"), pf)
  }
}
