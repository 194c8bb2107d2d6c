package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** YQL-level SQL surface (SURVEY.md §2.D): full join matrix, window
  * functions with frames, GROUP BY extensions, set operations, and the
  * aggregate library. All are native Spark operators — YQL's MiniKQL
  * executor vocabulary (Combine/GraceJoin/Top/...) is Catalyst's job.
  *
  * Reference: join kinds sql/v1/join.cpp:427; window dispatch
  * yql_opt_window.cpp:1761-1773; grouping sets sql_group_by.cpp:88-211;
  * set ops SQLv1.g.in:374; aggregates sql/v1/builtin.cpp:3200-3315.
  */
object Yql {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Ranking window family. Order keys end in the unique o_orderkey so
    // every rank is total (ties would be engine-dependent).
    "yql_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"))
        .filter(col("rn") <= 10)
    }),

    // lag/lead analytic functions.
    "yql_window_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"))
        .filter(col("o_custkey") < 200)
    }),

    // ROWS frame: running sum + moving average (FrameByRows).
    "yql_window_frame_rows" -> ((s, d) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      t(s, d, "lineitem")
        .filter(col("l_suppkey") < 50)
        .select(col("l_suppkey"), col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          round(sum(col("l_quantity"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).as("running_qty"),
          round(avg(col("l_quantity"))
            .over(w.rowsBetween(-2, 0)), 4).as("ma3_qty"))
    }),

    // RANGE frame (FrameByRange): per-priority price range stats.
    // GROUPS frame (FrameByGroups, yql_opt_window.h:12-15) — Spark has
    // no GROUPS mode (SURVEY.md §7.4 #5); emulated exactly as a RANGE
    // frame over dense_rank: peers share a rank, so "1 group
    // preceding/following" = rank within ±1.
    "yql_window_frame_groups" -> ((s, d) => {
      val base = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_orderdate"))
      val o = t(s, d, "orders").withColumn("dr", dense_rank().over(base))
      val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("dr"))
        .rangeBetween(-1, 1)
      o.select(col("o_orderkey"), col("o_orderpriority"),
        round(sum(col("o_totalprice")).over(w), 2).as("grp_sum"))
    }),

    "yql_window_frame_range" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .filter(col("o_custkey") < 100)
        .select(col("o_orderkey"), col("o_orderpriority"),
          count(lit(1)).over(w).as("n_cheaper_or_eq"))
    }),

    // first_value / last_value / nth_value over a full-partition frame.
    "yql_window_first_last" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "orders")
        .filter(col("o_custkey") < 200)
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("first_order"),
          last(col("o_orderkey")).over(w).as("last_order"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_order"))
    }),

    // ROLLUP (sql_group_by.cpp) — hierarchy totals.
    "yql_rollup" -> ((s, d) => {
      val n = t(s, d, "nation")
      val c = t(s, d, "customer")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .rollup(col("n_regionkey").cast("long").as("region"), col("n_name"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("c_acctbal")), 2).as("bal"))
    }),

    // CUBE — all grouping combinations.
    "yql_cube" -> ((s, d) =>
      t(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("l_quantity")), 2).as("qty"))),

    // GROUPING SETS + grouping() discriminator.
    "yql_grouping_sets" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"),
          grouping(col("o_orderstatus")).cast("long").as("g_status"))),

    // Set operations (UnionMerge / Intersect / Except lowering).
    "yql_union_all" -> ((s, d) => {
      val o = t(s, d, "orders")
      o.filter(col("o_totalprice") > 400000).select(col("o_orderkey"))
        .unionAll(o.filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey")))
        .groupBy().agg(count(lit(1)).as("cnt"),
          count_distinct(col("o_orderkey")).as("dcnt"))
    }),
    "yql_intersect" -> ((s, d) => {
      val o = t(s, d, "orders")
      o.filter(col("o_totalprice") > 300000).select(col("o_custkey"))
        .intersect(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
    }),
    "yql_except" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
      c.select(col("c_custkey")).except(o.select(col("o_custkey").as("c_custkey")))
    }),

    // Join matrix beyond inner/left (join.cpp:427).
    "yql_join_right" -> ((s, d) => {
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"), "right")
        .groupBy(col("c_mktsegment"))
        .agg(count(col("o_orderkey")).as("orders"), count(lit(1)).as("rows"))
    }),
    "yql_join_full" -> ((s, d) => {
      val hi = t(s, d, "orders").filter(col("o_totalprice") > 450000)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("hi_orders"))
      val c = t(s, d, "customer").filter(col("c_acctbal") > 9000)
      c.join(hi, c("c_custkey") === hi("o_custkey"), "full")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_custkey").isNotNull.as("has_customer"),
          col("o_custkey").isNotNull.as("has_hi_order"))
    }),
    // LeftSemi = EXISTS.
    "yql_join_semi" -> ((s, d) => {
      val c = t(s, d, "customer")
      val big = t(s, d, "orders").filter(col("o_totalprice") > 400000)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment"))
    }),
    // LeftOnly = NOT EXISTS.
    "yql_join_anti" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_totalprice") > 400000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("cnt"))
    }),
    // Exclusion = symmetric difference: full join minus the inner part.
    "yql_join_exclusion" -> ((s, d) => {
      val a = t(s, d, "orders").filter(col("o_totalprice") > 350000)
        .select(col("o_custkey")).distinct()
      val b = t(s, d, "customer").filter(col("c_acctbal") > 8000)
        .select(col("c_custkey")).distinct()
      a.join(b, a("o_custkey") === b("c_custkey"), "full")
        .filter(col("o_custkey").isNull || col("c_custkey").isNull)
        .select(coalesce(col("o_custkey"), col("c_custkey")).as("custkey"),
          col("o_custkey").isNotNull.as("from_orders"))
    }),
    "yql_join_cross" -> ((s, d) => {
      val r = t(s, d, "region")
      val n = t(s, d, "nation")
      r.crossJoin(n)
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("n_nationkey").cast("long")).as("sum_nk"))
    }),

    // Statistical aggregate library.
    "yql_agg_stats" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(stddev_pop(col("l_quantity")), 4).as("sdp_qty"),
          round(var_samp(col("l_extendedprice")), 2).as("var_price"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("covar_qd"))),

    // Multi-join analytics (TPC-H Q3 shape): 3-way join, filter on both
    // sides, top-10 by revenue — exercises join order + broadcast
    // selection + TakeOrderedAndProject.
    "yql_q3_shipping" -> ((s, d) => {
      val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, d, "orders")
      val l = t(s, d, "lineitem")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // Multi-join analytics (TPC-H Q5 shape): 5-way star join through
    // region→nation→customer→orders→lineitem.
    "yql_q5_region" -> ((s, d) => {
      val r = t(s, d, "region").filter(col("r_name") === "ASIA")
      val n = t(s, d, "nation")
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      val l = t(s, d, "lineitem")
      r.join(n, r("r_regionkey") === n("n_regionkey"))
        .join(c, n("n_nationkey") === c("c_nationkey"))
        .join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"), count(lit(1)).as("cnt"))
    }),

    // YQL UDF module library (udfs/common: Digest::, Url::, String::,
    // Math::, Unicode::, Ip::) — namespaced functions over builtins.
    "yql_fn_modules" -> ((s, d) => {
      import graft.functions.{YqlModules => M}
      val url = concat(lit("https://ex.com/"),
        regexp_replace(col("p_brand"), "#", "-"),
        lit("/item?size="), col("p_size"))
      t(s, d, "part").select(
        col("p_partkey"),
        M.Digest.md5(col("p_name")).as("name_md5"),
        M.Url.getPath(url).as("path"),
        M.Url.getCgiParam(url, "size").as("size_param"),
        M.Str.toUpper(col("p_brand")).as("brand_up"),
        M.Math.round(M.Math.pow(col("p_size").cast("double"), lit(2.0)), 1).as("size_sq"),
        M.Unicode.getLength(col("p_name")).as("name_len"),
        M.Ip.isPrivate(concat(lit("10.0."), col("p_size") % 256, lit(".7"))).as("is_priv"))
    }),

    // mode / topfreq (YQL mode/topfreq aggregates) — deterministic
    // most-frequent value per group, ties broken toward the larger
    // value so the oracle can replicate exactly.
    "yql_agg_topfreq" -> ((s, d) => {
      val counts = t(s, d, "orders")
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
      counts.groupBy(col("o_orderstatus"))
        .agg(
          max_by(col("o_orderpriority"),
            struct(col("cnt"), col("o_orderpriority"))).as("mode_priority"),
          max(col("cnt")).as("mode_cnt"))
    }),

    // median / exact percentile (YQL percentile/median) — exact
    // interpolated quantiles, matching DuckDB quantile_cont.
    "yql_agg_percentile" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          round(median(col("o_totalprice")), 4).as("med_price"),
          round(percentile(col("o_totalprice"), lit(0.9)), 4).as("p90_price"))),

    // Conditional + boolean + bitwise aggregates
    // (count_if/sum_if/bool_and/bool_or/bit_*).
    "yql_agg_cond_bool_bit" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_linestatus"))
        .agg(
          count_if(col("l_discount") > 0.05).as("cnt_disc"),
          round(sum(when(col("l_returnflag") === "R", col("l_quantity"))
            .otherwise(lit(0.0))), 2).as("sum_if_r"),
          bool_and(col("l_quantity") > 0).as("all_pos"),
          bool_or(col("l_discount") > 0.09).as("any_big_disc"),
          bit_and(col("l_orderkey")).as("band"),
          bit_or(col("l_orderkey")).as("bor"),
          bit_xor(col("l_orderkey")).as("bxor"))),

    // aggregate_list / aggregate_list_distinct → sorted arrays so the
    // result is deterministic across engines; serialized to CSV strings
    // so the oracle checker can hash-compare them.
    "yql_agg_list" -> ((s, d) =>
      t(s, d, "nation")
        .groupBy(col("n_regionkey").cast("long").as("region"))
        .agg(
          concat_ws(",", sort_array(collect_list(col("n_name")))).as("names"),
          concat_ws(",", sort_array(collect_set(substring(col("n_name"), 1, 7))))
            .as("prefixes"))),

    // DISTINCT aggregates + multi-distinct in one pass.
    "yql_agg_distinct" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count_distinct(col("l_partkey")).as("d_parts"),
          count_distinct(col("l_suppkey")).as("d_supps"),
          round(sum_distinct(col("l_quantity")), 2).as("sd_qty")))
  )

  val oracles: Map[String, String] = Map(
    "yql_window_rank" ->
      """SELECT o_orderkey, o_orderpriority, rn, rnk, drnk, quartile FROM (
           SELECT o_orderkey, o_orderpriority,
             CAST(row_number() OVER w AS INT) AS rn,
             CAST(rank() OVER w AS INT) AS rnk,
             CAST(dense_rank() OVER w AS INT) AS drnk,
             CAST(ntile(4) OVER w AS INT) AS quartile
           FROM orders
           WINDOW w AS (PARTITION BY o_orderpriority
                        ORDER BY o_totalprice DESC, o_orderkey)
         ) WHERE rn <= 10""",
    "yql_window_lag_lead" ->
      """SELECT * FROM (
           SELECT o_custkey, o_orderkey,
             lag(o_totalprice, 1) OVER w AS prev_price,
             lead(o_totalprice, 1) OVER w AS next_price
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ) WHERE o_custkey < 200""",
    "yql_window_frame_rows" ->
      """SELECT l_suppkey, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           ROUND(SUM(l_quantity) OVER (PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty,
           ROUND(AVG(l_quantity) OVER (PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS ma3_qty
         FROM lineitem WHERE l_suppkey < 50""",
    "yql_window_frame_groups" ->
      """WITH r AS (SELECT o_orderkey, o_orderpriority, o_totalprice,
             dense_rank() OVER (PARTITION BY o_orderpriority
               ORDER BY o_orderdate) AS dr
           FROM orders)
         SELECT o_orderkey, o_orderpriority,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_orderpriority
             ORDER BY dr RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING), 2) AS grp_sum
         FROM r""",
    "yql_window_frame_range" ->
"""SELECT o_orderkey, o_orderpriority,
           COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_cheaper_or_eq
         FROM orders WHERE o_custkey < 100""",
    "yql_window_first_last" ->
      """SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey) OVER w AS last_order,
           nth_value(o_orderkey, 2) OVER w AS second_order
         FROM orders
         WHERE o_custkey < 200
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""",
    "yql_rollup" ->
      """SELECT CAST(n_regionkey AS BIGINT) AS region, n_name,
           COUNT(*) AS cnt, ROUND(SUM(c_acctbal), 2) AS bal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY ROLLUP(1, 2)""",
    "yql_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
           ROUND(SUM(l_quantity), 2) AS qty
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""",
    "yql_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status
         FROM (SELECT o_orderstatus, o_orderpriority, COUNT(*) FROM orders
               GROUP BY 1, 2)
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""",
    "yql_union_all" ->
      """SELECT COUNT(*) AS cnt, COUNT(DISTINCT o_orderkey) AS dcnt FROM (
           SELECT o_orderkey FROM orders WHERE o_totalprice > 400000
           UNION ALL
           SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')""",
    "yql_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 300000
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""",
    "yql_except" ->
      """SELECT c_custkey FROM customer
         EXCEPT SELECT o_custkey AS c_custkey FROM orders
                WHERE o_orderpriority = '1-URGENT'""",
    "yql_join_right" ->
      """SELECT c_mktsegment, COUNT(o_orderkey) AS orders, COUNT(*) AS rows
         FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",
    "yql_join_full" ->
      """SELECT COALESCE(c_custkey, o_custkey) AS custkey,
           c_custkey IS NOT NULL AS has_customer,
           o_custkey IS NOT NULL AS has_hi_order
         FROM (SELECT c_custkey FROM customer WHERE c_acctbal > 9000) c
         FULL JOIN (SELECT o_custkey, COUNT(*) AS hi_orders FROM orders
                    WHERE o_totalprice > 450000 GROUP BY 1) o
           ON c.c_custkey = o.o_custkey""",
    "yql_join_semi" ->
      """SELECT c_custkey, c_mktsegment FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 400000)""",
    "yql_join_anti" ->
      """SELECT c_mktsegment, COUNT(*) AS cnt FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 400000)
         GROUP BY c_mktsegment""",
    "yql_join_exclusion" ->
      """SELECT COALESCE(a.o_custkey, b.c_custkey) AS custkey,
           a.o_custkey IS NOT NULL AS from_orders
         FROM (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 350000) a
         FULL JOIN (SELECT DISTINCT c_custkey FROM customer WHERE c_acctbal > 8000) b
           ON a.o_custkey = b.c_custkey
         WHERE a.o_custkey IS NULL OR b.c_custkey IS NULL""",
    "yql_join_cross" ->
      """SELECT r_name, COUNT(*) AS cnt, CAST(SUM(n_nationkey) AS BIGINT) AS sum_nk
         FROM region CROSS JOIN nation GROUP BY r_name""",
    "yql_agg_stats" ->
      """SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
           ROUND(stddev_pop(l_quantity), 4) AS sdp_qty,
           ROUND(var_samp(l_extendedprice), 2) AS var_price,
           ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
           ROUND(covar_samp(l_quantity, l_discount), 6) AS covar_qd
         FROM lineitem GROUP BY l_returnflag""",
    "yql_q3_shipping" ->
      """SELECT o_orderkey, o_orderdate,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY o_orderkey, o_orderdate
         ORDER BY revenue DESC, o_orderkey LIMIT 10""",
    "yql_q5_region" ->
      """SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS cnt
         FROM region
         JOIN nation ON r_regionkey = n_regionkey
         JOIN customer ON n_nationkey = c_nationkey
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         WHERE r_name = 'ASIA'
         GROUP BY n_name""",
    "yql_fn_modules" ->
      """SELECT p_partkey, md5(p_name) AS name_md5,
           '/' || replace(p_brand, '#', '-') || '/item' AS path,
           CAST(p_size AS VARCHAR) AS size_param,
           upper(p_brand) AS brand_up,
           ROUND(pow(CAST(p_size AS DOUBLE), 2.0), 1) AS size_sq,
           CAST(length(p_name) AS BIGINT) AS name_len,
           TRUE AS is_priv
         FROM part""",
    "yql_agg_topfreq" ->
      """SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt AS mode_cnt
         FROM (SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
                 row_number() OVER (PARTITION BY o_orderstatus
                   ORDER BY COUNT(*) DESC, o_orderpriority DESC) AS rn
               FROM orders GROUP BY 1, 2)
         WHERE rn = 1""",
    "yql_agg_percentile" ->
      """SELECT o_orderpriority,
           ROUND(median(o_totalprice), 4) AS med_price,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price
         FROM orders GROUP BY o_orderpriority""",
    "yql_agg_cond_bool_bit" ->
      """SELECT l_linestatus,
           COUNT(*) FILTER (WHERE l_discount > 0.05) AS cnt_disc,
           ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END), 2) AS sum_if_r,
           bool_and(l_quantity > 0) AS all_pos,
           bool_or(l_discount > 0.09) AS any_big_disc,
           bit_and(l_orderkey) AS band,
           bit_or(l_orderkey) AS bor,
           bit_xor(l_orderkey) AS bxor
         FROM lineitem GROUP BY l_linestatus""",
    "yql_agg_list" ->
      """SELECT CAST(n_regionkey AS BIGINT) AS region,
           array_to_string(list_sort(list(n_name)), ',') AS names,
           array_to_string(list_sort(list(DISTINCT substring(n_name, 1, 7))), ',')
             AS prefixes
         FROM nation GROUP BY 1""",
    "yql_agg_distinct" ->
      """SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS d_parts,
           COUNT(DISTINCT l_suppkey) AS d_supps,
           ROUND(SUM(DISTINCT l_quantity), 2) AS sd_qty
         FROM lineitem GROUP BY l_returnflag"""
  )
}
