package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** QL operator surface (SURVEY.md §2.A) re-expressed as declarative
  * DataFrame plans over the driver testdata corpus.
  *
  * Each entry has a DuckDB-runnable oracle in [[QL.oracles]] with the
  * exact same output column names (the driver's compare sorts columns
  * by name before hashing). Conventions for engine-portable results:
  *   - double aggregates are rounded (sum→2dp, avg→4dp) so that
  *     summation-order differences between engines can't flip a bit;
  *   - BIGINT sums are cast in the oracle (DuckDB SUM(BIGINT)→HUGEINT);
  *   - ORDER BY keys always end in a unique column so LIMIT is total.
  *
  * Reference semantics: query shape parser.ypp:243-251; operators
  * cg_fragment_compiler.cpp (scan/filter/project/group/order/offset/
  * join/arrayjoin ops) — see SURVEY §2.A for file:line.
  */
object QL {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // UDF/UDAF extension surface (the reference's registered-UDF
    // contract, test_udf/test_udaf): a USER-defined scalar udf and an
    // Aggregator-backed UDAF run inside a grouped query, value-exact
    // against the oracle's replayed arithmetic. Integer-only so the
    // compare is bit-exact; the spec-side ports keep covering
    // signature/registration breadth.
    "ql_udaf_custom" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Aggregator
      import org.apache.spark.sql.Encoders
      val sumSq = new Aggregator[java.lang.Long, Long, Long] {
        def zero: Long = 0L
        def reduce(b: Long, a: java.lang.Long): Long =
          b + (if (a == null) 0L else (a % 97L) * (a % 97L))
        def merge(b1: Long, b2: Long): Long = b1 + b2
        def finish(r: Long): Long = r
        def bufferEncoder = Encoders.scalaLong
        def outputEncoder = Encoders.scalaLong
      }
      s.udf.register("graft_sumsq97", org.apache.spark.sql.functions.udaf(sumSq))
      s.udf.register("graft_mix", (k: Long) => (k * 31L + 7L) % 1000L)
      t(s, d, "orders").createOrReplaceTempView("orders")
      s.sql("""SELECT o_orderpriority,
                 CAST(graft_sumsq97(o_orderkey) AS BIGINT) AS ssq,
                 CAST(SUM(graft_mix(o_custkey)) AS BIGINT) AS mix
               FROM orders GROUP BY o_orderpriority""")
    }),

    // QL `length` is BYTE length (builtin_function_registry.cpp:30 —
    // QL strings are byte payloads): the spelling lowers to
    // octet_length, and the oracle uses DuckDB's strlen (bytes). The
    // multibyte suffix makes char-counting diverge by 1 per row.
    "ql_fn_length" -> ((s, d) =>
      graft.ql.SelectRows(s,
        """n_name, length(n_name) as blen,
          |length(concat(n_name, 'é')) as blen2
          |from [//nation]""".stripMargin,
        Map("//nation" -> t(s, d, "nation")))),

    // Scan + projection pruning: only 2 columns must reach the parquet scan.
    "ql_scan" -> ((s, d) =>
      t(s, d, "nation").select(col("n_nationkey").cast("long").as("n_nationkey"),
        col("n_name"))),

    // WHERE filter → PushedFilters on the scan.
    "ql_filter_where" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_quantity") > 45 && col("l_discount") <= 0.02)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_quantity"))),

    // Projection with arithmetic (reference test_query.py test_project1:
    // `2*a + b - 1 as s`).
    "ql_project_arith" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          round(col("l_quantity") * 2 + col("l_discount") - 1, 2).as("s"))),

    // Hash GROUP BY with the core aggregate set (TPC-H Q1 shape).
    "ql_group_agg" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"),
          count(lit(1)).as("cnt"))),

    // GROUP BY + HAVING (filter over the aggregated stream).
    "ql_group_having" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("total"))
        .filter(col("cnt") >= 3)),

    // WITH TOTALS ≈ grand-total row appended (ETotalsMode::BeforeHaving);
    // rollup over a single key gives exactly group rows + one total row.
    "ql_with_totals" -> ((s, d) =>
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("cnt"))),

    // The QL string surface end-to-end: SelectRows("... FROM [//path]")
    // transpiled to Catalyst (§3.1 lifecycle; graft.ql.SelectRows).
    "ql_selectrows" -> ((s, d) =>
      graft.ql.SelectRows(s,
        "o_orderpriority, ROUND(SUM(o_totalprice), 2) AS total, SUM(1) AS cnt " +
          "FROM [//home/orders] WHERE o_orderstatus = 'F' GROUP BY o_orderpriority",
        Map("//home/orders" -> t(s, d, "orders")))),

    // The QL builtin registry through the string surface: accessor
    // functions, TRANSFORM value remap, a uint64 literal comparison
    // above Long.MaxValue, and a hash (count-distinct only — farm_hash
    // is xxhash64-based, values deliberately diverge from the oracle).
    "ql_selectrows_fns" -> ((s, d) =>
      graft.ql.SelectRows(s,
        "et, COUNT(DISTINCT farm_hash(event_type)) AS n_types, SUM(1) AS cnt, " +
          "ROUND(SUM(value), 2) AS sum_value " +
          "FROM [//home/events] " +
          "WHERE try_get_int64(props, '/k') < 18446744073709551610u " +
          "GROUP BY transform(event_type, ('click', 'view'), " +
          "('clicked', 'viewed'), 'other') AS et",
        Map("//home/events" -> t(s, d, "events")))),

    // Grammar breadth through the string surface: multi-range BETWEEN
    // list (parser.ypp:639), NOT LIKE, DISTINCT aggregate, ORDER BY on
    // the group key — all through QLParser, no fallback.
    "ql_selectrows_grammar" -> ((s, d) =>
      graft.ql.SelectRows(s,
        "p_brand, COUNT(*) AS cnt, COUNT(DISTINCT p_type) AS types, " +
          "MIN(p_size) AS mn FROM [//part] " +
          "WHERE p_size BETWEEN (5 AND 10, 40 AND 45) " +
          "AND p_name NOT LIKE '%green%' " +
          "GROUP BY p_brand ORDER BY p_brand LIMIT 20",
        Map("//part" -> t(s, d, "part")))),

    // WITH TOTALS BEFORE HAVING vs AFTER HAVING (ETotalsMode,
    // query_common.h:78-82): BeforeHaving computes the total over all
    // groups then filters groups; AfterHaving totals only surviving
    // groups. Both expressed as group rows unioned with a totals row.
    // Money runs in exact integer cents end-to-end: the r01/r02 driver
    // hash-compare failed on this pair twice despite bit-identical local
    // Spark-vs-DuckDB outputs, so every float is removed from the result —
    // DECIMAL(18,2) sums (exact, order-independent) scaled to BIGINT.
    "ql_with_totals_before_having" -> ((s, d) => {
      val groups = t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
               .cast("long").as("total_cents"),
             count(lit(1)).as("cnt"))
      val totalsRow = groups.agg(
        lit(null).cast("string").as("o_orderpriority"),
        sum(col("total_cents")).as("total_cents"),
        sum(col("cnt")).as("cnt"))
      groups.filter(col("cnt") >= 3000).unionByName(totalsRow)
    }),
    "ql_with_totals_after_having" -> ((s, d) => {
      val surviving = t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
               .cast("long").as("total_cents"),
             count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 3000)
      val totalsRow = surviving.agg(
        lit(null).cast("string").as("o_orderpriority"),
        sum(col("total_cents")).as("total_cents"),
        sum(col("cnt")).as("cnt"))
      surviving.unionByName(totalsRow)
    }),

    // ORDER BY + LIMIT → TakeOrderedAndProject (top-k, never a full sort).
    "ql_order_limit" -> ((s, d) =>
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select(col("o_orderkey"), col("o_totalprice"))
        .limit(25)),

    // OFFSET + LIMIT (distributed: bottom limit = offset+limit).
    "ql_offset_limit" -> ((s, d) =>
      t(s, d, "orders")
        .orderBy(col("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"))
        .offset(100).limit(50)),

    // Lookup join: fact stream joined to a foreign table — QL's
    // collected-key batch lookup ≈ broadcast hash join WHEN the foreign
    // side is small, and the PLANNER decides that (static threshold +
    // AQE runtime upgrade), not a hint: a forced broadcast(orders) dies
    // at Spark's 8 GiB broadcast cap once orders outgrows it (caught by
    // the sf100 soak: 9.1 GiB build side), and at 100 TB the correct
    // plan is the shuffle join the planner falls back to.
    "ql_join_inner" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val o = t(s, d, "orders")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(round(sum(col("l_extendedprice")), 2).as("sum_price"),
          count(lit(1)).as("cnt"))
    }),

    // Join + GROUP BY with foreign-side aggregates: the
    // PushDownGroupBy rule pre-aggregates orders per customer key
    // before the join (push_down_group_by.cpp:64) — plan asserted in
    // PlanContractSpec, result stays oracle-exact.
    "ql_join_pushdown_agg" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(round(sum(col("o_totalprice")), 2).as("total"),
          max(col("o_totalprice")).as("max_price"),
          min(col("o_totalprice")).as("min_price"))
    }),

    // LEFT lookup join with an extra join predicate (ast.h:445-480
    // TJoin{IsLeft, Predicate}).
    "ql_join_left" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey") && o("o_totalprice") > 200000, "left")
        .groupBy(col("c_mktsegment"))
        .agg(count(col("o_orderkey")).as("big_orders"), count(lit(1)).as("rows"))
    }),

    // ARRAY JOIN / unnest (MakeCodegenArrayJoinOp) — explode a list built
    // from the documents corpus; inner semantics drop empty lists.
    "ql_array_join" -> ((s, d) =>
      t(s, d, "documents")
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 5)),

    // IN (tuple list) — IsRowInRowset.
    "ql_in" -> ((s, d) =>
      t(s, d, "nation")
        .filter(col("n_name").isin("NATION_3", "NATION_7", "NATION_21"))
        .select(col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"))),

    // BETWEEN range.
    "ql_between" -> ((s, d) =>
      t(s, d, "part")
        .filter(col("p_size").between(10, 15))
        .groupBy(col("p_brand")).agg(count(lit(1)).as("cnt"))),

    // TRANSFORM(expr, from, to, default) — value remap via chained CASE.
    "ql_transform" -> ((s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"),
          when(col("o_orderstatus") === "F", "finished")
            .when(col("o_orderstatus") === "O", "open")
            .otherwise("other").as("status_name"))
        .groupBy(col("status_name")).agg(count(lit(1)).as("cnt"))),

    // CASE WHEN searched form.
    "ql_case" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(
          when(col("l_quantity") < 10, "low")
            .when(col("l_quantity") < 30, "mid")
            .otherwise("high").as("bucket"),
          col("l_extendedprice"))
        .groupBy(col("bucket"))
        .agg(round(sum(col("l_extendedprice")), 2).as("sum_price"))),

    // LIKE / REGEXP (EStringMatchOp).
    "ql_like" -> ((s, d) =>
      t(s, d, "part")
        .filter(col("p_type").like("%AND%") || col("p_name").rlike("^s.*t$"))
        .groupBy(col("p_brand")).agg(count(lit(1)).as("cnt"))),

    // Subquery in FROM (nested query chain).
    "ql_subquery_from" -> ((s, d) => {
      val inner = t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(round(sum(col("l_quantity")), 2).as("qty"))
      inner.filter(col("qty") > 150)
        .agg(count(lit(1)).as("big_orders"), round(avg(col("qty")), 4).as("avg_qty"))
    }),

    // Aggregates argmin/argmax (QL argmin/argmax → min_by/max_by).
    // The ordering key is (price, orderkey), NOT bare price: argmax
    // under a tied extreme is "any row" in BOTH engines, and the
    // round-10 sf10 soak (10 key-shifted copies ⇒ every extreme
    // 10-way tied) caught the two "any"s disagreeing — the composite
    // key pins a deterministic winner without changing the operator.
    "ql_argminmax" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          max_by(col("o_orderkey"),
            struct(col("o_totalprice"), col("o_orderkey")))
            .as("priciest_order"),
          min_by(col("o_orderkey"),
            struct(col("o_totalprice"), col("o_orderkey")))
            .as("cheapest_order"))),

    // cardinality() HyperLogLog. Estimator values differ between HLL
    // implementations, so the oracle can't compare them directly;
    // instead the query emits the EXACT distinct count plus a tolerance
    // verdict on its own estimate (HLL++ default rsd = 5%; gate at 3σ).
    // The oracle pins the exact count and expects `true` — a broken
    // estimator flips the flag and fails the hash compare. Same
    // equality-only-comparator tolerance-gate pattern as the recall
    // specs, but driver-visible.
    "ql_cardinality" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          count_distinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")) <=
            col("exact_parts") * 0.15).as("within_tolerance"))),

    // Timestamp functions: timestamp_floor_day / format_timestamp →
    // date_trunc / date_format over the events stream table.
    "ql_timestamp_floor" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))),

    // YSON/Any accessors (try_get_* family) — events.props is a JSON
    // document column, exactly the `Any` pattern; get_json_object ≈
    // get_string(any, ypath).
    "ql_any_access" -> ((s, d) =>
      t(s, d, "events")
        .select(graft.sources.Yson.getJsonFast(col("props"), lit("$.k"))
          .cast("long").as("k"),
          col("value"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))),

    // Typed Any ordering (composite_compare.cpp CompareYsonValues;
    // ql_query_ut.cpp CompareAny): list Anys built per-row, compared
    // through any_compare via the QL string surface. DuckDB's native
    // list comparison is the oracle (same itemwise-then-length order).
    // The CASE evaluates the same any_compare pair in both branches ON
    // PURPOSE (the reference test shape); whole-stage codegen's
    // subexpression elimination collapses it — the generated code calls
    // compareAnyJson exactly once per row (verified by codegen dump,
    // round 8).
    "ql_any_compare" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("ln"))
      graft.ql.SelectRows(s,
        "l_orderkey, ln, case " +
          "when any_compare(to_any(make_list(l_orderkey % 7, ln)), " +
          "to_any(make_list(l_orderkey % 5, 3))) < 0 then int64(-1) " +
          "when any_compare(to_any(make_list(l_orderkey % 7, ln)), " +
          "to_any(make_list(l_orderkey % 5, 3))) > 0 then int64(1) " +
          "else int64(0) end as cmp from [//tmp/anycmp]",
        Map("//tmp/anycmp" -> li))
    })
  )

  val oracles: Map[String, String] = Map(
    "ql_fn_length" ->
      """SELECT n_name, CAST(strlen(n_name) AS INTEGER) AS blen,
           CAST(strlen(n_name || 'é') AS INTEGER) AS blen2
         FROM nation""",
    "ql_udaf_custom" ->
      """SELECT o_orderpriority,
           CAST(SUM((o_orderkey % 97) * (o_orderkey % 97)) AS BIGINT) AS ssq,
           CAST(SUM((o_custkey * 31 + 7) % 1000) AS BIGINT) AS mix
         FROM orders GROUP BY o_orderpriority""",
    "ql_any_compare" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS ln,
         CASE WHEN [l_orderkey % 7, CAST(l_linenumber AS BIGINT)] <
                   [l_orderkey % 5, CAST(3 AS BIGINT)] THEN CAST(-1 AS BIGINT)
              WHEN [l_orderkey % 7, CAST(l_linenumber AS BIGINT)] >
                   [l_orderkey % 5, CAST(3 AS BIGINT)] THEN CAST(1 AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS cmp
         FROM lineitem""",
    "ql_scan" ->
      "SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name FROM nation",
    "ql_filter_where" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity
         FROM lineitem WHERE l_quantity > 45 AND l_discount <= 0.02""",
    "ql_project_arith" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         ROUND(l_quantity * 2 + l_discount - 1, 2) AS s FROM lineitem""",
    "ql_group_agg" ->
      """SELECT l_returnflag, l_linestatus,
         ROUND(SUM(l_quantity), 2) AS sum_qty,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         ROUND(AVG(l_quantity), 4) AS avg_qty,
         MIN(l_extendedprice) AS min_price,
         MAX(l_extendedprice) AS max_price,
         COUNT(*) AS cnt
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "ql_group_having" ->
      """SELECT o_custkey, COUNT(*) AS cnt, ROUND(SUM(o_totalprice), 2) AS total
         FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3""",
    "ql_with_totals" ->
      """SELECT l_returnflag, ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS cnt
         FROM lineitem GROUP BY ROLLUP(l_returnflag)""",
    "ql_selectrows" ->
      """SELECT o_orderpriority, ROUND(SUM(o_totalprice), 2) AS total, COUNT(*) AS cnt
         FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderpriority""",
    "ql_selectrows_fns" ->
      """SELECT CASE event_type WHEN 'click' THEN 'clicked'
           WHEN 'view' THEN 'viewed' ELSE 'other' END AS et,
           COUNT(DISTINCT event_type) AS n_types,
           CAST(SUM(1) AS BIGINT) AS cnt,
           ROUND(SUM(value), 2) AS sum_value
         FROM events
         WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) < 18446744073709551610
         GROUP BY 1""",
    "ql_selectrows_grammar" ->
      """SELECT p_brand, COUNT(*) AS cnt, COUNT(DISTINCT p_type) AS types,
           MIN(p_size) AS mn
         FROM part
         WHERE (p_size BETWEEN 5 AND 10 OR p_size BETWEEN 40 AND 45)
           AND p_name NOT LIKE '%green%'
         GROUP BY p_brand ORDER BY p_brand LIMIT 20""",
    "ql_with_totals_before_having" ->
      """WITH g AS (SELECT o_orderpriority,
                      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                        AS total_cents,
                      COUNT(*) AS cnt FROM orders GROUP BY 1)
         SELECT * FROM g WHERE cnt >= 3000
         UNION ALL
         SELECT NULL, CAST(SUM(total_cents) AS BIGINT),
                CAST(SUM(cnt) AS BIGINT) FROM g""",
    "ql_with_totals_after_having" ->
      """WITH g AS (SELECT o_orderpriority,
                      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                        AS total_cents,
                      COUNT(*) AS cnt FROM orders GROUP BY 1),
              s AS (SELECT * FROM g WHERE cnt >= 3000)
         SELECT * FROM s
         UNION ALL
         SELECT NULL, CAST(SUM(total_cents) AS BIGINT),
                CAST(SUM(cnt) AS BIGINT) FROM s""",
    "ql_order_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25""",
    "ql_offset_limit" ->
      """SELECT o_orderkey, o_custkey FROM orders
         ORDER BY o_orderkey LIMIT 50 OFFSET 100""",
    "ql_join_inner" ->
      """SELECT o_orderstatus, ROUND(SUM(l_extendedprice), 2) AS sum_price,
         COUNT(*) AS cnt
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderstatus""",
    "ql_join_pushdown_agg" ->
      """SELECT c_mktsegment, ROUND(SUM(o_totalprice), 2) AS total,
         MAX(o_totalprice) AS max_price, MIN(o_totalprice) AS min_price
         FROM customer JOIN orders ON c_custkey = o_custkey
         GROUP BY c_mktsegment""",
    "ql_join_left" ->
      """SELECT c_mktsegment, COUNT(o_orderkey) AS big_orders, COUNT(*) AS rows
         FROM customer LEFT JOIN orders
           ON c_custkey = o_custkey AND o_totalprice > 200000
         GROUP BY c_mktsegment""",
    "ql_array_join" ->
      """SELECT word, COUNT(*) AS cnt
         FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS word
               FROM documents WHERE doc_id < 100)
         WHERE LENGTH(word) > 0 GROUP BY word HAVING COUNT(*) >= 5""",
    "ql_in" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name FROM nation
         WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_21')""",
    "ql_between" ->
      """SELECT p_brand, COUNT(*) AS cnt FROM part
         WHERE p_size BETWEEN 10 AND 15 GROUP BY p_brand""",
    "ql_transform" ->
      """SELECT CASE o_orderstatus WHEN 'F' THEN 'finished' WHEN 'O' THEN 'open'
           ELSE 'other' END AS status_name, COUNT(*) AS cnt
         FROM orders GROUP BY 1""",
    "ql_case" ->
      """SELECT CASE WHEN l_quantity < 10 THEN 'low'
           WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END AS bucket,
         ROUND(SUM(l_extendedprice), 2) AS sum_price
         FROM lineitem GROUP BY 1""",
    "ql_like" ->
      """SELECT p_brand, COUNT(*) AS cnt FROM part
         WHERE p_type LIKE '%AND%' OR regexp_matches(p_name, '^s.*t$')
         GROUP BY p_brand""",
    "ql_subquery_from" ->
      """SELECT COUNT(*) AS big_orders, ROUND(AVG(qty), 4) AS avg_qty
         FROM (SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS qty
               FROM lineitem GROUP BY l_orderkey)
         WHERE qty > 150""",
    "ql_argminmax" ->
      """SELECT o_orderpriority,
         (max(struct_pack(p := o_totalprice, k := o_orderkey))).k
           AS priciest_order,
         (min(struct_pack(p := o_totalprice, k := o_orderkey))).k
           AS cheapest_order
         FROM orders GROUP BY o_orderpriority""",
    "ql_timestamp_floor" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
         COUNT(*) AS cnt, ROUND(SUM(value), 2) AS sum_value
         FROM events GROUP BY 1, 2""",
    // tolerance gate: the oracle pins the exact counts and the expected
    // verdict; a drifting estimator flips within_tolerance → hash fail
    "ql_cardinality" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
         true AS within_tolerance
         FROM lineitem GROUP BY l_returnflag""",
    "ql_any_access" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         COUNT(*) AS cnt, ROUND(SUM(value), 2) AS sum_value
         FROM events GROUP BY 1"""
  )
}
