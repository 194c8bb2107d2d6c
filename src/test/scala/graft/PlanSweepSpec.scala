package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Fleet-wide physical-plan contract: every SparkEntry query — current
  * and future — is held to the two invariants that decide whether a
  * plan survives a 100 TB scale-up:
  *
  *   1. No cartesian product, and no nested-loop join outside the three
  *      operators whose SEMANTICS are pairwise-against-a-small-side
  *      (brute-force ANN scoring, IVF centroid assignment, an explicit
  *      CROSS JOIN query). Everything else must reach its result
  *      through keyed joins — an accidental non-equi join that planned
  *      as BNLJ at test scale becomes a cartesian explosion at corpus
  *      scale.
  *   2. A shuffle budget per query: at most [[defaultShuffleCeil]]
  *      exchanges, with explicit, justified exceptions for the
  *      multi-stage sketch pipelines. Every exchange is a full
  *      re-materialization of the stream at 100 TB; a regression that
  *      sneaks a fourth shuffle into a three-shuffle operator is a
  *      performance bug even while results stay correct.
  *
  * Per-operator plan details (pushdown, broadcast sides, partial aggs)
  * live in PlanContractSpec; this sweep is the safety net that catches
  * the query nobody wrote a targeted contract for. ReusedExchangeExec
  * subtrees are not re-counted (exchange reuse is the desired shape).
  */
class PlanSweepSpec extends SparkSpec {

  /** Pairwise-by-contract operators, each against a broadcast-small
    * side: bruteForceTopK streams the corpus once against k broadcast
    * queries (llm_sim_lsh/ivf embed it as their in-plan recall truth);
    * ivfTopK assigns vectors to nlist broadcast centroids (that product
    * IS the IVF training/assignment cost); yql_join_cross is the CROSS
    * JOIN surface itself. */
  private val nestedLoopAllowed =
    Set("llm_sim_bruteforce", "llm_sim_ivf", "llm_sim_lsh", "llm_sim_pq",
      "yql_join_cross",
      // the hot-line set folds to ONE aggregated array row broadcast
      // against the corpus — a 1×N product by construction
      "llm_boilerplate_lines",
      // the export task instant is a ONE-row broadcast scalar (the
      // stream's high-water mark) crossed against the queue
      "dyn_queue_export",
      // the sampling verdict crosses FOUR one-row count aggregates
      // (three sampled counts + the total) — 1×1 products by
      // construction
      "yql_sql_sample")

  /** Nearly every operator fits in <= 4 exchanges (scan → shuffle agg /
    * join → final agg → order). The documented exceptions: the
    * multi-stage LSH dedups (signature → band/chunk explode → candidate
    * join → dedup → vector fetch-backs, legitimately ~7 stages), and
    * the approximate-operator VERDICT queries, which run the
    * approximate op AND its exact counterpart in one plan plus the
    * verdict join — their budgets are roughly the sum of both. */
  private val defaultShuffleCeil = 4
  private val shuffleCeil = Map(
    "llm_dedup_minhash" -> 8,
    "llm_dedup_simhash" -> 8, // simhash pipeline + exact-Jaccard truth
    "llm_dedup_embedding_lsh" -> 11, // LSH pipeline + block-grid exact
    "llm_sim_lsh" -> 8, // 8-table ANN + brute-force truth + verdict
    "llm_sim_ivf" -> 9, // IVF assign/probe + brute-force truth + verdict
    "llm_sim_pq" -> 10, // ADC scan + refine fetch + brute-force truth + verdict
    // commit plan: ONE corpus-sized merge shuffle; the rest are
    // single-row scalar aggregates (commit ts ×2, conflict count) —
    // metadata, not data volume
    "dyn_transaction" -> 6,
    // fuzz harness of 12 INDEPENDENT set-op cases unioned — INTERSECT/
    // EXCEPT legitimately shuffle both sides per case; the budget is
    // per-case ~2, not per-query
    "ql_fuzz_setops" -> 24,
    // FOUR independent single-row count aggregates (2 exchanges each)
    // + the scalar-subquery total — per-aggregate budget, single rows
    "yql_sql_sample" -> 12,
    // fuzz harnesses of INDEPENDENT unioned cases — one shuffle per
    // NFA case / two per count-aggregate case; per-case budget ~2
    "yql_fuzz_matchrec" -> 12,
    "yql_fuzz_tablepaths" -> 20,
    // hop/session fuzz harness: independent window-grouping cases
    // unioned — each case carries its own agg exchange by design
    "yql_fuzz_hopsession" -> 24,
    // dyn-table fuzz harness: 8 INDEPENDENT merge cases unioned, each
    // a key-grouped merge + its single-row summary aggregate (~2
    // shuffles per case); retention adds a window pass, the
    // transaction case a staged-batch union — per-case budget ~2.5
    "dyn_fuzz_log" -> 22,
    // index-maintenance fuzz: 5 INDEPENDENT cases unioned, each a
    // window pass over the primary log (maintenance replay) + the
    // index-key merge + its single-row summary (~3 shuffles per case)
    "dyn_fuzz_index" -> 16,
    // queue fuzz: per-case summary aggregates over the consumed
    // batches + the retained-tail window + producer push — the pull
    // loop itself is collect-driven, so only summaries shuffle
    "dyn_fuzz_queue" -> 8)

  /** Deep plan census. Each plan INSTANCE counts once: a scalar
    * subquery referenced from several scans is one execution, not one
    * per reference (visited-set on identity). */
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

  test("every query: no cartesian product, nested-loop joins only where " +
      "pairwise-by-contract, shuffle count within budget") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val df = fn(spark, sfDir)
        df.count() // drive AQE to its final plan
        val nodes = allNodes(df.queryExecution.executedPlan)
        val cartesian = nodes.count(_.isInstanceOf[CartesianProductExec])
        val bnlj = nodes.count(_.isInstanceOf[BroadcastNestedLoopJoinExec])
        val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeLike])
        val ceil = shuffleCeil.getOrElse(name, defaultShuffleCeil)
        Seq(
          if (cartesian > 0) Some(s"$name: $cartesian CartesianProductExec")
          else None,
          if (bnlj > 0 && !nestedLoopAllowed(name))
            Some(s"$name: $bnlj BroadcastNestedLoopJoinExec (not allowlisted)")
          else None,
          if (shuffles > ceil)
            Some(s"$name: $shuffles shuffles > budget $ceil")
          else None).flatten
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
