package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus mixing and training-order layout for pretraining pipelines:
  * per-source sampling weights (down-sample rare-quality sources,
  * up-sample high-quality ones across epochs) and a deterministic
  * content-hash shuffle into shards.
  *
  * Both operators are hash-deterministic (md5 over stable keys, the
  * same portable convention as `Operations.hashSampleMd5`), so any
  * engine — and the DuckDB oracle — reproduces the exact same mixture
  * and order. No RNG state, no driver-side sampling.
  */
object Mixture {

  /** Weighted mixture: each row of source s appears `floor(w_s)` times
    * (epochs 0..floor-1) plus one more epoch with probability
    * `w_s - floor(w_s)`, decided by md5 over (source, epoch, id) — the
    * standard up/down-sampling used to hit target mixture ratios.
    *
    * Plan shape: a generate (sequence explode) plus a filter — NO
    * shuffle; each epoch of a source streams straight through to the
    * consumer. At 100 TB the mixture is a map-side transform feeding
    * whatever comes next (packing, shard shuffle), never a join.
    *
    * Weights absent from the map default to 1.0 (one epoch, no
    * sampling). Determinism: the fractional-epoch key includes source
    * and epoch, so re-runs and re-partitions keep identical rows.
    */
  /** Temperature-flattened source mixture (the mT5/T5 α-sampling rule,
    * Xue et al. 2021: sample sources ∝ n_s^α, α<1 upweights rare
    * sources): given a row budget B, the target share of source s is
    * q_s = n_s^α / Σ n_t^α and each of its rows keeps with probability
    * min(1, B·q_s/n_s) via the md5-threshold rule (hashSampleMd5's
    * convention) — deterministic, repartition-invariant, replayable by
    * any engine with md5.
    *
    * Distributed shape: one tiny per-source count aggregation (the
    * only shuffle, ≤|sources| groups), thresholds computed driver-side
    * from that hyperparameter-sized table, then a map-side filter —
    * the corpus itself never shuffles.
    */
  def temperatureMixture(input: DataFrame, sourceCol: String,
      idCols: Seq[String], alpha: Double, budget: Long): DataFrame = {
    require(alpha >= 0.0 && alpha.isFinite, s"bad alpha $alpha")
    val counts: Map[String, Long] = input
      .groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val z = counts.values.map(n => math.pow(n.toDouble, alpha)).sum
    // threshold = floor(min(1, B·q_s/n_s)·2^32) as 8 hex digits; the
    // md5 key compares lexicographically below it (prob = thr/2^32)
    val thrOf: Map[String, String] = counts.map { case (s, n) =>
      val q = math.pow(n.toDouble, alpha) / z
      val p = math.min(1.0, budget.toDouble * q / n.toDouble)
      val t = math.floor(p * 4294967296.0).toLong
      s -> (if (t >= 4294967296L) "ffffffffg" else f"$t%08x")
    }
    val thr = thrOf.foldLeft(lit("00000000")) { case (acc, (name, t)) =>
      when(col(sourceCol) === lit(name), lit(t)).otherwise(acc)
    }
    val key = substring(md5(concat_ws("|",
      (col(sourceCol) +: idCols.map(c => col(c).cast("string"))): _*)), 1, 8)
    input.filter(key < thr)
  }

  /** Deterministic weighted sampling without replacement — Efraimidis
    * & Spirakis 2006, "Weighted random sampling with a reservoir"
    * (A-Res/A-ES): every row draws an exponential clock
    * E = −ln(u)/w from a content-hash uniform u (the first 52 md5
    * bits of salt|id, so any engine reproduces the draw); the k
    * SMALLEST clocks win — selection probability ∝ weight, without
    * replacement. One scan + one top-k (TakeOrderedAndProject): no
    * corpus shuffle, no driver state, repartition-invariant. Rows
    * with non-positive weight never win; clock ties (measure zero)
    * break by id so both engines agree.
    */
  def weightedSample(input: DataFrame, k: Int, idCol: String,
      weightCol: String, salt: String): DataFrame = {
    // u = (h + 1) / (2^52 + 1) ∈ (0, 1], h = first 13 md5 hex digits
    val h = conv(substring(md5(concat_ws("|",
      lit(salt), col(idCol).cast("string"))), 1, 13), 16, 10).cast("double")
    val u = (h + lit(1.0)) / lit(4503599627370497.0)
    val clock = -log(u) / col(weightCol).cast("double")
    input.filter(col(weightCol) > 0.0)
      .withColumn("__clock", clock)
      .orderBy(col("__clock"), col(idCol))
      .limit(k)
      .drop("__clock")
  }

  def weightedMixture(input: DataFrame, sourceCol: String,
      idCols: Seq[String], weights: Map[String, Double]): DataFrame = {
    require(weights.values.forall(w => w >= 0.0 && w.isFinite),
      s"weights must be finite and non-negative: $weights")
    def fullOf(w: Double): Long = math.floor(w).toLong
    // fractional part → 8-hex-digit md5 threshold (hashSampleMd5's
    // convention): keep iff substring(md5(key),1,8) < hex(frac·2³²)
    def thrOf(w: Double): String = {
      val frac = w - math.floor(w)
      f"${math.floor(frac * 4294967296.0).toLong}%08x"
    }
    val src = col(sourceCol)
    val full = weights.foldLeft(lit(1L)) { case (acc, (name, w)) =>
      when(src === lit(name), lit(fullOf(w))).otherwise(acc)
    }
    val thr = weights.foldLeft(lit("00000000")) { case (acc, (name, w)) =>
      when(src === lit(name), lit(thrOf(w))).otherwise(acc)
    }
    val key = substring(md5(concat_ws("|",
      (src +: col("epoch").cast("string") +: idCols.map(col)): _*)), 1, 8)
    input
      .withColumn("__full", full).withColumn("__thr", thr)
      .withColumn("epoch", explode(sequence(lit(0L), col("__full"))))
      .filter(col("epoch") < col("__full") || key < col("__thr"))
      .drop("__full", "__thr")
  }

  /** Leakage-safe train/validation split: the unit of assignment is the
    * near-dup CLUSTER, not the document, so duplicated or near-dup
    * content never straddles the split boundary (the classic eval
    * contamination where val docs have train twins). Documents outside
    * any dup pair are their own singleton cluster.
    *
    * Assignment is the portable md5-threshold rule over the cluster
    * representative — deterministic, re-runnable, engine-independent.
    * Scale shape: the (node, component) table is proportional to the
    * DUPLICATED sliver of the corpus, so it joins back broadcast; the
    * corpus itself never shuffles.
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String, dupPairs: DataFrame,
      aCol: String, bCol: String, valFraction: Double,
      salt: String = "split"): DataFrame = {
    require(valFraction >= 0.0 && valFraction <= 1.0, s"bad $valFraction")
    val comps = Dedup.connectedComponents(dupPairs, aCol, bCol)
    val thr = f"${math.floor(valFraction * 4294967296.0).toLong}%08x"
    docs
      // comps is the duplicated sliver — small in practice, corpus-
      // proportional in the worst case: let AQE upgrade to broadcast
      // from the RUNTIME size rather than forcing it by hint
      .join(comps, docs(idCol) === comps("node"), "left")
      .withColumn("split_key",
        coalesce(col("component"), docs(idCol)).cast("long"))
      .withColumn("split",
        when(substring(md5(concat_ws("|", lit(salt), col("split_key"))), 1, 8)
               < lit(thr), "validation")
          .otherwise("train"))
      .drop("node", "component")
  }

  /** Deterministic corpus shuffle into training shards: global order by
    * `md5(salt | id)`, sharded by the key's first hex nibbles. The salt
    * re-shuffles between runs without touching the data; the order is
    * content-independent, so adjacent documents decorrelate.
    *
    * `nibbles` = 1 gives 16 shards, 2 gives 256 — the shard is the
    * key's own prefix, so shard assignment and within-shard order come
    * from one hash and any engine re-derives both (production writers
    * that need arbitrary shard counts hash to `pmod(conv(prefix), n)`
    * instead; the prefix form is what the cross-engine oracle pins).
    *
    * Plan shape: one exchange on the shard prefix, one in-partition
    * sort, a per-shard running position — the exact shape of a
    * distributed shard writer (shards ≫ cores keeps it balanced).
    */
  def shuffleShards(input: DataFrame, idCols: Seq[String], salt: String,
      nibbles: Int = 1): DataFrame = {
    require(nibbles >= 1 && nibbles <= 4, s"nibbles in 1..4, got $nibbles")
    val key = md5(concat_ws("|", lit(salt) +: idCols.map(col): _*))
    val shard = substring(key, 1, nibbles)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(shard)
      .orderBy(key.asc +: idCols.map(col(_).asc): _*)
    input
      .withColumn("shard", shard)
      .withColumn("shuffle_key", key)
      .withColumn("shard_pos", row_number().over(w).cast("long") - 1L)
  }

  /** DSIR-style data selection via importance resampling (Xie et al.
    * 2023, "Data Selection for Language Models via Importance
    * Resampling"): score every raw document by how target-like its
    * hashed n-gram distribution is, then keep the top-k.
    *
    * Model: word unigrams + bigrams hash into `hexDigits` hex digits of
    * md5 (16^hexDigits buckets — md5 keeps the whole computation
    * portable, the same convention as [[weightedMixture]] /
    * `Operations.hashSampleMd5`, so the DuckDB oracle replays the exact
    * scores). Bucket counts over the target sample (p) and the full raw
    * corpus (q) give add-one-smoothed log importance ratios; a
    * document's score is the sum of its grams' ratios.
    *
    * Scale shape: the two bucket-count aggregations reduce to
    * 16^hexDigits rows (map-side partials, tiny shuffles); the ratio
    * table — hyperparameter-sized model state, like IVF centroids — is
    * collected once and baked into the scoring projection as a literal
    * array, so SCORING IS ONE SHUFFLE-FREE PASS over the corpus:
    * explode-join-regroup would re-shuffle every token at 100 TB.
    * Selection is a bounded top-k (TakeOrdered), deterministic under
    * ties via the id.
    */
  def importanceResample(docs: DataFrame, targetPred: Column, k: Int,
      idCol: String = "doc_id", textCol: String = "text",
      hexDigits: Int = 3): DataFrame = {
    require(hexDigits >= 1 && hexDigits <= 4, s"hexDigits in 1..4: $hexDigits")
    val nBuckets = 1 << (4 * hexDigits)
    // compiled single-pass gram→bucket expressions (Sketches.DsirBuckets
    // / DsirScore): the declarative split→zip_with→aggregate lambda tree
    // computes the same values but never codegens (HOFs run interpreted)
    // and re-evaluates the whitespace split five times per row
    val bucketed = docs.select(col(idCol), targetPred.as("__tgt"),
        explode(graft.functions.Sketches.dsirBuckets(col(textCol), hexDigits)).as("b"))
    val counts = bucketed.groupBy(col("b")).agg(
      count(lit(1)).as("q"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("p"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val pTot = counts.map(_._3).sum.toDouble
    val qTot = counts.map(_._2).sum.toDouble
    val ratio = Array.fill(nBuckets)(
      math.log(1.0 / (pTot + nBuckets)) - math.log(1.0 / (qTot + nBuckets)))
    counts.foreach { case (b, q, p) =>
      ratio(b) = math.log((p + 1.0) / (pTot + nBuckets)) -
        math.log((q + 1.0) / (qTot + nBuckets))
    }
    // the ratio table rides into codegen as one double[] reference
    // object (hyperparameter-sized model state, like IVF centroids)
    val scored = docs.select(col(idCol),
        graft.functions.Sketches.dsirScore(col(textCol), ratio, hexDigits).as("__s"))
      .select(col(idCol),
        col("__s.score").as("score"),
        col("__s.n_grams").as("n_grams"))
    scored.orderBy(col("score").desc, col(idCol).asc).limit(k)
  }
}
