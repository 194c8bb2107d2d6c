package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale document deduplication: exact, MinHash+LSH, SimHash and
  * exact n-gram Jaccard. All stages are declarative DataFrame plans —
  * no driver-side loops — so they scale by shuffle:
  *
  *   - exact: one hash-aggregate on the content digest.
  *   - minhash LSH: per-doc signature (map-only) → explode to
  *     (band, bandHash) buckets → self-join within buckets → verify.
  *     Shuffle volume is O(docs × bands), never O(docs²); band width
  *     trades recall for bucket size exactly like the standard
  *     (bands, rows) S-curve.
  *   - simhash: 64-bit signature (map-only) → pigeonhole into
  *     `64/chunkBits` chunks: any pair within hamming distance k must
  *     share ≥1 exact chunk when chunks > k → bucket join → popcount
  *     verify.
  *
  * The signature math uses multiply-add universal hashing over one
  * xxhash64 base hash per shingle, with constants from a seeded PRNG —
  * deterministic across runs and executors.
  */
object Dedup {
  /** Exact dedup: keep the lowest-id row per identical content. */
  def exact(df: DataFrame, contentCols: Seq[String], idCol: String): DataFrame = {
    df.groupBy(contentCols.map(col): _*)
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))
  }

  /** Connected components over an undirected dup-pair edge list —
    * the step that turns near-dup PAIRS into dedup CLUSTERS (transitive
    * closure: if a~b and b~c, then {a,b,c} keep one representative).
    *
    * Iterative min-label propagation: every node starts as its own
    * label; each round every node takes the min label in its closed
    * neighborhood. Converges in O(diameter) rounds — dup clusters are
    * near-cliques with tiny diameters, so a handful of rounds at any
    * corpus size. Each round is one shuffle of the edge list joined to
    * the (node, label) table; `localCheckpoint` cuts the lineage so the
    * plan doesn't grow with iterations (the classic iterative-Spark
    * failure mode). The driver loop carries only a converged/changed
    * counter, never data.
    *
    * Output: (node, component) where component = min node id reachable.
    */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25): DataFrame = {
    // Symmetric edge list (propagation must flow both ways),
    // hash-partitioned by the per-round join key ONCE: localCheckpoint
    // preserves outputPartitioning, so every iteration's edge⋈label join
    // shuffles only the small (node,label) table — the edge list (the
    // 100 TB side) never moves again.
    val sym = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .repartition(col("dst"))
      .localCheckpoint(eager = true)
    // Seed with the first propagation fused in: label₀(u) = min of the
    // closed neighborhood — one groupBy over the edge list, same shuffle
    // class as materializing the node set, but a whole round cheaper.
    var labels = sym
      .groupBy(col("src").as("node"))
      .agg(min(least(col("src"), col("dst"))).as("label"))
      .localCheckpoint(eager = true)
    // Convergence check without a second join: labels are monotonically
    // non-increasing (the min runs over the CLOSED neighborhood), so the
    // label sum strictly decreases until the fixed point — equal sums
    // between rounds ⇔ no node changed. One cheap agg over the freshly
    // checkpointed table replaces a join + filter + count job per round.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head.getDecimal(0)
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // min label over the closed neighborhood: the node's own label
      // union the labels of its neighbors
      val neighborLabels = sym
        .join(labels.withColumnRenamed("node", "dst"), "dst")
        .select(col("src").as("node"), col("label"))
      val next = labels.select(col("node"), col("label"))
        .union(neighborLabels)
        .groupBy("node").agg(min("label").as("label"))
        .localCheckpoint(eager = true)
      val nextSum = labelSum(next)
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      iter += 1
    }
    labels.select(col("node"), col("label").as("component"))
  }

  /** Word n-gram shingle set as distinct xxhash64 base hashes. A doc
    * with fewer than n words has zero shingles (no partial grams).
    */
  def shingleHashes(text: Column, n: Int): Column =
    graft.functions.Sketches.shingleHashes(text, n)

  /** MinHash signature: sig_i = min_s xxhash64(h(s), salt_i) — one
    * independent hash family member per salt, ANSI-safe (no arithmetic
    * overflow). Array column of length numHashes.
    */
  def minhashSignature(shingles: Column, numHashes: Int, seed: Long = 42L): Column =
    graft.functions.Sketches.minhashSig(shingles, numHashes, seed)

  /** Near-duplicate candidate pairs via MinHash + LSH banding, verified
    * with exact Jaccard over the shingle sets. Returns
    * (idA, idB, jaccard) with idA < idB and jaccard >= threshold.
    */
  def minhashLsh(df: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3, numHashes: Int = 128, bands: Int = 16,
      threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands

    val docs = df.select(col(idCol).as("doc_id"),
        shingleHashes(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numHashes))

    // (doc, band, bandHash) with ids only — the heavy shingle arrays
    // never ride through the band explode/self-join; candidate pairs
    // (tiny vs corpus) fetch them back afterwards.
    val banded = docs.select(col("doc_id"),
        posexplode(array((0 until bands).map { j =>
          xxhash64(slice(col("sig"), j * rows + 1, rows))
        }: _*)).as(Seq("band", "band_hash")))

    // Shuffle-hash joins throughout, never broadcast: every big side is
    // the corpus-derived stream (broadcast OOMs at scale), and identical
    // subtrees under identical exchanges collapse via ReuseExchange — the
    // shingle+signature scan is computed ONCE, not once per join arm.
    val l = banded.select(col("doc_id").as("id_a"), col("band"), col("band_hash"))
    val r = banded.select(col("doc_id").as("id_b"), col("band"), col("band_hash"))
    val candidates = l.hint("shuffle_hash")
      .join(r.hint("shuffle_hash"), Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")

    val shingleSets = docs.select(col("doc_id"), col("sh"))
    candidates
      .join(shingleSets.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
        .hint("shuffle_hash"), "id_a")
      .join(shingleSets.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
        .hint("shuffle_hash"), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** 64-bit SimHash over a feature-hash array: bit k of the signature
    * is the sign of sum over features of ±1 by the feature hash's bit
    * k. Features should be shingle hashes ([[shingleHashes]]) — word
    * unigrams give too little margin on short documents.
    */
  def simhash(features: Column): Column =
    graft.functions.Sketches.simhash64(features)

  /** SimHash near-dup pairs with hamming distance <= maxDist, using the
    * pigeonhole bucket join over 64/chunkBits exact-match chunks.
    * Defaults tuned for short documents: 3-gram shingle features,
    * dist <= 5 over 8 chunks of 8 bits.
    *
    * Bucket keys are chunk PAIRS when the pigeonhole budget allows
    * (chunks − maxDist ≥ 2): ≤ maxDist flipped bits dirty at most
    * maxDist chunks, leaving ≥ 2 clean ones — so every qualifying pair
    * still shares an exactly-matching chunk PAIR, and the final
    * popcount filter is exact either way: the OUTPUT is identical to
    * single-chunk keys. What changes is scale: the join's cost is
    * Σ bucket², and C(8,2)=28 bands of 2·chunkBits-bit keys cut bucket
    * occupancy 256× for a 3.5× explode — the sf1 soak measured
    * 14.5 s → ~2 s on 6M rows. Falls back to single-chunk keys when
    * chunks == maxDist + 1 (no spare clean chunk for pairing). */
  def simhashDup(df: DataFrame, textCol: String, idCol: String,
      maxDist: Int = 5, chunkBits: Int = 8, shingleSize: Int = 3,
      rows: Long = -1L): DataFrame = {
    val chunks = 64 / chunkBits
    require(chunks > maxDist, "need more chunks than maxDist for pigeonhole")
    val sigs = df.select(col(idCol).as("doc_id"),
      simhash(shingleHashes(col(textCol), shingleSize)).as("sig"))
    def chunkVal(j: Int) =
      shiftrightunsigned(col("sig"), j * chunkBits)
        .bitwiseAND((1L << chunkBits) - 1)
    // band WIDTH follows corpus size: ≤ maxDist flipped bits dirty at
    // most maxDist chunks, so ANY w ≤ chunks − maxDist leaves a clean
    // w-subset shared by every qualifying pair — output identical at
    // every width (the popcount filter is exact either way). What
    // width changes is Σ bucket² ≈ n·occ with occ = n/2^(w·chunkBits):
    // w=2 was the round-5 fix (14.5 s → 1 s at sf1), but 500k docs
    // saturate the 16-bit pair space (occ ≈ 7.6 × 28 bands ≈ 10⁸
    // candidate pairs — 40 s at the sf10 soak), so the width widens
    // until occ ≤ 4 or the pigeonhole budget is spent. C(chunks, w)
    // bands trade a linear explode for the quadratic bucket collapse.
    val budget = chunks - maxDist
    val n = math.max(1L,
      if (rows > 0) rows
      else sigs.queryExecution.optimizedPlan.stats.rowCount
        .map(_.toLong).getOrElse(df.count()))
    val w = (1 to budget).find(w0 =>
      n.toDouble / math.pow(2.0, w0.toDouble * chunkBits) <= 4.0)
      .getOrElse(budget)
    val keys: Seq[Column] =
      if (w == 1) (0 until chunks).map(chunkVal)
      else (0 until chunks).combinations(w).map(_.foldLeft(lit(0L)) {
        (acc, i) => shiftleft(acc, chunkBits).bitwiseOR(chunkVal(i))
      }).toSeq
    val chunked = sigs.select(col("doc_id"), col("sig"),
      posexplode(array(keys: _*)).as(Seq("chunk", "chunk_val")))
    val l = chunked.select(col("doc_id").as("id_a"), col("sig").as("sig_a"),
      col("chunk"), col("chunk_val"))
    val r = chunked.select(col("doc_id").as("id_b"), col("sig").as("sig_b"),
      col("chunk"), col("chunk_val"))
    // shuffle-hash, never broadcast: both sides are the whole corpus's
    // chunk table (broadcast OOMs at scale), and the two sides are the
    // same subtree — the shuffle join makes them identical exchanges, so
    // ReuseExchange computes the signature scan ONCE and reads it twice
    l.hint("shuffle_hash").join(r.hint("shuffle_hash"), Seq("chunk", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("dist", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
  }

  /** Embedding-cosine near-duplicate pairs: documents whose embedding
    * cosine clears `threshold`. EXACT, via a distributed block-grid pair
    * join: rows hash into `blocks` blocks; each unordered block pair
    * (p,q), p<=q becomes one equi-join cell — the A side replicates a
    * block-p row to cells (p, q>=p), the B side a block-q row to cells
    * (p<=q, q), so every pair is examined exactly once. No broadcast of
    * the corpus, no cross join: shuffle is O(n·blocks) and the n²/2
    * cosine evaluations spread over blocks(blocks+1)/2 independent
    * tasks, each of bounded (n/blocks)² size.
    *
    * Exact is the honest algorithm at low thresholds: at cos≈0.4 a
    * hyperplane bit agrees with prob 0.63 for a true pair vs 0.50 for a
    * random one — no LSH scheme gets recall≈1 while pruning anything.
    * For the genuine near-dup regime (cos >= ~0.8) use the sub-quadratic
    * [[embeddingCosinePairsLsh]].
    */
  /** Semantic dedup in the SemDeDup style (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space, then drop
    * near-duplicates WITHIN each cluster only — the pairwise work
    * shrinks from O(n²) to Σ|cell|², and cells are independent tasks.
    *
    * Pinned deterministic variant (so an external engine replays the
    * whole decision): cells are the `nCells` corpus vectors with the
    * smallest md5(salt|id) (a content-hash sample standing in for
    * k-means, the same posture as IVF's deterministic centroids);
    * every vector joins its highest-cosine centroid (ties → lowest
    * centroid id); within a cell, a vector is dropped when some
    * LOWER-ID cell-mate has cosine ≥ tau with it (the paper ranks by
    * distance-to-centroid; the min-id rule is the order-free
    * equivalent the oracle can replay).
    *
    * Scale shape: centroids are hyperparameter-sized and ship in the
    * assignment closure — assignment is ONE map-side pass, no shuffle,
    * no crossJoin; the only corpus shuffle keys by cell for the
    * bounded pairwise verify. Skewed cells split with the same
    * salting as any hot key.
    */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
      nCells: Int, tau: Double, salt: String,
      rows: Long = -1L): DataFrame = {
    // nCells <= 0 → AUTO: cells sized to ~64 rows so the within-cell
    // pairwise work stays Σ|cell|² ≈ 64·n — LINEAR in the corpus (a
    // fixed cell count bends quadratic: the sf10 soak measured 103 s
    // at 200k vectors / 8 cells). The centroid table stays
    // hyperparameter-sized (capped 65536 ≈ 32 MB of 64-dim doubles);
    // past the cap, swap the deterministic sample for the distributed
    // k-means in Similarity (same assignment expression).
    val k =
      if (nCells > 0) nCells
      else {
        val n = math.max(1L,
          if (rows > 0) rows
          else df.queryExecution.optimizedPlan.stats.rowCount
            .map(_.toLong).getOrElse(df.count()))
        math.min(65536L, math.max(16L, n / 64L)).toInt
      }
    val ranked = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"),
      md5(concat_ws("|", lit(salt), col(idCol).cast("string"))).as("r"))
    val centroids: Array[(Long, Array[Double])] = ranked
      .orderBy(col("r"), col("id")).limit(k)
      .select(col("id"), col("vec").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    // one compiled pass per row: argmax cosine over the broadcast
    // centroid table (Sketches.CentroidArgmax — the table rides into
    // codegen as reference objects, like the other sketches), with the
    // exact sequential summation order the oracle's cosine uses
    val assigned = df.select(col(idCol).cast("long").as("vec_id"),
      col(vecCol).as("vec"),
      graft.functions.Sketches.centroidArgmax(col(vecCol),
        centroids.map(_._1), centroids.map(_._2)).as("cell"))
    val dropped = assigned.as("a").join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("b.vec_id") < col("a.vec_id"))
      .filter(Similarity.cosine(col("a.vec"), col("b.vec")) >= tau)
      .select(col("a.vec_id").as("vec_id")).distinct()
    assigned.select(col("vec_id"), col("cell"))
      .join(dropped.withColumn("__d", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("__d").isNull.as("kept"))
  }

  def embeddingCosinePairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, blocks: Int = 16): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      pmod(xxhash64(col(idCol)), lit(blocks)).cast("int").as("g"))
    val a = v.select(col("id").as("id_a"), col("vec").as("vec_a"),
      col("g").as("p"), explode(sequence(col("g"), lit(blocks - 1))).as("q"))
    val b = v.select(col("id").as("id_b"), col("vec").as("vec_b"),
      explode(sequence(lit(0), col("g"))).as("p"), col("g").as("q"))
    a.join(b, Seq("p", "q"))
      // diagonal cells see both orderings of a pair; keep one
      .filter(col("p") < col("q") || col("id_a") < col("id_b"))
      .withColumn("cos", Similarity.cosine(col("vec_a"), col("vec_b")))
      .filter(col("cos") >= threshold)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        round(col("cos"), 4).as("cos"))
  }

  /** Sub-quadratic embedding near-dup pairs for the high-similarity
    * regime: hyperplane-signature pigeonhole candidates + exact cosine
    * verify. Signatures of `bits` sign bits split into bits/chunkBits
    * chunks; a pair agreeing on >=1 exact chunk becomes a candidate (id
    * columns only ride the join — vectors are fetched back for the
    * verify). Pigeonhole guarantees recall 1.0 for pairs within
    * signature hamming distance < bits/chunkBits; at cos 0.9 a bit
    * flips with prob acos(0.9)/pi ≈ 0.14, so the 24/4 default misses a
    * true pair with prob ~(1-(0.86)^4)^6 ≈ 1%. Not applicable below
    * cos ~0.7 (see [[embeddingCosinePairs]] for why).
    *
    * `bits`/`chunkBits` must be given together (a half-specified pair
    * is an error, not a silent auto-size); the default (-1/-1) sizes
    * BOTH to the corpus: the candidate join's cost is Σ bucket² and a
    * fixed 4-bit chunk space (16 buckets) goes quadratic the moment
    * buckets outgrow the true neighborhoods — the sf0.1→sf1 soak
    * measured 6.8 s → 64 s on fixed 24/4. Auto mode narrows buckets
    * to ~32 rows (chunkBits = log2(n/32), clamped to [4, 20]) and —
    * because a wider chunk is less likely to be clean — ADDS chunks
    * to hold the miss probability at the design point (see
    * [[lshAutoParams]]): a cos-0.9 pair is missed with prob ≤~1% at
    * EVERY auto size, not just the smallest. Auto mode also DELEGATES
    * sub-regime thresholds (< 0.7) to the exact block-grid, where no
    * LSH scheme can prune (see the in-body note). The corpus row count
    * comes from the `rows` hint, else the plan's catalog statistics
    * (populated by [[graft.sources.Tables.analyzeAll]]), else one
    * count job — at 100 TB, pass the hint or analyze the table.
    *
    * Each chunk is an independent cb-bit hyperplane family (its own
    * seeded plane set), so total signature bits are not capped by a
    * 64-bit word; the hamming prefilter popcounts across the chunk
    * array.
    */
  /** Auto sizing for [[embeddingCosinePairsLsh]]: (chunks, chunkBits)
    * for a corpus of `n` rows at `threshold`.
    *
    * chunkBits targets ~32-row buckets (`cb = log2(n/32)`, clamped to
    * [4, 20]): the bucket-collision join volume is m·n²/2^cb + true
    * pairs, so small constant buckets keep the candidate stream
    * near-linear in n — each extra chunk bit halves collisions while
    * costing only ~1.17× more chunks, so narrow buckets strictly win
    * until per-row signature cost takes over around bucket ≈ tens of
    * rows. The chunk COUNT then holds the miss probability for a true
    * pair at the regime design point (cos 0.9, or the actual
    * threshold when higher) at ≤1%:
    * miss = (1 - (1-p)^cb)^m with p = acos(max(threshold,0.9))/π, so
    * m = ceil(ln 0.01 / ln(1-(1-p)^cb)). The m(cb) growth is the
    * hyperplane-LSH ρ exponent (ρ = ln p₁ / ln ½ ≈ 0.22 at cos 0.9) —
    * sub-linear in n, the standard LSH trade.
    */
  def lshAutoParams(n: Long, threshold: Double,
      missTarget: Double = 0.01): (Int, Int) = {
    require(missTarget > 0 && missTarget < 1,
      "missTarget must be a probability in (0, 1)")
    val cb = math.min(20, math.max(4,
      math.ceil(math.log(n / 32.0) / math.log(2.0)).toInt))
    val p = math.acos(math.min(1.0, math.max(threshold, 0.9))) / math.Pi
    val q = math.pow(1 - p, cb) // per-chunk clean probability
    val m = math.max(2,
      math.ceil(math.log(missTarget) / math.log(1 - q)).toInt)
    (m, cb)
  }

  /** Measured PEAK on-disk cost of ONE banded row through the
    * candidate join. Two calibration points: the round-10 sf100 soak
    * put 584M rows at ~90 GB of shuffle WRITE (~154 B/row), but the
    * round-11 re-run showed write volume alone under-budgets the
    * peak — the banded sort spill and the band-join shuffle COEXIST
    * on disk, and 192M rows exhausted ~60 GB (~310 B/row) before the
    * join finished. The constant budgets the coexisting peak. */
  val lshBandedRowBytes = 320L

  /** [[lshAutoParams]] capped to a shuffle-scratch budget: the banded
    * stream materializes m·n rows once (~[[lshBandedRowBytes]] each),
    * so a chunk count the scratch volume cannot hold is shrunk to the
    * largest m that fits and the ACHIEVED miss probability
    * (1-(1-p)^cb)^m is reported back — recall degrades loudly (the
    * caller logs it), never by an OOD crash mid-soak. Returns
    * (chunks, chunkBits, achievedMiss). */
  def lshParamsForBudget(n: Long, threshold: Double, missTarget: Double,
      budgetBytes: Long): (Int, Int, Double) = {
    val (m0, cb) = lshAutoParams(n, threshold, missTarget)
    val mFit = math.max(2L, budgetBytes / (lshBandedRowBytes * math.max(1L, n)))
      .min(Int.MaxValue).toInt
    if (mFit >= m0) (m0, cb, missTarget)
    else {
      val p = math.acos(math.min(1.0, math.max(threshold, 0.9))) / math.Pi
      val q = math.pow(1 - p, cb)
      (mFit, cb, math.pow(1 - q, mFit))
    }
  }

  def embeddingCosinePairsLsh(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double, bits: Int = -1, chunkBits: Int = -1,
      rows: Long = -1L, seed: Long = 42L,
      missTarget: Double = 0.01, scratchBytes: Long = -1L): DataFrame = {
    require((bits > 0) == (chunkBits > 0),
      "bits and chunkBits must be specified together (or both left to auto)")
    // SUB-REGIME delegation: below cos ~0.7 a hyperplane bit agrees
    // with prob ≤0.75 for a true pair vs 0.5 for a random one — no
    // banding scheme prunes anything while keeping recall, and the
    // measured crossover agrees (at sf1 the exact grid beats every
    // LSH configuration at threshold 0.35). Auto mode therefore runs
    // the exact block-grid there: same output columns, recall 1.0 by
    // construction. Explicit bits/chunkBits keep the LSH path — the
    // caller asked for that specific configuration.
    if (bits <= 0 && threshold < 0.7)
      return embeddingCosinePairs(df, idCol, vecCol, threshold)
    val (chunks, cb) =
      if (bits > 0) {
        require(bits % chunkBits == 0, "chunkBits must divide bits")
        (bits / chunkBits, chunkBits)
      } else {
        val n = math.max(1L,
          if (rows > 0) rows
          else df.queryExecution.optimizedPlan.stats.rowCount
            .map(_.toLong).getOrElse(df.count()))
        // scratch-budget fit: the default config must COMPLETE on the
        // host it runs on. Budget = explicit param, else half the
        // usable space of the first shuffle-scratch dir (each executor
        // of a real cluster probes its own volume; local mode probes
        // the single host's). When the design-point chunk count does
        // not fit, shrink to the largest that does and log the
        // achieved recall target — never cap silently.
        val budget =
          if (scratchBytes > 0) scratchBytes
          else {
            val dir = df.sparkSession.conf.getOption("spark.local.dir")
              .orElse(sys.env.get("SPARK_LOCAL_DIRS"))
              .getOrElse(System.getProperty("java.io.tmpdir", "/tmp"))
            new java.io.File(dir.split(",").head).getUsableSpace / 2
          }
        val (m, cbFit, achieved) =
          lshParamsForBudget(n, threshold, missTarget, budget)
        if (achieved > missTarget)
          System.err.println(
            f"[graft] embeddingCosinePairsLsh: banded stream at the " +
              f"design point needs ${lshAutoParams(n, threshold, missTarget)._1}%d" +
              f" chunks x $n%d rows > scratch budget ${budget / (1L << 30)}%d GiB" +
              f" — capped to $m%d chunks; true-pair miss probability at " +
              f"cos ${math.max(threshold, 0.9)}%.2f relaxes to $achieved%.4f " +
              f"(pass scratchBytes or a lower missTarget to choose explicitly)")
        (m, cbFit)
      }
    // one independent cb-bit hyperplane family per chunk — seeds
    // decorrelated the same way lshTopK spaces its tables — plus ONE
    // 64-bit prefilter signature (its own family). The band join used
    // to carry the FULL m-chunk array on both sides to hamming-filter
    // candidates before the dedup shuffle; at corpus scale that array
    // IS the shuffle (m rows × m longs ≈ m²·8 bytes per document —
    // 34 GB at 1M vectors, measured 488 s at the sf10 soak). The
    // 8-byte proxy keeps the same protection (random collisions die
    // before any downstream shuffle) at 1/m the band-shuffle width:
    // the sf10 measure dropped to ~1/9 of the array-carrying plan.
    // planes exactly as the per-chunk hyperplaneSignature families
    // draw them (same seeds, same Gaussian sequence → bit-identical
    // signatures), evaluated by ONE compiled expression — the literal
    // per-plane chain (m·cb + 64 dot expressions) exceeds the 64 KB
    // codegen method limit at auto chunk counts, dropping the scan's
    // hottest projection to interpreted evaluation
    def planesFor(bits: Int, s: Long): Array[Array[Double]] = {
      val rnd = new java.util.Random(s)
      Array.fill(bits, dim)(rnd.nextGaussian())
    }
    val chunkPlanes = (0 until chunks).toArray
      .flatMap(j => planesFor(cb, seed + 7919L * j))
    val sigs = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      graft.functions.Sketches.hyperplaneSigs(col(vecCol), chunkPlanes,
        chunks, cb).as("sig"),
      element_at(graft.functions.Sketches.hyperplaneSigs(col(vecCol),
        planesFor(64, seed - 104729L), 1, 64), 1).as("sig64"))
    val chunked = sigs.select(col("id"), col("sig64"),
      posexplode(col("sig")).as(Seq("chunk", "chunk_val")))
    // Hamming prefilter bound: a pair at exactly `threshold` cosine
    // flips each of the 64 prefilter bits with p = acos(threshold)/π;
    // true pairs live within mean + 4σ of Binomial(64, p) (4σ keeps
    // the prefilter's own miss ≪ the banding design's 1%). Candidates
    // beyond that are (overwhelmingly) random bucket collisions —
    // dropped with ONE popcount inside the join probe, before the
    // dedup shuffle and the two vector-fetch joins, so the candidate
    // stream stays proportional to true pairs, not to bucket
    // occupancy² (the silent quadratic regrowth an LSH join can hide
    // at corpus scale).
    val p = math.acos(threshold) / math.Pi
    val h64 = math.min(64.0,
      math.ceil(64 * p + 4 * math.sqrt(64 * p * (1 - p)))).toInt
    // ONE materialization of the banded stream. The naive shape — a
    // (chunk, chunk_val) self-join of two RENAMED projections — wrote
    // the m·n-row banded stream to shuffle TWICE: the exchanges sat
    // ABOVE the differently-aliased projections, so their canonical
    // plans differ and ReuseExchange cannot unify them. At sf100 (8M
    // vectors, auto m = 73 chunks → 584M banded rows) the doubled
    // exchange exhausted the soak host's disk. (A groupBy/collect_list
    // bucket-gather was measured WORSE: partial aggregation wraps
    // every row in a one-element array buffer — ~2-3× the bytes.)
    // The fix is structural: repartition by the bucket key BELOW the
    // aliasing, so both join inputs are projections of the SAME
    // exchange — the join's distribution requirement is already
    // satisfied (projections preserve partitioning), planner inserts
    // no further exchanges, and ReuseExchange collapses the two
    // identical subtrees to one write + two reads.
    val parted = chunked.repartition(col("chunk"), col("chunk_val"))
    val l = parted.select(col("id").as("id_a"), col("sig64").as("s64_a"),
      col("chunk"), col("chunk_val"))
    val r = parted.select(col("id").as("id_b"), col("sig64").as("s64_b"),
      col("chunk"), col("chunk_val"))
    val candidates = l.hint("shuffle_hash")
      .join(r.hint("shuffle_hash"), Seq("chunk", "chunk_val"))
      .filter(col("id_a") < col("id_b") &&
        bit_count(col("s64_a").bitwiseXOR(col("s64_b"))) <= h64)
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    val vecs = sigs.select(col("id"), col("vec"))
    candidates
      .join(vecs.select(col("id").as("id_a"), col("vec").as("vec_a"))
        .hint("shuffle_hash"), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("vec").as("vec_b"))
        .hint("shuffle_hash"), "id_b")
      .withColumn("cos", Similarity.cosine(col("vec_a"), col("vec_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
  }

  /** Exact n-gram Jaccard similarity for all pairs above a threshold —
    * the quadratic ground truth (use on samples; LSH is the scale path).
    * Computed by exploding shingles and joining on shingle hash, so the
    * join is O(shared shingles), not O(pairs).
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3, threshold: Double = 0.5): DataFrame = {
    val docs = df.select(col(idCol).as("doc_id"),
        shingleHashes(col(textCol), shingleSize).as("sh"))
      .withColumn("n_sh", size(col("sh")))
    val ex = docs.select(col("doc_id"), col("n_sh"), explode(col("sh")).as("s"))
    val l = ex.select(col("doc_id").as("id_a"), col("n_sh").as("n_a"), col("s"))
    val r = ex.select(col("doc_id").as("id_b"), col("n_sh").as("n_b"), col("s"))
    // shuffle-hash + ReuseExchange: the exploded shingle stream is
    // shuffled once and read twice (see minhashLsh)
    l.hint("shuffle_hash").join(r.hint("shuffle_hash"), "s")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"), first(col("n_a")).as("n_a"),
        first(col("n_b")).as("n_b"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Benchmark decontamination (GPT-3 appendix C style): flag corpus
    * documents sharing any word n-gram with a benchmark/eval set.
    *
    * Scale shape: the benchmark is small — its distinct grams BROADCAST;
    * the corpus explodes its grams map-side and semi-joins the broadcast
    * set, so the 100 TB side never shuffles. Only the matched
    * (doc, gram) slivers reach the final distinct-count exchange.
    * Grams are compared as strings here so an SQL oracle can replay the
    * check exactly; swap in [[shingleHashes]] for production wire size.
    */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 13): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val benchGrams = benchmark
      .select(explode(TextAnalysis.wordNgrams(lower(col(benchTextCol)), n)).as("g"))
      .distinct()
    val docGrams = docs.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.wordNgrams(lower(col(textCol)), n)).as("g"))
    docGrams.join(broadcast(benchGrams), "g")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("g")).as("hits"))
  }

  /** Decontamination scale path for when the BENCHMARK side is itself
    * too large to broadcast as a hash set: a distributed-built Bloom
    * filter over the benchmark grams (`df.stat.bloomFilter`, built via
    * treeAggregate — benchmark never collects) probes the exploded
    * corpus grams AT SCAN SPEED (`Sketches.BloomProbe`, codegen'd;
    * the filter is megabytes for hundreds of millions of grams at 0.1%
    * fpp). Only the surviving sliver shuffles into the exact verify
    * join, which removes the false positives — so the result is
    * IDENTICAL to [[decontaminate]] while the corpus-sized gram stream
    * never reaches an exchange. */
  def decontaminateBloom(docs: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 13,
      fpp: Double = 0.001): DataFrame = {
    val benchGrams = benchmark
      .select(explode(TextAnalysis.wordNgrams(lower(col(benchTextCol)), n)).as("g"))
      .distinct()
      .localCheckpoint(eager = true) // built once, read twice (filter + verify)
    val expected = math.max(benchGrams.count(), 1L)
    val bloom = benchGrams.stat.bloomFilter("g", expected, fpp)
    val docGrams = docs.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.wordNgrams(lower(col(textCol)), n)).as("g"))
      .filter(graft.functions.Sketches.bloomProbe(col("g"), bloom))
    docGrams.join(benchGrams, "g")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("g")).as("hits"))
  }

  /** SEMANTIC decontamination (FineWeb/embedding-space posture): flag
    * corpus items whose embedding lies within cosine `threshold` of
    * ANY benchmark/eval item. The benchmark set is eval-sized by
    * contract, so its vectors ship in the compiled expression
    * ([[graft.functions.Sketches.maxCosine]]) — ONE map-side scan
    * pass over the corpus, no join, no shuffle, exactly the
    * decontamination analog of semDedup's centroid assignment. For
    * benchmark sets beyond closure size, compose
    * [[Similarity.lshTopK]]/[[Similarity.ivfTopK]] with the corpus as
    * queries instead. */
  def decontaminateEmbedding(corpus: DataFrame, idCol: String,
      vecCol: String, benchmark: DataFrame, benchVecCol: String,
      threshold: Double): DataFrame = {
    val refs: Array[Array[Double]] = benchmark
      .select(col(benchVecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(refs.nonEmpty, "empty benchmark set")
    corpus.select(col(idCol).as("doc_id"),
        round(graft.functions.Sketches.maxCosine(col(vecCol), refs), 4)
          .as("max_cos"))
      .withColumn("contaminated", col("max_cos") >= threshold)
  }

  /** Exact segment-level dedup (C4 / RefinedWeb style): documents are
    * cut into disjoint `segWords`-word segments, a segment that appears
    * more than `maxOccurrences` times corpus-wide is dropped from every
    * document, and the per-document damage report comes back as exact
    * integers (segments kept/dropped, tokens kept).
    *
    * Scale shape: segments explode map-side from a materialized word
    * array (an attribute, so the split is never re-evaluated per
    * segment); the corpus-wide count is one hash aggregation keyed by
    * the segment text; the flagged-segment set joins back BROADCAST —
    * in real corpora the over-duplicated set is a sliver of the gram
    * space, so the 100 TB exploded stream never shuffles for the join.
    * Segments are compared as strings so the SQL oracle replays the
    * whole pass exactly; production can key on xxhash64(segment).
    */
  def dedupSegments(docs: DataFrame, idCol: String, textCol: String,
      segWords: Int, maxOccurrences: Long): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val ws = filter(split(col(textCol), "\\s+"), w => length(w) > 0)
    // ws is materialized as an attribute before the transform so the
    // whitespace split runs once per doc, not once per segment
    val segs = docs
      .select(col(idCol).as("doc_id"), ws.as("ws"))
      .filter(size(col("ws")) > 0)
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(0),
            floor((size(col("ws")) - 1) / lit(segWords.toDouble)).cast("int")),
          i => array_join(slice(col("ws"), i * segWords + 1, lit(segWords)), " ")))
          .as("seg"))
      .withColumn("seg_tk", size(split(col("seg"), " ")).cast("long"))
    val flagged = segs.groupBy(col("seg"))
      .agg(count(lit(1)).as("occ"))
      .filter(col("occ") > maxOccurrences)
      .select(col("seg"), lit(true).as("dup"))
    // flagged is usually the tiny duplicated sliver — but it is
    // corpus-proportional in the worst case, so the planner (AQE
    // runtime upgrade) picks broadcast when it truly is small instead
    // of a hint forcing it past the 8 GiB cap on a pathological corpus
    segs.join(flagged, Seq("seg"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segments"),
        sum(when(col("dup"), 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("dup"), 0L).otherwise(col("seg_tk"))).as("tokens_kept"))
  }
}
