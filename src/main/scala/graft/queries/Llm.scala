package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Mixture, Multimodal, Packing, Similarity, TextAnalysis}
import graft.sources.Tables

/** Training-data pipeline operators over the documents/embeddings
  * corpus: deduplication (exact / MinHash-LSH / SimHash / exact n-gram
  * Jaccard), embedding similarity search (brute force + LSH), text
  * analysis and multimodal plumbing.
  *
  * Oracle strategy: everything DuckDB can recompute exactly gets a SQL
  * oracle (exact dedup, n-gram jaccard via shingle explode+join, brute
  * force cosine via DOUBLE[] list functions, token/char stats,
  * multimodal byte metadata). Signature-based ops (minhash/simhash/LSH
  * buckets) are hash-function-specific → rows-only gate here, recall
  * cross-checked against the exact result in LlmSpec.
  */
object Llm {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Shared operator invocations: the SAME closure feeds both the
    * verdict-wrapped `defs` entry (correctness sweep) and [[benchOnly]]
    * (throughput), so operator parameters CANNOT drift between what the
    * oracle verifies and what the bench times. */
  private val simhashOp: (SparkSession, String) => DataFrame = (s, d) =>
    Dedup.simhashDup(t(s, d, "documents"), "text", "doc_id",
      maxDist = 5, chunkBits = 8)
  /** In-regime near-dup fixture for the embedding-LSH path: the
    * corpus unioned with a deterministic perturbed copy of itself
    * (first component × 1.5, ids shifted by 10⁷). For ANY vector the
    * original↔perturbed cosine is (1+t/2)/√(1+1.25t) with
    * t = e₁²/‖v‖² ∈ [0,1], whose minimum is 0.9798 — every copy pair
    * is in the near-dup regime by construction, all cross pairs stay
    * at corpus background (≤~0.5), and DuckDB replays the perturbation
    * exactly. */
  private def perturbedUnion(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding")).unionByName(
      emb.select((col("vec_id") + 10000000L).as("vec_id"),
        concat(
          array((element_at(col("embedding"), 1) * lit(1.5f)).cast("float")),
          slice(col("embedding"), 2, 10000)).as("embedding")))

  private val embeddingLshOp: (SparkSession, String) => DataFrame = (s, d) =>
    Dedup.embeddingCosinePairsLsh(perturbedUnion(t(s, d, "embeddings")),
      "vec_id", "embedding", dim = 64, threshold = 0.9)
  private def annCorpus(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val emb = t(s, d, "embeddings")
    (emb, emb.filter(col("vec_id") < 10))
  }
  // radius 3 (≤3 flipped bits of 10) keeps the recall gate clear of
  // its 0.5 threshold on every testdata generation — radius 2 sat
  // right at the margin (one query at sf0.001 recalled 2/5)
  private val lshTopKOp: (SparkSession, String) => DataFrame = (s, d) => {
    val (emb, qs) = annCorpus(s, d)
    Similarity.lshTopK(emb, qs, k = 5, dim = 64, bits = 10,
      probeRadius = 3, tables = 8)
  }
  private val ivfTopKOp: (SparkSession, String) => DataFrame = (s, d) => {
    val (emb, qs) = annCorpus(s, d)
    Similarity.ivfTopK(emb, qs, k = 5, nlist = 16, nprobe = 6)
  }
  private val pqTopKOp: (SparkSession, String) => DataFrame = (s, d) => {
    val (emb, qs) = annCorpus(s, d)
    Similarity.pqTopK(emb, qs, k = 5, dim = 64, m = 16, ksub = 32, refine = 8)
  }

  /** Operator-only plans for [[graft.Bench]]. The correctness entries
    * for these keys wrap the operator in an in-plan truth + verdict
    * harness — right for the oracle gate, wrong for timing, because the
    * harness also computes the (sometimes quadratic) exact truth in the
    * same plan. Bench times THESE; Verify keeps the verdict-wrapped
    * `queries` entries. Each value IS the closure the `queries` entry
    * wraps, so the parameters are shared by construction.
    */
  val benchOnly: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_dedup_simhash" -> simhashOp,
    "llm_dedup_embedding_lsh" -> embeddingLshOp,
    // scale-honest configuration: AUTO cell count (~64-row cells —
    // linear Σ|cell|²). The correctness query pins nCells=8 so the
    // oracle can replay the centroid draw exactly; a fixed cell count
    // is quadratic by construction and belongs to the gate, not the
    // throughput number.
    "llm_dedup_semantic" -> ((s, d) =>
      graft.operators.Dedup.semDedup(t(s, d, "embeddings"), "vec_id",
        "embedding", nCells = -1, tau = 0.35, salt = "sd1")),
    "llm_sim_lsh" -> lshTopKOp,
    "llm_sim_ivf" -> ivfTopKOp,
    "llm_sim_pq" -> pqTopKOp)

  /** Per-query ANN quality verdict, computed in-plan: join the ANN
    * top-k against the brute-force top-k, emit each query's exact
    * top-1 cosine (oracle-recomputable) and whether recall clears
    * `gate`. An equality-only comparator becomes a tolerance gate: a
    * broken index flips the verdict column and fails the hash compare.
    */
  private def annRecallVerdict(ann: DataFrame, exact: DataFrame,
      gate: Double): DataFrame = {
    val hits = ann.select(col("query_id"), col("item_id"))
      .join(exact.select(col("query_id"), col("item_id")),
        Seq("query_id", "item_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
    exact.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"), max(col("cos")).as("top1_cos"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("top1_cos"),
        (coalesce(col("n_hit"), lit(0L)) >= col("n_exact") * gate)
          .as("recall_ok"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup by full text: canonical id + duplicate count.
    "llm_dedup_exact" -> ((s, d) =>
      Dedup.exact(t(s, d, "documents"), Seq("text"), "doc_id")
        .groupBy().agg(count(lit(1)).as("n_unique"),
          sum(col("dup_count")).as("n_docs"),
          min(col("doc_id")).as("min_id"))),

    // Text normalization for dedup keys: case/punct/whitespace folding
    // in one codegen'd projection.
    "llm_text_normalize" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        graft.operators.TextAnalysis.normalizeText(
          concat(upper(col("text")), lit("  Mixed, PUNCT!! end.  ")))
          .as("norm"))),

    // Connected components over a dup-pair edge list: near-dup PAIRS →
    // dedup CLUSTERS (transitive closure). Deterministic star+chain
    // topology over doc_ids so the oracle (a recursive CTE) replicates
    // the multi-hop merges exactly.
    "llm_dedup_clusters" -> ((s, d) => {
      val ids = t(s, d, "documents").select(col("doc_id"))
      val stars = ids.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id").as("a"),
          (col("doc_id") - col("doc_id") % 7).as("b"))
      val links = ids.filter(col("doc_id") % 21 === 0)
        .select(col("doc_id").as("a"), (col("doc_id") + 7).as("b"))
      Dedup.connectedComponents(stars.union(links), "a", "b")
        .groupBy(col("component"))
        .agg(count(lit(1)).as("n_members"))
        .select(col("component").cast("long").as("component"),
          col("n_members"))
    }),

    // Leakage-safe split: assignment by near-dup cluster (same synthetic
    // component fixture as llm_dedup_clusters), so no cluster straddles
    // train/validation; md5-threshold rule replayed by the oracle.
    "llm_split_leakage_safe" -> ((s, d) => {
      val ids = t(s, d, "documents").select(col("doc_id"))
      val stars = ids.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id").as("a"),
          (col("doc_id") - col("doc_id") % 7).as("b"))
      val links = ids.filter(col("doc_id") % 21 === 0)
        .select(col("doc_id").as("a"), (col("doc_id") + 7).as("b"))
      Mixture.leakageSafeSplit(ids, "doc_id", stars.union(links),
          "a", "b", valFraction = 0.2)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          count_distinct(col("split_key")).as("n_clusters"))
    }),

    // Exact n-gram Jaccard near-dup pairs (quadratic ground truth).
    "llm_dedup_ngram" -> ((s, d) =>
      Dedup.ngramJaccardPairs(t(s, d, "documents"), "text", "doc_id",
        shingleSize = 3, threshold = 0.5)),

    // MinHash+LSH near-dup pairs. The output pairs carry EXACT n-gram
    // Jaccard (LSH only proposes candidates), so the oracle is the
    // full exact-Jaccard pair list at the same threshold, compared
    // pair-for-pair, value-for-value. Bands: 32×4 — at the 0.8
    // threshold a true pair misses all bands with prob (1-0.8⁴)³² ≈
    // 5e-8, so recall is structural at ANY corpus size (the round-10
    // sf10 soak caught the old 16×8 scheme dropping 1 of 2560 true
    // pairs — a borderline j≈0.8 pair loses that coin flip ~5% of the
    // time; wider-band candidate volume stays bounded because only
    // j≳0.5 pairs collide on 4-row bands with non-trivial rate and the
    // exact-Jaccard filter discards them).
    "llm_dedup_minhash" -> ((s, d) =>
      Dedup.minhashLsh(t(s, d, "documents"), "text", "doc_id",
        shingleSize = 3, numHashes = 128, bands = 32, threshold = 0.8)),

    // SimHash near-dup detection, driver-verified through an in-plan
    // verdict: the hamming-ball pairs are joined against the exact
    // Jaccard truth (computed in the same plan); the oracle pins the
    // truth count and the expected precision/recall verdicts. Hash
    // values themselves stay engine-specific.
    "llm_dedup_simhash" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val found = simhashOp(s, d).select(col("id_a"), col("id_b"))
      val truth = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        shingleSize = 3, threshold = 0.8).select(col("id_a"), col("id_b"))
      found.withColumn("f", lit(1L))
        .join(truth.withColumn("t", lit(1L)), Seq("id_a", "id_b"), "full")
        .agg(sum(col("t")).as("n_true_pairs"),
          sum(when(col("f") === 1 && col("t") === 1, 1L)).as("n_hit"),
          sum(when(col("f") === 1 && col("t").isNull, 1L)).as("n_false"))
        .select(col("n_true_pairs"),
          (coalesce(col("n_false"), lit(0L)) === 0).as("all_found_are_dups"),
          (coalesce(col("n_hit"), lit(0L)) >=
            col("n_true_pairs") * 0.5).as("recall_ok"))
    }),

    // Brute-force cosine top-5 for 10 query vectors — exact baseline.
    "llm_sim_bruteforce" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
    }),

    // LSH-bucketed ANN (8 independent hash tables, 2-bit multiprobe —
    // ~5% of buckets probed per table), driver-verified through an
    // in-plan recall verdict against the brute-force truth: the oracle
    // recomputes each query's exact top-1 cosine and neighbor count
    // independently and pins the expected per-query recall verdict.
    "llm_sim_lsh" -> ((s, d) => {
      val (emb, qs) = annCorpus(s, d)
      annRecallVerdict(lshTopKOp(s, d),
        Similarity.bruteForceTopK(emb, qs, k = 5), 0.5)
    }),

    // Embedding-cosine near-dup pairs: exact block-grid pair join (no
    // corpus broadcast, no cross join — n·B shuffle, grid-cell tasks).
    "llm_dedup_embedding" -> ((s, d) =>
      Dedup.embeddingCosinePairs(t(s, d, "embeddings"), "vec_id", "embedding", 0.35)),

    // Sub-quadratic LSH for the high-similarity near-dup regime,
    // exercised IN its regime: the corpus unions with a deterministic
    // perturbed copy (every copy pair lands at cos ≥ 0.9798 by
    // construction, cross pairs stay at background), threshold 0.9.
    // In-plan verdict against the exact block-grid: precision is
    // exact-verified by construction, recall gated at 0.95 — the auto
    // sizing's ≤1% design-point miss bound holds with margin at every
    // corpus size, which is exactly what this query now proves.
    "llm_dedup_embedding_lsh" -> ((s, d) => {
      val corpus2 = perturbedUnion(t(s, d, "embeddings"))
      val found = embeddingLshOp(s, d).select(col("id_a"), col("id_b"))
      val exact = Dedup.embeddingCosinePairs(corpus2, "vec_id", "embedding", 0.9)
        .select(col("id_a"), col("id_b"))
      found.withColumn("f", lit(1L))
        .join(exact.withColumn("t", lit(1L)), Seq("id_a", "id_b"), "full")
        .agg(sum(col("t")).as("n_exact_pairs"),
          sum(when(col("f") === 1 && col("t") === 1, 1L)).as("n_hit"),
          sum(when(col("f") === 1 && col("t").isNull, 1L)).as("n_false"))
        .select(col("n_exact_pairs"),
          (coalesce(col("n_false"), lit(0L)) === 0).as("precision_ok"),
          (coalesce(col("n_hit"), lit(0L)) >=
            col("n_exact_pairs") * 0.95).as("recall_ok"))
    }),

    // IVF-partitioned ANN (FAISS-style nlist/nprobe) — the third scale
    // path; same in-plan recall verdict, oracle-pinned.
    "llm_sim_ivf" -> ((s, d) => {
      val (emb, qs) = annCorpus(s, d)
      annRecallVerdict(ivfTopKOp(s, d),
        Similarity.bruteForceTopK(emb, qs, k = 5), 0.55)
    }),

    // PQ-ADC search (Jégou 2011 / FAISS IndexPQ+refine): the corpus
    // scans as m-byte codes (m table adds per pair), the refine·k ADC
    // survivors re-rank by exact cosine after an id-only vector fetch.
    "llm_sim_pq" -> ((s, d) => {
      val (emb, qs) = annCorpus(s, d)
      annRecallVerdict(pqTopKOp(s, d),
        Similarity.bruteForceTopK(emb, qs, k = 5), 0.4)
    }),

    // Token counting: whitespace + subword estimate.
    "llm_text_tokens" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          TextAnalysis.subwordCountEstimate(col("text")).as("n_subwords"))),

    // Unigram-frequency scoring (the CCNet "LM perplexity" stage with
    // a corpus-trained unigram model): exact-integer outputs so the
    // compare is bit-stable; see TextAnalysis.unigramStats.
    "llm_unigram_stats" -> ((s, d) =>
      TextAnalysis.unigramStats(t(s, d, "documents"))
        .orderBy("doc_id")),

    // Boilerplate-line removal (RefinedWeb/CCNet line dedup): exact
    // 5-word lines repeated >= 3 times across the corpus are dropped;
    // the corpus never shuffles (hot set broadcast, map-side rebuild).
    "llm_boilerplate_lines" -> ((s, d) =>
      TextAnalysis.removeBoilerplateLines(t(s, d, "documents"))
        .orderBy("doc_id")),

    // Quality scoring components (ratios are engine-portable: counts
    // divided by counts, rounded).
    "llm_text_quality" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          round(TextAnalysis.punctRatio(col("text")), 4).as("punct_ratio"),
          round(TextAnalysis.meanWordLen(col("text")), 4).as("mean_word_len"),
          TextAnalysis.qualityScore(col("text")).as("quality"))),

    // The training-data pipeline composed end-to-end: quality gate →
    // exact dedup (keep lowest doc_id per identical text) → corpus
    // token budget. Every stage is a declarative plan, so the whole
    // pipeline is ONE Catalyst-optimized job — quality filter and
    // column pruning reach the scan, dedup is a single hash-agg.
    "llm_pipeline_e2e" -> ((s, d) => {
      val gated = t(s, d, "documents")
        .filter(TextAnalysis.qualityScore(col("text")) >= 0.5)
      val deduped = Dedup.exact(gated, Seq("text"), "doc_id")
      deduped.agg(
        count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text"))).as("total_tokens"),
        min(col("doc_id")).as("min_id"))
    }),

    // Exact segment dedup (C4/RefinedWeb): disjoint 10-word segments,
    // drop any segment occurring >2 times corpus-wide; per-doc damage
    // report in exact integers, row-level oracle.
    "llm_dedup_segments" -> ((s, d) =>
      Dedup.dedupSegments(t(s, d, "documents"), "doc_id", "text",
        segWords = 10, maxOccurrences = 2)),

    // Full pretrain-layout pipeline: quality gate → weighted source
    // mixture (src0 ×2, src1 ×0.5) → greedy 512-token packing over
    // (doc,epoch) buckets. Per-bucket pack counts / token sums / padding
    // waste come out as exact integers; the oracle recomposes the three
    // proven stages (quality SQL, mixture unnest, packing recursion).
    "llm_pipeline_pretrain" -> ((s, d) => {
      val gated = t(s, d, "documents")
        .filter(TextAnalysis.qualityScore(col("text")) >= 0.5)
        .select(col("doc_id"), col("source"),
          TextAnalysis.tokenCount(col("text")).as("tokens"))
      val mixed = Mixture.weightedMixture(gated, "source", Seq("doc_id"),
        Map("src0" -> 2.0, "src1" -> 0.5))
      val keyed = mixed
        .withColumn("bucket", pmod(col("doc_id") * 7 + col("epoch"), lit(8)))
        .withColumn("ord", col("doc_id") * 4 + col("epoch"))
      Packing.packSequences(keyed, "bucket", "ord", "tokens", budget = 512)
        .groupBy(col("bucket"), col("pack_id"))
        .agg(count(lit(1)).as("nd"), sum(col("tokens")).as("tk"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_packs"), sum(col("nd")).as("n_docs"),
          sum(col("tk")).as("token_sum"),
          sum(greatest(lit(512L) - col("tk"), lit(0L))).as("padding"))
    }),

    // Benchmark decontamination (GPT-3 appendix C): flag corpus docs
    // sharing any word 5-gram with the benchmark set (docs ≡ 0 mod 97
    // as the eval stand-in). Benchmark grams broadcast; the corpus
    // side never shuffles.
    "llm_decontaminate" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val bench = docs.filter(col("doc_id") % 97 === 0)
      Dedup.decontaminate(docs, "doc_id", "text", bench, "text", n = 5)
    }),

    // Bloom-filter scale path: identical result to llm_decontaminate
    // (same oracle), but the corpus gram stream is pruned at scan
    // speed by a distributed-built Bloom filter before the exact
    // verify join — the shape that survives a benchmark suite too
    // large to broadcast as a set.
    "llm_decontaminate_bloom" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val bench = docs.filter(col("doc_id") % 97 === 0)
      Dedup.decontaminateBloom(docs, "doc_id", "text", bench, "text", n = 5)
    }),

    // SEMANTIC decontamination: flag corpus embeddings within cosine
    // 0.35 of any eval-set embedding. The eval set (vec_id < 20) ships
    // in the compiled max-cosine expression — one map-side scan pass,
    // no join, no shuffle (the embedding analog of the n-gram path).
    "llm_decontaminate_semantic" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Dedup.decontaminateEmbedding(
        emb.filter(col("vec_id") >= 20), "vec_id", "embedding",
        emb.filter(col("vec_id") < 20), "embedding", threshold = 0.35)
    }),

    // Gopher repetition filters (Rae et al. §A1.1): duplicate-segment
    // and top-bigram character fractions, one codegen'd pass. Segment
    // boundaries injected deterministically ('the' → '.') since the
    // synthetic corpus has no sentence punctuation.
    "llm_text_repetition" -> ((s, d) => {
      val seg = regexp_replace(col("text"), "\\bthe\\b", ".")
      t(s, d, "documents").select(col("doc_id"),
          TextAnalysis.repetitionStats(seg).as("r"))
        .select(col("doc_id"),
          col("r.dup_seg_frac").as("dup_seg_frac"),
          col("r.dup_seg_char_frac").as("dup_seg_char_frac"),
          col("r.top_bigram_char_frac").as("top_bigram_char_frac"))
    }),

    // Temperature-flattened mixture (mT5 α-sampling): rare sources
    // upweighted via n^α shares; md5-threshold selection, map-side.
    "llm_mixture_temperature" -> ((s, d) =>
      Mixture.temperatureMixture(t(s, d, "documents"), "source",
        Seq("doc_id"), alpha = 0.5, budget = 300L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_selected"))),

    // Semantic dedup (SemDeDup): deterministic md5-sampled centroids,
    // map-side assignment, within-cell near-dup drop — the oracle
    // replays centroids, assignment and the drop rule exactly.
    "llm_dedup_semantic" -> ((s, d) =>
      Dedup.semDedup(t(s, d, "embeddings"), "vec_id", "embedding",
        nCells = 8, tau = 0.35, salt = "sd1")),

    // Sliding context-window chunking (tokenizer stride): 40-word
    // windows every 30 words, overlap 10 — map-side only, no shuffle.
    "llm_chunk_windows" -> ((s, d) =>
      Packing.chunkWindows(t(s, d, "documents"), "doc_id", "text",
        window = 40, stride = 30)),

    // Deterministic weighted sampling (Efraimidis–Spirakis A-Res):
    // selection ∝ n_chars via content-hash exponential clocks; one
    // scan + top-k, reproduced exactly by the oracle.
    "llm_weighted_sample" -> ((s, d) =>
      Mixture.weightedSample(t(s, d, "documents"), k = 50,
        idCol = "doc_id", weightCol = "n_chars", salt = "ws1")
        .select(col("doc_id"), col("source"), col("n_chars"))),

    // Exact repeated-span removal (Lee et al. 2021 ExactSubstr): any
    // 8-word span occurring ≥2 times corpus-wide drops from every doc.
    // One gram-count shuffle (longs, map-side combined); the rebuild
    // pass never shuffles the corpus.
    "llm_dedup_spans" -> ((s, d) =>
      TextAnalysis.removeRepeatedSpans(t(s, d, "documents"),
        k = 8, minOccurrences = 2L)),

    // Full Gopher §A1.1 rule set (Rae et al. 2021): all raw counts in
    // one compiled scan-speed pass (exact integers, no shuffle) + the
    // standard accept decision. The oracle independently re-derives
    // every count from the pinned cross-engine definitions.
    "llm_gopher_rules" -> ((s, d) => {
      val stats = TextAnalysis.gopherStats(col("text"))
      t(s, d, "documents").select(col("doc_id"), stats.as("g"))
        .select(col("doc_id"),
          col("g.n_words").as("n_words"),
          col("g.word_len_sum").as("word_len_sum"),
          col("g.n_alpha_words").as("n_alpha_words"),
          col("g.n_stop_hits").as("n_stop_hits"),
          col("g.n_lines").as("n_lines"),
          col("g.n_bullet_lines").as("n_bullet_lines"),
          col("g.n_ellipsis_lines").as("n_ellipsis_lines"),
          col("g.n_hash").as("n_hash"),
          col("g.n_ellipsis").as("n_ellipsis"),
          TextAnalysis.gopherPass(col("g")).as("gopher_pass"))
    }),

    // PII redaction: emails/IPv4/phone-runs → typed tokens + counts
    // (PII synthesized onto the corpus so both engines see the same
    // input). RE2-safe patterns, scan-speed rewrite.
    "llm_pii_redact" -> ((s, d) => {
      val withPii = t(s, d, "documents").select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com from 10.0."), (col("doc_id") % 256).cast("string"),
          lit(".7")).as("text"))
      withPii.select(col("doc_id"),
        TextAnalysis.redactPii(col("text")).as("redacted"),
        TextAnalysis.piiCounts(col("text")).getField("emails").as("emails"),
        TextAnalysis.piiCounts(col("text")).getField("ips").as("ips"))
    }),

    // Language-ID heuristic — corpus text is synthetic English-ish, so
    // the interesting assertions live in LlmSpec on real multilingual
    // fixtures; here the distribution is the smoke surface.
    "llm_text_langid" -> ((s, d) =>
      t(s, d, "documents")
        .select(TextAnalysis.langId(col("text")).as("pred_lang"))
        .groupBy(col("pred_lang")).agg(count(lit(1)).as("cnt"))),

    // Document fingerprint: min-k sketch over word 4-gram hashes, in
    // the portable md5 form so the DuckDB oracle recomputes the exact
    // sketch (the xxhash64 hot-path form keeps its LlmSpec coverage).
    "llm_text_fingerprint" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.portableFingerprint(col("text")).as("fp"))
        .groupBy().agg(count_distinct(col("fp")).as("n_fingerprints"),
          count(lit(1)).as("n_docs"))),

    // Multimodal plumbing: binary payload + stubbed batched decode;
    // byte_len is real (UTF-8 length) and oracle-checked.
    "llm_multimodal_meta" -> ((s, d) => {
      val withBin = Multimodal.withBinaryPayload(
        t(s, d, "documents").select(col("doc_id"), col("text")), "text", "payload")
      Multimodal.decodeMeta(withBin, "payload", "meta")
        .select(col("doc_id"), col("meta.byte_len").as("byte_len"))
    }),

    // Frame sampling: one row per fixed-size frame of the payload
    // (video frame-sample plumbing; slice → decode-at-offset in prod).
    "llm_multimodal_frames" -> ((s, d) => {
      val withBin = Multimodal.withBinaryPayload(
        t(s, d, "documents").filter(col("doc_id") < 200)
          .select(col("doc_id"), col("text")), "text", "payload")
      Multimodal.sampleFrames(withBin, "payload", 64)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_frames"))
    }),

    // Resize plumbing: payload scaled to a byte budget derived from the
    // target dims (stub scaler, real batched pass + schema contract).
    "llm_multimodal_resize" -> ((s, d) => {
      val withBin = Multimodal.withBinaryPayload(
        t(s, d, "documents").filter(col("doc_id") < 200)
          .select(col("doc_id"), col("text")), "text", "payload")
      Multimodal.resize(withBin, "payload", width = 32, height = 32)
        .select(col("doc_id"), length(col("resized")).cast("long").as("resized_len"))
    }),

    // Codec-backed decode chain on REAL PNG fixtures: synthesize a
    // solid-gray PNG per doc (true encoder bytes, dims derived from
    // doc_id), probe its header, bilinear-resize through the codec,
    // probe the output header, and extract pixel features. Every column
    // is analytically known: input dims from the doc_id formulas,
    // output dims = the resize target, features = gray/255 - 0.5.
    "llm_multimodal_decode" -> ((s, d) => {
      val specs = t(s, d, "documents").filter(col("doc_id") < 50)
        .select(col("doc_id"),
          (lit(8) + pmod(col("doc_id"), lit(23))).cast("int").as("w"),
          (lit(8) + pmod(col("doc_id") * 7, lit(17))).cast("int").as("h"),
          pmod(col("doc_id") * 37, lit(256)).cast("int").as("g"))
      val png = Multimodal.synthesizePng(specs, "w", "h", "g")
      val pin = Multimodal.decodeMeta(png, "payload", "m_in")
      val rs = Multimodal.resize(pin, "payload", width = 32, height = 24)
      val pout = Multimodal.decodeMeta(rs, "resized", "m_out")
      val feats = Multimodal.extractFeatures(pout, "resized", 16)
      feats.select(col("doc_id"),
        col("m_in.width").as("in_w"), col("m_in.height").as("in_h"),
        col("m_in.codec").as("in_codec"),
        col("m_out.width").as("out_w"), col("m_out.height").as("out_h"),
        col("m_out.codec").as("out_codec"),
        round(element_at(col("vec"), 1).cast("double"), 4).as("f0"),
        round(element_at(col("vec"), 16).cast("double"), 4).as("f15"))
    }),

    // REAL audio pipeline over javax.sound.sampled: synthesize a
    // square-wave WAV per doc (true WAVE encoder bytes, amplitude and
    // duration derived from doc_id), probe the container header, and
    // extract per-block RMS waveform features from decoded PCM. Every
    // column is analytically known: a ±v square wave has |sample| =
    // amp/256 exactly, so every block RMS = amp/256; duration_ms =
    // dur_ms by construction (8 frames/ms at 8 kHz, header math exact).
    "llm_multimodal_audio" -> ((s, d) => {
      val specs = t(s, d, "documents").filter(col("doc_id") < 50)
        .select(col("doc_id"),
          pmod(col("doc_id") * 37, lit(256)).cast("int").as("amp"),
          (lit(100) + pmod(col("doc_id") * 11, lit(400))).cast("int").as("dur_ms"))
      val wav = Multimodal.synthesizeWav(specs, "amp", "dur_ms")
      val meta = Multimodal.decodeMeta(wav, "payload", "m")
      val feats = Multimodal.extractFeatures(meta, "payload", 8)
      feats.select(col("doc_id"),
        col("m.codec").as("codec"),
        col("m.duration_ms").as("dur_decoded"),
        round(element_at(col("vec"), 1).cast("double"), 4).as("rms0"),
        round(element_at(col("vec"), 8).cast("double"), 4).as("rms7"))
    }),

    // REAL video pipeline over MJPEG-in-AVI: synthesize a true AVI
    // container (solid-gray JPEG frames through the real encoder, dims
    // and frame counts derived from doc_id), probe the container
    // header (exact math), and decode every frame through the real
    // JPEG codec. Counts and durations are exact; JPEG is lossy, so
    // mean luminance verifies within ±8/255 as an in-plan verdict.
    "llm_multimodal_video" -> ((s, d) => {
      val specs = t(s, d, "documents").filter(col("doc_id") < 30)
        .select(col("doc_id"),
          (lit(16) + pmod(col("doc_id"), lit(9))).cast("int").as("w"),
          (lit(16) + pmod(col("doc_id") * 5, lit(7))).cast("int").as("h"),
          pmod(col("doc_id") * 37, lit(256)).cast("int").as("g"),
          (lit(2) + pmod(col("doc_id"), lit(4))).cast("int").as("nf"))
      val avi = Multimodal.synthesizeAviMjpeg(specs, "w", "h", "g", "nf")
      val meta = Multimodal.decodeMeta(avi, "payload", "m")
      val stats = Multimodal.videoStats(meta, "payload")
      stats.select(col("doc_id"),
        col("m.codec").as("codec"),
        col("m.width").as("hdr_w"), col("m.height").as("hdr_h"),
        col("m.duration_ms").as("hdr_ms"),
        col("frames_decoded").cast("long").as("n_frames"),
        col("video_ms").as("decoded_ms"),
        (abs(col("mean_luma") - col("g")) <= 8.0).as("luma_ok"))
    }),

    // Sequence packing (sample packing for pretraining): whole docs
    // greedily fill 512-token context windows, bucketed for parallelism
    // (bucket = doc_id % 8 here so the oracle can re-derive it; xxhash64
    // buckets in production). Per-pack doc counts and token sums are
    // deterministic integers, recomputed by a recursive-CTE oracle.
    "llm_pack_sequences" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("tokens"))
        .withColumn("bucket", pmod(col("doc_id"), lit(8)))
      Packing.packSequences(docs, "bucket", "doc_id", "tokens", budget = 512)
        .groupBy(col("bucket"), col("pack_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tokens")).as("token_sum"),
          max(col("pack_pos")).as("max_pos"))
    }),

    // Weighted source mixture: src0 upsampled 2.5× (2 full epochs + a
    // half-sampled third), src1 downsampled to 0.3, everything else
    // passes through once. Shuffle-free map-side transform; the md5
    // epoch-sampling decision is replayed exactly by the oracle.
    "llm_mixture_weights" -> ((s, d) =>
      Mixture.weightedMixture(
          t(s, d, "documents").select(col("doc_id"), col("source")),
          "source", Seq("doc_id"),
          Map("src0" -> 2.5, "src1" -> 0.3))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_rows"),
          count_distinct(col("doc_id")).as("n_docs"),
          count_distinct(col("epoch")).as("n_epochs"))),

    // Deterministic shard shuffle (training order): md5 order key with
    // the shard as its own first hex nibble, per-shard positions from
    // one exchange + in-partition sort. Row-level oracle: every shard,
    // key and position is recomputed verbatim in SQL.
    "llm_shuffle_shards" -> ((s, d) =>
      Mixture.shuffleShards(
          t(s, d, "documents").select(col("doc_id")),
          Seq("doc_id"), salt = "r3", nibbles = 1)
        .select(col("doc_id"), col("shard"), col("shuffle_key"),
          col("shard_pos"))),

    // DSIR data selection (Xie et al. 2023): keep the 25 raw documents
    // whose hashed-ngram distribution is most like the English target
    // sample. md5 buckets keep the model portable: the oracle rebuilds
    // the same counts, smoothing and log-ratio sums in SQL. Scoring is
    // one shuffle-free pass (ratio table baked in as a literal array);
    // only the two 4096-bucket count aggs and the final top-k shuffle.
    "llm_dsir_select" -> ((s, d) =>
      Mixture.importanceResample(
          t(s, d, "documents").select(col("doc_id"), col("text"), col("lang")),
          targetPred = col("lang") === "en", k = 25)
        .select(col("doc_id"), round(col("score"), 4).as("score"),
          col("n_grams"))),

    // Trainable quality classifier (the CCNet/fastText filter stage):
    // hashed-gram logistic regression, trained on the even-id half,
    // verdict = held-out accuracy on the odd-id half. The label is
    // text-derived (contains the word 'hash', ~80% prevalence) so the
    // oracle can pin the test-set composition exactly; accuracy ≥ 0.9
    // is only reachable by LEARNING (the majority class scores 0.8,
    // and the one-feature NB shortcut drowns in correlated-feature
    // noise at 0.8 too — the logistic iterations are what pass).
    "llm_quality_classifier" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val label = col("text").rlike("(^| )hash( |$)")
      val w = TextAnalysis.trainTextClassifier(
        docs.filter(col("doc_id") % 2 === 0).select(col("text"), label.as("y")),
        "text", col("y"))
      docs.filter(col("doc_id") % 2 === 1)
        .select(label.cast("int").as("y"),
          TextAnalysis.classifierScore(col("text"), w).as("p"))
        .agg(count(lit(1)).as("n_test"),
          sum(col("y").cast("long")).as("n_pos"),
          avg(when((col("p") >= 0.5) === (col("y") === 1), 1.0)
            .otherwise(0.0)).as("acc"))
        .select(col("n_test"), col("n_pos"),
          (col("acc") >= 0.9).as("acc_ok"))
    }),

    // Feature extraction: payload → dense embedding (stubbed encoder).
    // The float vectors are pinned to an exact-integer invariant of the
    // same rolling byte hash (Sketches.RollingHashSum): Σ(vec) + len/2
    // must equal hsum/65536 up to float32 accumulation error, and hsum
    // itself is recomputed byte-for-byte by the DuckDB oracle — so the
    // vectors are oracle-verified, not just row-counted.
    "llm_multimodal_features" -> ((s, d) => {
      val withBin = Multimodal.withBinaryPayload(
        t(s, d, "documents").filter(col("doc_id") < 100)
          .select(col("doc_id"), col("text")), "text", "payload")
      Multimodal.extractFeatures(withBin, "payload", 16)
        .select(col("doc_id"),
          length(col("payload")).cast("long").as("byte_len"),
          graft.functions.Sketches.rollingHashSum(col("payload")).as("hsum"),
          (aggregate(col("vec"), lit(0.0d), (a, x) => a + x)
            + length(col("payload")) * 0.5d).as("vsum"))
        .select(col("doc_id"), col("byte_len"), col("hsum"),
          (abs(col("vsum") * 65536d - col("hsum")) < 1000d).as("vec_ok"))
    })
  )

  val oracles: Map[String, String] = Map(
    // Independent reimplementation of the LangId expression's exact
    // semantics (marker hit rate over the whitespace split, CJK ratio
    // override, 0.005 baseline, earlier-language ties).
    "llm_text_langid" ->
      """WITH d AS (
           SELECT CASE WHEN length(text) > 0 THEN
               length(regexp_replace(text, '[^\x{4E00}-\x{9FFF}]', '', 'g'))
                 * 1.0 / length(text)
             ELSE 0 END AS cjk_ratio,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
               w -> w <> '') AS ws
           FROM documents),
         s AS (
           SELECT cjk_ratio,
             len(list_filter(ws, w -> list_contains(['the','and','of','to','is','that','it','for','with','was'], w))) * 1.0 / greatest(len(ws), 1) AS s_en,
             len(list_filter(ws, w -> list_contains(['der','die','das','und','ist','nicht','ein','mit','auf','für'], w))) * 1.0 / greatest(len(ws), 1) AS s_de,
             len(list_filter(ws, w -> list_contains(['le','la','les','et','est','une','dans','que','pour','pas'], w))) * 1.0 / greatest(len(ws), 1) AS s_fr,
             len(list_filter(ws, w -> list_contains(['el','los','las','es','una','en','que','por','con','para'], w))) * 1.0 / greatest(len(ws), 1) AS s_es
           FROM d),
         p AS (
           SELECT CASE
               WHEN cjk_ratio > 0.2 THEN 'zh'
               WHEN s_en > 0.005 AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
               WHEN s_de > 0.005 AND s_de > s_en AND s_de >= s_fr AND s_de >= s_es THEN 'de'
               WHEN s_fr > 0.005 AND s_fr > s_en AND s_fr > s_de AND s_fr >= s_es THEN 'fr'
               WHEN s_es > 0.005 AND s_es > s_en AND s_es > s_de AND s_es > s_fr THEN 'es'
               ELSE 'und' END AS pred_lang
           FROM s)
         SELECT pred_lang, COUNT(*) AS cnt FROM p GROUP BY 1""",
    // Exact recomputation of the portable md5 min-k fingerprint.
    "llm_text_fingerprint" ->
      """WITH w AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS ws
           FROM documents),
         g AS (
           SELECT doc_id, CASE WHEN len(ws) >= 4 THEN
               list_transform(generate_series(1, len(ws) - 3),
                 i -> md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]))
             ELSE [] END AS hs
           FROM w)
         SELECT COUNT(DISTINCT array_to_string(list_sort(list_distinct(hs))[1:8], ''))
                  AS n_fingerprints,
                CAST(COUNT(*) AS BIGINT) AS n_docs
         FROM g""",
    "llm_dedup_embedding" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 4) AS cos
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])) >= 0.35""",
    "llm_dedup_exact" ->
      """SELECT COUNT(*) AS n_unique, CAST(SUM(dup_count) AS BIGINT) AS n_docs,
           MIN(doc_id) AS min_id
         FROM (SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
               FROM documents GROUP BY text)""",
    "llm_text_normalize" ->
      """SELECT doc_id,
           trim(regexp_replace(regexp_replace(
             lower(upper(text) || '  Mixed, PUNCT!! end.  '),
             '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
         FROM documents""",
    "llm_dedup_clusters" ->
      """WITH RECURSIVE
         edges AS (
           SELECT doc_id AS a, doc_id - doc_id % 7 AS b FROM documents
           WHERE doc_id % 7 != 0
           UNION ALL
           SELECT doc_id AS a, doc_id + 7 AS b FROM documents
           WHERE doc_id % 21 = 0
         ),
         sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
         reach(node, r) AS (
           SELECT DISTINCT a, a FROM sym
           UNION
           SELECT s.a, reach.r FROM sym s JOIN reach ON s.b = reach.node
         )
         SELECT CAST(r AS BIGINT) AS component,
           CAST(COUNT(*) AS BIGINT) AS n_members
         FROM (SELECT node, MIN(r) AS r FROM reach GROUP BY node)
         GROUP BY r""",
    "llm_dedup_ngram" ->
      """WITH sh AS (
           SELECT doc_id, s, n_sh FROM (
             SELECT doc_id,
               list_distinct(list_transform(
                 list_zip(words, words[2:], words[3:])[:greatest(len(words)-2,0)],
                 w -> w[1] || ' ' || w[2] || ' ' || w[3])) AS shset
             FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
           ), UNNEST(shset) AS u(s), LATERAL (SELECT len(shset) AS n_sh)
         )
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(COUNT(*)::DOUBLE /
             (ANY_VALUE(a.n_sh) + ANY_VALUE(b.n_sh) - COUNT(*)), 4) AS jaccard
         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY 1, 2
         HAVING COUNT(*)::DOUBLE /
           (ANY_VALUE(a.n_sh) + ANY_VALUE(b.n_sh) - COUNT(*)) >= 0.5""",
    // found==truth on this corpus (16 bands × 8 rows: a pair at j>=0.8
    // is banded with prob ~0.95+, and every true pair here lands) and
    // the emitted jaccard is exact — the oracle is the exact pair list
    "llm_dedup_minhash" ->
      """WITH sh AS (
           SELECT doc_id, s, n_sh FROM (
             SELECT doc_id,
               list_distinct(list_transform(
                 list_zip(words, words[2:], words[3:])[:greatest(len(words)-2,0)],
                 w -> w[1] || ' ' || w[2] || ' ' || w[3])) AS shset
             FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
           ), UNNEST(shset) AS u(s), LATERAL (SELECT len(shset) AS n_sh)
         )
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(COUNT(*)::DOUBLE /
             (ANY_VALUE(a.n_sh) + ANY_VALUE(b.n_sh) - COUNT(*)), 4) AS jaccard
         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY 1, 2
         HAVING COUNT(*)::DOUBLE /
           (ANY_VALUE(a.n_sh) + ANY_VALUE(b.n_sh) - COUNT(*)) >= 0.8""",
    // verdict oracles: DuckDB pins the exact side (truth counts, exact
    // top-1 cosines) and the expected quality verdicts
    "llm_dedup_simhash" ->
      """WITH sh AS (
           SELECT doc_id, s, n_sh FROM (
             SELECT doc_id,
               list_distinct(list_transform(
                 list_zip(words, words[2:], words[3:])[:greatest(len(words)-2,0)],
                 w -> w[1] || ' ' || w[2] || ' ' || w[3])) AS shset
             FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
           ), UNNEST(shset) AS u(s), LATERAL (SELECT len(shset) AS n_sh)
         ),
         truth AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2
           HAVING COUNT(*)::DOUBLE /
             (ANY_VALUE(a.n_sh) + ANY_VALUE(b.n_sh) - COUNT(*)) >= 0.8
         )
         SELECT COUNT(*) AS n_true_pairs, true AS all_found_are_dups,
           true AS recall_ok FROM truth""",
    "llm_dedup_embedding_lsh" ->
      """WITH c2 AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
           UNION ALL
           SELECT vec_id + 10000000,
             CAST(list_concat(
               [CAST(embedding[1] * CAST(1.5 AS FLOAT) AS FLOAT)],
               embedding[2:]) AS DOUBLE[])
           FROM embeddings)
         SELECT COUNT(*) AS n_exact_pairs, true AS precision_ok,
           true AS recall_ok
         FROM c2 a JOIN c2 b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(a.e, b.e) >= 0.9""",
    "llm_sim_lsh" ->
      """SELECT q.vec_id AS query_id,
           ROUND(MAX(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                            CAST(c.embedding AS DOUBLE[]))), 4)
             AS top1_cos,
           true AS recall_ok
         FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
         WHERE q.vec_id < 10 GROUP BY 1""",
    "llm_sim_pq" ->
      """SELECT q.vec_id AS query_id,
           ROUND(MAX(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                            CAST(c.embedding AS DOUBLE[]))), 4)
             AS top1_cos,
           true AS recall_ok
         FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
         WHERE q.vec_id < 10 GROUP BY 1""",
    "llm_sim_ivf" ->
      """SELECT q.vec_id AS query_id,
           ROUND(MAX(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                            CAST(c.embedding AS DOUBLE[]))), 4)
             AS top1_cos,
           true AS recall_ok
         FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
         WHERE q.vec_id < 10 GROUP BY 1""",
    "llm_sim_bruteforce" ->
      """SELECT query_id, item_id, ROUND(cos, 4) AS cos, rank FROM (
           SELECT q.vec_id AS query_id, c.vec_id AS item_id,
             list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                    CAST(c.embedding AS DOUBLE[])) AS cos,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                               CAST(c.embedding AS DOUBLE[])) DESC,
                        c.vec_id) AS rank
           FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
           WHERE q.vec_id < 10
         ) WHERE rank <= 5""",
    "llm_text_tokens" ->
      """SELECT doc_id,
           len(list_filter(string_split_regex(text, '\s+'), w -> len(w) > 0)) AS n_tokens,
           CAST(list_sum(list_transform(
             list_filter(string_split_regex(text, '\s+'), w -> len(w) > 0),
             w -> CAST(ceil(len(w) / 4.0) AS BIGINT))) AS BIGINT) AS n_subwords
         FROM documents""",
    "llm_unigram_stats" ->
      """WITH toks AS (
           SELECT doc_id, unnest(list_filter(
             string_split_regex(lower(text), '\s+'), w -> len(w) > 0)) AS tok
           FROM documents),
         vocab AS (
           SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok
           HAVING COUNT(*) >= 2)
         SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           COUNT(*) FILTER (WHERE v.cnt IS NULL) AS oov,
           CAST(SUM(COALESCE(v.cnt, 0)) AS BIGINT) AS freq_sum
         FROM toks t LEFT JOIN vocab v USING (tok)
         GROUP BY t.doc_id ORDER BY t.doc_id""",
    "llm_boilerplate_lines" ->
      """WITH w0 AS (
           SELECT doc_id, ws.w AS word, ws.i AS i0
           FROM documents,
             LATERAL (SELECT unnest(string_split_regex(text, '\s+')) AS w,
                generate_subscripts(string_split_regex(text, '\s+'), 1) AS i) ws
           WHERE len(ws.w) > 0),
         w AS (
           SELECT doc_id, word,
             row_number() OVER (PARTITION BY doc_id ORDER BY i0) AS i
           FROM w0),
         l AS (
           SELECT doc_id, CAST(floor((i - 1) / 5) AS BIGINT) AS pos,
             string_agg(word, ' ' ORDER BY i) AS line
           FROM w GROUP BY doc_id, floor((i - 1) / 5)),
         hot AS (
           SELECT line FROM l GROUP BY line HAVING COUNT(*) >= 3)
         SELECT doc_id,
           COUNT(*) AS n_lines,
           COUNT(*) FILTER (WHERE line IN (SELECT line FROM hot)) AS n_dropped,
           COALESCE(string_agg(
             CASE WHEN line NOT IN (SELECT line FROM hot) THEN line END,
             ' ' ORDER BY pos), '') AS clean_text
         FROM l GROUP BY doc_id ORDER BY doc_id""",
    "llm_text_quality" ->
      """SELECT doc_id,
           ROUND((len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g'))) /
             greatest(len(text), 1)::DOUBLE, 4) AS punct_ratio,
           ROUND((len(text) - n_words + 1)::DOUBLE / greatest(n_words, 1), 4)
             AS mean_word_len,
           ROUND(least(len(text) / 500.0, 1.0) * 0.3 +
             (CASE WHEN (len(text) - n_words + 1)::DOUBLE / greatest(n_words, 1)
               BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.3 END) * 0.3 +
             (CASE WHEN (len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g'))) /
               greatest(len(text), 1)::DOUBLE < 0.2 THEN 1.0 ELSE 0.2 END) * 0.2 +
             least((len(list_filter(string_split_regex(lower(text), '\s+'),
               w -> w IN ('the','a','of','and','to','in','is','that','it','for')))::DOUBLE
               / greatest(n_words, 1)) * 5.0, 1.0) * 0.2, 4) AS quality
         FROM (SELECT doc_id, text,
                 len(list_filter(string_split_regex(text, '\s+'), w -> len(w) > 0))
                   AS n_words
               FROM documents)""",
    "llm_pipeline_e2e" ->
      """WITH scored AS (
           SELECT doc_id, text,
             ROUND(least(len(text) / 500.0, 1.0) * 0.3 +
               (CASE WHEN (len(text) - n_words + 1)::DOUBLE / greatest(n_words, 1)
                 BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.3 END) * 0.3 +
               (CASE WHEN (len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g'))) /
                 greatest(len(text), 1)::DOUBLE < 0.2 THEN 1.0 ELSE 0.2 END) * 0.2 +
               least((len(list_filter(string_split_regex(lower(text), '\s+'),
                 w -> w IN ('the','a','of','and','to','in','is','that','it','for')))::DOUBLE
                 / greatest(n_words, 1)) * 5.0, 1.0) * 0.2, 4) AS quality,
             n_words
           FROM (SELECT doc_id, text,
                   len(list_filter(string_split_regex(text, '\s+'), w -> len(w) > 0))
                     AS n_words
                 FROM documents)),
         gated AS (SELECT * FROM scored WHERE quality >= 0.5),
         deduped AS (
           SELECT MIN(doc_id) AS doc_id, ANY_VALUE(n_words) AS n_words
           FROM gated GROUP BY text)
         SELECT COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS min_id
         FROM deduped""",
    "llm_decontaminate" ->
      """WITH w AS (SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS ws
           FROM documents),
         g AS (SELECT doc_id, array_to_string(ws[i:i+4], ' ') AS g
           FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 4)) AS i
                 FROM w WHERE len(ws) >= 5)),
         bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0)
         SELECT doc_id, count(DISTINCT g) AS hits
         FROM g JOIN bench USING (g) GROUP BY doc_id""",
    "llm_decontaminate_bloom" ->
      """WITH w AS (SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS ws
           FROM documents),
         g AS (SELECT doc_id, array_to_string(ws[i:i+4], ' ') AS g
           FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 4)) AS i
                 FROM w WHERE len(ws) >= 5)),
         bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0)
         SELECT doc_id, count(DISTINCT g) AS hits
         FROM g JOIN bench USING (g) GROUP BY doc_id""",
    "llm_decontaminate_semantic" ->
      """SELECT c.vec_id AS doc_id,
           ROUND(MAX(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[]))), 4)
             AS max_cos,
           ROUND(MAX(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[]))), 4)
             >= 0.35 AS contaminated
         FROM embeddings c, embeddings b
         WHERE c.vec_id >= 20 AND b.vec_id < 20
         GROUP BY c.vec_id""",
    "llm_mixture_temperature" ->
      """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
         z AS (SELECT sum(pow(n, 0.5)) AS z FROM c),
         t AS (SELECT source, n,
                 CAST(floor(least(1.0,
                   300 * (pow(n, 0.5) / (SELECT z FROM z)) / n) * 4294967296.0)
                 AS BIGINT) AS thr
               FROM c)
         SELECT d.source, CAST(count(*) AS BIGINT) AS n_selected
         FROM documents d JOIN t ON d.source = t.source
         WHERE CAST(concat('0x',
             substr(md5(concat(d.source, '|', CAST(d.doc_id AS VARCHAR))), 1, 8))
           AS BIGINT) < thr
         GROUP BY d.source""",
    "llm_dedup_semantic" ->
      """WITH cent AS (
           SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
           FROM embeddings
           ORDER BY md5(concat('sd1|', CAST(vec_id AS VARCHAR))), vec_id
           LIMIT 8),
         assigned AS (
           SELECT v.vec_id, CAST(v.embedding AS DOUBLE[]) AS vec,
             (SELECT cid FROM (
                SELECT cid,
                  list_cosine_similarity(CAST(v.embedding AS DOUBLE[]), cvec) AS s
                FROM cent ORDER BY s DESC, cid LIMIT 1)) AS cell
           FROM embeddings v),
         dropped AS (
           SELECT DISTINCT a.vec_id
           FROM assigned a JOIN assigned b
             ON a.cell = b.cell AND b.vec_id < a.vec_id
           WHERE list_cosine_similarity(a.vec, b.vec) >= 0.35)
         SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell,
           (a.vec_id NOT IN (SELECT vec_id FROM dropped)) AS kept
         FROM assigned a""",
    "llm_chunk_windows" ->
      """WITH words AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\s+'), w -> len(w) > 0) AS ws
           FROM documents),
         m AS (
           SELECT doc_id, ws, len(ws) AS n,
             CASE WHEN len(ws) <= 0 THEN 0
                  ELSE 1 + greatest(0, CAST(ceil((len(ws) - 40) / 30.0) AS BIGINT))
             END AS m
           FROM words)
         SELECT doc_id, CAST(w AS BIGINT) AS window_id,
           CAST(w * 30 AS BIGINT) AS start_word,
           CAST(least(40, n - w * 30) AS BIGINT) AS n_words,
           array_to_string(ws[w*30+1 : w*30+least(40, n - w*30)], ' ') AS window_text
         FROM (SELECT doc_id, ws, n, unnest(generate_series(0, m - 1)) AS w
               FROM m WHERE m > 0)""",
    "llm_weighted_sample" ->
      """SELECT doc_id, source, n_chars FROM (
           SELECT doc_id, source, n_chars,
             -ln((CAST(concat('0x',
                    substr(md5(concat('ws1|', CAST(doc_id AS VARCHAR))), 1, 13))
                  AS BIGINT) + 1.0) / 4503599627370497.0)
               / CAST(n_chars AS DOUBLE) AS clock
           FROM documents WHERE n_chars > 0
           ORDER BY clock, doc_id LIMIT 50)""",
    "llm_dedup_spans" ->
      """WITH words AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\s+'), w -> len(w) > 0) AS ws
           FROM documents),
         grams AS (
           SELECT doc_id, i, array_to_string(ws[i:i+7], ' ') AS g
           FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 7)) AS i
                 FROM words WHERE len(ws) >= 8)),
         counts AS (SELECT g, count(*) AS c FROM grams GROUP BY g),
         flagged AS (
           SELECT doc_id, list(i) AS fs
           FROM grams JOIN counts USING (g) WHERE c >= 2 GROUP BY doc_id),
         rebuilt AS (
           SELECT w.doc_id, ws, coalesce(fs, []) AS fs,
             list_filter(generate_series(1, len(ws)), j ->
               len(list_filter(coalesce(fs, []), p -> p <= j AND j < p + 8)) = 0)
               AS keep_idx
           FROM words w LEFT JOIN flagged ON w.doc_id = flagged.doc_id)
         SELECT doc_id,
           coalesce(array_to_string(list_transform(keep_idx, j -> ws[j]), ' '), '')
             AS kept_text,
           CAST(len(ws) - len(keep_idx) AS BIGINT) AS n_removed_words,
           CAST(len(fs) AS BIGINT) AS n_flagged_grams
         FROM rebuilt""",
    "llm_gopher_rules" ->
      """WITH words AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\s+'), w -> len(w) > 0) AS ws
           FROM documents),
         wstats AS (
           SELECT doc_id,
             len(ws) AS n_words,
             coalesce(list_sum(list_transform(ws, w -> length(w))), 0) AS word_len_sum,
             len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha_words,
             len(list_filter(['the','be','to','of','and','that','have','with'],
               s -> list_contains(list_transform(ws, w -> lower(w)), s))) AS n_stop_hits
           FROM words),
         lstats AS (
           SELECT doc_id,
             len(ls) AS n_lines,
             len(list_filter(ls, l -> starts_with(ltrim(l, ' ' || chr(9)), '- ')
               OR starts_with(ltrim(l, ' ' || chr(9)), '* ')
               OR starts_with(ltrim(l, ' ' || chr(9)), '• '))) AS n_bullet_lines,
             len(list_filter(ls, l -> ends_with(rtrim(l, ' ' || chr(9)), '...')
               OR ends_with(rtrim(l, ' ' || chr(9)), '…'))) AS n_ellipsis_lines
           FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents)),
         cstats AS (
           SELECT doc_id,
             length(text) - length(replace(text, '#', '')) AS n_hash,
             (length(text) - length(replace(text, '...', ''))) / 3
               + (length(text) - length(replace(text, '…', ''))) AS n_ellipsis
           FROM documents)
         SELECT w.doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(word_len_sum AS BIGINT) AS word_len_sum,
           CAST(n_alpha_words AS BIGINT) AS n_alpha_words,
           CAST(n_stop_hits AS BIGINT) AS n_stop_hits,
           CAST(n_lines AS BIGINT) AS n_lines,
           CAST(n_bullet_lines AS BIGINT) AS n_bullet_lines,
           CAST(n_ellipsis_lines AS BIGINT) AS n_ellipsis_lines,
           CAST(n_hash AS BIGINT) AS n_hash,
           CAST(n_ellipsis AS BIGINT) AS n_ellipsis,
           (n_words BETWEEN 50 AND 100000
             AND (word_len_sum / greatest(n_words, 1)::DOUBLE) BETWEEN 3.0 AND 10.0
             AND (n_hash / greatest(n_words, 1)::DOUBLE) <= 0.1
             AND (n_ellipsis / greatest(n_words, 1)::DOUBLE) <= 0.1
             AND (n_bullet_lines / greatest(n_lines, 1)::DOUBLE) <= 0.9
             AND (n_ellipsis_lines / greatest(n_lines, 1)::DOUBLE) <= 0.3
             AND (n_alpha_words / greatest(n_words, 1)::DOUBLE) >= 0.8
             AND n_stop_hits >= 2) AS gopher_pass
         FROM wstats w JOIN lstats USING (doc_id) JOIN cstats USING (doc_id)""",
    "llm_text_repetition" ->
      """WITH base AS (SELECT doc_id, regexp_replace(text, '\bthe\b', '.', 'g') AS t
           FROM documents),
         segs AS (SELECT doc_id, trim(s) AS s
           FROM (SELECT doc_id, unnest(string_split_regex(t, '[.!?]')) AS s FROM base)
           WHERE len(trim(s)) > 0),
         segstats AS (SELECT doc_id, SUM(c - 1) AS dups,
             SUM((c - 1) * len(s)) AS dupchars, SUM(c) AS nsegs
           FROM (SELECT doc_id, s, count(*) AS c FROM segs GROUP BY 1, 2)
           GROUP BY doc_id),
         words AS (SELECT doc_id,
             list_filter(string_split_regex(lower(t), '\s+'), x -> len(x) > 0) AS ws
           FROM base),
         grams AS (SELECT doc_id, array_to_string(ws[i:i+1], ' ') AS g
           FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
                 FROM words WHERE len(ws) >= 2)),
         gstats AS (SELECT doc_id, max(c) AS run,
             sum(c * glen)::DOUBLE / sum(c) AS meanlen
           FROM (SELECT doc_id, g, count(*) AS c, len(g) AS glen
                 FROM grams GROUP BY doc_id, g)
           GROUP BY doc_id)
         SELECT b.doc_id,
           ROUND(coalesce(dups, 0) / greatest(nsegs, 1)::DOUBLE, 4) AS dup_seg_frac,
           ROUND(coalesce(dupchars, 0) / greatest(len(t), 1)::DOUBLE, 4) AS dup_seg_char_frac,
           ROUND(coalesce(run, 0) * coalesce(meanlen, 0) / greatest(len(t), 1), 4)
             AS top_bigram_char_frac
         FROM base b LEFT JOIN segstats USING (doc_id) LEFT JOIN gstats USING (doc_id)""",
    "llm_pii_redact" ->
      """WITH p AS (SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR) ||
               '@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS text
           FROM documents)
         SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
             '\b[0-9][0-9()+. -]{7,}[0-9]\b', '<PHONE>', 'g') AS redacted,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS emails,
           CAST(len(regexp_extract_all(text,
             '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS ips
         FROM p""",
    "llm_multimodal_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
         FROM documents""",
    "llm_multimodal_frames" ->
      """SELECT doc_id,
           GREATEST(octet_length(encode(text)) // 64, 1) AS n_frames
         FROM documents WHERE doc_id < 200""",
    "llm_multimodal_resize" ->
      """SELECT doc_id,
           LEAST(octet_length(encode(text)), 16) AS resized_len
         FROM documents WHERE doc_id < 200""",
    "llm_multimodal_audio" ->
      """SELECT doc_id,
           'audio/wav' AS codec,
           CAST(100 + (doc_id * 11) % 400 AS BIGINT) AS dur_decoded,
           ROUND((doc_id * 37 % 256) / 256.0, 4) AS rms0,
           ROUND((doc_id * 37 % 256) / 256.0, 4) AS rms7
         FROM documents WHERE doc_id < 50""",
    "llm_multimodal_video" ->
      """SELECT doc_id,
           'video/avi' AS codec,
           CAST(16 + doc_id % 9 AS INT) AS hdr_w,
           CAST(16 + (doc_id * 5) % 7 AS INT) AS hdr_h,
           CAST((2 + doc_id % 4) * 100 AS BIGINT) AS hdr_ms,
           CAST(2 + doc_id % 4 AS BIGINT) AS n_frames,
           CAST((2 + doc_id % 4) * 100 AS BIGINT) AS decoded_ms,
           true AS luma_ok
         FROM documents WHERE doc_id < 30""",
    "llm_multimodal_decode" ->
      """SELECT doc_id,
           CAST(8 + doc_id % 23 AS INT) AS in_w,
           CAST(8 + (doc_id * 7) % 17 AS INT) AS in_h,
           'image/png' AS in_codec,
           CAST(32 AS INT) AS out_w, CAST(24 AS INT) AS out_h,
           'image/png' AS out_codec,
           ROUND((doc_id * 37 % 256) / 255.0 - 0.5, 4) AS f0,
           ROUND((doc_id * 37 % 256) / 255.0 - 0.5, 4) AS f15
         FROM documents WHERE doc_id < 50""",
    // The cluster CTE of llm_dedup_clusters + the md5 split rule:
    // rep = min reachable node, split by md5('split|' || rep) < 0.2·2³².
    "llm_split_leakage_safe" ->
      """WITH RECURSIVE
         edges AS (
           SELECT doc_id AS a, doc_id - doc_id % 7 AS b FROM documents
           WHERE doc_id % 7 != 0
           UNION ALL
           SELECT doc_id AS a, doc_id + 7 AS b FROM documents
           WHERE doc_id % 21 = 0
         ),
         sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
         reach(node, r) AS (
           SELECT DISTINCT a, a FROM sym
           UNION
           SELECT s.a, reach.r FROM sym s JOIN reach ON s.b = reach.node
         ),
         rep AS (SELECT node, MIN(r) AS rp FROM reach GROUP BY node),
         assigned AS (
           SELECT d.doc_id, CAST(COALESCE(rep.rp, d.doc_id) AS BIGINT)
                    AS split_key
           FROM documents d LEFT JOIN rep ON rep.node = d.doc_id),
         s AS (
           SELECT doc_id, split_key,
             CASE WHEN substring(md5('split|' || split_key), 1, 8)
                    < '33333333'
                  THEN 'validation' ELSE 'train' END AS split
           FROM assigned)
         SELECT split, COUNT(*) AS n_docs,
                COUNT(DISTINCT split_key) AS n_clusters
         FROM s GROUP BY 1""",
    // Same disjoint segmentation, corpus-wide count and drop rule as
    // Dedup.dedupSegments, replayed on DuckDB's list slices.
    "llm_dedup_segments" ->
      """WITH w AS (
           SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS ws
           FROM documents),
         s AS (
           SELECT doc_id,
             list_transform(
               generate_series(0, CAST(floor((len(ws) - 1) / 10.0) AS INT)),
               i -> array_to_string(ws[i*10+1 : i*10+10], ' ')) AS segl
           FROM w WHERE len(ws) > 0),
         e AS (SELECT doc_id, unnest(segl) AS seg FROM s),
         c AS (SELECT seg, COUNT(*) AS occ FROM e GROUP BY 1),
         j AS (
           SELECT e.doc_id, (c.occ > 2) AS dup,
                  len(string_split(e.seg, ' ')) AS seg_tk
           FROM e JOIN c USING (seg))
         SELECT doc_id, COUNT(*) AS n_segments,
           CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           CAST(SUM(CASE WHEN dup THEN 0 ELSE seg_tk END) AS BIGINT)
             AS tokens_kept
         FROM j GROUP BY 1""",
    // The three proven stages recomposed: the e2e quality formula, the
    // mixture's epoch unnest + md5 threshold, and the packing recursion
    // over (bucket, ord) — per-bucket layout stats as exact integers.
    "llm_pipeline_pretrain" ->
      """WITH RECURSIVE scored AS (
           SELECT doc_id, source, n_words,
             ROUND(least(len(text) / 500.0, 1.0) * 0.3 +
               (CASE WHEN (len(text) - n_words + 1)::DOUBLE / greatest(n_words, 1)
                 BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.3 END) * 0.3 +
               (CASE WHEN (len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g'))) /
                 greatest(len(text), 1)::DOUBLE < 0.2 THEN 1.0 ELSE 0.2 END) * 0.2 +
               least((len(list_filter(string_split_regex(lower(text), '\s+'),
                 w -> w IN ('the','a','of','and','to','in','is','that','it','for')))::DOUBLE
                 / greatest(n_words, 1)) * 5.0, 1.0) * 0.2, 4) AS quality
           FROM (SELECT doc_id, source, text,
                   len(list_filter(string_split_regex(text, '\s+'), w -> len(w) > 0))
                     AS n_words
                 FROM documents)),
         g AS (SELECT doc_id, source, n_words AS tokens
               FROM scored WHERE quality >= 0.5),
         m AS (
           SELECT doc_id, source, tokens,
             CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 0 ELSE 1 END AS n_full,
             CASE source WHEN 'src1' THEN '80000000' ELSE '00000000' END AS thr
           FROM g),
         e AS (
           SELECT doc_id, tokens, source, n_full, thr,
                  unnest(generate_series(0, n_full)) AS epoch
           FROM m),
         k AS (
           SELECT doc_id, tokens, epoch,
                  (doc_id * 7 + epoch) % 8 AS bucket,
                  doc_id * 4 + epoch AS ord
           FROM e
           WHERE epoch < n_full
              OR substring(md5(source || '|' || epoch || '|' || doc_id), 1, 8) < thr),
         d AS (
           SELECT bucket, ord, tokens,
                  ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY ord) AS rn
           FROM k),
         p AS (
           SELECT bucket, rn, tokens, CAST(0 AS BIGINT) AS pack_id, tokens AS fill
           FROM d WHERE rn = 1
           UNION ALL
           SELECT d.bucket, d.rn, d.tokens,
             CASE WHEN p.fill + d.tokens > 512 THEN p.pack_id + 1
                  ELSE p.pack_id END,
             CASE WHEN p.fill + d.tokens > 512 THEN d.tokens
                  ELSE p.fill + d.tokens END
           FROM p JOIN d ON d.bucket = p.bucket AND d.rn = p.rn + 1),
         pk AS (
           SELECT bucket, pack_id, COUNT(*) AS nd,
                  CAST(SUM(tokens) AS BIGINT) AS tk
           FROM p GROUP BY 1, 2)
         SELECT bucket, COUNT(*) AS n_packs, CAST(SUM(nd) AS BIGINT) AS n_docs,
                CAST(SUM(tk) AS BIGINT) AS token_sum,
                CAST(SUM(greatest(512 - tk, 0)) AS BIGINT) AS padding
         FROM pk GROUP BY 1""",
    // The mixture's epoch replication and md5 fractional sampling,
    // replayed with the identical key string and thresholds
    // (floor(frac·2³²) as 8 lowercase hex digits).
    "llm_mixture_weights" ->
      """WITH m AS (
           SELECT doc_id, source,
             CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 0
                  ELSE 1 END AS n_full,
             CASE source WHEN 'src0' THEN '80000000' WHEN 'src1' THEN '4ccccccc'
                  ELSE '00000000' END AS thr
           FROM documents),
         e AS (
           SELECT doc_id, source, n_full, thr,
                  unnest(generate_series(0, n_full)) AS epoch
           FROM m)
         SELECT source, COUNT(*) AS n_rows,
                COUNT(DISTINCT doc_id) AS n_docs,
                COUNT(DISTINCT epoch) AS n_epochs
         FROM e
         WHERE epoch < n_full
            OR substring(md5(source || '|' || epoch || '|' || doc_id), 1, 8) < thr
         GROUP BY 1""",
    "llm_shuffle_shards" ->
      """SELECT doc_id,
           substring(md5('r3|' || doc_id), 1, 1) AS shard,
           md5('r3|' || doc_id) AS shuffle_key,
           ROW_NUMBER() OVER (
             PARTITION BY substring(md5('r3|' || doc_id), 1, 1)
             ORDER BY md5('r3|' || doc_id), doc_id) - 1 AS shard_pos
         FROM documents""",
    // DSIR replayed in SQL: same grams (unigrams + bigrams of the
    // space-split text), same 3-hex-digit md5 buckets, same add-one
    // smoothing over target (lang='en') vs raw counts, same top-25.
    "llm_dsir_select" ->
      """WITH words AS (
           SELECT doc_id, lang,
             list_filter(string_split(trim(text), ' '), x -> x <> '') AS w
           FROM documents),
         grams AS (
           SELECT doc_id, lang,
             unnest(list_concat(w,
               list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]))) AS g
           FROM words),
         bucketed AS (
           SELECT doc_id, lang,
             CAST(('0x' || substr(md5(g), 1, 3)) AS INTEGER) AS b
           FROM grams),
         q AS (
           SELECT b, count(*) AS qc,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pc
           FROM bucketed GROUP BY b),
         tot AS (
           SELECT CAST(sum(qc) AS DOUBLE) AS qt,
                  CAST(sum(pc) AS DOUBLE) AS pt FROM q),
         lr AS (
           SELECT b,
             ln((pc + 1.0) / (pt + 4096.0)) - ln((qc + 1.0) / (qt + 4096.0)) AS r
           FROM q, tot),
         scores AS (
           SELECT doc_id, sum(r) AS s, count(*) AS n
           FROM bucketed JOIN lr USING (b) GROUP BY doc_id)
         SELECT doc_id, round(s, 4) AS score, CAST(n AS BIGINT) AS n_grams
         FROM scores ORDER BY s DESC, doc_id LIMIT 25""",
    "llm_quality_classifier" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN regexp_matches(text, '(^| )hash( |$)')
             THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           true AS acc_ok
         FROM documents WHERE doc_id % 2 = 1""",
    // Greedy packing replayed exactly: docs ordered per bucket, the
    // recursive step carries (pack_id, fill) and opens a new pack when
    // the budget would overflow — the same rule as Packing.packSequences.
    // max_pos doubles as a contiguity check (positions 0..n-1 per pack).
    "llm_pack_sequences" ->
      """WITH RECURSIVE d AS (
           SELECT doc_id % 8 AS bucket, doc_id,
             len(list_filter(string_split_regex(text, '\s+'),
                 w -> len(w) > 0)) AS tokens,
             ROW_NUMBER() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
           FROM documents),
         p AS (
           SELECT bucket, rn, tokens, CAST(0 AS BIGINT) AS pack_id,
                  tokens AS fill
           FROM d WHERE rn = 1
           UNION ALL
           SELECT d.bucket, d.rn, d.tokens,
             CASE WHEN p.fill + d.tokens > 512 THEN p.pack_id + 1
                  ELSE p.pack_id END,
             CASE WHEN p.fill + d.tokens > 512 THEN d.tokens
                  ELSE p.fill + d.tokens END
           FROM p JOIN d ON d.bucket = p.bucket AND d.rn = p.rn + 1)
         SELECT bucket, pack_id, COUNT(*) AS n_docs,
                CAST(SUM(tokens) AS BIGINT) AS token_sum,
                CAST(COUNT(*) - 1 AS BIGINT) AS max_pos
         FROM p GROUP BY 1, 2""",
    // Byte-for-byte reimplementation of the feature encoder's rolling
    // hash (h = 31h + signed_byte mod 2^64 from 1125899906842597;
    // hsum = Σ h&0xffff) over the hex dump of the UTF-8 payload —
    // pins the Spark-side float vectors through the integer invariant.
    "llm_multimodal_features" ->
      """WITH RECURSIVE b AS (
           SELECT doc_id, hex(encode(text)) AS hx,
                  octet_length(encode(text)) AS n
           FROM documents WHERE doc_id < 100),
         r AS (
           SELECT doc_id, hx, n, 0 AS i,
                  CAST(1125899906842597 AS HUGEINT) AS h,
                  CAST(0 AS HUGEINT) AS s
           FROM b
           UNION ALL
           SELECT doc_id, hx, n, i + 1, h1, s + h1 % 65536
           FROM (
             SELECT doc_id, hx, n, i, s,
               ((31 * h + sb) % 18446744073709551616
                 + 18446744073709551616) % 18446744073709551616 AS h1
             FROM (
               SELECT *, CASE WHEN byt >= 128 THEN byt - 256 ELSE byt END AS sb
               FROM (
                 SELECT *,
                   16 * (strpos('0123456789ABCDEF', substr(hx, 2*i+1, 1)) - 1)
                      + (strpos('0123456789ABCDEF', substr(hx, 2*i+2, 1)) - 1) AS byt
                 FROM r WHERE i < n))))
         SELECT doc_id, CAST(n AS BIGINT) AS byte_len, CAST(s AS BIGINT) AS hsum,
                true AS vec_ok
         FROM r WHERE i = n"""
  )
}
