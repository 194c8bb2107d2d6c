package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: token counting, quality
  * scoring, language identification and document fingerprinting. All
  * map-only column expressions (codegen'd, no shuffle) — at 100 TB these
  * run at scan speed.
  */
object TextAnalysis {
  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), w => length(w) > 0)).cast("long")

  /** BPE-ish subword token estimate: word-piece regex split — runs of
    * letters, digits, or single punctuation, ~4 chars per piece cap.
    */
  def subwordCountEstimate(text: Column): Column =
    aggregate(
      filter(split(text, "\\s+"), w => length(w) > 0),
      lit(0L),
      (acc, w) => acc + ceil(length(w).cast("double") / 4.0).cast("long"))

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))

  /** Mean word length. */
  def meanWordLen(text: Column): Column = {
    val words = filter(split(text, "\\s+"), w => length(w) > 0)
    (length(text) - size(words) + 1).cast("double") /
      greatest(size(words).cast("double"), lit(1.0))
  }

  /** Stopword ratio against a given stopword list. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val words = filter(split(lower(text), "\\s+"), w => length(w) > 0)
    size(filter(words, w => w.isin(stopwords.map(lit(_)): _*))).cast("double") /
      greatest(size(words).cast("double"), lit(1.0))
  }

  private val enStop = Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for")

  /** Composite quality score in [0,1]: long texts with normal word lengths,
    * some stopwords and little punctuation score high — the standard
    * heuristic-filter recipe (length/punct/stopword ratios).
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val wl = meanWordLen(text)
    val wordLenScore = when(wl.between(3.0, 10.0), 1.0).otherwise(0.3)
    val punctScore = when(punctRatio(text) < 0.2, 1.0).otherwise(0.2)
    val stopScore = least(stopwordRatio(text, enStop) * 5.0, lit(1.0))
    round(lenScore * 0.3 + wordLenScore * 0.3 + punctScore * 0.2 + stopScore * 0.2, 4)
  }

  /** Language-ID by stopword/character heuristics — an n-gram-free
    * fasttext-style fallback: score each language by its marker-word hit
    * rate plus script detection for CJK; highest score wins, 'und' when
    * nothing matches.
    */
  def langId(text: Column): Column =
    graft.functions.Sketches.langId(text)

  /** Rolling-hash document fingerprint: min-k sketch of word 4-gram
    * hashes, collapsed to one 64-bit value. Stable under whitespace
    * normalization; near-identical docs share fingerprints of their
    * min-shingles with high probability.
    */
  def fingerprint(text: Column, shingleSize: Int = 4, sketchSize: Int = 8): Column = {
    val sh = Dedup.shingleHashes(text, shingleSize)
    val minK = slice(array_sort(sh), 1, sketchSize)
    xxhash64(minK)
  }

  /** Cross-engine-reproducible fingerprint: same min-k-of-shingle-hash
    * sketch as [[fingerprint]], but the shingle hash is md5 of the
    * literal word 4-gram, composed from portable builtins only — any
    * engine with split/md5/sort recomputes the identical value (the
    * DuckDB oracle does, verbatim). xxhash64 [[fingerprint]] stays the
    * hot-path default; this is for pipelines that must agree on
    * fingerprints with systems outside the JVM.
    *
    * Declarative definition (what external engines recompute):
    * {{{
    *   ws    = filter(split(text, "\\s+"), w => w =!= "")
    *   grams = transform(sequence(1, size(ws) - k + 1), i =>
    *             md5(concat_ws(" ", ws[i] .. ws[i+k-1])))
    *   fp    = concat_ws("", slice(array_sort(array_distinct(grams)), 1, m))
    * }}}
    * Computed here as one codegen'd pass (Sketches.PortableFingerprint):
    * the HOF form re-evaluates the whitespace split once per gram, which
    * is quadratic in document length. Null text maps to "" like the
    * concat_ws form. */
  def portableFingerprint(text: Column, shingleSize: Int = 4,
      sketchSize: Int = 8): Column =
    coalesce(
      graft.functions.Sketches.portableFingerprint(text, shingleSize, sketchSize),
      lit(""))

  /** Canonical text normalization for dedup preprocessing: lowercase,
    * strip punctuation to spaces, collapse whitespace runs, trim. Two
    * documents differing only in case/punctuation/spacing normalize to
    * the same bytes, which is what exact-dedup keys and shingle streams
    * want. ONE compiled pass (`Sketches.NormalizeText`) — the
    * declarative chain below runs four passes with regex engines over
    * every byte of the corpus (24 s → a scan-speed pass on the sf10
    * soak corpus); [[normalizeTextDeclarative]] stays as the
    * cross-checked reference form.
    */
  def normalizeText(text: Column): Column =
    graft.functions.Sketches.normalizeText(text)

  /** The declarative builtin chain — byte-identical to
    * [[normalizeText]] (parity is spec-pinned); kept as the
    * independent reference implementation. */
  def normalizeTextDeclarative(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", " "),
      "\\s+", " "))

  /** Word n-grams as strings (space-joined), for contamination checks
    * where the oracle must reproduce the grams exactly (hash-free). */
  def wordNgrams(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.{shims => S}
    S.column(graft.functions.Sketches.WordGrams(S.expression(text), n))
  }

  /** Gopher-style repetition filters (Rae et al. 2021 §A1.1): fraction
    * of duplicate segments, fraction of characters inside duplicate
    * segments, and the character share of the single most frequent word
    * 2-gram. One pass over sorted in-row arrays — map-only, codegen'd,
    * no shuffle; the standard pre-training repetition gate.
    *
    * Returns struct(dup_seg_frac, dup_seg_char_frac, top_bigram_char_frac).
    */
  def repetitionStats(text: Column): Column = {
    import org.apache.spark.sql.graft.{shims => S}
    S.column(graft.functions.Sketches.RepetitionStats(S.expression(text)))
  }

  /** Full Gopher §A1.1 rule-set raw counts (Rae et al. 2021 appendix
    * A1.1), one compiled scan-speed pass — no shuffle, no per-rule
    * re-tokenization. Returns exact-integer counts; pair with
    * [[gopherPass]] for the standard accept/reject decision. */
  def gopherStats(text: Column): Column = {
    import org.apache.spark.sql.graft.{shims => S}
    S.column(graft.functions.Sketches.GopherStats(S.expression(text)))
  }

  /** The Gopher §A1.1 accept decision over [[gopherStats]] output:
    *   - 50 ≤ word count ≤ 100,000
    *   - 3 ≤ mean word length ≤ 10
    *   - hash-to-word and ellipsis-to-word ratios ≤ 0.1
    *   - ≤ 90% of lines start with a bullet; ≤ 30% end with an ellipsis
    *   - ≥ 80% of words contain an alphabetic character
    *   - at least 2 of Gopher's 8 English stop words present
    * Thresholds are arguments so pipelines can re-tune per corpus. */
  def gopherPass(stats: Column,
      minWords: Long = 50L, maxWords: Long = 100000L,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, maxBulletFrac: Double = 0.9,
      maxEllipsisLineFrac: Double = 0.3, minAlphaFrac: Double = 0.8,
      minStopHits: Long = 2L): Column = {
    val w = stats.getField("n_words").cast("double")
    val lines = greatest(stats.getField("n_lines"), lit(1L)).cast("double")
    val meanLen = stats.getField("word_len_sum").cast("double") / greatest(w, lit(1.0))
    stats.getField("n_words").between(minWords, maxWords) &&
      meanLen.between(minMeanWordLen, maxMeanWordLen) &&
      (stats.getField("n_hash").cast("double") / greatest(w, lit(1.0))) <= maxSymbolRatio &&
      (stats.getField("n_ellipsis").cast("double") / greatest(w, lit(1.0))) <= maxSymbolRatio &&
      (stats.getField("n_bullet_lines").cast("double") / lines) <= maxBulletFrac &&
      (stats.getField("n_ellipsis_lines").cast("double") / lines) <= maxEllipsisLineFrac &&
      (stats.getField("n_alpha_words").cast("double") / greatest(w, lit(1.0))) >= minAlphaFrac &&
      stats.getField("n_stop_hits") >= minStopHits
  }

  /** PII redaction: emails, IPv4s and long digit runs (phone-ish)
    * replaced with typed tokens, plus per-kind match counts. RE2-safe
    * patterns (work identically in Spark and the DuckDB oracle). One
    * projection — at 100 TB this is a scan-speed rewrite.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\b[0-9][0-9()+. -]{7,}[0-9]\\b"

  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Re, "<IP>")
    regexp_replace(noIp, PhoneRe, "<PHONE>")
  }

  def piiCounts(text: Column): Column = struct(
    size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long").as("emails"),
    size(regexp_extract_all(text, lit(Ipv4Re), lit(0))).cast("long").as("ips"))

  /** Unigram-frequency document scoring — the CCNet/Gopher "LM
    * perplexity" stage with a corpus-trained unigram model standing in
    * for KenLM. Two distributed passes:
    *
    *   1. vocabulary: token → corpus count (one hash aggregation with
    *      map-side combine), kept where count >= minCount. A COUNT
    *      THRESHOLD, not a top-K: membership is deterministic (no
    *      tie-broken cutoff) and the pass never needs a global sort.
    *   2. scoring: explode doc tokens, join the vocabulary on token
    *      (AQE broadcasts it when small; at 100 TB the join shuffles
    *      by token, both sides key-partitioned, no driver state), then
    *      one per-doc aggregation.
    *
    * Outputs are exact integers — token total, out-of-vocabulary
    * count, summed corpus frequency — so the oracle compare is
    * bit-stable; the floating rarity score derives from them
    * downstream (freq_sum/n_tokens ≈ unigram likelihood proxy:
    * LOW values = rare/garbled text, the tail CCNet trims).
    */
  def unigramStats(docs: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      minCount: Long = 2L): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col(idCol),
      explode(filter(split(lower(col(textCol)), "\\s+"), t => length(t) > 0))
        .as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
    toks.join(vocab, Seq("tok"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        count(when(col("cnt").isNull, 1)).as("oov"),
        sum(coalesce(col("cnt"), lit(0L))).as("freq_sum"))
  }

  /** Distributed BPE vocabulary learning (Sennrich et al. 2016, the
    * merge-learning loop behind GPT/Llama-style tokenizers).
    *
    * Classic formulation: merges are learned over the WORD-FREQUENCY
    * table, not the raw corpus — the first aggregation collapses 100 TB
    * of text to one row per distinct word (the only corpus-sized
    * shuffle). Each merge round is then one distributed pair-count over
    * that table (map-side combined; the candidate space is pairs of
    * current symbols) plus a driver-side argmax of ONE (pair, count)
    * row — the merge table itself is hyperparameter-sized state, like
    * IVF centroids. The symbol rewrite is a map; localCheckpoint every
    * few rounds cuts the growing lineage exactly as
    * Dedup.connectedComponents does.
    *
    * Ties break deterministically (count desc, then pair lexicographic)
    * so the learned merge sequence is reproducible across partitionings
    * — the property the spec pins against a single-node reference
    * implementation.
    *
    * Returns the learned merges in order: (rank, left, right).
    */
  def learnBpe(docs: org.apache.spark.sql.DataFrame, textCol: String,
      numMerges: Int, minPairCount: Long = 2L): Seq[(Int, String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words = docs
      .select(explode(filter(split(lower(col(textCol)), "\\s+"),
        w => length(w) > 0)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .as[(String, Long)]
      .map { case (w, c) => (w.map(_.toString), c) }
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String)]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val top = words.rdd
        .flatMap { case (syms, c) =>
          syms.iterator.sliding(2).withPartial(false)
            .map { p => ((p.head, p(1)), c) } }
        .reduceByKey(_ + _)
        .takeOrdered(1)(Ordering.by { case ((a, b), c) => (-c, a, b) })
      top.headOption.filter(_._2 >= minPairCount) match {
        case None => exhausted = true
        case Some(((l, r), _)) =>
          merges += ((rank, l, r))
          val (ml, mr) = (l, r)
          words = words.map { case (syms, c) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == ml && syms(i + 1) == mr) {
                out += ml + mr; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toIndexedSeq, c)
          }
          rank += 1
          if (rank % 8 == 0) words = words.localCheckpoint()
      }
    }
    merges.toSeq
  }

  /** Apply a learned merge table to text: per-word greedy merge in rank
    * order — the tokenizer's encode step, one codegen-free map over the
    * corpus (no shuffle). Returns (doc rows + n_bpe_tokens). */
  def bpeTokenCount(docs: org.apache.spark.sql.DataFrame, textCol: String,
      merges: Seq[(Int, String, String)]): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    val ranked = merges.sortBy(_._1).map { case (_, l, r) => (l, r) }
    val countUdf = udf { (text: String) =>
      if (text == null) 0L
      else text.toLowerCase.split("\\s+").filter(_.nonEmpty).map { w =>
        var syms: IndexedSeq[String] = w.map(_.toString)
        ranked.foreach { case (l, r) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              out += l + r; i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.toIndexedSeq
        }
        syms.length.toLong
      }.sum
    }
    docs.withColumn("n_bpe_tokens", countUdf(col(textCol)))
  }

  /** FNV-1a over a word-range of `words` — both boilerplate passes hash
    * lines with THIS function, so they agree by construction (no
    * dependence on any engine hash). */
  private def lineHash(words: Array[String], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      val w = words(i)
      var j = 0
      while (j < w.length) { h ^= w.charAt(j); h *= 0x100000001b3L; j += 1 }
      h ^= ' '; h *= 0x100000001b3L
      i += 1
    }
    h
  }

  private def splitWords(text: String): Array[String] =
    if (text == null) Array.empty else text.split("\\s+").filter(_.nonEmpty)

  /** Boilerplate-line removal (the RefinedWeb / CCNet line-dedup stage:
    * drop lines whose EXACT text repeats across the corpus ≥ minRepeats
    * times — nav bars, cookie banners, license footers).
    *
    * Lines here are fixed [[wordsPerLine]]-word chunks (the synthetic
    * corpus has no newlines); with real data pass the text pre-split on
    * '\n' through the same pipeline.
    *
    * Scale shape: pass 1 hashes each doc's lines in one compiled UDF
    * and feeds a partially-aggregated count of the 64-bit hashes (the
    * only shuffle, carrying longs, map-side combined); the hot set
    * (count ≥ minRepeats) is the boilerplate sliver — hundreds of longs
    * — shipped to executors in the rebuild UDF's closure, where
    * membership is an O(1) HashSet probe per line. The corpus never
    * shuffles, and the whole rebuild is one compiled pass per doc (the
    * first cut used declarative array lambdas over a broadcast array:
    * the nested-loop join above them disabled whole-stage codegen and
    * the interpreted per-line array scans were ~10× slower). Hot sets
    * beyond `maxDriverSet` switch automatically to [[hotMembership]]'s
    * distributed Bloom-probe + exact-verify path — identical results,
    * no driver set.
    */
  def removeBoilerplateLines(docs: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      wordsPerLine: Int = 5, minRepeats: Long = 3L,
      maxDriverSet: Int = 2000000): org.apache.spark.sql.DataFrame = {
    val wpl = wordsPerLine
    val hashesUdf = udf { (text: String) =>
      val ws = splitWords(text)
      Array.tabulate((ws.length + wpl - 1) / wpl) { i =>
        lineHash(ws, i * wpl, math.min((i + 1) * wpl, ws.length)) }
    }
    // a local function VALUE, not a def: a nested def compiles to a
    // module instance method and the udf closure would drag the whole
    // (non-serializable) TextAnalysis module into the task
    val rebuild: (String, Long => Boolean) => (Long, Long, String) = (text, isHot) => {
      val ws = splitWords(text)
      val n = (ws.length + wpl - 1) / wpl
      val sb = new StringBuilder
      var dropped = 0L
      var i = 0
      while (i < n) {
        val until = math.min((i + 1) * wpl, ws.length)
        if (isHot(lineHash(ws, i * wpl, until))) dropped += 1
        else {
          var j = i * wpl
          while (j < until) {
            if (sb.nonEmpty) sb.append(' ')
            sb.append(ws(j)); j += 1
          }
        }
        i += 1
      }
      (n.toLong, dropped, sb.toString)
    }
    val rebuilt = hotMembership(docs, idCol, textCol, hashesUdf,
        minRepeats, maxDriverSet) match {
      case Left(hot) =>
        val rebuildUdf = udf { (text: String) => rebuild(text, hot.contains) }
        docs.select(col(idCol).as("doc_id"), rebuildUdf(col(textCol)).as("r"))
      case Right(docHot) =>
        val rebuildUdf = udf { (text: String, hs: Seq[Long]) =>
          rebuild(text, if (hs == null) _ => false else hs.toSet)
        }
        docs.select(col(idCol).as("doc_id"), col(textCol).as("_txt"))
          .join(docHot, Seq("doc_id"), "left")
          .select(col("doc_id"), rebuildUdf(col("_txt"), col("hot_hs")).as("r"))
    }
    rebuilt
      .select(col("doc_id"), col("r._1").as("n_lines"),
        col("r._2").as("n_dropped"), col("r._3").as("clean_text"))
      .filter(col("n_lines") > 0)
  }

  /** Hot-hash membership for the span/line dedup rebuilds. The common
    * case (real corpora: the over-duplicated sliver is small) collects
    * the hot hashes once and ships them in the rebuild closure —
    * `Left(set)`. When the sliver exceeds `maxDriverSet` (adversarial
    * corpus: every line repeated), membership resolves DISTRIBUTED
    * instead — the [[graft.operators.Dedup.decontaminateBloom]]
    * pattern: a distributed-built Bloom filter over the hot hashes
    * probes each doc's hashes at scan speed, the surviving sliver
    * exact-verifies against the true hot table (false positives drop),
    * and each doc gets back its own verified-hot array —
    * `Right(doc_id, hot_hs)`. Results are identical either way; the
    * driver never holds more than `maxDriverSet` hashes. */
  private def hotMembership(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String,
      hashesUdf: org.apache.spark.sql.expressions.UserDefinedFunction,
      minOcc: Long, maxDriverSet: Int)
      : Either[Set[Long], org.apache.spark.sql.DataFrame] = {
    val hot = docs
      .select(explode(hashesUdf(col(textCol))).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= minOcc)
      .select("h")
      .localCheckpoint(eager = true) // one aggregation pass, both branches
    val cap = math.min(maxDriverSet, Int.MaxValue - 1)
    val sample = hot.limit(cap + 1).collect()
    if (sample.length <= cap) Left(sample.map(_.getLong(0)).toSet)
    else {
      val bloom = hot.stat.bloomFilter("h", math.max(hot.count(), 1L), 0.001)
      Right(docs
        .select(col(idCol).as("doc_id"), explode(hashesUdf(col(textCol))).as("h"))
        .filter(graft.functions.Sketches.bloomProbeLong(col("h"), bloom))
        .join(hot, Seq("h")) // exact verify: Bloom false positives drop
        .groupBy(col("doc_id"))
        .agg(array_distinct(collect_list(col("h"))).as("hot_hs")))
    }
  }

  /** Exact repeated-substring (span) removal — Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better"
    * (arXiv:2107.06499, the ExactSubstr variant): any k-word span whose
    * exact text occurs at least `minOccurrences` times across the
    * corpus (intra-document repeats count) is removed from EVERY
    * document — a word drops when at least one flagged overlapping
    * k-gram covers it; surviving words keep their order.
    *
    * Distributed shape (the [[removeBoilerplateLines]] pattern, but
    * over OVERLAPPING grams): pass 1 hashes every k-gram in one
    * compiled UDF per document and partially aggregates 64-bit counts
    * — the only corpus shuffle, carrying longs with map-side combine;
    * the repeated sliver (count ≥ minOccurrences) ships to executors
    * in the rebuild UDF's closure, where membership is an O(1) probe
    * per gram and the corpus never shuffles again. Slivers beyond
    * `maxDriverSet` switch automatically to [[hotMembership]]'s
    * distributed Bloom-probe + exact-verify path — identical results,
    * no driver set.
    */
  def removeRepeatedSpans(docs: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      k: Int = 8, minOccurrences: Long = 2L,
      maxDriverSet: Int = 2000000): org.apache.spark.sql.DataFrame = {
    val kk = k
    val gramsUdf = udf { (text: String) =>
      val ws = splitWords(text)
      if (ws.length < kk) Array.empty[Long]
      else Array.tabulate(ws.length - kk + 1)(i => lineHash(ws, i, i + kk))
    }
    // function value, not def — see removeBoilerplateLines
    val rebuild: (String, Long => Boolean) => (String, Long, Long) = (text, isHot) => {
      val ws = splitWords(text)
      val n = ws.length
      val covered = new Array[Boolean](n)
      var flagged = 0L
      if (n >= kk) {
        var i = 0
        while (i <= n - kk) {
          if (isHot(lineHash(ws, i, i + kk))) {
            flagged += 1
            var j = i
            while (j < i + kk) { covered(j) = true; j += 1 }
          }
          i += 1
        }
      }
      val sb = new StringBuilder
      var removed = 0L
      var j = 0
      while (j < n) {
        if (covered(j)) removed += 1
        else {
          if (sb.nonEmpty) sb.append(' ')
          sb.append(ws(j))
        }
        j += 1
      }
      (sb.toString, removed, flagged)
    }
    val rebuilt = hotMembership(docs, idCol, textCol, gramsUdf,
        minOccurrences, maxDriverSet) match {
      case Left(hot) =>
        val rebuildUdf = udf { (text: String) => rebuild(text, hot.contains) }
        docs.select(col(idCol).as("doc_id"), rebuildUdf(col(textCol)).as("r"))
      case Right(docHot) =>
        val rebuildUdf = udf { (text: String, hs: Seq[Long]) =>
          rebuild(text, if (hs == null) _ => false else hs.toSet)
        }
        docs.select(col(idCol).as("doc_id"), col(textCol).as("_txt"))
          .join(docHot, Seq("doc_id"), "left")
          .select(col("doc_id"), rebuildUdf(col("_txt"), col("hot_hs")).as("r"))
    }
    rebuilt
      .select(col("doc_id"), col("r._1").as("kept_text"),
        col("r._2").as("n_removed_words"), col("r._3").as("n_flagged_grams"))
  }

  /** fastText/CCNet-style trainable quality classifier: logistic
    * regression over hashed uni+bigram PRESENCE features (the CCNet
    * pipeline's lid/quality filter stage; same md5 feature space as
    * DSIR — `Sketches.DsirBuckets`, binarized per doc).
    *
    * Distributed shape: features materialize ONCE as per-doc distinct
    * bucket-id arrays (localCheckpoint; the corpus-sized pass). Each
    * training iteration is then ONE aggregation — score every doc with
    * the compiled `BucketScore` expression (weights ride as a reference
    * object), explode bucket ids with the doc's residual and sum per
    * bucket: a map-side-combined shuffle of (bucket, residual) pairs
    * into ≤ 16^hexDigits+1 groups. The weight vector (hyperparameter-
    * sized, like IVF centroids / DSIR ratios) updates driver-side with
    * a decayed-lr full-batch gradient step — decay is what keeps the
    * trajectory stable (plain Newton steps on thousands of correlated
    * presence features overshoot and oscillate between the majority
    * classes). Nothing corpus-sized ever reaches the driver; full-batch
    * gradients are partitioning-independent up to float summation
    * order.
    *
    * The last weight slot is the bias: a sentinel bucket id appended to
    * every doc's feature array, so bias learns through the same
    * aggregation as the weights.
    *
    * @return weights of length 16^hexDigits + 1 (bias last), for
    *         [[classifierScore]].
    */
  def trainTextClassifier(docs: org.apache.spark.sql.DataFrame,
      textCol: String, labelCol: Column,
      hexDigits: Int = 3, iters: Int = 15, lr: Double = 8.0,
      lrDecay: Double = 0.5, l2: Double = 1e-3): Array[Double] = {
    val nBuckets = 1 << (4 * hexDigits)
    val feats = docs.select(
        labelCol.cast("double").as("y"),
        concat(
          array_distinct(
            graft.functions.Sketches.dsirBuckets(col(textCol), hexDigits)),
          array(lit(nBuckets))).as("b"))
      .localCheckpoint(eager = true)
    val n = feats.count().toDouble
    require(n > 0, "empty training set")
    val w = new Array[Double](nBuckets + 1)
    // Each iteration is ONE map-only stage: every partition scores its
    // docs against the broadcast-sized weight array and accumulates a
    // DENSE gradient (nBuckets+1 doubles), merged on the driver — no
    // shuffle, no explode, no per-bucket row traffic. Replaces the
    // previous explode→groupBy→collect (2 stages + AQE replan per
    // iteration; the gradient itself is hyperparameter-sized either
    // way). The update rule is unchanged, including its only-observed-
    // buckets scope (the old collect only returned buckets present in
    // the data; `seen` reproduces that so unobserved weights skip the
    // l2 decay exactly as before).
    val featsRdd = feats.queryExecution.toRdd
    var seen: Array[Boolean] = null
    var it = 0
    while (it < iters) {
      val wLocal = w.clone()
      val trackSeen = seen == null
      val (grad, seenNow) = featsRdd.mapPartitions { rows =>
        val g = new Array[Double](wLocal.length)
        val s = if (trackSeen) new Array[Boolean](wLocal.length) else null
        rows.foreach { row =>
          if (!row.isNullAt(0) && !row.isNullAt(1)) {
            val y = row.getDouble(0)
            val b = row.getArray(1)
            val p = 1.0 / (1.0 +
              math.exp(-graft.functions.SketchOps.bucketScore(b, wLocal)))
            val r = p - y
            var i = 0
            val m = b.numElements()
            while (i < m) {
              val bk = b.getInt(i)
              g(bk) += r
              if (trackSeen) s(bk) = true
              i += 1
            }
          }
        }
        Iterator((g, s))
      }.reduce { (a, b) =>
        val (ga, sa) = a; val (gb, sb) = b
        var i = 0
        while (i < ga.length) {
          ga(i) += gb(i)
          if (sa != null && sb(i)) sa(i) = true
          i += 1
        }
        a
      }
      if (trackSeen) seen = seenNow
      val step = lr / (1.0 + lrDecay * it)
      var bk = 0
      while (bk < w.length) {
        if (seen(bk)) w(bk) -= step * (grad(bk) / n + l2 * w(bk))
        bk += 1
      }
      it += 1
    }
    // the checkpoint blocks are training scaffolding only (the caller
    // gets the weight array) — release them instead of waiting for GC.
    // Unpersist exactly the persisted RDDs in THIS frame's lineage
    // (walk featsRdd's dependency DAG for non-NONE storage levels); a
    // global before/after keyset diff could sweep up RDDs cached
    // concurrently by unrelated work on the same context.
    def unpersistLineage(r: org.apache.spark.rdd.RDD[_],
        seenIds: scala.collection.mutable.Set[Int]): Unit =
      if (seenIds.add(r.id)) {
        if (r.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
          r.unpersist(blocking = false)
        r.dependencies.foreach(d => unpersistLineage(d.rdd, seenIds))
      }
    unpersistLineage(featsRdd, scala.collection.mutable.Set.empty[Int])
    w
  }

  /** Sigmoid probability of [[trainTextClassifier]]'s model on raw
    * text — one compiled pass (distinct buckets scored through the
    * trained weight array; the bias is the extra slot). */
  def classifierScore(text: Column, weights: Array[Double], hexDigits: Int = 3): Column = {
    val linear = graft.functions.Sketches.bucketScore(
      concat(
        array_distinct(
          graft.functions.Sketches.dsirBuckets(text, hexDigits)),
        array(lit(weights.length - 1))), weights)
    lit(1.0) / (lit(1.0) + exp(-linear))
  }
}
