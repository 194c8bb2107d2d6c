package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Scale design: queries are a small broadcast side; the corpus streams
  * once. Brute force is the exact baseline (one pass, top-k per query
  * via window over query partitions — k·|Q| rows survive the shuffle).
  * The LSH variant buckets the corpus by random-hyperplane sign bits so
  * each query only scans its bucket — the 100 TB path where a full scan
  * per query batch is too expensive.
  *
  * All dot products run in double via zip_with + aggregate (codegen'd
  * higher-order functions, no UDFs).
  */
object Similarity {
  /** sum(a_i * b_i) in double precision — single-pass expression
    * ([[graft.functions.Sketches.DotProduct]]); the declarative
    * zip_with form allocates an intermediate array per evaluation,
    * which turns all-pairs scoring quadratic in allocations. */
  def dot(a: Column, b: Column): Column =
    graft.functions.Sketches.dotProduct(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    graft.functions.Sketches.cosineSim(a, b)

  /** Exact brute-force cosine top-k: for each query row, the k corpus
    * rows with highest cosine similarity (excluding self-matches by id).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("item_id"), col(vecCol).as("item_vec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
    val scored = c.join(broadcast(q), col("item_id") =!= col("query_id"))
      .select(col("query_id"), col("item_id"),
        cosine(col("query_vec"), col("item_vec")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("item_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("item_id"), round(col("cos"), 4).as("cos"),
        col("rank").cast("long").as("rank"))
  }

  /** Random hyperplane signature: `bits` sign bits packed into a long.
    * Deterministic hyperplanes from a seeded PRNG, dim `dim`.
    */
  def hyperplaneSignature(vec: Column, dim: Int, bits: Int, seed: Long = 42L): Column = {
    val rnd = new java.util.Random(seed)
    val planes = Array.fill(bits, dim)(rnd.nextGaussian())
    val sigBits = (0 until bits).map { j =>
      val plane = array(planes(j).map(lit(_)): _*)
      when(dot(vec, plane) > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    sigBits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** IVF (inverted-file) ANN: the corpus is partitioned into `nlist`
    * cells by nearest centroid; each query probes its `nprobe` closest
    * cells and brute-forces only those — the classic FAISS-style scale
    * path. Centroids here are a deterministic corpus sample (ids
    * `0..nlist-1`); swap for k-means iterations offline without
    * touching the search. At 100 TB: centroid assignment is one
    * broadcast pass over the corpus (persisted alongside it in
    * practice), and each query batch touches nprobe/nlist of the data.
    */
  /** Distributed Lloyd iterations for IVF centroids: seed with a
    * deterministic corpus sample, then alternate (assign to nearest
    * centroid by cosine) / (element-wise mean per cell). Each
    * iteration is two key-partitioned shuffles — assignment joins a
    * broadcast centroid table, the mean re-aggregates by (cell, dim) —
    * so the pass scales linearly with the corpus and never collects
    * vectors to the driver. localCheckpoint cuts the iteration
    * lineage (same discipline as Dedup.connectedComponents).
    */
  def kmeansCentroids(corpus: DataFrame, nlist: Int, iters: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    var cents = corpus.filter(col(idCol) < nlist)
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent_vec"))
    for (_ <- 0 until iters) {
      val assigned = corpus
        .select(col(idCol).as("item_id"), col(vecCol).as("item_vec"))
        .join(broadcast(cents))
        .select(col("item_id"), col("item_vec"), col("cent_id"),
          cosine(col("item_vec"), col("cent_vec")).as("ccos"))
        .groupBy(col("item_id"))
        .agg(first(col("item_vec")).as("item_vec"),
          max_by(col("cent_id"), col("ccos")).as("cell"))
      cents = assigned
        .select(col("cell").as("cent_id"), posexplode(col("item_vec")))
        .groupBy(col("cent_id"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .groupBy(col("cent_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          e => e.getField("m").cast("float")).as("cent_vec"))
        .localCheckpoint(eager = true)
    }
    cents
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4, idCol: String = "vec_id",
      vecCol: String = "embedding", kmeansIters: Int = 0): DataFrame = {
    val cents =
      if (kmeansIters > 0)
        kmeansCentroids(corpus, nlist, kmeansIters, idCol, vecCol)
      else corpus.filter(col(idCol) < nlist)
        .select(col(idCol).as("cent_id"), col(vecCol).as("cent_vec"))
    // assign corpus rows to their single nearest centroid
    val assigned = corpus
      .select(col(idCol).as("item_id"), col(vecCol).as("item_vec"))
      .join(broadcast(cents))
      .select(col("item_id"), col("item_vec"), col("cent_id"),
        cosine(col("item_vec"), col("cent_vec")).as("ccos"))
      .groupBy(col("item_id"))
      .agg(first(col("item_vec")).as("item_vec"),
        max_by(col("cent_id"), col("ccos")).as("cell"))
    // queries probe their nprobe nearest cells
    val probed = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
      .join(broadcast(cents))
      .select(col("query_id"), col("query_vec"), col("cent_id"),
        cosine(col("query_vec"), col("cent_vec")).as("ccos"))
      .groupBy(col("query_id"))
      .agg(first(col("query_vec")).as("query_vec"),
        slice(sort_array(collect_list(struct(col("ccos"), col("cent_id"))), asc = false),
          1, nprobe).as("probes"))
      .select(col("query_id"), col("query_vec"),
        explode(transform(col("probes"), p => p.getField("cent_id"))).as("cell"))
    val scored = assigned.join(broadcast(probed), Seq("cell"))
      .filter(col("item_id") =!= col("query_id"))
      .select(col("query_id"), col("item_id"),
        cosine(col("query_vec"), col("item_vec")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("item_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("item_id"), round(col("cos"), 4).as("cos"),
        col("rank").cast("long").as("rank"))
  }

  /** LSH-bucketed ANN: corpus and queries hashed into hyperplane-sign
    * buckets; each query scans only probed buckets — its own plus all
    * buckets within `probeRadius` flipped bits (multi-probe recovers
    * near-boundary neighbors). Recall/scan-fraction scales with the
    * radius; on clustered real embeddings small radii suffice, on
    * near-orthogonal data push the radius up. Returns the same schema
    * as [[bruteForceTopK]].
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      bits: Int = 8, probeRadius: Int = 2, tables: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding",
      seed: Long = 42L): DataFrame = {
    // L independent hash tables (the classic recall lever: a true
    // neighbor missed by one table's buckets is caught by another's —
    // union of candidates, each table a fresh hyperplane family). The
    // corpus index carries tables×1 rows per vector, the standard
    // multi-table LSH storage cost; candidates dedup on (query, item)
    // BEFORE scoring so each surviving pair pays exactly one cosine.
    def sig(t: Int, c: Column) =
      hyperplaneSignature(c, dim, bits, seed + t * 7919L)
    val c = corpus.select(col(idCol).as("item_id"), col(vecCol).as("item_vec"),
      posexplode(array((0 until tables).map(t => sig(t, col(vecCol))): _*))
        .as(Seq("table", "bucket")))
    // multi-probe: all masks with <= probeRadius bits set, per table
    val masks = (0L until (1L << bits))
      .filter(m => java.lang.Long.bitCount(m) <= probeRadius)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"),
        posexplode(array((0 until tables).map(t => sig(t, col(vecCol))): _*))
          .as(Seq("table", "sig")))
      .select(col("query_id"), col("query_vec"), col("table"),
        explode(array(masks.map(m => col("sig").bitwiseXOR(lit(m))): _*))
          .as("bucket"))
    // score BEFORE deduplicating: a pair surfacing from T tables pays
    // up to T redundant cosines (cheap, codegen'd) so the dedup
    // shuffle carries (ids, cos) — one double instead of 2×dim floats.
    // At scale the network is the bottleneck, not the arithmetic.
    val scored = c.join(broadcast(q), Seq("table", "bucket"))
      .filter(col("item_id") =!= col("query_id"))
      .select(col("query_id"), col("item_id"),
        cosine(col("query_vec"), col("item_vec")).as("cos"))
      .groupBy(col("query_id"), col("item_id"))
      .agg(max(col("cos")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("item_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("item_id"), round(col("cos"), 4).as("cos"),
        col("rank").cast("long").as("rank"))
  }
}
