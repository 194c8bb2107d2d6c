package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing for LLM pretraining: greedily fill fixed token
  * budgets (context windows) with whole documents, so a training run
  * wastes as little padding as possible — the "sample packing" stage
  * that sits between dedup/filtering and shard writing in a
  * training-data pipeline.
  *
  * Distributed shape: packing is sequential by nature (each doc's pack
  * depends on the running fill), so the corpus is split into
  * independent buckets and the greedy scan runs per bucket. One hash
  * exchange on the bucket key plus an in-partition sort — no global
  * sort, no driver state. At 100 TB: buckets ≫ cores (e.g. 100k
  * buckets) keep every executor busy and each greedy scan streams one
  * bucket's docs once; skew is bounded because the bucket key is a
  * hash (or any user expression) over doc ids, not content.
  *
  * Packing rule (deterministic given bucket + order):
  *   - docs are visited per bucket in `orderCol` order;
  *   - a doc joins the current pack unless that would push the fill
  *     past `budget`, in which case it opens the next pack;
  *   - a doc larger than the whole budget gets a pack of its own
  *     (never split — padding-free truncation is the trainer's call).
  *
  * Output = input columns + `pack_id` (per-bucket pack ordinal) +
  * `pack_pos` (doc ordinal inside its pack). The (bucket, pack_id)
  * pair is the global pack key.
  */
object Packing {

  /** Sliding context-window chunking (the tokenizer `stride` /
    * `return_overflowing_tokens` stage): each document's word stream
    * splits into windows of `window` words starting every `stride`
    * words, so consecutive windows overlap by `window - stride` —
    * the standard long-document treatment before packing. Emission
    * rule, pinned for cross-engine parity: window starts are
    * 0, stride, 2·stride, …; a document with n > 0 words emits
    * 1 + max(0, ⌈(n − window) / stride⌉) windows (the last may be
    * short); an empty document emits nothing.
    *
    * Purely map-side — one projection + explode, NO shuffle: at
    * 100 TB the chunking rides the same scan as the quality filters.
    */
  def chunkWindows(input: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val ws = filter(split(col(textCol), "\\s+"), w => length(w) > 0)
    val n = size(ws).cast("long")
    val m = when(n <= 0L, 0L).otherwise(
      lit(1L) + greatest(lit(0L),
        ceil((n - lit(window.toLong)).cast("double") / stride).cast("long")))
    input
      .withColumn("__ws", ws).withColumn("__n", n).withColumn("__m", m)
      .filter(col("__m") > 0L)
      .select(col(idCol).as("doc_id"), col("__ws"), col("__n"),
        explode(sequence(lit(0L), col("__m") - 1L)).as("window_id"))
      .select(col("doc_id"), col("window_id"),
        (col("window_id") * stride).as("start_word"),
        least(lit(window.toLong), col("__n") - col("window_id") * stride)
          .as("n_words"),
        concat_ws(" ", slice(col("__ws"),
          (col("window_id") * stride + 1L).cast("int"),
          least(lit(window.toLong),
            col("__n") - col("window_id") * stride).cast("int")))
          .as("window_text"))
  }

  def packSequences(input: DataFrame, bucketCol: String, orderCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val schema = input.schema
      .add("pack_id", LongType, nullable = false)
      .add("pack_pos", LongType, nullable = false)
    val bIdx = input.schema.fieldIndex(bucketCol)
    val tIdx = input.schema.fieldIndex(tokensCol)
    input
      .repartition(col(bucketCol))
      .sortWithinPartitions(col(bucketCol), col(orderCol))
      .mapPartitions { rows =>
        // a partition holds whole buckets (hash partitioning on the
        // bucket key); greedy state resets at each bucket boundary, so
        // the result is independent of which buckets share a partition
        var curBucket: Any = null
        var started = false
        var pack = 0L
        var pos = 0L
        var fill = 0L
        rows.map { r =>
          val b = r.get(bIdx)
          val tk = r.getLong(tIdx)
          if (!started || b != curBucket) {
            started = true; curBucket = b
            pack = 0L; pos = 0L; fill = 0L
          } else if (fill + tk > budget) {
            pack += 1L; pos = 0L; fill = 0L
          }
          fill += tk
          val out = Row.fromSeq(r.toSeq :+ pack :+ pos)
          pos += 1L
          out
        }
      }(Encoders.row(schema))
  }
}
