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
