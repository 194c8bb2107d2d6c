package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Secondary-index reads — the reference's `WITH INDEX` clause
  * (ast.h:507; rewrite TransformWithIndexStatement,
  * yt/yt/library/query/secondary_index/transform.cpp:137-146; index
  * kinds secondary_index/schema.cpp).
  *
  * The reference rewrites `SELECT ... FROM t WITH INDEX i WHERE p(ic)`
  * into "scan the index table (keyed by the indexed column) with the
  * predicate, then join the primary by primary key". We do the same at
  * the DataFrame level: the index table is a materialized projection
  * `(indexedCols..., primaryKey...)` sorted/partitioned by the indexed
  * columns, so `p` prunes its scan; the surviving keys semi-join the
  * primary.
  *
  * Scale story: the index scan reads only the predicate's slice (range
  * pruning on the index sort key); the key set is usually small →
  * broadcast semi-join against the primary, i.e. a distributed "batch
  * lookup" with no shuffle of the primary — the same asymptotics as the
  * reference's index read followed by keyed lookups.
  */
object SecondaryIndex {

  /** Build (materialize) an index table for `indexed` → `keys`
    * (full-sync index: one row per primary row,
    * secondary_index/schema.cpp). Callers persist this next to the
    * primary and maintain it on write. */
  def build(primary: DataFrame, indexed: Seq[String], keys: Seq[String]): DataFrame =
    primary.select((indexed ++ keys).map(primary.col): _*)
      .repartitionByRange(indexed.map(primary.col): _*)
      .sortWithinPartitions(indexed.map(primary.col): _*)

  /** `SELECT * FROM primary WITH INDEX index WHERE pred` — pred must
    * only reference index columns. */
  def query(primary: DataFrame, index: DataFrame, keys: Seq[String],
      pred: String): DataFrame = {
    val hits = index.where(pred).select(keys.map(index.col): _*).distinct()
    primary.join(broadcast(hits), keys, "left_semi")
  }
}
