package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** Unfolded index (ESecondaryIndexKind::Unfolded,
    * secondary_index/schema.cpp): the indexed column is a LIST; the
    * index holds one row per list ELEMENT, so membership predicates
    * (`list_contains(col, v)` ≈ the reference's unfolding of
    * `value IN unfolded_col`) become an equality scan of the index.
    * `listCol` must be an array column; it unfolds into a scalar column
    * of the same name.
    */
  def buildUnfolded(primary: DataFrame, listCol: String, keys: Seq[String]): DataFrame =
    primary.select(explode(col(listCol)).as(listCol) +: keys.map(col): _*)
      .repartitionByRange(col(listCol))
      .sortWithinPartitions(col(listCol))

  /** Unique index (ESecondaryIndexKind::Unique): at most one primary
    * row per indexed value — the write path rejects duplicates, so the
    * build enforces it: any duplicate indexed value fails the job (the
    * reference returns `UniqueIndexConflict` on write). The check rides
    * inside the plan (no extra pass): the key column is wrapped in a
    * conflict guard evaluated per group.
    */
  def buildUnique(primary: DataFrame, indexed: Seq[String], keys: Seq[String]): DataFrame = {
    val g = primary.groupBy(indexed.map(col): _*)
      .agg(count(lit(1)).as("_n"),
        keys.map(k => first(col(k)).as(k)): _*)
    val guarded = keys.foldLeft(g) { (df, k) =>
      df.withColumn(k, when(col("_n") > 1,
        raise_error(concat(lit(s"unique index conflict on ("),
          concat_ws(",", indexed.map(col): _*), lit(")"))))
        .otherwise(col(k)))
    }
    guarded.drop("_n")
      .repartitionByRange(indexed.map(col): _*)
      .sortWithinPartitions(indexed.map(col): _*)
  }

  /** Predicated index (ESecondaryIndexKind + TIndexSchema::Predicate):
    * the index only materializes rows satisfying `indexPred`, so it is
    * smaller and cheaper to maintain; a query through it answers
    * `pred AND indexPred` (the reference's transform verifies the query
    * predicate implies the index predicate before substituting).
    */
  def buildPredicated(primary: DataFrame, indexed: Seq[String], keys: Seq[String],
      indexPred: Column): DataFrame =
    build(primary.filter(indexPred), indexed, keys)

  /** `SELECT * FROM primary WITH INDEX index WHERE pred` — pred must
    * only reference index columns. Works for all kinds: full-sync,
    * unfolded (pred on the element column), unique, predicated (the
    * result is implicitly restricted to the index predicate — semi-join
    * keys must then be the primary key so non-matching rows drop). */
  def query(primary: DataFrame, index: DataFrame, keys: Seq[String],
      pred: String): DataFrame = {
    val hits = index.where(pred).select(keys.map(index.col): _*).distinct()
    primary.join(broadcast(hits), keys, "left_semi")
  }
}
