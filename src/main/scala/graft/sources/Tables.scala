package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table catalog over a testdata scale-factor directory.
  *
  * The reference addresses tables by Cypress path (`//path/to/table`,
  * see /root/reference/yt/yt/client/api/table_client.h); here a "static
  * table" is a parquet path under a directory, loaded as a DataFrame and
  * registered as a temp view so both the DataFrame API and `spark.sql`
  * can reach it. Scans stay declarative so Catalyst gets pushdown,
  * pruning and vectorized parquet reads for free.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Load one table. Never caches — Catalyst column pruning + filter
    * pushdown on the parquet scan beat an uncompressed memory cache at
    * 100 TB scale.
    *
    * `events.ts` normalizes to microsecond TimestampType — the precision
    * the reference's Timestamp logical type carries (row_base.h: µs since
    * epoch) — whatever physical encoding the parquet writer chose:
    * TIMESTAMP(NANOS) arrives as a long (legacy nanosAsLong) and is
    * divided down; timestamp[us] (isAdjustedToUTC=false → TIMESTAMP_NTZ)
    * casts losslessly under the engine's fixed UTC session timezone.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(path(dir, name))
    if (name == "events") {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types._
      df.schema("ts").dataType match {
        case LongType => // nanos-as-long from TIMESTAMP(NANOS) parquet
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _: TimestampNTZType =>
          df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      }
    } else df
  }

  /** Register every table in `dir` as a temp view (idempotent). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach { n =>
      load(spark, dir, n).createOrReplaceTempView(n)
    }

  /** Persist a table bucketed+sorted by its key prefix — the engine's
    * equivalent of the reference's sorted-table key metadata that
    * enables co-located merge joins without re-partitioning
    * (`CommonKeyPrefix`, query.h:345; `GetJoinGroups`, query.h:377:
    * joins on a shared key prefix skip the foreign-key re-lookup).
    * Two tables bucketed the same way join with NO exchange on either
    * side — at 100 TB that's the difference between a full dual
    * shuffle and a local merge per bucket.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
