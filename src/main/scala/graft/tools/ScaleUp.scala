package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-soak corpus generator: blow an existing sf directory up K×
  * (default 10) into a target directory, for SCALING.md decades beyond
  * the driver-provided testdata.
  *
  * Method: K key-shifted copies per fact table — copy i shifts every
  * key column by i·stride (stride = max(key)+1 per table), so each copy
  * is an independent, join-consistent shard: referential integrity
  * (lineitem→orders/part/supplier, orders→customer) holds within every
  * copy and the key spaces never collide. Dimension tables
  * (region/nation) stay fixed, like TPC-H.
  *
  * Dedup-sensitive payloads are DECORRELATED across copies so the
  * near-dup workloads scale linearly instead of quadratically
  * exploding on artificial cross-copy duplicates:
  *   - documents.text: every word gets a copy suffix (word → word_i),
  *     preserving each copy's internal gram/dup structure exactly;
  *   - embeddings.embedding: a per-copy deterministic ±1 sign mask
  *     multiplies each component — cosines WITHIN a copy are exactly
  *     preserved (both vectors carry the same mask), cosines ACROSS
  *     copies decorrelate to ~0.
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <dstDir> [copies]
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.GraftSession.quietLogs(spark)
    new java.io.File(dst).mkdirs()

    def load(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def save(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")
    def stride(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).collect().head.getLong(0) + 1L

    // fixed dims
    save(load("region"), "region")
    save(load("nation"), "nation")

    def copies(df: DataFrame, shifts: Map[String, Long],
        extra: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until k).map { i =>
        val shifted = shifts.foldLeft(df) { case (d, (c, s)) =>
          d.withColumn(c, col(c) + lit(i * s))
        }
        extra(shifted, i)
      }.reduce(_.unionByName(_))

    val cust = load("customer"); val cStride = stride(cust, "c_custkey")
    // c_name carries a unique-index contract (dyn_index_unique): copy
    // suffixes keep names corpus-unique like the keys
    save(copies(cust, Map("c_custkey" -> cStride), (d, i) =>
      if (i == 0) d
      else d.withColumn("c_name", concat(col("c_name"), lit(s"_$i")))),
      "customer")

    val supp = load("supplier"); val sStride = stride(supp, "s_suppkey")
    save(copies(supp, Map("s_suppkey" -> sStride)), "supplier")

    val part = load("part"); val pStride = stride(part, "p_partkey")
    save(copies(part, Map("p_partkey" -> pStride)), "part")

    val ord = load("orders"); val oStride = stride(ord, "o_orderkey")
    save(copies(ord, Map("o_orderkey" -> oStride, "o_custkey" -> cStride)),
      "orders")

    val li = load("lineitem")
    save(copies(li, Map("l_orderkey" -> oStride, "l_partkey" -> pStride,
      "l_suppkey" -> sStride)), "lineitem")

    val ev = load("events")
    val eStride = stride(ev, "event_id")
    val uStride = stride(ev, "user_id")
    save(copies(ev, Map("event_id" -> eStride, "user_id" -> uStride)),
      "events")

    val docs = load("documents"); val dStride = stride(docs, "doc_id")
    save(copies(docs, Map("doc_id" -> dStride), (d, i) =>
      if (i == 0) d
      else d.withColumn("text",
        regexp_replace(col("text"), "(\\S+)", "$1" + s"_$i"))), "documents")

    val emb = load("embeddings"); val vStride = stride(emb, "vec_id")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    save(copies(emb, Map("vec_id" -> vStride), (d, i) => {
      if (i == 0) d
      else {
        val rnd = new java.util.Random(1000L + i)
        val mask = Array.fill(dim)(if (rnd.nextBoolean()) 1.0f else -1.0f)
        val maskCol = array(mask.map(lit): _*)
        d.withColumn("embedding",
          zip_with(col("embedding"), maskCol, (x, s) => x * s))
      }
    }), "embeddings")

    println(s"[scaleup] wrote ${k}x of $src to $dst")
    spark.stop()
  }
}
