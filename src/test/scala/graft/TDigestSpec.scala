package graft

import org.apache.spark.sql.functions._
import graft.functions.TDigestSketch
import graft.functions.YqlModules.Stat

/** Stat::TDigest (stat_udf.h / tdigest.cpp): quantile accuracy, the
  * serialize/deserialize/merge round trip, NaN handling, and the
  * distributed aggregate forms. */
class TDigestSpec extends SparkSpec {

  test("percentile accuracy on a known distribution (local sketch)") {
    val d = TDigestSketch()
    val rnd = new scala.util.Random(42)
    (1 to 100000).foreach(_ => d.add(rnd.nextDouble()))
    // uniform [0,1): quantile q ≈ q
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      assert(math.abs(d.percentile(q) - q) < 0.01, s"q=$q got ${d.percentile(q)}")
    }
    // rank is the inverse
    for (v <- Seq(0.1, 0.5, 0.9)) {
      assert(math.abs(d.rank(v) - v) < 0.01)
    }
  }

  test("serialize/deserialize round trip preserves quantiles exactly") {
    val d = TDigestSketch()
    (1 to 10000).foreach(i => d.add(i.toDouble))
    val bytes = d.serialize()
    val back = TDigestSketch.deserialize(bytes)
    for (q <- Seq(0.0, 0.25, 0.5, 0.75, 1.0)) {
      assert(back.percentile(q) === d.percentile(q))
    }
    assert(back.count === d.count)
  }

  test("merged shard sketches match a single-pass sketch's accuracy") {
    val rnd = new scala.util.Random(7)
    val data = Array.fill(50000)(rnd.nextGaussian())
    val whole = TDigestSketch()
    data.foreach(whole.add(_))
    val shards = data.grouped(5000).map { chunk =>
      val s = TDigestSketch(); chunk.foreach(s.add(_)); s.serialize()
    }.toSeq
    val merged = TDigestSketch()
    shards.foreach(b => merged.addSketch(TDigestSketch.deserialize(b)))
    val sorted = data.sorted
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val exact = sorted(((q * data.length).toInt).min(data.length - 1))
      assert(math.abs(merged.percentile(q) - exact) < 0.05,
        s"q=$q merged=${merged.percentile(q)} exact=$exact")
    }
    assert(merged.count === data.length.toDouble)
  }

  test("empty and NaN handling follow the reference") {
    val empty = TDigestSketch()
    assert(empty.percentile(0.5) === 0.0) // tdigest.cpp:150: empty → 0.0
    val withNaN = TDigestSketch()
    withNaN.add(Double.NaN)
    assert(withNaN.percentile(0.5).isNaN) // only-NaN sketch → NaN
    val mixed = TDigestSketch()
    mixed.add(1.0); mixed.add(Double.NaN); mixed.add(3.0)
    assert(mixed.percentile(1.0).isNaN) // NaN sorts above all (p>=1 → NaN)
    assert(!mixed.percentile(0.5).isNaN)
    // NaN flag survives serialization
    val back = TDigestSketch.deserialize(mixed.serialize())
    assert(back.percentile(1.0).isNaN)
  }

  test("distributed aggregate matches exact percentiles within t-digest bounds") {
    import spark.implicits._
    val df = (1 to 20000).map(i => (i % 4, i.toDouble)).toDF("g", "v")
    val out = df.groupBy($"g")
      .agg(Stat.tdigest($"v").as("sk"), count(lit(1)).as("n"))
      .select($"g", $"n",
        Stat.getPercentile($"sk", 0.5).as("p50"),
        Stat.getRank($"sk", lit(10000.0)).as("r10k"))
      .collect()
    assert(out.length === 4)
    out.foreach { r =>
      // values per group are uniform over ~[1, 20000] stepping by 4
      assert(math.abs(r.getDouble(2) - 10000.0) < 250.0, r.toString)
      assert(math.abs(r.getDouble(3) - 0.5) < 0.02)
    }
  }

  test("merge aggregate over persisted sketch bytes equals direct sketch") {
    import spark.implicits._
    val df = (1 to 20000).map(i => (i % 4, i % 16, i.toDouble)).toDF("g", "shard", "v")
    val perShard = df.groupBy($"g", $"shard").agg(Stat.tdigest($"v").as("sk"))
    val rolled = perShard.groupBy($"g")
      .agg(Stat.tdigestMerge($"sk").as("sk"))
      .select($"g", Stat.getPercentile($"sk", 0.9).as("p90"))
      .collect()
    rolled.foreach { r =>
      assert(math.abs(r.getDouble(1) - 18000.0) < 400.0, r.toString)
    }
  }

  test("proto wire bytes: known single-centroid sketch layout") {
    val d = TDigestSketch()
    d.add(2.5)
    val b = d.serialize()
    // Delta=1 double 0.01, K=2 double 25.0, one centroid {mean 2.5, w 1.0}
    assert(b(0) === 0x09.toByte)
    assert(b(9) === 0x11.toByte)
    assert(b(18) === 0x1a.toByte)
    assert(b(19) === 18.toByte)
    val mean = java.nio.ByteBuffer.wrap(b, 21, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getDouble
    assert(mean === 2.5)
  }
}
