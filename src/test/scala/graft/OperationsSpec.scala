package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{Chopper, Operations}

/** Operation-layer semantics on the reference's fixture shapes
  * (FIXTURES.md A.5: primary sorted by join_by ⊆ sort_by prefix).
  */
class OperationsSpec extends SparkSpec {
  import spark.implicits._

  test("chopper splits sorted stream at key boundaries") {
    val rows = Seq(Row(1L, "a"), Row(1L, "b"), Row(2L, "c"), Row(3L, "d"), Row(3L, "e"))
    val groups = Chopper(rows.iterator, Array(0)).map {
      case (k, it) => (k.getLong(0), it.map(_.getString(1)).mkString)
    }.toList
    assert(groups == List((1L, "ab"), (2L, "c"), (3L, "de")))
  }

  test("chopper drains unconsumed groups") {
    val rows = Seq(Row(1L, "a"), Row(1L, "b"), Row(2L, "c"))
    val keys = Chopper(rows.iterator, Array(0)).map(_._1.getLong(0)).toList
    assert(keys == List(1L, 2L))
  }

  test("chopper handles null keys as a group") {
    val rows = Seq(Row(null, "a"), Row(null, "b"), Row(5L, "c"))
    val groups = Chopper(rows.iterator, Array(0)).map(_._2.size).toList
    assert(groups == List(2, 1))
  }

  test("sortedReduce sees rows in secondary-sort order with key guarantee") {
    val df = Seq(
      ("k1", 3, "c"), ("k1", 1, "a"), ("k1", 2, "b"),
      ("k2", 2, "y"), ("k2", 1, "x")).toDF("k", "ord", "v")
    val out = StructType(Seq(StructField("k", StringType), StructField("seq", StringType)))
    val got = Operations.sortedReduce(df, Seq("k"), Seq("ord"), out) { (key, rows) =>
      Iterator(Row(key.getString(0), rows.map(_.getString(2)).mkString))
    }.as[(String, String)].collect().toMap
    assert(got == Map("k1" -> "abc", "k2" -> "xy"))
  }

  test("sort produces a total order across partitions") {
    val df = spark.range(1000).select((col("id") * 7919 % 1000).as("v"))
    val sorted = Operations.sort(df, Seq(col("v").asc), Some(8))
    val vals = sorted.as[Long].collect()
    assert(vals.toSeq == vals.sorted.toSeq)
  }

  test("erase keeps the complement, including null predicate rows") {
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (2L, "b"), (null, "c"))
      .toDF("k", "v")
    val kept = Operations.erase(df, col("k") === 1L).select("v")
      .as[String].collect().toSet
    // null predicate counts as not-matching the erase range → row kept
    assert(kept == Set("b", "c"))
  }

  test("mapReduce combiner output equals no-combiner output") {
    val in = Seq("a b a", "b c").toDF("text")
    val kv = StructType(Seq(StructField("w", StringType), StructField("n", LongType)))
    val out = StructType(Seq(StructField("w", StringType), StructField("cnt", LongType)))
    val mapper: Iterator[Row] => Iterator[Row] =
      _.flatMap(r => r.getString(0).split(" ").map(Row(_, 1L)))
    val combiner: Iterator[Row] => Iterator[Row] = rows => {
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      rows.foreach(r => m.update(r.getString(0), m.getOrElse(r.getString(0), 0L) + r.getLong(1)))
      m.iterator.map { case (w, n) => Row(w, n) }
    }
    def run(c: Option[Iterator[Row] => Iterator[Row]]) =
      Operations.mapReduce(in, (mapper, kv), Seq("w"), Seq(), c, out) { (k, rows) =>
        Iterator(Row(k.getString(0), rows.map(_.getLong(1)).sum))
      }.as[(String, Long)].collect().toMap
    val expected = Map("a" -> 2L, "b" -> 2L, "c" -> 1L)
    assert(run(Some(combiner)) == expected)
    assert(run(None) == expected)
  }

  test("multi-output map splits one pass into n tables (MapperOutputTableCount)") {
    import org.apache.spark.sql.types._
    val in = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDS()
    val outs = Operations.mapMultiOutput(in, 2) { it =>
      it.map(v => ((v % 2).toInt, Row(v, v * 10)))
    }(StructType(Seq(StructField("v", LongType), StructField("x", LongType))))
    assert(outs.length == 2)
    assert(outs(0).select("v").as[Long].collect().sorted.toSeq == Seq(2L, 4L, 6L))
    assert(outs(1).select("v").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 5L))
    assert(outs(0).columns.toSeq == Seq("v", "x"))
  }

  test("LEFT join with foreign predicate filters foreign rows, keeps primary (config.cpp:1615 foreign semantics)") {
    val primary = Seq((1L, "p1"), (2L, "p2"), (3L, "p3")).toDF("k", "pv")
    val foreign = Seq((1L, 5.0), (2L, 50.0)).toDF("k", "fv")
    // QL: LEFT JOIN foreign ON k = k AND fv > 10 — predicate prunes the
    // foreign side; unmatched primary rows survive with nulls
    val got = primary.join(foreign,
        primary("k") === foreign("k") && foreign("fv") > 10.0, "left")
      .select(primary("k"), col("pv"), col("fv"))
      .orderBy("k").collect()
    assert(got.toSeq == Seq(
      org.apache.spark.sql.Row(1L, "p1", null),
      org.apache.spark.sql.Row(2L, "p2", 50.0),
      org.apache.spark.sql.Row(3L, "p3", null)))
  }

  test("vanilla runs one task per declared slot, no table input") {
    val out = Operations.vanilla(spark, 4)(i => Iterator(i, i * 10))
      .collect().sorted
    assert(out.toSeq == Seq(0, 0, 1, 2, 3, 10, 20, 30))
  }

  test("asofJoin: latest right row at-or-before each left ts, null when none") {
    val left = Seq((1L, 100L, "a"), (1L, 200L, "b"), (2L, 50L, "c"))
      .toDF("k", "ts", "name")
    val right = Seq((1L, 100L, 10.0), (1L, 150L, 20.0), (2L, 60L, 30.0))
      .toDF("k", "rts", "v")
    val got = Operations.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("v"))
      .orderBy("k", "ts").collect()
    // (1,100): equal-ts right row included (<= semantics) → 10.0
    // (1,200): latest at-or-before is 150 → 20.0
    // (2,50): right row at 60 is in the future → null
    assert(got.toSeq == Seq(
      org.apache.spark.sql.Row(1L, 100L, "a", 10.0),
      org.apache.spark.sql.Row(1L, 200L, "b", 20.0),
      org.apache.spark.sql.Row(2L, 50L, "c", null)))
  }

  test("saltedJoin equals the plain join and splits hot keys across salts") {
    import org.apache.spark.sql.functions._
    // one pathological key (0) carrying half the rows
    val skewed = (0L until 2000L).map(i => (if (i % 2 == 0) 0L else i % 50, i))
      .toDF("k", "v")
    val dim = (0L until 50L).map(i => (i, s"d$i")).toDF("k", "name")
    val plain = skewed.join(dim, Seq("k")).agg(count(lit(1)), sum("v")).first()
    val salted = Operations.saltedJoin(skewed, dim, Seq("k"), salt = 8)
      .agg(count(lit(1)), sum("v")).first()
    assert(salted == plain)
    // the hot key's rows really do land in multiple salt buckets
    val buckets = skewed.withColumn("_salt",
        pmod(xxhash64(col("k"), col("v")), lit(8)))
      .filter(col("k") === 0L).select("_salt").distinct().count()
    assert(buckets > 1, s"hot key stayed in $buckets bucket(s)")
  }

  test("pipeMap runs an external binary per partition over a tab-separated pipe") {
    import org.apache.spark.sql.types._
    val in = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("k", "w")
      .repartition(2)
    // the classic unix mapper: upper-case the second field
    val out = Operations.pipeMap(in,
      Seq("awk", "-F\t", "{ print $1 \"\t\" toupper($2) }"),
      StructType(Seq(StructField("k", LongType), StructField("w", StringType))))
    val got = out.orderBy("k").collect()
    assert(got.toSeq == Seq(Row(1L, "ALPHA"), Row(2L, "BETA"), Row(3L, "GAMMA")))
  }

  test("pipeMap fails the task when the user job exits non-zero") {
    import org.apache.spark.sql.types._
    val in = Seq((1L, "a"), (2L, "b")).toDF("k", "w").repartition(1)
    // the job emits one valid row, then dies — without the exit-code
    // check this would pass with silently truncated output
    val e = intercept[Exception] {
      Operations.pipeMap(in,
        Seq("sh", "-c", "head -n 1; echo boom >&2; exit 3"),
        StructType(Seq(StructField("k", LongType), StructField("w", StringType))))
        .collect()
    }
    val msg = Option(e.getMessage).getOrElse(e.getCause.getMessage)
    assert(msg.contains("exit code 3") || e.getCause != null &&
      e.getCause.getMessage.contains("exit code 3"), msg)
  }

  test("hashSample: deterministic, repartition-stable, join-compatible") {
    val left = (1L to 2000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val s1 = Operations.hashSample(left, Seq("k"), 0.2, 7L)
    val c1 = s1.count()
    // fraction lands near 20% (binomial tail at n=2000 is tight)
    assert(c1 > 300 && c1 < 500, s"sampled $c1 of 2000 at p=0.2")
    // deterministic and stable under repartitioning
    val c2 = Operations.hashSample(left.repartition(13), Seq("k"), 0.2, 7L)
    assert(c2.count() == c1)
    assert(s1.select("k").except(c2.select("k")).count() == 0)
    // join compatibility: sample(join) == join(sample, sample) on the key
    val right = (1L to 2000L).map(i => (i, i * 10)).toDF("k", "rv")
    val joinOfSamples = Operations.hashSample(left, Seq("k"), 0.2, 7L)
      .join(Operations.hashSample(right, Seq("k"), 0.2, 7L), "k")
    val sampleOfJoin = Operations.hashSample(left.join(right, "k"),
      Seq("k"), 0.2, 7L)
    assert(joinOfSamples.select("k").except(sampleOfJoin.select("k")).count() == 0)
    assert(sampleOfJoin.select("k").except(joinOfSamples.select("k")).count() == 0)
    // Bernoulli form: same seed twice = same rows
    val b1 = Operations.tableSample(left, 0.3, 99L).select("k").collect().toSet
    val b2 = Operations.tableSample(left, 0.3, 99L).select("k").collect().toSet
    assert(b1 == b2)
    // md5 portable form: same stability properties, and the row set is
    // exactly what any engine computing md5(key)[0,8) < hex(p·2^32) gets
    val m1 = Operations.hashSampleMd5(left, Seq("k"), 0.2)
    val cm = m1.count()
    assert(cm > 300 && cm < 500, s"md5-sampled $cm of 2000 at p=0.2")
    val m2 = Operations.hashSampleMd5(left.repartition(13), Seq("k"), 0.2)
    assert(m2.count() == cm)
    assert(m1.select("k").except(m2.select("k")).count() == 0)
    val expected = (1L to 2000L).filter { i =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      hex < f"${(0.2 * (1L << 32)).toLong}%08x"
    }.toSet
    assert(m1.select("k").collect().map(_.getLong(0)).toSet == expected)
    // stratified: majority class capped, minority kept whole
    val classes = (1L to 1000L).map(i => (i, if (i % 10 == 0L) "rare" else "common"))
      .toDF("k", "cls")
    val strat = Operations.stratifiedSample(classes, "cls",
      Map[Any, Double]("common" -> 0.1, "rare" -> 1.0), 5L)
    val byCls = strat.groupBy("cls").count().as[(String, Long)].collect().toMap
    assert(byCls("rare") == 100L, byCls)
    assert(byCls("common") > 40L && byCls("common") < 180L, byCls)
  }

  test("vanilla: job_count input-less jobs, $YT_JOB_INDEX exported, " +
      "non-zero exit fails the task (vanilla_controller.cpp)") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("job", LongType, nullable = false),
      StructField("v", StringType, nullable = false)))
    val out = Operations.vanilla(spark, 3,
      Seq("sh", "-c", "printf '%s\\thello\\n' \"$YT_JOB_INDEX\""), schema)
      .as[(Long, String)].collect().sorted
    assert(out.toSeq == Seq((0L, "hello"), (1L, "hello"), (2L, "hello")))
    // a failing job fails the operation, not silently truncates
    val ex = intercept[Exception] {
      Operations.vanilla(spark, 2, Seq("sh", "-c", "exit 3"), schema).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("exit code 3")))
  }

  test("shallow merge rejects inputs with incompatible schemas") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-shallow-bad").toString
    Seq((1L, "a")).toDF("k", "v").write.mode("overwrite").parquet(s"$tmp/a")
    Seq((2L, 3.5)).toDF("k", "x").write.mode("overwrite").parquet(s"$tmp/b")
    val ex = intercept[IllegalArgumentException] {
      Operations.shallowMerge(spark, Seq(s"$tmp/a", s"$tmp/b"), s"$tmp/out")
    }
    assert(ex.getMessage.contains("share one schema"))
  }

  test("shallow merge copies chunk files byte-identically (no recompression)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-shallow-spec").toString
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/a")
    Seq((3L, "c")).toDF("k", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/b")
    val n = Operations.shallowMerge(spark, Seq(s"$tmp/a", s"$tmp/b"), s"$tmp/out")
    assert(n == 2)
    // union readable
    val rows = spark.read.parquet(s"$tmp/out").as[(Long, String)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // the chunk bytes are the SOURCE bytes — the whole point: no decode
    def bytes(dir: String): Map[String, Seq[Byte]] = {
      val d = new java.io.File(dir)
      d.listFiles.filter(_.getName.endsWith(".parquet")).map { f =>
        f.getName -> java.nio.file.Files.readAllBytes(f.toPath).toSeq
      }.toMap
    }
    val src = bytes(s"$tmp/a") ++ bytes(s"$tmp/b")
    val out = bytes(s"$tmp/out")
    assert(out.size == 2)
    out.foreach { case (name, b) =>
      val orig = src(name.substring(name.indexOf('-') + 1))
      assert(b == orig, s"chunk $name must be byte-identical to its source")
    }
  }
}
