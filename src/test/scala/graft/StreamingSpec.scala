package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.{MatchRecognize => MR, Streams}

/** Streaming semantics: windows with watermarks on a real stream,
  * queue-consumer offset resume, and the MATCH_RECOGNIZE NFA.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(min * 60000L)

  test("hopping window aggregates a stream with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Double)]
    val df = in.toDF().toDF("ts", "v")
    val agg = Streams.hoppingWindow(
      Streams.withWatermark(df, "ts", "10 minutes"),
      col("ts"), "10 minutes", "5 minutes",
      Seq.empty, Seq(sum(col("v")).as("s")))
    val q = agg.writeStream.format("memory").queryName("hop")
      .outputMode("complete").start()
    in.addData((ts(1), 1.0), (ts(6), 2.0), (ts(11), 4.0))
    q.processAllAvailable()
    val got = spark.table("hop")
      .select(col("window.start").cast("long").as("st"), col("s"))
      .as[(Long, Double)].collect().toMap
    q.stop()
    // minute 1 → windows [-5,5),[0,10); 6 → [0,10),[5,15); 11 → [5,15),[10,20)
    assert(got == Map(-300L -> 1.0, 0L -> 3.0, 300L -> 6.0, 600L -> 4.0))
  }

  test("string-surface GROUP BY HOP wires delay to the watermark on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Double)]
    in.toDF().toDF("ts", "v").createOrReplaceTempView("hopstream")
    // HOP(time, hop, interval, delay): 5m hop, 10m windows, 10m delay —
    // the delay becomes withWatermark on the lowered streaming frame
    val agg = graft.functions.YqlSql.sql(spark,
      """SELECT HOP_START() AS ws, SUM(v) AS s
        |FROM hopstream
        |GROUP BY HOP(ts, 'PT5M', 'PT10M', 'PT10M')""".stripMargin)
    assert(agg.isStreaming)
    val q = agg.writeStream.format("memory").queryName("hopwm")
      .outputMode("append").start()
    in.addData((ts(1), 1.0), (ts(6), 2.0))
    q.processAllAvailable()
    // advance the watermark to 40-10=30m: windows ending <= 30 finalize
    in.addData((ts(40), 8.0))
    q.processAllAvailable()
    // a row at 2m is older than the watermark → DROPPED per delay
    in.addData((ts(2), 100.0))
    q.processAllAvailable()
    // advance to 80-10=70m so the 40m row's windows finalize too
    in.addData((ts(80), 16.0))
    q.processAllAvailable()
    val got = spark.table("hopwm")
      .select(col("ws").cast("long").as("w"), col("s"))
      .as[(Long, Double)].collect().toMap
    q.stop()
    // the late 100.0 never lands: [0,10) stays 3.0
    assert(got.get(-300L).contains(1.0) && got.get(0L).contains(3.0) &&
      got.get(300L).contains(2.0))
    assert(got.get(2100L).contains(8.0) && got.get(2400L).contains(8.0))
    assert(!got.values.exists(_ >= 100.0))
  }

  test("stream-stream interval join matches within the time bound, bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val l = MemoryStream[(Long, Timestamp, String)]
    val r = MemoryStream[(Long, Timestamp, Double)]
    val left = Streams.withWatermark(l.toDF().toDF("k", "lts", "tag"), "lts", "10 minutes")
    val right = Streams.withWatermark(r.toDF().toDF("k", "rts", "v"), "rts", "10 minutes")
    val joined = Streams.intervalJoin(left, right, Seq("k"), "lts", "rts",
      "0 seconds", "5 minutes")
      .select(col("tag"), col("v"))
    val q = joined.writeStream.format("memory").queryName("ivj")
      .outputMode("append").start()
    l.addData((1L, ts(10), "a"), (2L, ts(10), "b"))
    r.addData((1L, ts(12), 1.5), // within [10, 15] → match
      (1L, ts(20), 9.9),         // outside the 5-minute bound
      (2L, ts(9), 7.0))          // before the left event → no match
    q.processAllAvailable()
    val got = spark.table("ivj").as[(String, Double)].collect().toSet
    q.stop()
    assert(got == Set(("a", 1.5)))
  }

  test("interval join of two filters of ONE source is unambiguous (no self-join trap)") {
    // clicks and purchases as two filters of the same frame — the
    // pattern that makes unaliased left(k) === right(k) trivially true
    val ev = Seq((1L, ts(10), "click"), (1L, ts(12), "buy"),
      (1L, ts(30), "buy"), (2L, ts(12), "buy"))
      .toDF("k", "ets", "kind")
    val clicks = ev.filter(col("kind") === "click")
      .withColumnRenamed("ets", "lts")
    val buys = ev.filter(col("kind") === "buy")
      .withColumnRenamed("ets", "rts")
    val j = Streams.intervalJoin(clicks, buys, Seq("k"), "lts", "rts",
      "0 seconds", "5 minutes")
    // only (k=1 click@10, k=1 buy@12) matches: k=2 has no click, the
    // @30 buy is outside the bound — a trivially-true key equality
    // would also admit (click@10, buy@12 of k=2)
    assert(j.count() == 1)
    val cond = j.queryExecution.analyzed.collectFirst {
      case join: org.apache.spark.sql.catalyst.plans.logical.Join =>
        join.condition.get
    }.get
    // the key equality compares two DISTINCT attribute ids
    val eqs = cond.collect {
      case org.apache.spark.sql.catalyst.expressions.EqualTo(
        l: org.apache.spark.sql.catalyst.expressions.AttributeReference,
        r: org.apache.spark.sql.catalyst.expressions.AttributeReference) =>
        (l.exprId, r.exprId)
    }
    assert(eqs.nonEmpty && eqs.forall { case (a, b) => a != b })
  }

  test("keyedUpsertSink: micro-batches key-merge into a keyed table, idempotent replay") {
    graft.functions.YqlDml.dropTableDeep(spark, "strm_keyed")
    graft.functions.YqlSql.sql(spark,
      "CREATE TABLE strm_keyed (k Int64, v Utf8, PRIMARY KEY (k)); SELECT 1 AS one")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_kus").toString
    val q = Streams.keyedUpsertSink(in.toDF().toDF("k", "v"), "strm_keyed", ckpt)
    in.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    in.addData((2L, "B"), (3L, "c"), (2L, "B")) // update + insert + dup delivery
    q.processAllAvailable()
    q.stop()
    assert(spark.table("strm_keyed").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "B"), (3L, "c")))
    graft.functions.YqlDml.dropTableDeep(spark, "strm_keyed")
  }

  test("streaming dedup drops late duplicates with watermark-bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val df = Streams.withWatermark(in.toDF().toDF("id", "ts", "payload"),
      "ts", "10 minutes")
    val q = Streams.dedupStream(df, Seq("id"))
      .select("id", "payload")
      .writeStream.format("memory").queryName("ddp")
      .outputMode("append").start()
    in.addData((1L, ts(1), "first"), (2L, ts(2), "two"))
    q.processAllAvailable()
    in.addData((1L, ts(3), "dup-late")) // same id within watermark → dropped
    q.processAllAvailable()
    val got = spark.table("ddp").as[(Long, String)].collect().toSet
    q.stop()
    assert(got == Set((1L, "first"), (2L, "two")))
  }

  test("session window closes after the gap") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val df = in.toDF().toDF("ts", "uid")
    val agg = Streams.sessionWindow(
      Streams.withWatermark(df, "ts", "1 minute"),
      col("ts"), "5 minutes", Seq(col("uid")), Seq(count(lit(1)).as("cnt")))
    val q = agg.writeStream.format("memory").queryName("sess")
      .outputMode("complete").start()
    in.addData((ts(0), 7L), (ts(2), 7L), (ts(20), 7L))
    q.processAllAvailable()
    val got = spark.table("sess").select("cnt").as[Long].collect().sorted
    q.stop()
    assert(got.toSeq == Seq(1L, 2L)) // [0,2] one session, 20 its own
  }

  test("queue consumer: checkpoint = registered offset, resume reads only new rows") {
    val dir = Files.createTempDirectory("queue").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("ckpt").toFile.getAbsolutePath
    val schema = StructType(Seq(StructField("id", LongType)))
    Seq(1L, 2L).toDF("id").write.mode("append").parquet(dir)

    val sink = Files.createTempDirectory("sink").toFile.getAbsolutePath
    def drain(): Seq[Long] = {
      val q = Streams.readQueue(spark, dir, schema)
        .writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      q.processAllAvailable(); q.stop()
      spark.read.parquet(sink).as[Long].collect().toSeq.sorted
    }
    assert(drain() == Seq(1L, 2L))
    Seq(3L).toDF("id").write.mode("append").parquet(dir)
    // same checkpoint (= registered consumer offset): only new rows flow
    assert(drain() == Seq(1L, 2L, 3L))
    // and the consumed prefix is not re-emitted: exactly one file batch
    // arrived after the append (no duplicates of 1,2 in the sink)
    assert(spark.read.parquet(sink).count() == 3L)
  }

  test("streaming match_recognize emits matches incrementally across triggers") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, String)]
    val df = in.toDF().toDF("k", "seq", "t")
    val out = MR.streamingOneRowPerMatch(
      df, Seq("k"),
      pattern = Seq(MR.times("E", 3)(_.getAs[String]("t") == "e")),
      measures = vars => Seq(vars("E").head.getAs[Long]("seq"),
        vars("E").last.getAs[Long]("seq")),
      measureSchema = StructType(Seq(
        StructField("start_seq", LongType), StructField("end_seq", LongType))))
    val q = out.writeStream.format("memory").queryName("mrstream")
      .outputMode("append").start()
    // first trigger: an incomplete burst (2 e's) — nothing emits
    in.addData((1L, 1L, "e"), (1L, 2L, "e"))
    q.processAllAvailable()
    assert(spark.table("mrstream").count() == 0)
    // the third e completes the pattern across the trigger boundary
    in.addData((1L, 3L, "e"), (1L, 4L, "x"), (1L, 5L, "e"))
    q.processAllAvailable()
    val got = spark.table("mrstream").collect()
    q.stop()
    assert(got.toSeq == Seq(Row(1L, 1L, 3L)))
  }

  test("stateful running aggregates over a keyed stream (mapGroupsWithState)") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Double)]
    val counts = in.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), (Long, Long, Double)](
        GroupStateTimeout.NoTimeout()) {
        (k: Long, rows: Iterator[(Long, Double)], st: GroupState[(Long, Double)]) =>
          val (c0, s0) = st.getOption.getOrElse((0L, 0.0))
          val batch = rows.toSeq
          val next = (c0 + batch.size, s0 + batch.map(_._2).sum)
          st.update(next)
          (k, next._1, next._2)
      }
    val q = counts.toDF("k", "cnt", "sum").writeStream.format("memory")
      .queryName("state").outputMode("update").start()
    in.addData((1L, 1.0), (1L, 2.0), (2L, 5.0))
    q.processAllAvailable()
    in.addData((1L, 3.0))
    q.processAllAvailable()
    val last = spark.table("state").orderBy("k", "cnt").collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.last }
    q.stop()
    assert(last(1L) == Row(1L, 3L, 6.0) && last(2L) == Row(2L, 1L, 5.0))
  }

  test("match_recognize: alternation (A B | C) prefers the leftmost branch") {
    val rows = Seq(
      (1L, 1L, "start"), (1L, 2L, "spike"), (1L, 3L, "end"),   // A B path
      (1L, 4L, "start"), (1L, 5L, "end"),                      // C path (no spike)
      (2L, 1L, "start"), (2L, 2L, "other")                     // no match
    ).toDF("k", "seq", "ev")
    import MR._
    val pat: Seq[MR.Pat] = Seq(
      Leaf(one("S")(_.getString(2) == "start")),
      alt(
        Seq(one("SP")(_.getString(2) == "spike"), one("E")(_.getString(2) == "end")),
        Seq(one("E2")(_.getString(2) == "end"))),
    )
    val got = MR.oneRowPerMatchPattern(rows, Seq("k"), Seq("seq"), pat,
      vars => Seq(
        vars("S").head.getLong(1),
        if (vars("SP").nonEmpty) "spiked" else "plain"),
      StructType(Seq(StructField("start_seq", LongType),
        StructField("kind", StringType))))
      .orderBy("start_seq").collect()
    assert(got.toSeq == Seq(Row(1L, 1L, "spiked"), Row(1L, 4L, "plain")))
  }

  test("match_recognize: greedy DOWN+ UP+ with PREV navigation") {
    val df = Seq(
      (1L, 1L, 10.0), (1L, 2L, 8.0), (1L, 3L, 5.0), (1L, 4L, 7.0), (1L, 5L, 9.0),
      (2L, 1L, 3.0), (2L, 2L, 4.0) // no descent → no match
    ).toDF("k", "seq", "v")
    val out = MR.oneRowPerMatch(
      df, Seq("k"), Seq("seq"),
      pattern = Seq(
        MR.one("A")(_ => true),
        MR.plus("DOWN")((prev, cur) =>
          prev != null && cur.getAs[Double]("v") < prev.getAs[Double]("v")),
        MR.plus("UP")((prev, cur) =>
          prev != null && cur.getAs[Double]("v") > prev.getAs[Double]("v"))),
      measures = vars => Seq(
        vars("A").head.getAs[Double]("v"),
        vars("DOWN").last.getAs[Double]("v"),
        vars("UP").last.getAs[Double]("v")),
      measureSchema = StructType(Seq(
        StructField("start_v", DoubleType), StructField("bottom_v", DoubleType),
        StructField("top_v", DoubleType))))
    assert(out.collect().toSeq == Seq(Row(1L, 10.0, 5.0, 9.0)))
  }

  test("match_recognize: optional + backtracking quantifiers") {
    val df = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "b"), (1L, 4L, "c"))
      .toDF("k", "seq", "t")
    val out = MR.oneRowPerMatch(
      df, Seq("k"), Seq("seq"),
      pattern = Seq(
        MR.one("A")(_.getAs[String]("t") == "a"),
        MR.star("B")((_, cur) => cur.getAs[String]("t") == "b"),
        MR.one("C")(_.getAs[String]("t") == "c")),
      measures = vars => Seq(vars("B").length.toLong),
      measureSchema = StructType(Seq(StructField("b_count", LongType))))
    assert(out.collect().toSeq == Seq(Row(1L, 2L)))
  }

  test("queue → sorted table ingestion: upsert sink merges via DynTable, " +
      "batch retry is idempotent, compaction preserves reads") {
    implicit val sqlCtx = spark.sqlContext
    val state = Files.createTempDirectory("dynstate").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("dynckpt").toFile.getAbsolutePath
    val in = MemoryStream[(Long, Long, String, Double)]
    val stream = in.toDF().toDF("k", "ts", "op", "v")
    val q = Streams.upsertSink(stream, state, ckpt)
    in.addData((1L, 1L, "upsert", 10.0), (2L, 1L, "upsert", 5.0))
    q.processAllAvailable()
    in.addData((1L, 2L, "upsert", 20.0), (2L, 2L, "delete", 0.0))
    q.processAllAvailable()
    q.stop()
    def latest(): Seq[Row] =
      graft.operators.DynTable.readLatest(
        Streams.readState(spark, state).drop("batch"), Seq("k"))
        .orderBy("k").select("k", "v").collect().toSeq
    assert(latest() == Seq(Row(1L, 20.0)))
    // a replayed epoch overwrites its own output — no duplicate state
    // (materialized first: a real retry replays source data, not the sink)
    val replayed = Streams.readState(spark, state).where($"batch" === 1)
      .drop("batch").as[(Long, Long, String, Double)].collect().toSeq
    Streams.upsertSinkBatch(state)(
      replayed.toDF("k", "ts", "op", "v"), 1L)
    assert(latest() == Seq(Row(1L, 20.0)))
    // periodic compaction: rewrite the store, reads unchanged
    val compacted = graft.operators.DynTable.compact(
      Streams.readState(spark, state).drop("batch"), Seq("k"))
    assert(compacted.count() == 1)
  }

  test("Streaming::Process pipes a live stream through an external command") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[String]
    val piped = Streams.process(in.toDF().toDF("t"), "t",
      Seq("tr", "a-z", "A-Z"))
    val q = piped.writeStream.format("memory").queryName("proc")
      .outputMode("append").start()
    in.addData("hello", "world")
    q.processAllAvailable()
    in.addData("again")
    q.processAllAvailable()
    q.stop()
    assert(spark.table("proc").as[String].collect().sorted.toSeq ==
      Seq("AGAIN", "HELLO", "WORLD"))
  }

  test("Streaming::ProcessInline runs a script body; custom delimiters split records") {
    import spark.implicits._
    val df = Seq("a", "bb", "ccc").toDF("t")
    // script body with shebang, executed from a task-local temp file
    val out = Streams.processInline(df, "t",
      "#!/bin/sh\nwhile read x; do echo \"len:${#x}\"; done\n")
      .as[String].collect().sorted.toSeq
    assert(out == Seq("len:1", "len:2", "len:3"))
    // non-newline delimiters: records framed by '|' on both sides;
    // final unterminated chunk still emits
    val piped = Streams.process(Seq("x", "y", "z").toDF("t"), "t",
      Seq("cat"), inputDelimiter = "|", outputDelimiter = "|")
      .as[String].collect().sorted.toSeq
    assert(piped == Seq("x", "y", "z"))
  }
}
