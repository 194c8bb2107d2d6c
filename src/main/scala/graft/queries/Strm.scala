package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.{MatchRecognize => MR, Streams}
import graft.sources.Tables

/** Streaming-operator surface (SURVEY.md §2.D streaming: hopping /
  * session windows, MATCH_RECOGNIZE) run in batch mode over `events`
  * so the DuckDB oracle can replay the window semantics exactly. The
  * same transforms run unchanged on a streaming frame (see
  * StreamingSpec).
  */
object Strm {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact streaming dedup, BATCH contract: dedupStream falls back to
    // dropDuplicates on a non-streaming frame. The projection is
    // key-determined (every column a function of the dedup key), so
    // which duplicate survives is immaterial and the oracle is a plain
    // DISTINCT — the streaming side (watermark-bounded state) keeps
    // its MemoryStream specs.
    "strm_dedup_exact" -> ((s, d) =>
      Streams.dedupStream(
        t(s, d, "events").select((col("event_id") % 500).as("k"),
          ((col("event_id") % 500) * 3 + 1).as("v")),
        Seq("k"))),

    // Hopping window 6h size / 3h hop (mkql_multihopping.h): each
    // event contributes to two windows.
    "strm_window_hopping" -> ((s, d) =>
      Streams.hoppingWindow(t(s, d, "events"), col("ts"), "6 hours", "3 hours",
          Seq.empty, Seq(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value")))
        .select(col("window.start").as("ws"), col("window.end").as("we"),
          col("cnt"), col("sum_value"))),

    // Session windows per user, 6h inactivity gap
    // (yql_opt_window.cpp:3364 SessionWindowTraits).
    "strm_window_session" -> ((s, d) =>
      Streams.sessionWindow(t(s, d, "events"), col("ts"), "6 hours",
          Seq(col("user_id")),
          Seq(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value")))
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"), col("cnt"), col("sum_value"))),

    // Interval (stream-stream) join in batch form: purchases within
    // [click, click+6h] per user — the same expression runs streaming
    // with watermark-bounded state (StreamingSpec).
    "strm_interval_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts"), col("value"))
      Streams.intervalJoin(clicks, purchases, Seq("user_id"),
        "ts", "pts", "0 seconds", "6 hours")
        .agg(count(lit(1)).as("pairs"),
          round(sum(col("value")), 2).as("total_value"))
    }),

    // MATCH_RECOGNIZE: PARTITION BY user_id ORDER BY event_id
    // PATTERN (E{3}) DEFINE E AS event_type = 'error'
    // AFTER MATCH SKIP TO NEXT ROW — overlapping error bursts.
    "strm_match_recognize" -> ((s, d) => {
      val ev = t(s, d, "events").select("user_id", "event_id", "event_type")
      MR.oneRowPerMatch(
        ev,
        partitionBy = Seq("user_id"),
        orderBy = Seq("event_id"),
        pattern = Seq(MR.times("E", 3)(_.getAs[String]("event_type") == "error")),
        measures = vars => {
          val es = vars("E")
          Seq(es.head.getAs[Long]("event_id"), es.last.getAs[Long]("event_id"))
        },
        measureSchema = StructType(Seq(
          StructField("start_id", LongType), StructField("end_id", LongType))),
        skip = MR.SkipToNextRow)
    }),

    // TimeOrderRecover (mkql_time_order_recover.h): restore per-key
    // event-time order without a global sort. Arrival order is first
    // scrambled, recovery co-locates each key and sorts within the
    // partition, and positions are assigned by a partition-local
    // counter — NO further exchange; the oracle's row_number() proves
    // the recovered order is exactly event-time order per key.
    "strm_time_order_recover" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_id"), col("user_id"), col("ts"))
        .repartition(pmod(col("event_id"), lit(17)).cast("int"))
      val rec = Streams.timeOrderRecover(ev, col("user_id"),
        struct(col("ts"), col("event_id")))
      val schema = StructType(Seq(StructField("user_id", LongType),
        StructField("event_id", LongType), StructField("pos", LongType)))
      s.createDataFrame(
        rec.select(col("user_id"), col("event_id")).rdd.mapPartitions { it =>
          var cur = Long.MinValue; var first = true; var p = 0L
          it.map { r =>
            val u = r.getLong(0)
            if (first || u != cur) { cur = u; p = 0L; first = false }
            p += 1
            org.apache.spark.sql.Row(u, r.getLong(1), p)
          }
        }, schema)
    }),

    // Streaming::Process (streaming_udf.cpp:694): pipe string records
    // through an external command, one process per partition. Same code
    // path on a streaming micro-batch (StreamingSpec runs it under
    // readStream).
    "strm_process_pipe" -> ((s, d) =>
      Streams.process(
        t(s, d, "part").select(col("p_name")),
        "p_name", Seq("tr", "a-z", "A-Z"))
        .groupBy(col("value")).agg(count(lit(1)).as("cnt"))))

  val oracles: Map[String, String] = Map(
    "strm_dedup_exact" ->
      """SELECT DISTINCT event_id % 500 AS k,
           (event_id % 500) * 3 + 1 AS v FROM events""",
    "strm_time_order_recover" ->
      """SELECT user_id, event_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pos
         FROM events""",
    "strm_interval_join" ->
      """SELECT COUNT(*) AS pairs, ROUND(SUM(p.value), 2) AS total_value
        |FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
        |JOIN (SELECT user_id, ts AS pts, value FROM events
        |      WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id
        | AND p.pts >= c.ts AND p.pts <= c.ts + INTERVAL '6 hours'""".stripMargin,
    "strm_window_hopping" ->
      """SELECT ws, ws + INTERVAL '6 hours' AS we, count(*) AS cnt,
        |  sum(value) AS sum_value
        |FROM (SELECT unnest([time_bucket(INTERVAL '3 hours', ts),
        |        time_bucket(INTERVAL '3 hours', ts) - INTERVAL '3 hours']) AS ws,
        |      value FROM events)
        |GROUP BY ws""".stripMargin,

    "strm_window_session" ->
      """WITH marked AS (SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR ts - lag(ts) OVER w > INTERVAL '6 hours' THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |islands AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS sid FROM marked)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL '6 hours' AS session_end,
        |  count(*) AS cnt, sum(value) AS sum_value
        |FROM islands GROUP BY user_id, sid""".stripMargin,

    "strm_match_recognize" ->
      """SELECT user_id, event_id AS start_id, e2 AS end_id
        |FROM (SELECT user_id, event_id, event_type,
        |    lead(event_type, 1) OVER w AS t1, lead(event_type, 2) OVER w AS t2,
        |    lead(event_id, 2) OVER w AS e2
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
        |WHERE event_type = 'error' AND t1 = 'error' AND t2 = 'error'""".stripMargin,
    "strm_process_pipe" ->
      """SELECT upper(p_name) AS value, CAST(COUNT(*) AS BIGINT) AS cnt
         FROM part GROUP BY 1""")
}
