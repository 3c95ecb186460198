package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Batch-equivalent semantics of the streaming operator surface (SURVEY.md
  * §2.9, T2–T6). The reference only streams presentation text (SSE,
  * reference: final/app.py:157-164); real stream processing is a north-star
  * extension. The t2 contract checks these BATCH analogs on the static
  * `events` table; streaming execution itself ([[graft.streaming]]) is
  * verified by unit tests proving stream-vs-batch result equivalence.
  *
  * Time is floored to whole epoch seconds before bucketing/gap arithmetic so
  * the engine (microsecond timestamps) and the DuckDB oracle (nanosecond
  * parquet timestamps) bucket identically.
  */
object StreamAnalogQueries {

  type Q = (SparkSession, String) => DataFrame

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val D18_4 = DecimalType(18, 4)

  /** Epoch seconds (floored) — cross-engine-stable bucketing basis. */
  private def epochS(c: String): org.apache.spark.sql.Column =
    unix_timestamp(col(c))

  // ------------------------------------------------ Q36 tumbling window (T2)
  /** T2: 5-minute tumbling buckets per event type, count + exact decimal sum. */
  private def q36(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "events")
      .groupBy(col("event_type"), floor(epochS("ts") / 300).as("bucket"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(D18_4)).cast(DoubleType).as("sval"))
      .orderBy("event_type", "bucket")

  private val q36Sql =
    """SELECT event_type, CAST(FLOOR(epoch(ts)/300) AS BIGINT) AS bucket, COUNT(*) AS cnt,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sval
      |FROM events GROUP BY event_type, bucket ORDER BY event_type, bucket""".stripMargin

  // ------------------------------------------------- Q37 sliding window (T3)
  /** T3: 10-minute windows sliding by 5 — every event lands in exactly two
    * windows; window id = start/300.
    */
  private def q37(s: SparkSession, dir: String): DataFrame = {
    val b = floor(epochS("ts") / 300)
    val e = T(s, dir, "events")
    // Aggregate BEFORE the window doubling (r18, guide §2.3): every event
    // lands in windows wb and wb−1, so sliding(w) = tumbling(w) +
    // tumbling(w+1). The old shape unionAll'd the RAW events and
    // aggregated 2× the rows; tumbling-first scans and aggregates the
    // events once, then doubles only the per-bucket partials — bounded by
    // the time span (types × buckets), not the event volume, which is why
    // the eager checkpoint that stops the two union branches re-executing
    // the aggregation is safe at any scale. sum-of-counts ≡
    // count-of-union per (type, window) by construction.
    val tumb = e.groupBy(col("event_type"), b.as("wb"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    tumb.unionAll(tumb.select(col("event_type"), (col("wb") - 1).as("wb"), col("cnt")))
      .groupBy("event_type", "wb").agg(sum(col("cnt")).as("cnt"))
      .orderBy("event_type", "wb")
  }

  private val q37Sql =
    """SELECT event_type, wb, COUNT(*) AS cnt FROM (
      |  SELECT event_type, CAST(FLOOR(epoch(ts)/300) AS BIGINT) AS wb FROM events
      |  UNION ALL
      |  SELECT event_type, CAST(FLOOR(epoch(ts)/300) AS BIGINT) - 1 FROM events) u
      |GROUP BY event_type, wb ORDER BY event_type, wb""".stripMargin

  // ------------------------------------------------- Q38 session window (T4)
  /** T4: 30-minute-gap sessions per user (lag + cumulative session id);
    * output per user: session count + longest session (in events).
    */
  private def q38(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("es")
    val sess = T(s, dir, "events")
      .select(col("user_id"), epochS("ts").as("es"))
      .withColumn("gap", col("es") - lag(col("es"), 1).over(byUser))
      .withColumn("new_s", when(col("gap").isNull || col("gap") > 1800, 1).otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    sess.groupBy("user_id", "sid").agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), max(col("len")).as("max_len"))
      .orderBy("user_id")
  }

  private val q38Sql =
    """WITH e AS (SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS es FROM events),
      |s AS (SELECT user_id, es,
      |        CASE WHEN es - LAG(es) OVER (PARTITION BY user_id ORDER BY es) IS NULL
      |               OR es - LAG(es) OVER (PARTITION BY user_id ORDER BY es) > 1800
      |             THEN 1 ELSE 0 END AS new_s
      |      FROM e),
      |t AS (SELECT user_id, SUM(new_s) OVER (PARTITION BY user_id ORDER BY es
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM s),
      |g AS (SELECT user_id, sid, COUNT(*) AS len FROM t GROUP BY user_id, sid)
      |SELECT user_id, COUNT(*) AS n_sessions, MAX(len) AS max_len
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin

  // ------------------------------------------------------ Q39 watermark (T5)
  /** T5 batch analog: drop events older than 10 minutes before the global max
    * timestamp (late-data drop), count survivors per type.
    */
  private def q39(s: SparkSession, dir: String): DataFrame = {
    val e = T(s, dir, "events").select(col("event_type"), epochS("ts").as("es"))
    val mx = e.agg(max(col("es")).as("mx"))
    e.crossJoin(mx)
      .filter(col("es") >= col("mx") - 600)
      .groupBy("event_type").agg(count(lit(1)).as("cnt"))
      .orderBy("event_type")
  }

  private val q39Sql =
    """SELECT event_type, COUNT(*) AS cnt FROM (
      |  SELECT event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) AS es FROM events) e
      |WHERE es >= (SELECT MAX(CAST(FLOOR(epoch(ts)) AS BIGINT)) FROM events) - 600
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // --------------------------------------------------- Q40 stream dedup (T6)
  /** T6/X3: exact dedup on the event identity triple. The timestamp is
    * floored to seconds for engine/oracle precision parity.
    */
  private def q40(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "events")
      .select(col("user_id"), col("event_type"), epochS("ts").as("es"))
      .distinct()
      .agg(count(lit(1)).as("distinct_events"))

  private val q40Sql =
    """SELECT COUNT(*) AS distinct_events FROM (
      |  SELECT DISTINCT user_id, event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) AS es FROM events) d""".stripMargin

  // ------------------------------------------------------------------ registry

  val defs: Map[String, Q] = Map(
    "q36_tumbling_window" -> q36 _,
    "q37_sliding_window" -> q37 _,
    "q38_session_window" -> q38 _,
    "q39_watermark_drop" -> q39 _,
    "q40_stream_dedup" -> q40 _
  )

  val oracle: Map[String, String] = Map(
    "q36_tumbling_window" -> q36Sql,
    "q37_sliding_window" -> q37Sql,
    "q38_session_window" -> q38Sql,
    "q39_watermark_drop" -> q39Sql,
    "q40_stream_dedup" -> q40Sql
  )
}
