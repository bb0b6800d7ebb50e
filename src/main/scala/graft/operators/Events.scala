package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table: windowed
  * aggregation, gap sessionization, JSON payload extraction, ordered
  * funnels. These are the batch twins of the Structured Streaming
  * pipeline in graft.streaming (same logical transforms, different
  * source/sink), mirroring how the reference's TCP stream would be
  * analyzed downstream of ingestion.
  *
  * Scale posture: everything keys/shuffles on user_id (or the window
  * bucket) exactly once; sessionization is a per-key linear window
  * scan, never a self-join.
  */
object Events {
  import Relational.{cents, epochS}

  // ─── ev_tumbling: tumbling event-time window aggregate ───
  def evTumbling(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy(date_trunc("hour", col("ts")).as("hour_ts"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        cents(sum(col("value"))).as("value_cents"))
      .select(epochS(col("hour_ts")).as("hour_epoch"), col("event_type"),
        col("n_events"), col("value_cents"))
      .orderBy(col("hour_epoch"), col("event_type"))

  val evTumblingSql: String =
    s"""SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_epoch,
       |  event_type, count(*) AS n_events,
       |  ${Tables.centsSql("sum(value)")} AS value_cents
       |FROM events GROUP BY 1, 2 ORDER BY hour_epoch, event_type""".stripMargin

  // ─── ev_sessionize: 30-minute-gap sessionization ───
  // New session when the gap to the previous event of the same user
  // exceeds 1800s. One shuffle on user_id; two linear window passes.
  def evSessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables(spark, dir).events
      .withColumn("epoch", epochS(col("ts")))
      .withColumn("prev_epoch", lag(col("epoch"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_epoch").isNull ||
          col("epoch") - col("prev_epoch") > 1800, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("epoch")).as("session_start_epoch"),
        max(col("epoch")).as("session_end_epoch"),
        count(lit(1)).as("n_events"),
        cents(sum(col("value"))).as("value_cents"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val evSessionizeSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, value,
       |    CAST(floor(epoch(ts)) AS BIGINT) AS epoch, ts
       |  FROM events
       |), flagged AS (
       |  SELECT *, CASE WHEN lag(epoch) OVER w IS NULL
       |      OR epoch - lag(epoch) OVER w > 1800 THEN 1 ELSE 0 END AS is_new
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), sess AS (
       |  SELECT *, CAST(sum(is_new) OVER (
       |    PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |  FROM flagged
       |)
       |SELECT user_id, session_id, min(epoch) AS session_start_epoch,
       |  max(epoch) AS session_end_epoch, count(*) AS n_events,
       |  ${Tables.centsSql("sum(value)")} AS value_cents
       |FROM sess GROUP BY user_id, session_id
       |ORDER BY user_id, session_id""".stripMargin

  // ─── ev_session_native: Spark's native session_window operator ───
  // The same 30-minute-gap semantics as ev_sessionize but via the
  // built-in session_window aggregate — the operator a Spark-first
  // user reaches for, and the one that carries over unchanged to
  // Structured Streaming (StreamRelationalSpec drives it on a
  // stream with a watermark). Native semantics are µs-precise: a
  // session extends while ts < session_end (= last ts + gap), so the
  // DuckDB twin flags a new session at gap ≥ 1800s in epoch_us —
  // NOT the floored-seconds logic of ev_sessionize; keeping both
  // queries documents the subtle boundary difference.
  def evSessionNative(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        cents(sum(col("value"))).as("value_cents"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"), col("value_cents"))
      .orderBy(col("user_id"), col("start_us"))

  val evSessionNativeSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, value, epoch_us(ts) AS us, ts FROM events
       |), flagged AS (
       |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
       |      OR us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS is_new
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), sess AS (
       |  SELECT *, sum(is_new) OVER (
       |    PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |  FROM flagged
       |)
       |SELECT user_id, min(us) AS start_us,
       |  max(us) + 1800000000 AS end_us, count(*) AS n_events,
       |  ${Tables.centsSql("sum(value)")} AS value_cents
       |FROM sess GROUP BY user_id, sid
       |ORDER BY user_id, start_us""".stripMargin

  // ─── ev_json_props: JSON payload extraction ───
  def evJsonProps(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .withColumn("k_val",
        get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(sum(col("k_val")).as("k_sum"),
        max(col("k_val")).as("k_max"),
        count(when(col("k_val") > 50, 1)).as("n_high"))
      .orderBy(col("event_type"))

  val evJsonPropsSql: String =
    """SELECT event_type,
      |  CAST(sum(k_val) AS BIGINT) AS k_sum, max(k_val) AS k_max,
      |  count(CASE WHEN k_val > 50 THEN 1 END) AS n_high
      |FROM (SELECT event_type,
      |    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
      |  FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ─── ev_funnel: ordered signup→purchase funnel per user ───
  def evFunnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
    e.groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", col("ts"))).as("signup_ts"),
        max(when(col("event_type") === "purchase", col("ts"))).as("last_purchase_ts"))
      .withColumn("converted",
        when(col("signup_ts").isNotNull &&
          col("last_purchase_ts") > col("signup_ts"), 1).otherwise(0))
      .select(col("user_id"), epochS(col("signup_ts")).as("signup_epoch"),
        col("converted"))
      .orderBy(col("user_id"))
  }

  val evFunnelSql: String =
    """SELECT user_id,
      |  CAST(floor(epoch(min(CASE WHEN event_type = 'signup' THEN ts END))) AS BIGINT) AS signup_epoch,
      |  CASE WHEN min(CASE WHEN event_type = 'signup' THEN ts END) IS NOT NULL
      |    AND max(CASE WHEN event_type = 'purchase' THEN ts END)
      |      > min(CASE WHEN event_type = 'signup' THEN ts END)
      |    THEN 1 ELSE 0 END AS converted
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // ─── ev_pattern: adjacent-event sequence detection ───
  // MATCH_RECOGNIZE-lite: an error IMMEDIATELY followed (no
  // intervening event for that user) by a purchase within one hour.
  // lead() over the per-user event-time order — one shuffle on
  // user_id, linear per key; never a self-join on proximity (which
  // would be a range join over the whole event stream). Ties broken
  // by event_id so the adjacency relation is total and both engines
  // see the same sequence.
  def evPattern(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables(spark, dir).events
      .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
      .withColumn("next_ts", lead(col("ts"), 1).over(byUser))
      .filter(col("event_type") === "error" && col("next_type") === "purchase" &&
        epochS(col("next_ts")) - epochS(col("ts")) <= 3600)
      .select(col("user_id"), col("event_id").as("err_id"),
        epochS(col("ts")).as("err_epoch"),
        (epochS(col("next_ts")) - epochS(col("ts"))).as("gap_sec"))
      .orderBy(col("err_id"))
  }

  val evPatternSql: String =
    """WITH seq AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    lead(event_type) OVER w AS next_type,
      |    lead(ts) OVER w AS next_ts
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT user_id, event_id AS err_id,
      |  CAST(floor(epoch(ts)) AS BIGINT) AS err_epoch,
      |  CAST(floor(epoch(next_ts)) AS BIGINT) - CAST(floor(epoch(ts)) AS BIGINT) AS gap_sec
      |FROM seq
      |WHERE event_type = 'error' AND next_type = 'purchase'
      |  AND CAST(floor(epoch(next_ts)) AS BIGINT) - CAST(floor(epoch(ts)) AS BIGINT) <= 3600
      |ORDER BY err_id""".stripMargin

  // ─── ev_pattern_quant: quantified 3-step sequence ───
  // MATCH_RECOGNIZE with a quantifier: error, then AT LEAST ONE
  // click, then the next purchase — all inside 48 hours (the event
  // stream is sparse: ~1 event/user/10h, so a tighter window never
  // contains an intermediate click). No
  // self-joins: a running click count per user plus two
  // conditional-min windows over the FOLLOWING rows. The trick that
  // keeps it one pass: cum_clicks is monotone in event order, so the
  // earliest following purchase also carries the MINIMUM cum_clicks
  // among following purchases — min() recovers both its time and its
  // click count without joining back to the purchase row. Clicks
  // strictly between the two anchors = cum(purchase) − cum(error)
  // (neither anchor is a click). One shuffle on user_id, linear per
  // key.
  def evPatternQuant(spark: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val upTo = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val after = order.rowsBetween(1, Window.unboundedFollowing)
    Tables(spark, dir).events
      .withColumn("cum_clicks",
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).over(upTo))
      .withColumn("np_ts",
        min(when(col("event_type") === "purchase", col("ts"))).over(after))
      .withColumn("np_cum",
        min(when(col("event_type") === "purchase", col("cum_clicks"))).over(after))
      .filter(col("event_type") === "error" && col("np_ts").isNotNull &&
        epochS(col("np_ts")) - epochS(col("ts")) <= 172800 &&
        col("np_cum") - col("cum_clicks") >= 1)
      .select(col("user_id"), col("event_id").as("err_id"),
        epochS(col("ts")).as("err_epoch"),
        (epochS(col("np_ts")) - epochS(col("ts"))).as("gap_sec"),
        (col("np_cum") - col("cum_clicks")).as("n_clicks_between"))
      .orderBy(col("err_id"))
  }

  val evPatternQuantSql: String =
    """WITH seq AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_clicks
      |  FROM events),
      |nxt AS (
      |  SELECT *,
      |    min(CASE WHEN event_type = 'purchase' THEN ts END) OVER w AS np_ts,
      |    min(CASE WHEN event_type = 'purchase' THEN cum_clicks END) OVER w AS np_cum
      |  FROM seq
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
      |SELECT user_id, event_id AS err_id,
      |  CAST(floor(epoch(ts)) AS BIGINT) AS err_epoch,
      |  CAST(floor(epoch(np_ts)) AS BIGINT) - CAST(floor(epoch(ts)) AS BIGINT) AS gap_sec,
      |  CAST(np_cum - cum_clicks AS BIGINT) AS n_clicks_between
      |FROM nxt
      |WHERE event_type = 'error' AND np_ts IS NOT NULL
      |  AND CAST(floor(epoch(np_ts)) AS BIGINT) - CAST(floor(epoch(ts)) AS BIGINT) <= 172800
      |  AND np_cum - cum_clicks >= 1
      |ORDER BY err_id""".stripMargin

  // ─── ts_fill: time-series resample + forward fill ───
  // Regularize the irregular event stream onto an hourly grid per
  // event_type, forward-filling empty hours with the last observed
  // hourly sum. The grid is data-derived (global [min, max] hour) so
  // the plan is deterministic; grid×type is a broadcast of two tiny
  // frames; the fill is last(ignoreNulls) over a per-type linear
  // window — one shuffle on event_type, no per-gap self-joins.
  def tsFill(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
    val hourly = ev
      .groupBy(date_trunc("hour", col("ts")).as("hour_ts"), col("event_type"))
      .agg(cents(sum(col("value"))).as("sum_cents"))
    val span = ev.agg(
      date_trunc("hour", min(col("ts"))).as("h0"),
      date_trunc("hour", max(col("ts"))).as("h1"))
    val grid = span.select(explode(
      expr("sequence(h0, h1, INTERVAL 1 HOUR)")).as("hour_ts"))
    val types = ev.select(col("event_type")).distinct()
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("hour_ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.crossJoin(broadcast(types))
      .join(hourly, Seq("hour_ts", "event_type"), "left")
      .withColumn("filled", col("sum_cents").isNull)
      .withColumn("sum_cents",
        last(col("sum_cents"), ignoreNulls = true).over(w))
      .filter(col("sum_cents").isNotNull) // leading hours before first datum
      .select(epochS(col("hour_ts")).as("hour_epoch"), col("event_type"),
        col("sum_cents"), col("filled"))
      .orderBy(col("hour_epoch"), col("event_type"))
  }

  val tsFillSql: String =
    s"""WITH hourly AS (
       |  SELECT date_trunc('hour', ts) AS hour_ts, event_type,
       |    ${Tables.centsSql("sum(value)")} AS sum_cents
       |  FROM events GROUP BY 1, 2),
       |span AS (SELECT date_trunc('hour', min(ts)) AS h0,
       |                date_trunc('hour', max(ts)) AS h1 FROM events),
       |grid AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour_ts
       |         FROM span),
       |typed AS (SELECT g.hour_ts, t.event_type
       |          FROM grid g CROSS JOIN (SELECT DISTINCT event_type FROM events) t),
       |joined AS (
       |  SELECT t.hour_ts, t.event_type, h.sum_cents,
       |    h.sum_cents IS NULL AS filled
       |  FROM typed t LEFT JOIN hourly h
       |    ON t.hour_ts = h.hour_ts AND t.event_type = h.event_type),
       |flled AS (
       |  SELECT CAST(floor(epoch(hour_ts)) AS BIGINT) AS hour_epoch, event_type,
       |    last_value(sum_cents IGNORE NULLS) OVER (
       |      PARTITION BY event_type ORDER BY hour_ts
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_fill,
       |    filled
       |  FROM joined)
       |SELECT hour_epoch, event_type, sum_fill AS sum_cents, filled
       |FROM flled WHERE sum_fill IS NOT NULL
       |ORDER BY hour_epoch, event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_tumbling" -> evTumbling,
    "ev_sessionize" -> evSessionize,
    "ev_json_props" -> evJsonProps,
    "ev_funnel" -> evFunnel,
    "ev_pattern" -> evPattern,
    "ts_fill" -> tsFill,
    "ev_session_native" -> evSessionNative,
    "ev_pattern_quant" -> evPatternQuant)

  val oracle: Map[String, String] = Map(
    "ev_tumbling" -> evTumblingSql,
    "ev_sessionize" -> evSessionizeSql,
    "ev_json_props" -> evJsonPropsSql,
    "ev_funnel" -> evFunnelSql,
    "ev_pattern" -> evPatternSql,
    "ts_fill" -> tsFillSql,
    "ev_session_native" -> evSessionNativeSql,
    "ev_pattern_quant" -> evPatternQuantSql)
}
