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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_tumbling" -> evTumbling,
    "ev_sessionize" -> evSessionize,
    "ev_json_props" -> evJsonProps,
    "ev_funnel" -> evFunnel)

  val oracle: Map[String, String] = Map(
    "ev_tumbling" -> evTumblingSql,
    "ev_sessionize" -> evSessionizeSql,
    "ev_json_props" -> evJsonPropsSql,
    "ev_funnel" -> evFunnelSql)
}
