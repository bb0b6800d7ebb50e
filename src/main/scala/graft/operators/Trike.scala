package graft.operators

import graft.Tables
import graft.streaming.OcsPipeline
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reference-semantics operators: the mbta/trike OCS→CloudEvent→Kinesis
  * pipeline re-expressed as batch relational plans over the `events`
  * table (the streaming twin lives in graft.streaming.OcsPipeline).
  *
  * Reference semantics mirrored here:
  *  - EOT (0x04) message framing with a partial tail carried as "rest"
  *    (reference lib/trike/proxy.ex:212-217 `extract/1`).
  *  - "HEARTBEAT" keepalives dropped (proxy.ex:242-244 `not_ignored?/1`,
  *    config/config.exs:21).
  *  - CloudEvent projection: id = base64(hash(iso8601(time) ++ message)),
  *    partitionkey, sourceip, time, fixed type/specversion/source
  *    (lib/trike/cloud_event.ex:31-44). The reference hashes with SHA-1;
  *    the oracle-facing queries use SHA-256 because the DuckDB oracle
  *    has no sha1 — graft.functions.CloudEventId keeps the faithful
  *    SHA-1 variant, pinned by a spec.
  *  - One clock read per received packet: every message framed from the
  *    same packet shares `current_time` (proxy.ex:150).
  *  - Per-connection batch put with a sequence chain for ordering
  *    (proxy.ex:171-204).
  *  - Stale/idle connection detection (proxy.ex:125-131) and
  *    per-connection health state (lib/trike/health_checker.ex).
  *
  * The packet fixture is derived deterministically from `events`: one
  * connection per user, one packet per (connection, 10-minute bucket),
  * messages ordered by (ts, event_id), every 7th event a HEARTBEAT, and
  * a "PARTIAL" tail after the last EOT so framing must drop it.
  *
  * Scale posture: everything shuffles once on the connection (or
  * connection+bucket) key; ordered packet assembly is array_sort over
  * collect_list inside a hash aggregate — no window over the full
  * stream, no driver-side state.
  */
object Trike {
  import Relational.epochS

  private val EOT = graft.streaming.OcsPipeline.EOT
  /** Spark SQL split() takes a regex; \u0004 needs no escaping. */
  private val EOT_RE = EOT

  // ─── packet construction (shared fixture prefix) ───
  private def packets(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .withColumn("conn_id", concat(lit("conn-"), col("user_id")))
      .withColumn("msg",
        when(col("event_id") % 7 === 0, lit("HEARTBEAT"))
          .otherwise(concat(col("event_type"), lit(","), col("event_id"))))
      .withColumn("bucket", floor(epochS(col("ts")) / 600).cast("long"))
      .groupBy(col("conn_id"), col("bucket"))
      .agg(
        concat(
          array_join(
            transform(
              array_sort(collect_list(struct(col("ts"), col("event_id"), col("msg")))),
              x => x.getField("msg")),
            EOT),
          lit(EOT), lit("PARTIAL")).as("payload"),
        max(col("ts")).as("receive_ts"))

  private val packetsSql: String =
    """msgs AS (
      |  SELECT 'conn-' || user_id AS conn_id,
      |    CAST(floor(epoch(ts) / 600) AS BIGINT) AS bucket,
      |    CASE WHEN event_id % 7 = 0 THEN 'HEARTBEAT'
      |         ELSE event_type || ',' || event_id END AS msg,
      |    ts, event_id
      |  FROM events),
      |packets AS (
      |  SELECT conn_id, bucket,
      |    string_agg(msg, chr(4) ORDER BY ts, event_id) || chr(4) || 'PARTIAL' AS payload,
      |    max(ts) AS receive_ts
      |  FROM msgs GROUP BY conn_id, bucket)""".stripMargin

  // ─── ocs_frame_extract: EOT framing, drop the partial tail ───
  // proxy.ex:212-217: split on EOT, last element is the unframed rest.
  private def framesPlan(spark: SparkSession, dir: String): DataFrame =
    packets(spark, dir)
      .withColumn("f", split(col("payload"), EOT_RE))
      .withColumn("f", expr("slice(f, 1, size(f) - 1)"))
      .select(col("conn_id"), col("bucket"), col("receive_ts"),
        posexplode(col("f")).as(Seq("pos", "message")))
      .withColumn("pos", col("pos").cast("long"))

  /** Session-shared fixture: all seven trike queries branch off the
    * same packets→frames prefix, which round 4 measured at ~0.7-1.3s
    * of redundant recompute PER QUERY. At 100 TB the framed message
    * stream is the ingestion pipeline's materialization point — a
    * persisted table every downstream analytic reads, never recomputed
    * per query — so the batch twins share one materialization per
    * (session, dir) too. localCheckpoint rather than cache: a durable
    * materialization with explicit release (the predecessor's blocks
    * are dropped when the key changes), not an advisory cache entry.
    * Same sequential-execution assumption as Dedup's signature cache:
    * a dir switch invalidates frames the previous dir's queries
    * returned but haven't yet executed. */
  private var fixture: Option[((SparkSession, String), DataFrame,
    Seq[org.apache.spark.rdd.RDD[_]])] = None

  /** Drop the shared frames fixture and release its checkpoint blocks —
    * for callers that stop the owning session (Bench's chunk recycle).
    * Safe to call when nothing is cached. */
  def invalidate(): Unit = synchronized {
    fixture.foreach { case (_, _, rdds) =>
      rdds.foreach(r => scala.util.Try(r.unpersist(blocking = false)))
    }
    fixture = None
  }

  private def frames(spark: SparkSession, dir: String): DataFrame = synchronized {
    val key = (spark, dir)
    fixture match {
      case Some((k, df, _)) if k == key => df
      case prev =>
        prev.foreach { case (_, _, rdds) =>
          rdds.foreach(r => scala.util.Try(r.unpersist(blocking = false)))
        }
        // Eagerly materialized under a timed-fixture ledger entry so
        // Bench reports the build as its own line item (Families doc).
        val df = graft.Families.timedFixture("trike_frames") {
          val f = framesPlan(spark, dir).localCheckpoint(eager = false)
          f.count()
          f
        }
        fixture = Some((key, df, Graph.ckptRdds(df)))
        df
    }
  }

  private val framesSql: String =
    s"""$packetsSql,
       |fr AS (
       |  SELECT conn_id, bucket, receive_ts, string_split(payload, chr(4)) AS f
       |  FROM packets),
       |frames AS (
       |  SELECT conn_id, bucket, receive_ts, pos, message FROM (
       |    SELECT conn_id, bucket, receive_ts,
       |      unnest(f) AS message, unnest(range(len(f))) AS pos, len(f) AS n
       |    FROM fr)
       |  WHERE pos < n - 1)""".stripMargin

  def ocsFrameExtract(spark: SparkSession, dir: String): DataFrame =
    frames(spark, dir)
      .select(col("conn_id"), col("bucket"), col("pos"), col("message"))
      .orderBy(col("conn_id"), col("bucket"), col("pos"))

  val ocsFrameExtractSql: String =
    s"""WITH $framesSql
       |SELECT conn_id, bucket, pos, message FROM frames
       |ORDER BY conn_id, bucket, pos""".stripMargin

  // ─── ocs_heartbeat_filter: drop keepalives (proxy.ex:242-244) ───
  def ocsHeartbeatFilter(spark: SparkSession, dir: String): DataFrame =
    frames(spark, dir)
      .filter(col("message") =!= "HEARTBEAT")
      .select(col("conn_id"), col("bucket"), col("pos"), col("message"))
      .orderBy(col("conn_id"), col("bucket"), col("pos"))

  val ocsHeartbeatFilterSql: String =
    s"""WITH $framesSql
       |SELECT conn_id, bucket, pos, message FROM frames
       |WHERE message <> 'HEARTBEAT'
       |ORDER BY conn_id, bucket, pos""".stripMargin

  // ─── cloud_event_build: the CloudEvent projection ───
  // cloud_event.ex:31-44; sha256 stands in for sha1 (see object doc).
  private val isoFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"
  private val isoFmtDuck = "%Y-%m-%dT%H:%M:%S.%fZ"

  private def cloudEvents(spark: SparkSession, dir: String): DataFrame =
    frames(spark, dir)
      .filter(col("message") =!= "HEARTBEAT")
      .withColumn("time_iso", date_format(col("receive_ts"), isoFmt))
      .withColumn("id",
        base64(unhex(sha2(concat(col("time_iso"), col("message")), 256))))
      .withColumn("sourceip",
        concat(lit("10.0.0."),
          pmod(regexp_replace(col("conn_id"), "conn-", "").cast("long"), lit(250))))

  private val cloudEventsSql: String =
    s"""$framesSql,
       |cloud_events AS (
       |  SELECT conn_id, bucket, pos, message,
       |    strftime(receive_ts, '$isoFmtDuck') AS time_iso,
       |    base64(unhex(sha256(strftime(receive_ts, '$isoFmtDuck') || message))) AS id,
       |    '10.0.0.' || (CAST(replace(conn_id, 'conn-', '') AS BIGINT) % 250) AS sourceip
       |  FROM frames WHERE message <> 'HEARTBEAT')""".stripMargin

  def cloudEventBuild(spark: SparkSession, dir: String): DataFrame =
    cloudEvents(spark, dir)
      .select(col("id"), col("conn_id").as("partitionkey"), col("sourceip"),
        col("time_iso"), lit("com.mbta.ocs.raw_message").as("type"),
        lit("1.0").as("specversion"),
        lit(OcsPipeline.eventSource).as("source"),
        col("message").as("raw"), col("bucket"), col("pos"))
      .orderBy(col("partitionkey"), col("bucket"), col("pos"))

  val cloudEventBuildSql: String =
    s"""WITH $cloudEventsSql
       |SELECT id, conn_id AS partitionkey, sourceip, time_iso,
       |  'com.mbta.ocs.raw_message' AS type, '1.0' AS specversion,
       |  '${OcsPipeline.eventSource}' AS source, message AS raw, bucket, pos
       |FROM cloud_events ORDER BY partitionkey, bucket, pos""".stripMargin

  // ─── cloud_event_json: canonical JSON (alphabetical keys) ───
  // Jason.Encoder parity shape (cloud_event.ex:19); compact encoding,
  // keys sorted so both engines render byte-identically.
  private def eventJson: Column =
    to_json(struct(
      struct(col("message").as("raw")).as("data"),
      col("id"),
      col("conn_id").as("partitionkey"),
      lit(OcsPipeline.eventSource).as("source"),
      col("sourceip"),
      lit("1.0").as("specversion"),
      col("time_iso").as("time"),
      lit("com.mbta.ocs.raw_message").as("type")))

  // CAST to VARCHAR: DuckDB to_json yields the JSON logical type while
  // Spark's to_json is a plain string; the compare is type-sensitive.
  private val eventJsonSql: String =
    s"""CAST(to_json({'data': {'raw': message}, 'id': id, 'partitionkey': conn_id,
       |    'source': '${OcsPipeline.eventSource}', 'sourceip': sourceip,
       |    'specversion': '1.0', 'time': time_iso,
       |    'type': 'com.mbta.ocs.raw_message'}) AS VARCHAR)""".stripMargin

  def cloudEventJson(spark: SparkSession, dir: String): DataFrame =
    cloudEvents(spark, dir)
      .select(col("conn_id").as("partitionkey"), col("bucket"), col("pos"),
        eventJson.as("event_json"))
      .orderBy(col("partitionkey"), col("bucket"), col("pos"))

  val cloudEventJsonSql: String =
    s"""WITH $cloudEventsSql
       |SELECT conn_id AS partitionkey, bucket, pos,
       |  $eventJsonSql AS event_json
       |FROM cloud_events ORDER BY partitionkey, bucket, pos""".stripMargin

  // ─── kinesis_batch_put: one put_record per packet, ordered chain ───
  // proxy.ex:171-204: JSON-encode the packet's record batch, put to the
  // stream keyed by connection, chaining sequence_number_for_ordering.
  // All-heartbeat packets put nothing (records == [] short-circuit).
  def kinesisBatchPut(spark: SparkSession, dir: String): DataFrame = {
    val perConn = Window.partitionBy(col("partitionkey")).orderBy(col("bucket"))
    cloudEvents(spark, dir)
      .select(col("conn_id").as("partitionkey"), col("bucket"), col("pos"),
        eventJson.as("event_json"))
      .groupBy(col("partitionkey"), col("bucket"))
      .agg(
        count(lit(1)).as("n_records"),
        concat(lit("["),
          array_join(
            transform(
              array_sort(collect_list(struct(col("pos"), col("event_json")))),
              x => x.getField("event_json")),
            ","),
          lit("]")).as("encoded"))
      .withColumn("seq", row_number().over(perConn).cast("long"))
      .select(col("partitionkey"), col("seq"), col("bucket"), col("n_records"),
        length(col("encoded")).cast("long").as("payload_bytes"),
        base64(unhex(sha2(col("encoded"), 256))).as("payload_sha"))
      .orderBy(col("partitionkey"), col("seq"))
  }

  val kinesisBatchPutSql: String =
    s"""WITH $cloudEventsSql,
       |recs AS (
       |  SELECT conn_id AS partitionkey, bucket, pos,
       |    $eventJsonSql AS event_json
       |  FROM cloud_events),
       |batches AS (
       |  SELECT partitionkey, bucket, count(*) AS n_records,
       |    '[' || string_agg(event_json, ',' ORDER BY pos) || ']' AS encoded
       |  FROM recs GROUP BY partitionkey, bucket)
       |SELECT partitionkey,
       |  CAST(row_number() OVER (PARTITION BY partitionkey ORDER BY bucket) AS BIGINT) AS seq,
       |  bucket, n_records,
       |  CAST(length(encoded) AS BIGINT) AS payload_bytes,
       |  base64(unhex(sha256(encoded))) AS payload_sha
       |FROM batches ORDER BY partitionkey, seq""".stripMargin

  // ─── stale_session: idle-timeout detection (proxy.ex:125-131) ───
  // A connection is stale when nothing (heartbeats included — any bytes
  // reset the timer) arrived within the timeout before "now" = the
  // global max event time. Broadcast the 1-row global max; one shuffle.
  private val staleTimeoutS = 1800

  def staleSession(spark: SparkSession, dir: String): DataFrame = {
    val f = frames(spark, dir)
      .groupBy(col("conn_id"))
      .agg(max(epochS(col("receive_ts"))).as("last_epoch"),
        count(lit(1)).as("n_msgs"))
    val now = f.agg(max(col("last_epoch")).as("now_epoch"))
    f.join(broadcast(now))
      .select(col("conn_id"), col("last_epoch"),
        (col("now_epoch") - col("last_epoch")).as("idle_s"),
        when(col("now_epoch") - col("last_epoch") > staleTimeoutS, 1)
          .otherwise(0).as("is_stale"))
      .orderBy(col("conn_id"))
  }

  val staleSessionSql: String =
    s"""WITH $framesSql,
       |agg AS (
       |  SELECT conn_id,
       |    max(CAST(floor(epoch(receive_ts)) AS BIGINT)) AS last_epoch,
       |    count(*) AS n_msgs
       |  FROM frames GROUP BY conn_id)
       |SELECT conn_id, last_epoch,
       |  (SELECT max(last_epoch) FROM agg) - last_epoch AS idle_s,
       |  CASE WHEN (SELECT max(last_epoch) FROM agg) - last_epoch > $staleTimeoutS
       |    THEN 1 ELSE 0 END AS is_stale
       |FROM agg ORDER BY conn_id""".stripMargin

  // ─── health_rollup: per-connection health (health_checker.ex) ───
  def healthRollup(spark: SparkSession, dir: String): DataFrame =
    frames(spark, dir)
      .groupBy(col("conn_id"))
      .agg(
        count(lit(1)).as("n_msgs"),
        sum(when(col("message") === "HEARTBEAT", 1).otherwise(0)).as("n_heartbeats"),
        sum(when(col("message") =!= "HEARTBEAT", 1).otherwise(0)).as("n_data"),
        sum(length(col("message")).cast("long")).as("msg_bytes"),
        min(epochS(col("receive_ts"))).as("first_epoch"),
        max(epochS(col("receive_ts"))).as("last_epoch"))
      .orderBy(col("conn_id"))

  val healthRollupSql: String =
    s"""WITH $framesSql
       |SELECT conn_id, count(*) AS n_msgs,
       |  CAST(sum(CASE WHEN message = 'HEARTBEAT' THEN 1 ELSE 0 END) AS BIGINT) AS n_heartbeats,
       |  CAST(sum(CASE WHEN message <> 'HEARTBEAT' THEN 1 ELSE 0 END) AS BIGINT) AS n_data,
       |  CAST(sum(CAST(length(message) AS BIGINT)) AS BIGINT) AS msg_bytes,
       |  min(CAST(floor(epoch(receive_ts)) AS BIGINT)) AS first_epoch,
       |  max(CAST(floor(epoch(receive_ts)) AS BIGINT)) AS last_epoch
       |FROM frames GROUP BY conn_id ORDER BY conn_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ocs_frame_extract" -> ocsFrameExtract,
    "ocs_heartbeat_filter" -> ocsHeartbeatFilter,
    "cloud_event_build" -> cloudEventBuild,
    "cloud_event_json" -> cloudEventJson,
    "kinesis_batch_put" -> kinesisBatchPut,
    "stale_session" -> staleSession,
    "health_rollup" -> healthRollup)

  val oracle: Map[String, String] = Map(
    "ocs_frame_extract" -> ocsFrameExtractSql,
    "ocs_heartbeat_filter" -> ocsHeartbeatFilterSql,
    "cloud_event_build" -> cloudEventBuildSql,
    "cloud_event_json" -> cloudEventJsonSql,
    "kinesis_batch_put" -> kinesisBatchPutSql,
    "stale_session" -> staleSessionSql,
    "health_rollup" -> healthRollupSql)
}
