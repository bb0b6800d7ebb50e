package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Periodic health reporting for the streaming pipeline — the twin of
  * the reference's Trike.HealthChecker (health_checker.ex:44-76),
  * which on an interval logs (a) listener-wide ranch info and (b) one
  * line per live connection with its backlog.
  *
  * Split the same way here, along Spark's natural seams:
  *
  *  - [[HealthListener]] — the "ranch_info" half. A
  *    StreamingQueryListener sees every micro-batch's progress (input
  *    rows, processing rate, state-store rows = the aggregate backlog
  *    held for all connections) without touching the query plan; the
  *    interval is the trigger cadence, which is where a micro-batch
  *    engine surfaces "periodically".
  *  - [[HealthReporter.connectionHealth]] — the per-connection half.
  *    An update-mode keyed aggregation over the frame stream: every
  *    trigger re-emits the rows whose connection saw traffic, carrying
  *    the same fields as the batch `health_rollup` oracle. State is
  *    one row per connection — bounded by fleet size, not by data, so
  *    it holds at any scale.
  */
object HealthReporter {

  /** Per-connection running health over a (streaming) frames frame
    * with columns (connId, message, receiveTs): message/heartbeat/byte
    * counters plus first/last-seen epochs, updated every trigger.
    * Schema mirrors the batch health_rollup so dashboards can read
    * either. Run with outputMode("update").
    *
    * `probeName` (optional) names a registered graft-multisocket
    * stream: each emitted row then also carries `queue_depth` — the
    * connection's rows still sitting in the source buffer, the twin of
    * the reference health checker logging each proxy's mailbox size
    * (health_checker.ex:60-72). The lookup reads the driver-resident
    * probe registry, which is where this dev/test source's buffer
    * lives (the 100 TB ingest path is Kafka/Kinesis, not this source),
    * and is re-evaluated every trigger so the depth tracks the live
    * backlog. */
  def connectionHealth(frames: DataFrame,
      probeName: Option[String] = None): DataFrame = {
    val base = frames
      .groupBy(col("connId").as("conn_id"))
      .agg(
        count(lit(1)).as("n_msgs"),
        sum(when(col("message") === "HEARTBEAT", 1).otherwise(0)).as("n_heartbeats"),
        sum(when(col("message") =!= "HEARTBEAT", 1).otherwise(0)).as("n_data"),
        sum(length(col("message")).cast("long")).as("msg_bytes"),
        min(unix_timestamp(col("receiveTs"))).as("first_epoch"),
        max(unix_timestamp(col("receiveTs"))).as("last_epoch"))
    probeName.fold(base) { n =>
      val depth = udf { conn: String =>
        Option(graft.sources.MultiSocketSource.activeStreams.get(n))
          .map(_.bufferedByConn.getOrElse(conn, 0)).getOrElse(0)
      }
      base.withColumn("queue_depth", depth(col("conn_id")).cast("long"))
    }
  }
}

/** The listener half: publishes one line per completed micro-batch
  * (plus start/termination markers), formatted like the reference's
  * `health_check …` log lines. `publish` defaults to the structured
  * [[graft.telemetry.Telemetry]] fan-out (console unless backends are
  * configured — runtime.exs:42-49 twin); tests inject a collector.
  * Register with `spark.streams.addListener(new HealthListener(...))`. */
final class HealthListener(
  publish: String => Unit = m => graft.telemetry.Telemetry.info(m))
  extends StreamingQueryListener {

  override def onQueryStarted(e: QueryStartedEvent): Unit =
    publish(s"health_check started query=${e.name} id=${e.id}")

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    val stateRows =
      p.stateOperators.map(_.numRowsTotal).sum
    publish(
      s"health_check query=${p.name} batch=${p.batchId} " +
        s"inputRows=${p.numInputRows} " +
        s"rowsPerSec=${p.processedRowsPerSecond} " +
        s"stateRows=$stateRows")
  }

  override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
    publish(s"health_check terminated id=${e.id} " +
      s"exception=${e.exception.getOrElse("none")}")
}
