package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog compaction and incremental upsert-merge, treating the
  * `events` table as a CDC stream keyed by user_id. The pattern a
  * 100 TB pipeline runs nightly: compact a changelog to
  * latest-state-per-key, and apply a delta partition to a base
  * snapshot without reprocessing history (merged state must equal the
  * full recompute — CdcSpec asserts exactly that identity).
  */
object Cdc {
  import Relational.{cents, epochS}

  /** Latest row per key: ONE shuffle on the key, then a per-partition
    * linear scan (row_number, no self-join). Tie-break on event_id
    * (unique) makes the winner deterministic under equal timestamps —
    * the same arrival-order discipline StatefulFraming applies. */
  private def latestPerUser(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("last_type"),
        epochS(col("ts")).as("last_epoch"),
        cents(col("value")).as("last_value_cents"))
  }

  private def latestSql(src: String): String =
    s"""SELECT user_id, event_type AS last_type,
       |  CAST(floor(epoch(ts)) AS BIGINT) AS last_epoch,
       |  ${Tables.centsSql("value")} AS last_value_cents
       |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
       |    ORDER BY ts DESC, event_id DESC) AS rn FROM $src)
       |WHERE rn = 1""".stripMargin

  // ─── cdc_latest: full changelog → current-state compaction ───
  def cdcLatest(spark: SparkSession, dir: String): DataFrame =
    latestPerUser(Tables(spark, dir).parallelized("events", "user_id")).orderBy(col("user_id"))

  val cdcLatestSql: String = latestSql("events") + "\nORDER BY user_id"

  // ─── cdc_reconcile: bucketed checksum audit of a lossy replica ───
  // The pt-table-checksum / data-migration validation shape: two
  // replicas of the same keyed state are compared WITHOUT shipping
  // rows — each side rolls up to 64 key-hash buckets carrying a row
  // count and an order-independent content checksum (sum of per-row
  // md5-derived values), and only the bucket table crosses systems.
  // The divergent replica here is deterministic: side B rebuilds
  // latest-state from a changelog that LOST ~2 % of deliveries
  // (md5(event_id) % 100 < 2 — the at-least-once pipeline's nightmare
  // made reproducible), so some buckets disagree in count, some only
  // in content (a dropped non-final version changes nothing; a
  // dropped final version changes the checksum). consistent=false
  // rows are exactly the key ranges a repair job must re-sync — 64
  // rows to find them, not a row-level diff. Checksums sum 10⁹-capped
  // values: longs hold to ~10⁹ rows/bucket; DECIMAL(38,0) past that.
  private def reconcileState(ev: DataFrame): DataFrame =
    latestPerUser(ev)
      .select(col("user_id"),
        (conv(substring(md5(concat_ws("~",
          col("user_id"), col("last_epoch"), col("last_value_cents"))),
          1, 15), 16, 10).cast("long") % 1000000000L).as("h"),
        (conv(substring(md5(concat(lit("rbkt:"),
          col("user_id").cast("string"))), 1, 15), 16, 10)
          .cast("long") % 64L).as("bucket"))

  /** The deterministic ~2 % delivery-loss filter shared by the
    * reconciliation and offset-gap audits: drop events whose
    * md5("loss:"+event_id) bucket lands under 2/100. */
  private def lossyOf(ev: DataFrame): DataFrame =
    ev.filter(
      conv(substring(md5(concat(lit("loss:"),
        col("event_id").cast("string"))), 1, 15), 16, 10)
        .cast("long") % 100L >= 2L)

  private val lossySqlPred: String =
    """CAST(('0x' || substr(md5('loss:' || CAST(event_id AS VARCHAR)),
      |    1, 15)) AS BIGINT) % 100 >= 2""".stripMargin

  def cdcReconcile(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).parallelized("events", "user_id")
    val a = reconcileState(ev)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_a"), sum(col("h")).as("sum_a"))
    val lossy = lossyOf(ev)
    val b = reconcileState(lossy)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_b"), sum(col("h")).as("sum_b"))
    a.join(b, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("sum_a"), lit(0L)).as("sum_a"),
        coalesce(col("sum_b"), lit(0L)).as("sum_b"))
      .withColumn("consistent",
        col("n_a") === col("n_b") && col("sum_a") === col("sum_b"))
      .orderBy(col("bucket"))
  }

  // ─── cdc_offset_gaps: which offset ranges did the replica drop? ───
  // The Kafka-offset / DBLog-sequence gap audit that complements
  // cdc_reconcile: instead of comparing states, scan the surviving
  // changelog's GLOBAL id space in 1024-wide ranges and count the
  // ids missing INSIDE each range's observed [lo, hi] span (ids are
  // unique, so expected = hi−lo+1). On the same deterministic 2 %
  // lossy stream the per-range missing_bp clusters around 200 —
  // exactly the loss rate, localized to re-fetchable offset brackets.
  // One map-combining aggregate to n/1024 metadata rows; ranges with
  // no loss report 0, the healthy baseline the alert thresholds on.
  def cdcOffsetGaps(spark: SparkSession, dir: String): DataFrame =
    lossyOf(Tables(spark, dir).parallelized("events", "user_id"))
      .groupBy(shiftright(col("event_id"), 10).as("range_id"))
      .agg(count(lit(1)).as("n_seen"),
        min(col("event_id")).as("lo"), max(col("event_id")).as("hi"))
      .select(col("range_id"), col("n_seen"), col("lo"), col("hi"),
        (col("hi") - col("lo") + 1 - col("n_seen")).as("n_missing"),
        expr("(hi - lo + 1 - n_seen) * 10000 div (hi - lo + 1)")
          .as("missing_bp"))
      .orderBy(col("range_id"))

  val cdcOffsetGapsSql: String =
    s"""SELECT range_id, n_seen, lo, hi,
       |  hi - lo + 1 - n_seen AS n_missing,
       |  (hi - lo + 1 - n_seen) * 10000 // (hi - lo + 1) AS missing_bp
       |FROM (
       |  SELECT event_id >> 10 AS range_id,
       |    CAST(count(*) AS BIGINT) AS n_seen,
       |    min(event_id) AS lo, max(event_id) AS hi
       |  FROM events
       |  WHERE $lossySqlPred
       |  GROUP BY 1)
       |ORDER BY range_id""".stripMargin

  val cdcReconcileSql: String = {
    // NB: inner strings are re-scanned by the OUTER stripMargin, so a
    // continuation line must never start with `||` (it would be
    // clipped to a bitwise `|`) — concatenation operators stay at
    // line ends.
    def state(src: String): String =
      s"""SELECT user_id,
         |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || '~' ||
         |      CAST(last_epoch AS VARCHAR) || '~' ||
         |      CAST(last_value_cents AS VARCHAR)), 1, 15)) AS BIGINT)
         |      % 1000000000 AS h,
         |    CAST(('0x' || substr(md5('rbkt:' || CAST(user_id AS VARCHAR)),
         |      1, 15)) AS BIGINT) % 64 AS bucket
         |  FROM (${latestSql(src)})""".stripMargin
    s"""WITH lossy AS (
       |  SELECT * FROM events
       |  WHERE CAST(('0x' || substr(md5('loss:' || CAST(event_id AS VARCHAR)),
       |    1, 15)) AS BIGINT) % 100 >= 2),
       |sa AS (${state("events")}),
       |sb AS (${state("lossy")}),
       |a AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_a,
       |    CAST(sum(h) AS BIGINT) AS sum_a FROM sa GROUP BY bucket),
       |b AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_b,
       |    CAST(sum(h) AS BIGINT) AS sum_b FROM sb GROUP BY bucket)
       |SELECT coalesce(a.bucket, b.bucket) AS bucket,
       |  coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b,
       |  coalesce(sum_a, 0) AS sum_a, coalesce(sum_b, 0) AS sum_b,
       |  (coalesce(n_a, 0) = coalesce(n_b, 0)
       |    AND coalesce(sum_a, 0) = coalesce(sum_b, 0)) AS consistent
       |FROM a FULL OUTER JOIN b ON a.bucket = b.bucket
       |ORDER BY bucket""".stripMargin
  }

  // ─── cdc_merge: base snapshot + delta partition → new snapshot ───
  // Base = state compacted from history before the cutoff; delta =
  // only the new partition's changelog. The merge never touches
  // history: compact the (small) delta, full-outer join against the
  // base on the key, delta wins. At scale both sides are bucketed by
  // user_id so the outer join is co-partitioned and shuffle-free.
  private val cutoff = "2024-01-15 00:00:00"

  def cdcMerge(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).parallelized("events", "user_id")
    val base = latestPerUser(ev.filter(col("ts") < lit(cutoff)))
      .withColumnRenamed("last_type", "b_type")
      .withColumnRenamed("last_epoch", "b_epoch")
      .withColumnRenamed("last_value_cents", "b_cents")
    // Presence marker, NOT a value column as presence proxy: a delta
    // row whose last_type is legitimately NULL must still win the
    // merge and be labeled 'delta' (mirrors the oracle's
    // `d.user_id IS NOT NULL`).
    val delta = latestPerUser(ev.filter(col("ts") >= lit(cutoff)))
      .withColumn("in_delta", lit(true))
    base.join(delta, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        when(col("in_delta"), col("last_type")).otherwise(col("b_type")).as("last_type"),
        when(col("in_delta"), col("last_epoch")).otherwise(col("b_epoch")).as("last_epoch"),
        when(col("in_delta"), col("last_value_cents")).otherwise(col("b_cents")).as("last_value_cents"),
        when(col("in_delta"), "delta").otherwise("base").as("src"))
      .orderBy(col("user_id"))
  }

  val cdcMergeSql: String =
    s"""WITH base AS (
       |${latestSql(s"(SELECT * FROM events WHERE ts < TIMESTAMP '$cutoff')")}
       |), delta AS (
       |${latestSql(s"(SELECT * FROM events WHERE ts >= TIMESTAMP '$cutoff')")}
       |)
       |SELECT coalesce(d.user_id, b.user_id) AS user_id,
       |  CASE WHEN d.user_id IS NOT NULL THEN d.last_type ELSE b.last_type END AS last_type,
       |  CASE WHEN d.user_id IS NOT NULL THEN d.last_epoch ELSE b.last_epoch END AS last_epoch,
       |  CASE WHEN d.user_id IS NOT NULL THEN d.last_value_cents ELSE b.last_value_cents END AS last_value_cents,
       |  CASE WHEN d.user_id IS NOT NULL THEN 'delta' ELSE 'base' END AS src
       |FROM base b FULL OUTER JOIN delta d ON b.user_id = d.user_id
       |ORDER BY user_id""".stripMargin

  // ─── cdc_scd2: slowly-changing-dimension type-2 history ───
  // The changelog → dimension-history build: per user, collapse
  // consecutive events with the same attribute (event_type here
  // standing in for the tracked column) into validity intervals
  // [valid_from, valid_to), open-ended for the current version.
  // Three linear window passes over ONE shuffle on user_id — change
  // detection (lag), version numbering (cumulative sum), interval
  // close (lead on the filtered change rows). No self-join, no
  // full-history re-sort downstream: at 100 TB the input arrives
  // bucketed by the key and the whole build is map-side after the one
  // exchange. Arrival order ties break on event_id, as cdc_latest.
  def cdcScd2(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val changes = Tables(spark, dir).parallelized("events", "user_id")
      .withColumn("attr", col("event_type"))
      .withColumn("prev_attr", lag(col("attr"), 1).over(byUser))
      .filter(col("prev_attr").isNull || col("attr") =!= col("prev_attr"))
      .select(col("user_id"), col("attr"), epochS(col("ts")).as("valid_from"),
        col("event_id"))
    val byUserV = Window.partitionBy(col("user_id"))
      .orderBy(col("valid_from"), col("event_id"))
    changes
      .withColumn("version", row_number().over(byUserV))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byUserV))
      .select(col("user_id"), col("version"), col("attr"),
        col("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  val cdcScd2Sql: String =
    s"""WITH chg AS (
       |  SELECT user_id, event_type AS attr,
       |    CAST(floor(epoch(ts)) AS BIGINT) AS valid_from, event_id
       |  FROM (SELECT *, lag(event_type) OVER (PARTITION BY user_id
       |          ORDER BY ts, event_id) AS prev_attr FROM events)
       |  WHERE prev_attr IS NULL OR event_type <> prev_attr)
       |SELECT user_id,
       |  CAST(row_number() OVER w AS INT) AS version, attr, valid_from,
       |  lead(valid_from) OVER w AS valid_to,
       |  lead(valid_from) OVER w IS NULL AS is_current
       |FROM chg
       |WINDOW w AS (PARTITION BY user_id ORDER BY valid_from, event_id)
       |ORDER BY user_id, version""".stripMargin

  // ─── cdc_retention_gc: history-retention vacuum plan over SCD-2 ───
  // The maintenance decision cdc_scd2 creates: closed versions whose
  // validity ENDED before the retention horizon (here 50 % of the
  // epoch span — the split_time integer-cut discipline, identical in
  // both engines) are reclaimable; current and recently-closed rows
  // must survive or time travel breaks. Rolled per version-age week
  // so the table reads as a GC forecast — how much history each
  // additional week of retention costs — with reclaimable row share
  // in bp. Rides the cdc_scd2 derivation (two windows over ONE
  // user-keyed exchange) plus a broadcast span row; the rollup frame
  // is ≤ span-weeks rows.
  def cdcRetentionGc(spark: SparkSession, dir: String): DataFrame = {
    val hist = cdcScd2(spark, dir)
    val span = Tables(spark, dir).parallelized("events", "user_id")
      .agg(min(epochS(col("ts"))).as("t0"), max(epochS(col("ts"))).as("t1"))
    hist.crossJoin(broadcast(span))
      .withColumn("cut", expr("t0 + (t1 - t0) * 50 div 100"))
      .withColumn("reclaimable",
        !col("is_current") && col("valid_to") < col("cut"))
      .withColumn("age_weeks",
        when(col("is_current"), lit(-1L))
          .otherwise(expr("(t1 - valid_to) div 604800")))
      .groupBy(col("age_weeks"))
      .agg(count(lit(1)).as("n_versions"),
        sum(when(col("reclaimable"), 1L).otherwise(0L)).as("n_reclaimable"))
      .withColumn("reclaim_bp",
        expr("n_reclaimable * 10000 div n_versions"))
      .orderBy(col("age_weeks"))
  }

  val cdcRetentionGcSql: String =
    s"""WITH hist AS ($cdcScd2Sql),
       |span AS (
       |  SELECT min(CAST(floor(epoch(ts)) AS BIGINT)) AS t0,
       |    max(CAST(floor(epoch(ts)) AS BIGINT)) AS t1 FROM events),
       |tagged AS (
       |  SELECT h.*,
       |    (NOT h.is_current AND h.valid_to < t0 + (t1 - t0) * 50 // 100)
       |      AS reclaimable,
       |    CASE WHEN h.is_current THEN -1
       |      ELSE (t1 - h.valid_to) // 604800 END AS age_weeks
       |  FROM hist h CROSS JOIN span)
       |SELECT age_weeks, CAST(count(*) AS BIGINT) AS n_versions,
       |  CAST(sum(CASE WHEN reclaimable THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_reclaimable,
       |  CAST(sum(CASE WHEN reclaimable THEN 1 ELSE 0 END) AS BIGINT)
       |    * 10000 // count(*) AS reclaim_bp
       |FROM tagged GROUP BY age_weeks ORDER BY age_weeks""".stripMargin

  // ─── cdc_ivm: incremental maintenance of an aggregate view ───
  // The materialized-view refresh a 100 TB warehouse runs on every
  // ingest: a per-key aggregate state (count + sum are
  // self-maintainable — commutative monoids) is updated by
  // aggregating ONLY the delta partition and merging it onto the base
  // state with an outer join; history is never rescanned. The merged
  // result must equal the from-scratch aggregate over base ∪ delta —
  // the oracle IS that full recompute, so the hash match proves the
  // maintenance identity, not just the plumbing. At scale base and
  // delta aggregates are bucketed by key → co-partitioned merge.
  def cdcIvm(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).parallelized("events", "user_id")
    def aggOf(f: DataFrame) = f.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("c"))
    val base = aggOf(ev.filter(col("ts") < lit(cutoff)))
      .select(col("user_id"), col("n").as("bn"), col("c").as("bc"))
    val delta = aggOf(ev.filter(col("ts") >= lit(cutoff)))
      .select(col("user_id"), col("n").as("dn"), col("c").as("dc"))
    base.join(delta, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n_events"),
        (coalesce(col("bc"), lit(0L)) + coalesce(col("dc"), lit(0L)))
          .as("value_cents"),
        col("dn").isNotNull.as("touched"))
      .orderBy(col("user_id"))
  }

  val cdcIvmSql: String =
    s"""SELECT user_id, count(*) AS n_events,
       |  CAST(sum(${Tables.centsSql("value")}) AS BIGINT) AS value_cents,
       |  bool_or(ts >= TIMESTAMP '$cutoff') AS touched
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // ─── cdc_audit: per-key changelog churn profile ───
  // The audit sweep run before trusting a CDC feed: per key, volume,
  // how often the tracked attribute actually changed (lag compare —
  // distinguishes updates from no-op writes), lifetime span, and
  // distinct active days. One shuffle on user_id shared by the lag
  // window and the aggregate (same key ⇒ Catalyst reuses the
  // exchange); the distinct-days count is an in-group distinct over
  // ≤31 values, not a second shuffle.
  def cdcAudit(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables(spark, dir).parallelized("events", "user_id")
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_writes"),
        sum(when(col("prev_type").isNotNull &&
          col("prev_type") =!= col("event_type"), 1L).otherwise(0L))
          .as("n_changes"),
        (epochS(max(col("ts"))) - epochS(min(col("ts")))).as("span_s"),
        countDistinct(date_trunc("day", col("ts"))).as("n_active_days"))
      .orderBy(col("user_id"))
  }

  val cdcAuditSql: String =
    """WITH l AS (
      |  SELECT user_id, ts, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev_type
      |  FROM events)
      |SELECT user_id, count(*) AS n_writes,
      |  CAST(sum(CASE WHEN prev_type IS NOT NULL
      |    AND prev_type <> event_type THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
      |  CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT) AS span_s,
      |  count(DISTINCT date_trunc('day', ts)) AS n_active_days
      |FROM l GROUP BY user_id ORDER BY user_id""".stripMargin

  // ─── cdc_diff: snapshot-to-snapshot regression diff ───
  // The pipeline-regression primitive: compare state AT the cutoff
  // (v1) against current state (v2) per key and classify — `added`
  // (key absent in v1) / `changed` (tracked attributes differ) /
  // `unchanged`. Both snapshots are one compaction each (window
  // rn=1, shuffled on the key), the diff is a co-keyed outer join;
  // at scale both compactions bucket by user_id so the join is
  // co-partitioned. Keys can't vanish from an append-only changelog,
  // so `removed` can't occur here; the classification still carries
  // the branch for feeds with tombstones.
  def cdcDiff(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).parallelized("events", "user_id")
    val v1 = latestPerUser(ev.filter(col("ts") < lit(cutoff)))
      .select(col("user_id"), col("last_type").as("t1"),
        col("last_value_cents").as("c1"))
    val v2 = latestPerUser(ev)
      .select(col("user_id"), col("last_type").as("t2"),
        col("last_value_cents").as("c2"))
    v2.join(v1, Seq("user_id"), "left_outer")
      .select(col("user_id"),
        when(col("t1").isNull, "added")
          .when(col("t1") =!= col("t2") || col("c1") =!= col("c2"), "changed")
          .otherwise("unchanged").as("diff_kind"),
        col("t2").as("cur_type"), col("c2").as("cur_value_cents"))
      .orderBy(col("user_id"))
  }

  val cdcDiffSql: String =
    s"""WITH v1 AS (${latestSql(s"(SELECT * FROM events WHERE ts < TIMESTAMP '$cutoff')")}),
       |v2 AS (${latestSql("events")})
       |SELECT v2.user_id,
       |  CASE WHEN v1.user_id IS NULL THEN 'added'
       |       WHEN v1.last_type <> v2.last_type
       |         OR v1.last_value_cents <> v2.last_value_cents THEN 'changed'
       |       ELSE 'unchanged' END AS diff_kind,
       |  v2.last_type AS cur_type, v2.last_value_cents AS cur_value_cents
       |FROM v2 LEFT JOIN v1 ON v1.user_id = v2.user_id
       |ORDER BY v2.user_id""".stripMargin

  // ─── cdc_staleness: per-key freshness distribution ───
  // The replication-lag audit of a CDC mirror: how stale is each
  // key's latest state relative to the stream head ("now" =
  // data-derived max ts, so the query is reproducible)? One key-keyed
  // max aggregate (map-side combine) + a broadcast 1-row head frame;
  // ages bucketed into ops-meaningful bands and rolled up to a
  // |buckets|-bounded profile. All integer epoch arithmetic.
  def cdcStaleness(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).parallelized("events", "user_id")
    val last = ev.groupBy(col("user_id")).agg(max(col("ts")).as("last_ts"))
    val head = ev.agg(max(col("ts")).as("now_ts"))
    last.crossJoin(broadcast(head))
      .select(col("user_id"),
        (epochS(col("now_ts")) - epochS(col("last_ts"))).as("age_s"))
      .withColumn("bucket",
        when(col("age_s") < 3600, "0_lt1h")
          .when(col("age_s") < 21600, "1_lt6h")
          .when(col("age_s") < 86400, "2_lt1d")
          .when(col("age_s") < 259200, "3_lt3d")
          .otherwise("4_ge3d"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_keys"),
        min(col("age_s")).as("min_age_s"),
        max(col("age_s")).as("max_age_s"))
      .orderBy(col("bucket"))
  }

  val cdcStalenessSql: String =
    """WITH last AS (SELECT user_id, max(ts) AS last_ts FROM events GROUP BY user_id),
      |head AS (SELECT max(ts) AS now_ts FROM events),
      |aged AS (
      |  SELECT user_id,
      |    CAST(floor(epoch(now_ts)) AS BIGINT)
      |      - CAST(floor(epoch(last_ts)) AS BIGINT) AS age_s
      |  FROM last CROSS JOIN head),
      |bucketed AS (
      |  SELECT user_id, age_s,
      |    CASE WHEN age_s < 3600 THEN '0_lt1h'
      |         WHEN age_s < 21600 THEN '1_lt6h'
      |         WHEN age_s < 86400 THEN '2_lt1d'
      |         WHEN age_s < 259200 THEN '3_lt3d'
      |         ELSE '4_ge3d' END AS bucket
      |  FROM aged)
      |SELECT bucket, count(*) AS n_keys,
      |  min(age_s) AS min_age_s, max(age_s) AS max_age_s
      |FROM bucketed GROUP BY bucket ORDER BY bucket""".stripMargin

  // ─── cdc_compact: bounded log compaction (keep last K per key) ───
  // The Kafka-style compaction planner: retain each key's K most
  // recent versions, report per-key what survives and what the
  // compaction reclaims. One ranking window PARTITIONED BY the key
  // (per-task input is one user's history — bounded by the hottest
  // key, the same shape every compactor carries), then a per-key
  // rollup. Emits a per-user plan row: versions kept/dropped and the
  // epoch horizon (oldest retained version) — the file-rewrite list a
  // real compactor would feed to the table format's commit.
  private val compactKeep = 3

  def cdcCompact(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables(spark, dir).parallelized("events", "user_id")
      .withColumn("rn", row_number().over(w).cast("long"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_versions"),
        sum(when(col("rn") <= compactKeep, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rn") > compactKeep, 1L).otherwise(0L)).as("n_dropped"),
        min(when(col("rn") <= compactKeep, epochS(col("ts")))).as("horizon_epoch"))
      .orderBy(col("user_id"))
  }

  val cdcCompactSql: String =
    s"""WITH r AS (
       |  SELECT user_id, ts,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY ts DESC, event_id DESC) AS rn
       |  FROM events)
       |SELECT user_id, CAST(count(*) AS BIGINT) AS n_versions,
       |  CAST(count(*) FILTER (WHERE rn <= $compactKeep) AS BIGINT) AS n_kept,
       |  CAST(count(*) FILTER (WHERE rn > $compactKeep) AS BIGINT) AS n_dropped,
       |  CAST(floor(epoch(min(ts) FILTER (WHERE rn <= $compactKeep))) AS BIGINT)
       |    AS horizon_epoch
       |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin

  // ─── cdc_bitemporal: valid-time × transaction-time snapshots ───
  // The modeling axis cdc_scd2 lacks: SCD2 tracks only TRANSACTION
  // time (what the system recorded when); bitemporal state answers
  // "as the system knew at tx time X, what was true at valid time V"
  // — the reproducible-backfill/audit question (late-arriving facts
  // change the answer at tx=now but not at tx=then). Valid time = ts
  // (when the fact held); transaction time = event_id (the stream's
  // commit order, the cdc tie-break axis). A 2×2 cut grid (50%/100%
  // on each axis, cuts derived from one O(1) aggregate) is broadcast
  // onto the changelog; each cell's state is latest-by-(ts,event_id)
  // among rows within BOTH cuts — one window over (cell, user), a
  // bounded 4× expansion of the one corpus scan.
  def cdcBitemporal(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).parallelized("events", "user_id")
    val cuts = ev.agg(max(col("event_id")).as("mx_id"),
      epochS(min(col("ts"))).as("mn_e"), epochS(max(col("ts"))).as("mx_e"))
    val cells = cuts.select(explode(array(
      struct(lit(50L).as("tx_pct"), lit(50L).as("valid_pct"),
        expr("mx_id div 2").as("tx_cut"),
        expr("mn_e + (mx_e - mn_e) div 2").as("valid_cut")),
      struct(lit(50L).as("tx_pct"), lit(100L).as("valid_pct"),
        expr("mx_id div 2").as("tx_cut"), col("mx_e").as("valid_cut")),
      struct(lit(100L).as("tx_pct"), lit(50L).as("valid_pct"),
        col("mx_id").as("tx_cut"),
        expr("mn_e + (mx_e - mn_e) div 2").as("valid_cut")),
      struct(lit(100L).as("tx_pct"), lit(100L).as("valid_pct"),
        col("mx_id").as("tx_cut"), col("mx_e").as("valid_cut")))).as("c"))
      .select(col("c.*"))
    val w = Window.partitionBy(col("tx_pct"), col("valid_pct"), col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    ev.crossJoin(broadcast(cells))
      .filter(col("event_id") <= col("tx_cut") &&
        epochS(col("ts")) <= col("valid_cut"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("tx_pct"), col("valid_pct"), col("user_id"),
        col("event_type").as("last_type"), epochS(col("ts")).as("last_epoch"),
        cents(col("value")).as("last_value_cents"))
      .orderBy(col("tx_pct"), col("valid_pct"), col("user_id"))
  }

  val cdcBitemporalSql: String =
    """WITH cuts AS (
      |  SELECT max(event_id) AS mx_id,
      |    CAST(floor(epoch(min(ts))) AS BIGINT) AS mn_e,
      |    CAST(floor(epoch(max(ts))) AS BIGINT) AS mx_e
      |  FROM events),
      |cells AS (
      |  SELECT CAST(50 AS BIGINT) AS tx_pct, CAST(50 AS BIGINT) AS valid_pct,
      |    mx_id // 2 AS tx_cut, mn_e + (mx_e - mn_e) // 2 AS valid_cut
      |  FROM cuts
      |  UNION ALL SELECT 50, 100, mx_id // 2, mx_e FROM cuts
      |  UNION ALL SELECT 100, 50, mx_id, mn_e + (mx_e - mn_e) // 2 FROM cuts
      |  UNION ALL SELECT 100, 100, mx_id, mx_e FROM cuts),
      |ranked AS (
      |  SELECT c.tx_pct, c.valid_pct, e.user_id, e.event_type, e.ts,
      |    e.event_id, e.value,
      |    row_number() OVER (PARTITION BY c.tx_pct, c.valid_pct, e.user_id
      |      ORDER BY e.ts DESC, e.event_id DESC) AS rn
      |  FROM events e CROSS JOIN cells c
      |  WHERE e.event_id <= c.tx_cut
      |    AND CAST(floor(epoch(e.ts)) AS BIGINT) <= c.valid_cut)
      |SELECT tx_pct, valid_pct, user_id, event_type AS last_type,
      |  CAST(floor(epoch(ts)) AS BIGINT) AS last_epoch,
      |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS last_value_cents
      |FROM ranked WHERE rn = 1
      |ORDER BY tx_pct, valid_pct, user_id""".stripMargin

  // ─── cdc_merge_stats: MERGE INTO outcome metrics ───
  // The numbers a nightly merge job reports (and alerting watches
  // for drift): how many keys were inserted, actually changed,
  // touched-but-identical, or untouched. Same base/delta latest
  // frames as cdc_merge, full-outer joined on the co-partitioned
  // key; "identical" compares the PAYLOAD columns (type + value) —
  // the arrival timestamp always advances, so including it would
  // make the category unreachable; a delta write carrying the same
  // payload is a no-op the merge can skip (write-amplification
  // telemetry). Output is the ≤4-row category rollup, share in bp.
  def cdcMergeStats(spark: SparkSession, dir: String): DataFrame = {
    val all = Window.partitionBy(lit(1))
    val ev = Tables(spark, dir).parallelized("events", "user_id")
    val base = latestPerUser(ev.filter(col("ts") < lit(cutoff)))
      .withColumnRenamed("last_type", "b_type")
      .withColumnRenamed("last_epoch", "b_epoch")
      .withColumnRenamed("last_value_cents", "b_cents")
    val delta = latestPerUser(ev.filter(col("ts") >= lit(cutoff)))
      .withColumn("in_delta", lit(true))
    base.join(delta, Seq("user_id"), "full_outer")
      .withColumn("category",
        when(col("in_delta").isNull, "untouched")
          .when(col("b_type").isNull, "inserted")
          .when(col("last_type") === col("b_type") &&
            col("last_value_cents") === col("b_cents"), "identical")
          .otherwise("updated"))
      .groupBy(col("category")).agg(count(lit(1)).as("n_keys"))
      .withColumn("share_bp",
        Ranks.idiv(col("n_keys") * 10000L, sum(col("n_keys")).over(all)))
      .orderBy(col("category"))
  }

  val cdcMergeStatsSql: String =
    s"""WITH base AS (
       |${latestSql(s"(SELECT * FROM events WHERE ts < TIMESTAMP '$cutoff')")}
       |), delta AS (
       |${latestSql(s"(SELECT * FROM events WHERE ts >= TIMESTAMP '$cutoff')")}
       |),
       |cat AS (
       |  SELECT CASE
       |    WHEN d.user_id IS NULL THEN 'untouched'
       |    WHEN b.user_id IS NULL THEN 'inserted'
       |    WHEN d.last_type = b.last_type
       |      AND d.last_value_cents = b.last_value_cents THEN 'identical'
       |    ELSE 'updated' END AS category
       |  FROM base b FULL OUTER JOIN delta d ON b.user_id = d.user_id),
       |g AS (
       |  SELECT category, CAST(count(*) AS BIGINT) AS n_keys
       |  FROM cat GROUP BY 1)
       |SELECT category, n_keys,
       |  CAST(n_keys * 10000 // (sum(n_keys) OVER ()) AS BIGINT) AS share_bp
       |FROM g ORDER BY category""".stripMargin

  // ─── cdc_snapshot_chunks: watermark-chunked initial snapshot plan ───
  // The DBLog/Debezium incremental-snapshot primitive (Andradyne &
  // Gharachorloo, "DBLog: A Watermark Based Change-Data-Capture
  // Framework", Netflix 2019): a consistent initial snapshot runs as
  // a sequence of small KEY-RANGE CHUNKS interleaved with the live
  // changelog, each chunk bracketed by watermarks. This computes the
  // chunk plan: the distinct key set exact-ranked on the Ranks
  // ledger (never a global sort), cut every `chunkKeys` ranks, per
  // chunk the [lo, hi] key bracket the snapshot SELECT uses. The
  // chunk table is what the driver walks; rows never move.
  private val chunkKeys = 10L

  def cdcSnapshotChunks(spark: SparkSession, dir: String): DataFrame = {
    val keys = Tables(spark, dir).parallelized("events", "user_id")
      .select(col("user_id")).distinct()
    Ranks.groupedRank(keys, Nil, Seq(shiftright(col("user_id"), 8)),
        Seq(col("user_id")), "rk", "n")
      .withColumn("chunk_id", expr(s"(rk - 1) div $chunkKeys"))
      .groupBy(col("chunk_id"))
      .agg(min(col("user_id")).as("lo_key"),
        max(col("user_id")).as("hi_key"),
        count(lit(1)).as("n_keys"))
      .orderBy(col("chunk_id"))
  }

  val cdcSnapshotChunksSql: String =
    s"""WITH k AS (SELECT DISTINCT user_id FROM events),
       |r AS (
       |  SELECT user_id,
       |    row_number() OVER (ORDER BY user_id) AS rk
       |  FROM k)
       |SELECT CAST((rk - 1) // $chunkKeys AS BIGINT) AS chunk_id,
       |  min(user_id) AS lo_key, max(user_id) AS hi_key,
       |  CAST(count(*) AS BIGINT) AS n_keys
       |FROM r GROUP BY 1 ORDER BY chunk_id""".stripMargin

  // ─── cdc_delete_vector: deletion-vector compaction planner ───
  // The lakehouse maintenance decision (Iceberg v2 / Delta deletion
  // vectors): merge-on-read keeps deletes as per-file bitmaps until
  // a file's dead fraction makes scan-time filtering worse than a
  // rewrite. File layout is simulated as l_orderkey div 1000 (the
  // clustered-write shape); "deleted" rows are the returned lines
  // (l_returnflag = 'R'). Per file: row/dead counts, live_bp, and
  // the action — 'rewrite' past 30 % dead (the engines' default
  // threshold neighborhood), 'keep-dv' when deletes exist but stay
  // cheap, 'none' for clean files. ONE map-combining aggregate over
  // the fact table; per-file math is exact integer.
  def cdcDeleteVector(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .groupBy(expr("l_orderkey div 1000").as("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_deleted"))
      .select(col("file_id"), col("n_rows"), col("n_deleted"),
        expr("(n_rows - n_deleted) * 10000 div n_rows").as("live_bp"),
        when(col("n_deleted") * 10 > col("n_rows") * 3, "rewrite")
          .when(col("n_deleted") > 0, "keep-dv")
          .otherwise("none").as("action"))
      .orderBy(col("file_id"))

  val cdcDeleteVectorSql: String =
    """WITH f AS (
      |  SELECT l_orderkey // 1000 AS file_id,
      |    CAST(count(*) AS BIGINT) AS n_rows,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_deleted
      |  FROM lineitem GROUP BY 1)
      |SELECT file_id, n_rows, n_deleted,
      |  (n_rows - n_deleted) * 10000 // n_rows AS live_bp,
      |  CASE WHEN n_deleted * 10 > n_rows * 3 THEN 'rewrite'
      |       WHEN n_deleted > 0 THEN 'keep-dv'
      |       ELSE 'none' END AS action
      |FROM f ORDER BY file_id""".stripMargin

  // ─── cdc_conflict: concurrent-writer conflict detection ───
  // The multi-writer CDC hazard the merge family assumes away: two
  // writers updating the SAME key within a short window, where
  // last-writer-wins silently discards one side. Writer identity =
  // event_type (each pipeline writes its own event class); a conflict
  // is an adjacent update pair on one key ≤60 s apart from DIFFERENT
  // writers. One window pass over (user_id, ts) — the ev_interarrival
  // shape: lag() per key, never a self-join — rolling up per key to
  // update/conflict counts, the distinct writers involved, and the
  // cents the losing (overwritten) side had written, i.e. the blast
  // radius a reconciliation job must review. Scale: one shuffle on
  // user_id; per-key state is a linear scan regardless of corpus size.
  def cdcConflict(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).parallelized("events", "user_id")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val paired = ev
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("writer"), cents(col("value")).as("v_cents"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("prev_writer", lag(col("writer"), 1).over(w))
      .withColumn("prev_cents", lag(col("v_cents"), 1).over(w))
      .withColumn("conflict",
        (col("prev_ts").isNotNull &&
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) <= 60 &&
          col("writer") =!= col("prev_writer")).cast("int").cast("long"))
    paired.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_updates"),
        sum(col("conflict")).as("n_conflicts"),
        countDistinct(col("writer")).as("n_writers"),
        sum(when(col("conflict") === 1, col("prev_cents"))
          .otherwise(lit(0L))).as("overwritten_cents"))
      .filter(col("n_conflicts") > 0)
      .select(col("user_id"), col("n_updates"), col("n_conflicts"),
        col("n_writers"), col("overwritten_cents"))
      .orderBy(col("n_conflicts").desc, col("user_id")).limit(50)
  }

  val cdcConflictSql: String =
    s"""WITH paired AS (
       |  SELECT user_id, ts, event_type AS writer,
       |    ${Tables.centsSql("value")} AS v_cents,
       |    lag(ts) OVER w AS prev_ts,
       |    lag(event_type) OVER w AS prev_writer,
       |    lag(${Tables.centsSql("value")}) OVER w AS prev_cents
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |flagged AS (
       |  SELECT user_id, writer, prev_cents,
       |    CASE WHEN prev_ts IS NOT NULL
       |      AND CAST(floor(epoch(ts)) AS BIGINT)
       |        - CAST(floor(epoch(prev_ts)) AS BIGINT) <= 60
       |      AND writer <> prev_writer THEN 1 ELSE 0 END AS conflict
       |  FROM paired)
       |SELECT user_id, CAST(count(*) AS BIGINT) AS n_updates,
       |  CAST(sum(conflict) AS BIGINT) AS n_conflicts,
       |  CAST(count(DISTINCT writer) AS BIGINT) AS n_writers,
       |  CAST(sum(CASE WHEN conflict = 1 THEN prev_cents ELSE 0 END)
       |    AS BIGINT) AS overwritten_cents
       |FROM flagged GROUP BY user_id
       |HAVING sum(conflict) > 0
       |ORDER BY n_conflicts DESC, user_id LIMIT 50""".stripMargin

  // ─── cdc_apply_plan: copy-on-write MERGE write-amplification ───
  // The Iceberg/Delta COW planning readout cdc_delete_vector's MOR
  // variant skips: lay the base state (cdc_latest's key set) out in
  // 64 md5-hash-bucketed files, take the LAST 10 % of the epoch span
  // as the incoming delta (the split_time integer-cut discipline, so
  // both engines cut identically), and report per file how many base
  // rows a copy-on-write MERGE would rewrite against how many delta
  // changes land there — write_amp_x100 = rewritten per change. The
  // number that decides COW vs MOR vs re-bucketing: hash layouts
  // touch EVERY file under uniform deltas (amp ≈ |file| per change);
  // the fix a lakehouse applies is exactly what this table
  // quantifies. One scan for the span row, one for base, one for the
  // delta rollup; everything after is a 64-row frame.
  def cdcApplyPlan(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).parallelized("events", "user_id")
    def fileOf(key: org.apache.spark.sql.Column) =
      conv(substring(md5(concat(lit("cowf:"), key.cast("string"))), 1, 15),
        16, 10).cast("long") % 64L
    val span = ev.agg(min(epochS(col("ts"))).as("t0"),
      max(epochS(col("ts"))).as("t1"))
    val base = ev.select(col("user_id")).distinct()
      .groupBy(fileOf(col("user_id")).as("file_id"))
      .agg(count(lit(1)).as("n_base_rows"))
    val delta = ev.crossJoin(broadcast(span))
      .filter(epochS(col("ts")) >= expr("t0 + (t1 - t0) * 90 div 100"))
      .groupBy(fileOf(col("user_id")).as("file_id"))
      .agg(count(lit(1)).as("n_delta_changes"),
        countDistinct(col("user_id")).as("n_touched_keys"))
    base.join(delta, Seq("file_id"), "left")
      .withColumn("n_delta_changes", coalesce(col("n_delta_changes"), lit(0L)))
      .withColumn("n_touched_keys", coalesce(col("n_touched_keys"), lit(0L)))
      .withColumn("touched", col("n_delta_changes") > 0)
      .withColumn("rows_rewritten",
        when(col("touched"), col("n_base_rows")).otherwise(lit(0L)))
      .withColumn("write_amp_x100",
        expr("rows_rewritten * 100 div greatest(1, n_delta_changes)"))
      .orderBy(col("file_id"))
  }

  val cdcApplyPlanSql: String =
    """WITH span AS (
      |  SELECT min(CAST(floor(epoch(ts)) AS BIGINT)) AS t0,
      |    max(CAST(floor(epoch(ts)) AS BIGINT)) AS t1 FROM events),
      |base AS (
      |  SELECT CAST(('0x' || substr(md5('cowf:' || CAST(user_id AS VARCHAR)),
      |      1, 15)) AS BIGINT) % 64 AS file_id,
      |    CAST(count(*) AS BIGINT) AS n_base_rows
      |  FROM (SELECT DISTINCT user_id FROM events) GROUP BY 1),
      |delta AS (
      |  SELECT CAST(('0x' || substr(md5('cowf:' || CAST(user_id AS VARCHAR)),
      |      1, 15)) AS BIGINT) % 64 AS file_id,
      |    CAST(count(*) AS BIGINT) AS n_delta_changes,
      |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_touched_keys
      |  FROM events CROSS JOIN span
      |  WHERE CAST(floor(epoch(ts)) AS BIGINT) >= t0 + (t1 - t0) * 90 // 100
      |  GROUP BY 1)
      |SELECT b.file_id, b.n_base_rows,
      |  coalesce(d.n_delta_changes, 0) AS n_delta_changes,
      |  coalesce(d.n_touched_keys, 0) AS n_touched_keys,
      |  coalesce(d.n_delta_changes, 0) > 0 AS touched,
      |  CASE WHEN coalesce(d.n_delta_changes, 0) > 0 THEN b.n_base_rows
      |    ELSE 0 END AS rows_rewritten,
      |  CASE WHEN coalesce(d.n_delta_changes, 0) > 0 THEN b.n_base_rows
      |    ELSE 0 END * 100 // greatest(1, coalesce(d.n_delta_changes, 0))
      |    AS write_amp_x100
      |FROM base b LEFT JOIN delta d USING (file_id)
      |ORDER BY b.file_id""".stripMargin

  // ─── cdc_key_skew: changes-per-key histogram of the changelog ───
  // The write-skew disclosure a CDC APPLY plan needs before choosing
  // its partitioning: a changelog whose hottest keys absorb most of
  // the updates turns a key-hashed MERGE into a straggler (the same
  // pathology q25_skew_salt salts on the read side). One
  // map-combining count per key, then an fl2 = ⌊log₂⌋ bucket rollup —
  // output is ≤ 64 rows at any corpus scale, with the change-mass
  // share and cumulative coverage per bucket and the hottest key
  // pinned per bucket for the salting decision.
  def cdcKeySkew(spark: SparkSession, dir: String): DataFrame = {
    val perKey = Tables(spark, dir).parallelized("events", "user_id")
      .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
    val binned = perKey
      .groupBy((length(bin(col("c"))) - 1).cast("long").as("fl2_bucket"))
      .agg(count(lit(1)).as("n_keys"), sum(col("c")).as("n_changes"),
        max(col("c")).as("max_changes"))
    binned
      .withColumn("changes_bp",
        expr("n_changes * 10000 div sum(n_changes) over ()"))
      .withColumn("cum_bp",
        expr("sum(n_changes) over (order by fl2_bucket) * 10000" +
          " div sum(n_changes) over ()"))
      .orderBy(col("fl2_bucket"))
  }

  val cdcKeySkewSql: String =
    """WITH pk AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY user_id),
      |b AS (
      |  SELECT CAST(length(bin(c)) - 1 AS BIGINT) AS fl2_bucket,
      |    CAST(count(*) AS BIGINT) AS n_keys,
      |    CAST(sum(c) AS BIGINT) AS n_changes,
      |    max(c) AS max_changes
      |  FROM pk GROUP BY 1)
      |SELECT fl2_bucket, n_keys, n_changes, max_changes,
      |  n_changes * 10000 // CAST(sum(n_changes) OVER () AS BIGINT)
      |    AS changes_bp,
      |  CAST(sum(n_changes) OVER (ORDER BY fl2_bucket) AS BIGINT) * 10000
      |    // CAST(sum(n_changes) OVER () AS BIGINT) AS cum_bp
      |FROM b ORDER BY fl2_bucket""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_key_skew" -> cdcKeySkew,
    "cdc_apply_plan" -> cdcApplyPlan,
    "cdc_retention_gc" -> cdcRetentionGc,
    "cdc_conflict" -> cdcConflict,
    "cdc_merge_stats" -> cdcMergeStats,
    "cdc_snapshot_chunks" -> cdcSnapshotChunks,
    "cdc_delete_vector" -> cdcDeleteVector,
    "cdc_bitemporal" -> cdcBitemporal,
    "cdc_compact" -> cdcCompact,
    "cdc_staleness" -> cdcStaleness,
    "cdc_diff" -> cdcDiff,
    "cdc_audit" -> cdcAudit,
    "cdc_ivm" -> cdcIvm,
    "cdc_latest" -> cdcLatest,
    "cdc_reconcile" -> cdcReconcile,
    "cdc_offset_gaps" -> cdcOffsetGaps,
    "cdc_merge" -> cdcMerge,
    "cdc_scd2" -> cdcScd2)

  val oracle: Map[String, String] = Map(
    "cdc_conflict" -> cdcConflictSql,
    "cdc_merge_stats" -> cdcMergeStatsSql,
    "cdc_snapshot_chunks" -> cdcSnapshotChunksSql,
    "cdc_delete_vector" -> cdcDeleteVectorSql,
    "cdc_bitemporal" -> cdcBitemporalSql,
    "cdc_compact" -> cdcCompactSql,
    "cdc_staleness" -> cdcStalenessSql,
    "cdc_diff" -> cdcDiffSql,
    "cdc_audit" -> cdcAuditSql,
    "cdc_ivm" -> cdcIvmSql,
    "cdc_key_skew" -> cdcKeySkewSql,
    "cdc_apply_plan" -> cdcApplyPlanSql,
    "cdc_retention_gc" -> cdcRetentionGcSql,
    "cdc_latest" -> cdcLatestSql,
    "cdc_reconcile" -> cdcReconcileSql,
    "cdc_offset_gaps" -> cdcOffsetGapsSql,
    "cdc_merge" -> cdcMergeSql,
    "cdc_scd2" -> cdcScd2Sql)
}
