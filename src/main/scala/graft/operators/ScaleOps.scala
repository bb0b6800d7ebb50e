package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operators whose whole point is the 100 TB execution shape:
  * a point-in-interval (range) join that never degenerates into a
  * nested loop, an explicitly skew-salted fact join, and sketch-based
  * approximate statistics. Each pairs a scale-safe Spark plan with a
  * semantically equivalent (but not scale-safe) oracle formulation.
  */
object ScaleOps {
  import Relational.{cents, epochS}

  // ─── q24_range_join: point-in-interval join via time bucketing ───
  // "How many purchases landed inside the 10-minute window after each
  // error event?" — an interval join with NO equality key. Naively
  // `points.join(intervals, p_ts between ...)` gives Spark a
  // BroadcastNestedLoopJoin: O(|points|·|intervals|) compares and a
  // full broadcast of one side — fatal at scale. The scale-safe shape
  // buckets time at the window width W: a point belongs to exactly one
  // bucket, a W-wide interval overlaps at most two, so exploding each
  // interval to its two candidate buckets turns the range join into an
  // EQUIJOIN on bucket + a residual range filter. Candidate count is
  // bounded by temporal locality (points per bucket), never n².
  // PlanShapeSpec asserts the nested loop is gone.
  private val windowSec = 600L

  def q24RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 10 MINUTES")).as("w_end"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("ts").as("p_ts"),
        expr(s"unix_timestamp(ts) DIV $windowSec").as("bucket"))
    // Each (interval, point) pair meets in exactly one bucket (the
    // point's), so the explode cannot duplicate matches.
    val candidates = errors
      .withColumn("b0", expr(s"unix_timestamp(w_start) DIV $windowSec"))
      .withColumn("bucket", explode(array(col("b0"), col("b0") + 1)))
      .join(purchases, Seq("bucket"))
      .filter(col("p_ts") >= col("w_start") && col("p_ts") < col("w_end"))
    val counts = candidates.groupBy(col("err_id"))
      .agg(count(lit(1)).as("n_purchases"))
    errors.join(counts, Seq("err_id"), "left")
      .select(col("err_id"), epochS(col("w_start")).as("err_epoch"),
        coalesce(col("n_purchases"), lit(0L)).as("n_purchases"))
      .orderBy(col("err_id"))
  }

  /** Oracle: the literal inequality join (DuckDB's IEJoin copes at
    * test SF), proving the bucketed equijoin equivalent. */
  val q24Sql: String =
    """SELECT e.event_id AS err_id,
      |  CAST(floor(epoch(e.ts)) AS BIGINT) AS err_epoch,
      |  count(p.ts) AS n_purchases
      |FROM events e LEFT JOIN events p
      |  ON p.event_type = 'purchase'
      | AND p.ts >= e.ts AND p.ts < e.ts + INTERVAL 10 MINUTE
      |WHERE e.event_type = 'error'
      |GROUP BY 1, 2 ORDER BY err_id""".stripMargin

  // ─── q25_skew_salt: explicitly salted fact-to-dim join ───
  // Technique demo on uniform test keys; the shape is what matters.
  // A hot join key (one orderkey owning a large share of lineitem)
  // funnels into a single reducer in a plain shuffle join. Salting
  // splits it R ways: the fact side gets salt = f(row) ∈ [0,R) from a
  // NON-key column (deterministic — no rand(), so re-runs and
  // speculative retries agree), the dim side is exploded ×R so every
  // (key, salt) pair finds its dim row. Each hot key now lands on R
  // reducers. AQE's skewJoin covers sort-merge joins at runtime, but
  // salting is the portable fix — it also works for window functions
  // and stateful aggregations where AQE cannot split a partition.
  private val saltR = 8

  def q25SkewSalt(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val fact = t.lineitem
      // Murmur3 over non-key columns: deterministic (re-runs and
      // speculative retries agree) AND covers the full [0,R) range —
      // a raw l_linenumber mod R never hits salt 0 (domain 1..7), so
      // 1/R of the exploded dim would be dead weight and a hot key
      // would fan to R-1 reducers, not R.
      .withColumn("salt", pmod(hash(col("l_linenumber"), col("l_partkey")).cast("long"), lit(saltR)))
    val dim = t.orders.select(col("o_orderkey"), col("o_orderpriority"))
      .withColumn("salt", explode(array((0 until saltR).map(i => lit(i.toLong)): _*)))
    fact.join(dim,
        fact("l_orderkey") === dim("o_orderkey") && fact("salt") === dim("salt"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        cents(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue_cents"))
      .orderBy(col("o_orderpriority"))
  }

  /** Oracle: the unsalted join — same rows by construction. */
  val q25Sql: String =
    s"""SELECT o_orderpriority, count(*) AS n_items,
       |  ${Tables.centsSql("sum(l_extendedprice*(1-l_discount))")} AS revenue_cents
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ─── sketch_stats: HLL + quantile-sketch approximate statistics ───
  // The sub-2×-memory path for "distinct users / p50 / p95 per group"
  // at 100 TB: approx_count_distinct is HyperLogLog++ (fixed ~kB of
  // state per group, mergeable map-side), approx_percentile is a
  // quantile sketch — vs an exact distinct-count (full shuffle of the
  // distinct pairs) and exact percentile (full sort per group). Sketch
  // INTERNALS differ across engines, so the raw estimates can't be
  // hash-oracled — instead the output is the BAND VERDICT (the
  // dedup_est_error discipline): each sketch estimate is checked
  // Spark-side against the exact answer within its documented error
  // band, and the oracle asserts the verdict columns are TRUE.
  //   users_in_band : |HLL − exact| ≤ max(3, 15% · exact)
  //                   (rsd 0.05 ⇒ 15% is 3σ; +3 absolute for tiny
  //                    groups where one register flip dominates)
  //   p50/p95_in_band: the sketch value (an actual element with rank
  //                   error ≤ 1/accuracy = 0.001) lies within the
  //                   exact [rank 45%, rank 55%] / [rank 90%, rank
  //                   97%] ORDER-STATISTIC envelope — far outside the
  //                   guarantee, so the verdict is deterministic-
  //                   stable across SFs. Groups under 50 rows fall
  //                   back to the [min, max] envelope: with 2-3
  //                   distinct values a percentile envelope can
  //                   exclude every actual element, failing a sketch
  //                   that is within spec (the round-14 advice).
  // Exact n_events / exact_users ride along so the oracle still
  // hash-checks real aggregates, not just three TRUEs.
  //
  // The exact envelope rides the q15 DISTRIBUTION AGGREGATE: the
  // earlier sort-based built-in `percentile()` was the one
  // ObjectHashAggregate in any registered plan — a value→count map of
  // every group value in one executor's heap, i.e. the exact 100 TB
  // shape the sketch exists to avoid, spent on its own audit. Now a
  // map-side-combining groupBy (type, cents) shrinks the corpus to the
  // distinct-value ledger (bounded by the cents-quantized value
  // domain, not by row count), the cumulative window runs over that
  // ledger only, and the envelope bounds are the exact order
  // statistics read off the cumulative counts (PlanShapeSpec pins
  // that no registered plan contains `percentile(`).
  def sketchStats(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = Tables(spark, dir)
    // Two aggregate passes on purpose: countDistinct forces the
    // two-phase Expand plan, and mixing it with the TypedImperative
    // sketch aggregates (HLL, approx_percentile) drags EVERY aggregate
    // through that expanded, non-codegen path. Split, the exact pass
    // stays a codegen'd HashAggregate and the sketch pass an
    // ObjectHashAggregate over un-expanded rows; the join is 5 rows.
    val evP = t.parallelized("events")
    val exactAgg = evP
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("exact_users"))
    val sketchAgg = evP
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), 0.05).as("au"),
        cents(percentile_approx(col("value"), lit(0.5), lit(1000)))
          .as("ap50"),
        cents(percentile_approx(col("value"), lit(0.95), lit(1000)))
          .as("ap95"))
    val agg = exactAgg.join(broadcast(sketchAgg), Seq("event_type"))
    val ledger = evP
      .groupBy(col("event_type"), cents(col("value")).as("c"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("event_type"))
    val cum = ledger
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
    def atRank(pct: Int): Column =
      min(when(col("cum") >= expr(s"(n * $pct + 99) DIV 100"), col("c")))
    val env = cum.groupBy(col("event_type"))
      .agg(atRank(45).as("lo50"), atRank(55).as("hi50"),
        atRank(90).as("lo95"), atRank(97).as("hi95"),
        min(col("c")).as("cl"), max(col("c")).as("ch"))
    def band(ap: Column, lo: Column, hi: Column): Column =
      when(col("n_events") < 50, ap >= col("cl") && ap <= col("ch"))
        .otherwise(ap >= lo && ap <= hi)
    agg.join(broadcast(env), Seq("event_type"))
      .select(col("event_type"), col("n_events"), col("exact_users"),
        (abs(col("au") - col("exact_users")) <=
          greatest(lit(3L), floor(col("exact_users") * 0.15).cast("long")))
          .as("users_in_band"),
        band(col("ap50"), col("lo50"), col("hi50")).as("p50_in_band"),
        band(col("ap95"), col("lo95"), col("hi95")).as("p95_in_band"))
      .orderBy(col("event_type"))
  }

  val sketchStatsSql: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  TRUE AS users_in_band, TRUE AS p50_in_band, TRUE AS p95_in_band
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ─── layout_zorder: Z-order (Morton) data-layout clustering ───
  // The write-side half of multi-dimensional data skipping: interleave
  // the bits of two clustering dimensions (customer, order day) into
  // one Morton code, sort by it, and cut the sorted order into target
  // files. Rows close in BOTH dimensions land in the same file, so a
  // min/max-pruned scan filtered on EITHER dimension skips most files
  // — a linear sort by (custkey, date) only skips on the leading
  // column. Pure integer bit arithmetic (shift/and/or), whole-stage
  // codegen, one range-partitioned sort — exactly how engines cluster
  // 100 TB tables for pruning. file_id = zval >> 6 carves the 16-bit
  // Morton space into 1024 equal z-ranges (a fixed spatial grid, so
  // the assignment is data-independent and oracle-stable).
  private val zBits = 8

  private def zInterleave(x: org.apache.spark.sql.Column,
                          y: org.apache.spark.sql.Column) =
    (0 until zBits).map { i =>
      shiftleft(shiftrightunsigned(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  def layoutZorder(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val dims = t.orders.select(col("o_orderkey"),
      pmod(col("o_custkey"), lit(1L << zBits)).as("xd"),
      pmod(expr("unix_timestamp(o_orderdate) DIV 86400"),
        lit(1L << zBits)).as("yd"))
    dims.select(col("o_orderkey"), zInterleave(col("xd"), col("yd")).as("zval"))
      .withColumn("file_id", shiftrightunsigned(col("zval"), 6))
      .orderBy(col("zval"), col("o_orderkey"))
  }

  val layoutZorderSql: String = {
    val terms = (0 until zBits).map { i =>
      s"(((xd >> $i) & 1) << ${2 * i}) | (((yd >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" | ")
    s"""WITH dims AS (
       |  SELECT o_orderkey,
       |    o_custkey % ${1L << zBits} AS xd,
       |    (CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400) % ${1L << zBits} AS yd
       |  FROM orders),
       |z AS (SELECT o_orderkey, CAST($terms AS BIGINT) AS zval FROM dims)
       |SELECT o_orderkey, zval, zval >> 6 AS file_id
       |FROM z ORDER BY zval, o_orderkey""".stripMargin
  }

  // ─── layout_prune: min/max data-skipping proof over the z-layout ───
  // The read-side half of layout_zorder: a min/max file index (what
  // parquet row-group stats / Iceberg manifests give a 100 TB table)
  // over the SAME z-range files layout_zorder writes, probed with one
  // band predicate per clustering dimension. Because the layout
  // interleaved both dimensions, BOTH probes skip most files — the
  // measurable claim behind z-ordering, stated per file: its stats,
  // whether each probe must scan it, and the actual match counts
  // (n_match_x > 0 ⇒ scan_x is the no-false-skip invariant,
  // Round11OpsSpec). One bounded aggregate (≤1024 file rows); the
  // index build is the only pass over the table.
  private val pruneXLo = 64L; private val pruneXHi = 79L
  private val pruneYLo = 32L; private val pruneYHi = 47L

  def layoutPrune(spark: SparkSession, dir: String): DataFrame = {
    val dims = Tables(spark, dir).orders.select(
      pmod(col("o_custkey"), lit(1L << zBits)).as("xd"),
      pmod(expr("unix_timestamp(o_orderdate) DIV 86400"),
        lit(1L << zBits)).as("yd"))
    dims
      .withColumn("file_id",
        shiftrightunsigned(zInterleave(col("xd"), col("yd")), 6))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("xd")).as("min_xd"), max(col("xd")).as("max_xd"),
        min(col("yd")).as("min_yd"), max(col("yd")).as("max_yd"),
        sum(when(col("xd").between(pruneXLo, pruneXHi), 1L).otherwise(0L))
          .as("n_match_x"),
        sum(when(col("yd").between(pruneYLo, pruneYHi), 1L).otherwise(0L))
          .as("n_match_y"))
      .withColumn("scan_x",
        col("min_xd") <= lit(pruneXHi) && col("max_xd") >= lit(pruneXLo))
      .withColumn("scan_y",
        col("min_yd") <= lit(pruneYHi) && col("max_yd") >= lit(pruneYLo))
      .orderBy(col("file_id"))
  }

  val layoutPruneSql: String = {
    val terms = (0 until zBits).map { i =>
      s"(((xd >> $i) & 1) << ${2 * i}) | (((yd >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" | ")
    s"""WITH dims AS (
       |  SELECT o_custkey % ${1L << zBits} AS xd,
       |    (CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400) % ${1L << zBits} AS yd
       |  FROM orders),
       |f AS (SELECT xd, yd, CAST($terms AS BIGINT) >> 6 AS file_id FROM dims)
       |SELECT file_id, count(*) AS n_rows,
       |  min(xd) AS min_xd, max(xd) AS max_xd,
       |  min(yd) AS min_yd, max(yd) AS max_yd,
       |  CAST(sum(CASE WHEN xd BETWEEN $pruneXLo AND $pruneXHi THEN 1 ELSE 0 END) AS BIGINT) AS n_match_x,
       |  CAST(sum(CASE WHEN yd BETWEEN $pruneYLo AND $pruneYHi THEN 1 ELSE 0 END) AS BIGINT) AS n_match_y,
       |  (min(xd) <= $pruneXHi AND max(xd) >= $pruneXLo) AS scan_x,
       |  (min(yd) <= $pruneYHi AND max(yd) >= $pruneYLo) AS scan_y
       |FROM f GROUP BY file_id ORDER BY file_id""".stripMargin
  }

  // ─── layout_advisor: which clustering layout should this table buy? ───
  // The decision table ABOVE layout_zorder/layout_prune: before an
  // operator pays for a rewrite, compare the three candidate layouts
  // (sort-by-x, sort-by-y, z-order) under the SAME file budget (64
  // value-range files each — range placement, no global sort) against
  // the same two band probes, and report files/rows each layout
  // forces every probe to scan. The expected shape — each linear
  // layout wins its own dimension and loses the other badly, z-order
  // is near-best on BOTH — is exactly the argument for paying the
  // interleave, now stated as numbers (scan_bp = mean scanned-row
  // fraction across the two probes). ONE corpus projection with a
  // constant ×3 layout fan-out; everything after the first groupBy is
  // ≤192 file rows.
  def layoutAdvisor(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dims = Tables(spark, dir).orders.select(
        pmod(col("o_custkey"), lit(1L << zBits)).as("xd"),
        pmod(expr("unix_timestamp(o_orderdate) DIV 86400"),
          lit(1L << zBits)).as("yd"))
      .withColumn("z", zInterleave(col("xd"), col("yd")))
    val lay = Seq("linear_x", "linear_y", "zorder").toDF("layout")
    dims.crossJoin(broadcast(lay))
      .withColumn("file_id",
        when(col("layout") === "linear_x", shiftrightunsigned(col("xd"), 2))
          .when(col("layout") === "linear_y", shiftrightunsigned(col("yd"), 2))
          .otherwise(shiftrightunsigned(col("z"), 2 * zBits - 6)))
      .groupBy(col("layout"), col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("xd")).as("min_xd"), max(col("xd")).as("max_xd"),
        min(col("yd")).as("min_yd"), max(col("yd")).as("max_yd"))
      .groupBy(col("layout"))
      .agg(count(lit(1)).as("n_files"),
        sum(when(col("min_xd") <= pruneXHi && col("max_xd") >= pruneXLo,
          1L).otherwise(0L)).as("files_x"),
        sum(when(col("min_xd") <= pruneXHi && col("max_xd") >= pruneXLo,
          col("n_rows")).otherwise(0L)).as("rows_x"),
        sum(when(col("min_yd") <= pruneYHi && col("max_yd") >= pruneYLo,
          1L).otherwise(0L)).as("files_y"),
        sum(when(col("min_yd") <= pruneYHi && col("max_yd") >= pruneYLo,
          col("n_rows")).otherwise(0L)).as("rows_y"),
        sum(col("n_rows")).as("n_rows_total"))
      .withColumn("scan_bp",
        expr("(rows_x + rows_y) * 10000 div (2 * n_rows_total)"))
      .orderBy(col("layout"))
  }

  val layoutAdvisorSql: String = {
    val terms = (0 until zBits).map { i =>
      s"(((xd >> $i) & 1) << ${2 * i}) | (((yd >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" | ")
    s"""WITH dims AS (
       |  SELECT o_custkey % ${1L << zBits} AS xd,
       |    (CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400) % ${1L << zBits} AS yd
       |  FROM orders),
       |d2 AS (SELECT xd, yd, CAST($terms AS BIGINT) AS z FROM dims),
       |lay(layout) AS (VALUES ('linear_x'), ('linear_y'), ('zorder')),
       |t AS (
       |  SELECT l.layout, d.xd, d.yd,
       |    CASE l.layout WHEN 'linear_x' THEN d.xd >> 2
       |                  WHEN 'linear_y' THEN d.yd >> 2
       |                  ELSE d.z >> ${2 * zBits - 6} END AS file_id
       |  FROM d2 d, lay l),
       |f AS (
       |  SELECT layout, file_id, count(*) AS n_rows,
       |    min(xd) AS min_xd, max(xd) AS max_xd,
       |    min(yd) AS min_yd, max(yd) AS max_yd
       |  FROM t GROUP BY 1, 2)
       |SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
       |  CAST(sum(CASE WHEN min_xd <= $pruneXHi AND max_xd >= $pruneXLo
       |    THEN 1 ELSE 0 END) AS BIGINT) AS files_x,
       |  CAST(sum(CASE WHEN min_xd <= $pruneXHi AND max_xd >= $pruneXLo
       |    THEN n_rows ELSE 0 END) AS BIGINT) AS rows_x,
       |  CAST(sum(CASE WHEN min_yd <= $pruneYHi AND max_yd >= $pruneYLo
       |    THEN 1 ELSE 0 END) AS BIGINT) AS files_y,
       |  CAST(sum(CASE WHEN min_yd <= $pruneYHi AND max_yd >= $pruneYLo
       |    THEN n_rows ELSE 0 END) AS BIGINT) AS rows_y,
       |  CAST(sum(n_rows) AS BIGINT) AS n_rows_total,
       |  CAST((sum(CASE WHEN min_xd <= $pruneXHi AND max_xd >= $pruneXLo
       |      THEN n_rows ELSE 0 END)
       |    + sum(CASE WHEN min_yd <= $pruneYHi AND max_yd >= $pruneYLo
       |      THEN n_rows ELSE 0 END)) * 10000
       |    // (2 * sum(n_rows)) AS BIGINT) AS scan_bp
       |FROM f GROUP BY layout ORDER BY layout""".stripMargin
  }

  // ─── sketch_quantile: deterministic histogram order statistics ───
  // Completes the sketch tier (cms = frequency, hll = distinct, bloom
  // = membership): order statistics from a fixed 256-bin integer
  // histogram instead of a full per-group sort. Two bounded passes —
  // exact integer min/max/count per group (broadcast back), then a
  // per-(group, bin) count whose state is ≤ 256 rows per group at ANY
  // corpus size, mergeable map-side. The p50/p95/p99 estimate is the
  // lower edge of the first bin whose cumulative count reaches
  // ceil(q·n) — all integer, so DuckDB replays it exactly; the kth
  // order statistic rides along as the audit, computed on the bucket
  // ledger (Ranks.groupedRank — no per-type full sort even for the
  // audit), with exact − est ∈ [0, bin width) the provable bound
  // (Round11OpsSpec "sketch_quantile audit bound").
  private val sqBins = 256L

  def sketchQuantile(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables(spark, dir).events
      .select(col("event_type"), col("event_id"), cents(col("value")).as("c"))
    val bounds = ev.groupBy(col("event_type"))
      .agg(min(col("c")).as("cmin"), max(col("c")).as("cmax"),
        count(lit(1)).as("n"))
    val hist = ev.join(broadcast(bounds), Seq("event_type"))
      .withColumn("bin", expr(s"((c - cmin) * $sqBins) DIV (cmax - cmin + 1)"))
      .groupBy(col("event_type"), col("bin")).agg(count(lit(1)).as("bc"))
    val wcum = Window.partitionBy(col("event_type")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("bc")).over(wcum))
      .join(broadcast(bounds), Seq("event_type"))
    val qs = Seq(50, 95, 99)
    val estAggs = qs.map(q =>
      min(when(col("cum") >= expr(s"(n * $q + 99) DIV 100"), col("bin")))
        .as(s"bin_p$q"))
    val est = cum.groupBy(col("event_type"), col("cmin"), col("cmax"), col("n"))
      .agg(estAggs.head, estAggs.tail: _*)
      .select(Seq(col("event_type"), col("n"),
        expr(s"(cmax - cmin + 1 + ${sqBins - 1}) DIV $sqBins").as("bin_w")) ++
        qs.map(q => expr(
          s"cmin + (bin_p$q * (cmax - cmin + 1)) DIV $sqBins").as(s"est_p${q}_cents")): _*)
    // The audit side: the true kth order statistic per group. Round 12
    // moved this off the per-type full-sort window (a 100 TB per-type
    // sort — the thing the sketch exists to avoid) onto the SAME
    // two-level bucket ledger the sketch uses: rank = count of earlier
    // bins + row_number within the row's bin (Ranks.groupedRank), so
    // per-task sort input is one bin (~n/256), the only unpartitioned
    // state is the ≤256-rows-per-type ledger, and the ranks — hence
    // the hash — are identical to the full sort's.
    val ranked = Ranks.groupedRank(
      ev.join(broadcast(bounds), Seq("event_type")),
      grp = Seq("event_type"),
      bucket = Seq(expr(s"((c - cmin) * $sqBins) DIV (cmax - cmin + 1)")),
      sort = Seq(col("c"), col("event_id")),
      rankName = "rn", totalName = "__ntot")
      .drop("__ntot")
    val exactAggs = qs.map(q =>
      min(when(col("rn") === expr(s"(n * $q + 99) DIV 100"), col("c")))
        .as(s"exact_p${q}_cents"))
    val exact = ranked.groupBy(col("event_type"))
      .agg(exactAggs.head, exactAggs.tail: _*)
    est.join(exact, Seq("event_type"))
      .select(Seq(col("event_type"), col("n"), col("bin_w")) ++
        qs.flatMap(q => Seq(col(s"est_p${q}_cents"), col(s"exact_p${q}_cents"))): _*)
      .orderBy(col("event_type"))
  }

  val sketchQuantileSql: String = {
    val qs = Seq(50, 95, 99)
    val estCols = qs.map(q =>
      s"""cmin + (min(CASE WHEN cum >= (n * $q + 99) // 100 THEN bin END)
         |    * (cmax - cmin + 1)) // $sqBins AS est_p${q}_cents""".stripMargin)
      .mkString(",\n  ")
    val exactCols = qs.map(q =>
      s"min(CASE WHEN rn = (n * $q + 99) // 100 THEN c END) AS exact_p${q}_cents")
      .mkString(",\n  ")
    val outCols = qs.map(q =>
      s"e.est_p${q}_cents, x.exact_p${q}_cents").mkString(", ")
    s"""WITH ev AS (
       |  SELECT event_type, event_id,
       |    ${Tables.centsSql("value")} AS c
       |  FROM events),
       |bounds AS (
       |  SELECT event_type, min(c) AS cmin, max(c) AS cmax, count(*) AS n
       |  FROM ev GROUP BY 1),
       |hist AS (
       |  SELECT e.event_type,
       |    ((e.c - b.cmin) * $sqBins) // (b.cmax - b.cmin + 1) AS bin,
       |    count(*) AS bc
       |  FROM ev e JOIN bounds b USING (event_type) GROUP BY 1, 2),
       |cum AS (
       |  SELECT h.event_type, h.bin, b.cmin, b.cmax, b.n,
       |    sum(h.bc) OVER (PARTITION BY h.event_type ORDER BY h.bin
       |                    ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM hist h JOIN bounds b USING (event_type)),
       |est AS (
       |  SELECT event_type, n,
       |    (cmax - cmin + 1 + ${sqBins - 1}) // $sqBins AS bin_w,
       |  $estCols
       |  FROM cum GROUP BY event_type, cmin, cmax, n),
       |ranked AS (
       |  SELECT e.event_type, e.c, b.n,
       |    row_number() OVER (PARTITION BY e.event_type
       |                       ORDER BY e.c, e.event_id) AS rn
       |  FROM ev e JOIN bounds b USING (event_type)),
       |exact AS (
       |  SELECT event_type,
       |  $exactCols
       |  FROM ranked GROUP BY 1)
       |SELECT e.event_type, CAST(e.n AS BIGINT) AS n,
       |  CAST(e.bin_w AS BIGINT) AS bin_w, $outCols
       |FROM est e JOIN exact x USING (event_type)
       |ORDER BY e.event_type""".stripMargin
  }

  // ─── profile_table: per-column data-quality profile ───
  // The Deequ/Great-Expectations shape every ingestion run executes
  // before data is admitted: per column — null count, exact distinct
  // count, normalized min/max (doubles as cents, timestamps as epoch
  // seconds, so the profile is integer-exact cross-engine; free-text
  // columns profile cardinality only). ONE pass over the fact table:
  // Spark expands the multi-distinct aggregate internally (11
  // distinct columns → 11-way expand before a single shuffle) — the
  // documented at-scale trade; with approx_count_distinct the expand
  // disappears entirely (sketch_stats demonstrates that tier), exact
  // distincts are kept here for the oracle gate.
  private case class ProfCol(name: String, norm: Option[Column], distinctOn: Column)
  private val profCols: Seq[ProfCol] = Seq(
    ProfCol("l_orderkey", Some(col("l_orderkey")), col("l_orderkey")),
    ProfCol("l_partkey", Some(col("l_partkey")), col("l_partkey")),
    ProfCol("l_suppkey", Some(col("l_suppkey")), col("l_suppkey")),
    ProfCol("l_linenumber", Some(col("l_linenumber").cast("long")), col("l_linenumber")),
    ProfCol("l_quantity", Some(cents(col("l_quantity")).cast("long")), col("l_quantity")),
    ProfCol("l_extendedprice", Some(cents(col("l_extendedprice")).cast("long")), col("l_extendedprice")),
    ProfCol("l_discount", Some(cents(col("l_discount")).cast("long")), col("l_discount")),
    ProfCol("l_tax", Some(cents(col("l_tax")).cast("long")), col("l_tax")),
    ProfCol("l_returnflag", None, col("l_returnflag")),
    ProfCol("l_linestatus", None, col("l_linestatus")),
    ProfCol("l_shipdate", Some(epochS(col("l_shipdate"))), col("l_shipdate")))

  def profileTable(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    // One single-distinct aggregate branch per column, unioned — NOT
    // one wide 11-distinct aggregate: Spark expands a multi-distinct
    // agg 12× (every input row replicated per distinct column, 7.2M
    // wide rows hash-aggregated at sf0.1 — measured 4.6-7.5s). Each
    // branch here is a pruned one-column scan with its own partial
    // agg (≈1.1s for all 11, one job, branches run as parallel
    // stages); total I/O equals reading each column once, i.e. one
    // full-width scan. Each branch's global agg also emits exactly
    // one row on an EMPTY table, so the empty-input profile is 11
    // zero-count rows — the oracle's UNION ALL branch shape (#82).
    // count(1)-count(col), not sum(when(isNull,1)): sum() is NULL on
    // empty input while the oracle's count(*)-count(col) is 0.
    val branches = profCols.map { pc =>
      val mn = pc.norm.map(min(_).cast("long")).getOrElse(lit(null).cast("long"))
      val mx = pc.norm.map(max(_).cast("long")).getOrElse(lit(null).cast("long"))
      li.agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(pc.distinctOn)).as("n_nulls"),
        count_distinct(pc.distinctOn).as("n_distinct"),
        mn.as("min_v"), mx.as("max_v"))
        .select(lit(pc.name).as("column_name"), col("n_rows"),
          col("n_nulls"), col("n_distinct"), col("min_v"), col("max_v"))
    }
    branches.reduce(_ unionAll _).orderBy(col("column_name"))
  }

  val profileTableSql: String = {
    val branches = profCols.map { pc =>
      val (mn, mx) = pc.norm match {
        case None => ("CAST(NULL AS BIGINT)", "CAST(NULL AS BIGINT)")
        case Some(_) =>
          val e = pc.name match {
            case "l_quantity" | "l_extendedprice" | "l_discount" | "l_tax" =>
              s"CAST(${Tables.centsSql(pc.name)} AS BIGINT)"
            case "l_shipdate" => s"CAST(floor(epoch(${pc.name})) AS BIGINT)"
            case n => s"CAST($n AS BIGINT)"
          }
          (s"min($e)", s"max($e)")
      }
      s"""SELECT '${pc.name}' AS column_name, count(*) AS n_rows,
         |  CAST(count(*) - count(${pc.name}) AS BIGINT) AS n_nulls,
         |  count(DISTINCT ${pc.name}) AS n_distinct,
         |  $mn AS min_v, $mx AS max_v FROM lineitem""".stripMargin
    }
    branches.mkString("\nUNION ALL\n") + "\nORDER BY column_name"
  }

  // ─── shard_skew: hash-sharding balance profile ───
  // The pre-flight check before committing to a partition key: hash
  // lineitem into 64 shards on l_orderkey (md5 — the repo-wide
  // deterministic placement hash) and report each shard's row count
  // plus its deviation from the mean in bp. A key whose max dev runs
  // hot tells you to salt BEFORE the 100 TB shuffle does. One
  // map-side-combining aggregate to 64 rows; the mean/dev windows
  // touch only those.
  private val nSkewShards = 64

  def shardSkew(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy(lit(1))
    Tables(spark, dir).lineitem
      .select((conv(substring(md5(concat(lit("shard:"),
        col("l_orderkey").cast("string"))), 1, 15), 16, 10)
        .cast("long") % nSkewShards).as("shard"))
      .groupBy(col("shard")).agg(count(lit(1)).as("n_rows"))
      // cast-truncation, NOT floor: dev can be negative, and DuckDB's
      // `//` truncates toward zero where floor would round down.
      .withColumn("dev_bp",
        ((col("n_rows") * nSkewShards - sum(col("n_rows")).over(all))
          * 10000L / sum(col("n_rows")).over(all)).cast("long"))
      .orderBy(col("shard"))
  }

  val shardSkewSql: String =
    s"""WITH s AS (
       |  SELECT CAST(('0x' || substr(md5('shard:' || CAST(l_orderkey AS VARCHAR)), 1, 15))
       |      AS BIGINT) % $nSkewShards AS shard
       |  FROM lineitem),
       |c AS (SELECT shard, count(*) AS n_rows FROM s GROUP BY 1)
       |SELECT shard, n_rows,
       |  CAST((n_rows * $nSkewShards - sum(n_rows) OVER ()) * 10000
       |    // sum(n_rows) OVER () AS BIGINT) AS dev_bp
       |FROM c ORDER BY shard""".stripMargin

  // ─── profile_drift: split-half distribution drift per column ───
  // The Great-Expectations CI check between two slices of the same
  // table (old batch vs new batch; here the deterministic l_orderkey
  // parity split): per profiled column, mean (exact cents) and exact
  // distinct count on each side, drift of the mean in bp of side A.
  // A column whose drift_bp jumps is the schema-on-read alarm that
  // fires BEFORE a model quietly degrades. One grouped aggregate per
  // column branch (profile_table's union shape), all-integer except
  // nothing — means are cents·100 div n, exact.
  private val driftCols: Seq[(String, Column)] = Seq(
    ("l_quantity", col("l_quantity")),
    ("l_extendedprice", col("l_extendedprice")),
    ("l_discount", col("l_discount")),
    ("l_tax", col("l_tax")))

  def profileDrift(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
      .withColumn("half", pmod(col("l_orderkey"), lit(2L)))
    driftCols.map { case (name, c) =>
      li.groupBy(col("half"))
        .agg(count(lit(1)).as("n"), Relational.cents(sum(c)).as("s"),
          countDistinct(c).as("nd"))
        .groupBy()
        .agg(
          max(when(col("half") === 0, expr("s * 100 div n"))).as("mean_a_x100"),
          max(when(col("half") === 1, expr("s * 100 div n"))).as("mean_b_x100"),
          max(when(col("half") === 0, col("nd"))).as("nd_a"),
          max(when(col("half") === 1, col("nd"))).as("nd_b"))
        .select(lit(name).as("column_name"), col("mean_a_x100"),
          col("mean_b_x100"),
          expr("abs(mean_a_x100 - mean_b_x100) * 10000 div mean_a_x100")
            .as("mean_drift_bp"),
          col("nd_a"), col("nd_b"))
    }.reduce(_ unionByName _).orderBy(col("column_name"))
  }

  val profileDriftSql: String = {
    val branches = driftCols.map { case (name, _) =>
      s"""SELECT '$name' AS column_name, mean_a_x100, mean_b_x100,
         |  abs(mean_a_x100 - mean_b_x100) * 10000 // mean_a_x100
         |    AS mean_drift_bp, nd_a, nd_b
         |FROM (
         |  SELECT
         |    max(CASE WHEN half = 0 THEN s * 100 // n END) AS mean_a_x100,
         |    max(CASE WHEN half = 1 THEN s * 100 // n END) AS mean_b_x100,
         |    max(CASE WHEN half = 0 THEN nd END) AS nd_a,
         |    max(CASE WHEN half = 1 THEN nd END) AS nd_b
         |  FROM (
         |    SELECT l_orderkey % 2 AS half, CAST(count(*) AS BIGINT) AS n,
         |      ${Tables.centsSql(s"sum($name)")} AS s,
         |      CAST(count(DISTINCT $name) AS BIGINT) AS nd
         |    FROM lineitem GROUP BY 1))""".stripMargin
    }
    branches.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }

  // ─── shard_rebalance: minimum-movement shard leveling plan ───
  // What an operator does AFTER shard_skew flags imbalance: the
  // exact minimal set of (from, to, n_rows) transfers that levels
  // every shard to its Hamilton-fair target. Hash shards have no
  // row-contiguity constraint, so the true minimum moved is
  // Σ surplus — achieved by pairing the SURPLUS runs against the
  // DEFICIT runs on their cumulative axes: donor i (surplus sᵢ>0)
  // occupies [cumS_{i-1}, cumSᵢ), receiver j (deficit dⱼ>0)
  // occupies [cumD_{j-1}, cumDⱼ); move(i→j) = the interval overlap.
  // Every overlap row moves exactly once, so Σ moves = Σ surplus =
  // Σ deficit. All cumsums and the overlap join live on the
  // ‖shards‖-bounded count frame; the corpus is touched once.
  def shardRebalance(spark: SparkSession, dir: String): DataFrame = {
    val all = Window.partitionBy(lit(1))
    val byShard = all.orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val counts = Tables(spark, dir).lineitem
      .select((conv(substring(md5(concat(lit("shard:"),
        col("l_orderkey").cast("string"))), 1, 15), 16, 10)
        .cast("long") % nSkewShards).as("shard"))
      .groupBy(col("shard")).agg(count(lit(1)).as("n_rows"))
      .withColumn("total", sum(col("n_rows")).over(all))
      .withColumn("target",
        expr(s"total div $nSkewShards") +
          when(col("shard") < pmod(col("total"), lit(nSkewShards.toLong)), 1L)
            .otherwise(0L))
      .localCheckpoint(eager = false)
    val donor = counts.filter(col("n_rows") > col("target"))
      .withColumn("s", col("n_rows") - col("target"))
      .withColumn("s_hi", sum(col("s")).over(byShard))
      .select(col("shard").as("from_shard"),
        (col("s_hi") - col("s")).as("s_lo"), col("s_hi"))
    val recv = counts.filter(col("n_rows") < col("target"))
      .withColumn("d", col("target") - col("n_rows"))
      .withColumn("d_hi", sum(col("d")).over(byShard))
      .select(col("shard").as("to_shard"),
        (col("d_hi") - col("d")).as("d_lo"), col("d_hi"))
    donor.join(recv,
        col("s_lo") < col("d_hi") && col("d_lo") < col("s_hi"))
      .select(col("from_shard"), col("to_shard"),
        (least(col("s_hi"), col("d_hi")) -
          greatest(col("s_lo"), col("d_lo"))).as("n_moved"))
      .filter(col("n_moved") > 0)
      .orderBy(col("from_shard"), col("to_shard"))
  }

  val shardRebalanceSql: String =
    s"""WITH s AS (
       |  SELECT CAST(('0x' || substr(md5('shard:' || CAST(l_orderkey AS VARCHAR)), 1, 15))
       |      AS BIGINT) % $nSkewShards AS shard
       |  FROM lineitem),
       |c AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_rows FROM s GROUP BY 1),
       |t AS (
       |  SELECT shard, n_rows,
       |    CAST(sum(n_rows) OVER () AS BIGINT) AS total
       |  FROM c),
       |g AS (
       |  SELECT shard, n_rows,
       |    CAST(total // $nSkewShards
       |      + CASE WHEN shard < total % $nSkewShards THEN 1 ELSE 0 END
       |      AS BIGINT) AS target
       |  FROM t),
       |donor AS (
       |  SELECT shard AS from_shard,
       |    CAST(sum(n_rows - target) OVER (ORDER BY shard)
       |      - (n_rows - target) AS BIGINT) AS s_lo,
       |    CAST(sum(n_rows - target) OVER (ORDER BY shard) AS BIGINT) AS s_hi
       |  FROM g WHERE n_rows > target),
       |recv AS (
       |  SELECT shard AS to_shard,
       |    CAST(sum(target - n_rows) OVER (ORDER BY shard)
       |      - (target - n_rows) AS BIGINT) AS d_lo,
       |    CAST(sum(target - n_rows) OVER (ORDER BY shard) AS BIGINT) AS d_hi
       |  FROM g WHERE n_rows < target)
       |SELECT from_shard, to_shard,
       |  least(s_hi, d_hi) - greatest(s_lo, d_lo) AS n_moved
       |FROM donor JOIN recv ON s_lo < d_hi AND d_lo < s_hi
       |WHERE least(s_hi, d_hi) - greatest(s_lo, d_lo) > 0
       |ORDER BY from_shard, to_shard""".stripMargin

  // ─── filter_bloom: deterministic Bloom-filter build + probe ───
  // The join pre-filter primitive: build an M=4096-position, K=3
  // Bloom filter over the custkeys of 'F'-status orders, probe every
  // customer, and report bloom_hit vs exact membership — false
  // positives included, byte-reproducibly, because the K hash
  // positions derive from md5 (the repo's cross-engine hash), not a
  // JVM-private hash. Distributed shape: the built filter is the
  // DISTINCT position set (≤ M rows — tiny, AQE broadcasts it), the
  // probe explodes each key to its K positions and counts matches ==
  // K; the exact check is a broadcast semi-join on the same build
  // aggregate. At 100 TB the position set is exactly what you'd ship
  // to executors as a bitmap to skip shuffling the non-matching bulk
  // of the fact side — this operator is that filter, plus its own
  // precision audit (fp row flags).
  private val bloomM = 4096
  private val bloomK = 3

  private def bloomPos(k: Int, key: Column): Column =
    conv(substring(md5(concat(lit(s"bloom$k:"), key.cast("string"))), 1, 15), 16, 10)
      .cast("long") % bloomM

  private def bloomPosSql(k: Int, key: String): String =
    s"(CAST(('0x' || substr(md5('bloom$k:' || CAST($key AS VARCHAR)), 1, 15)) AS BIGINT) % $bloomM)"

  def filterBloom(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val corpus = t.orders.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("key")).distinct()
    val built = corpus
      .select(explode(array((1 to bloomK).map(k => bloomPos(k, col("key"))): _*))
        .as("pos")).distinct()
    val probePos = t.customer
      .select(col("c_custkey"),
        explode(array((1 to bloomK).map(k => bloomPos(k, col("c_custkey"))): _*))
          .as("pos"))
    val hits = probePos.join(broadcast(built), Seq("pos"))
      .groupBy(col("c_custkey")).agg(count(lit(1)).as("n_hit"))
    val actual = corpus.withColumnRenamed("key", "c_custkey")
      .withColumn("actual", lit(true))
    t.customer.select(col("c_custkey"))
      .join(hits, Seq("c_custkey"), "left")
      .join(broadcast(actual), Seq("c_custkey"), "left")
      .select(col("c_custkey"),
        (coalesce(col("n_hit"), lit(0L)) === bloomK).as("bloom_hit"),
        coalesce(col("actual"), lit(false)).as("actual"))
      .withColumn("fp", col("bloom_hit") && !col("actual"))
      .orderBy(col("c_custkey"))
  }

  val filterBloomSql: String = {
    val buildPos = (1 to bloomK).map(k => bloomPosSql(k, "key")).mkString(", ")
    val probeP = (1 to bloomK).map(k => bloomPosSql(k, "c_custkey")).mkString(", ")
    s"""WITH corpus AS (
       |  SELECT DISTINCT o_custkey AS key FROM orders WHERE o_orderstatus = 'F'),
       |built AS (
       |  SELECT DISTINCT unnest([$buildPos]) AS pos FROM corpus),
       |probe AS (
       |  SELECT c_custkey, unnest([$probeP]) AS pos FROM customer),
       |hits AS (
       |  SELECT c_custkey, count(*) AS n_hit
       |  FROM probe JOIN built USING (pos) GROUP BY c_custkey)
       |SELECT c.c_custkey,
       |  COALESCE(h.n_hit, 0) = $bloomK AS bloom_hit,
       |  (cp.key IS NOT NULL) AS actual,
       |  (COALESCE(h.n_hit, 0) = $bloomK AND cp.key IS NULL) AS fp
       |FROM customer c
       |LEFT JOIN hits h ON c.c_custkey = h.c_custkey
       |LEFT JOIN corpus cp ON c.c_custkey = cp.key
       |ORDER BY c.c_custkey""".stripMargin
  }

  // ─── profile_unique_keys: candidate-key discovery ───
  // The uniqueness half of profiling that profile_fd's dependency
  // tests sit on top of: for each declared candidate key (single
  // columns and the lineitem composite), exact row vs distinct
  // counts, duplicate mass, and the is_key verdict — the constraint a
  // MERGE/upsert silently corrupts data without — and it earns its
  // keep immediately here: the TPC-H-assumed (l_orderkey,
  // l_linenumber) composite does NOT hold on the synthetic lineitem
  // (the generator repeats line numbers), which is precisely the
  // assumed-key violation to catch before trusting it. Exact distincts cost
  // one shuffle per candidate by design (this is the audit; the
  // streaming-scale approximation is sketch_hll's job and the two
  // disagreeing is itself a signal). Composite keys canonicalize as
  // delimited strings — '~' can't appear in numeric keys, so the
  // concat is injective.
  def profileUniqueKeys(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    def audit(df: DataFrame, table: String, key: String,
        expr0: Column): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
        countDistinct(expr0).as("n_distinct"))
        .select(lit(table).as("table_name"), lit(key).as("key_columns"),
          col("n_rows"), col("n_distinct"))
    audit(t.events, "events", "event_id", col("event_id"))
      .unionByName(audit(t.orders, "orders", "o_orderkey", col("o_orderkey")))
      // concat (null-propagating), NOT concat_ws (null-skipping): the
      // DuckDB oracle's '||' nulls the composite when any component is
      // NULL, and a row with a NULL key component must not count as a
      // distinct key on either engine. TPC-H columns are non-null, but
      // the audit must not depend on that.
      .unionByName(audit(t.lineitem, "lineitem", "l_orderkey~l_linenumber",
        concat(col("l_orderkey").cast("string"), lit("~"),
          col("l_linenumber").cast("string"))))
      .unionByName(audit(t.documents, "documents", "doc_id", col("doc_id")))
      .unionByName(audit(t.customer, "customer", "c_custkey", col("c_custkey")))
      .unionByName(audit(t.lineitem, "lineitem", "l_orderkey",
        col("l_orderkey")))
      .withColumn("n_dup_rows", col("n_rows") - col("n_distinct"))
      .withColumn("is_key", col("n_dup_rows") === 0)
      .orderBy(col("table_name"), col("key_columns"))
  }

  val profileUniqueKeysSql: String =
    """WITH a AS (
      |  SELECT 'events' AS table_name, 'event_id' AS key_columns,
      |    CAST(count(*) AS BIGINT) AS n_rows,
      |    CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct
      |  FROM events
      |  UNION ALL
      |  SELECT 'orders', 'o_orderkey', CAST(count(*) AS BIGINT),
      |    CAST(count(DISTINCT o_orderkey) AS BIGINT) FROM orders
      |  UNION ALL
      |  SELECT 'lineitem', 'l_orderkey~l_linenumber',
      |    CAST(count(*) AS BIGINT),
      |    CAST(count(DISTINCT CAST(l_orderkey AS VARCHAR) || '~' ||
      |      CAST(l_linenumber AS VARCHAR)) AS BIGINT) FROM lineitem
      |  UNION ALL
      |  SELECT 'documents', 'doc_id', CAST(count(*) AS BIGINT),
      |    CAST(count(DISTINCT doc_id) AS BIGINT) FROM documents
      |  UNION ALL
      |  SELECT 'customer', 'c_custkey', CAST(count(*) AS BIGINT),
      |    CAST(count(DISTINCT c_custkey) AS BIGINT) FROM customer
      |  UNION ALL
      |  SELECT 'lineitem', 'l_orderkey', CAST(count(*) AS BIGINT),
      |    CAST(count(DISTINCT l_orderkey) AS BIGINT) FROM lineitem)
      |SELECT table_name, key_columns, n_rows, n_distinct,
      |  n_rows - n_distinct AS n_dup_rows,
      |  n_rows - n_distinct = 0 AS is_key
      |FROM a ORDER BY table_name, key_columns""".stripMargin

  // ─── layout_partition: partition-column advisor ───
  // layout_advisor ranks SORT orders; this ranks the coarser decision
  // above it — which column, if any, a table should be PARTITIONED BY.
  // The three ways the choice goes wrong are all share/cardinality
  // facts: too few partitions (no pruning leverage), too many (the
  // small-file problem layout_compact then has to undo; 10⁴+ per
  // snapshot is the lakehouse rule of thumb), or one partition holding
  // the bulk of the rows (skew — pruning works but the big partition
  // still dominates every scan). One map-combining count pass per
  // table (candidate columns ride a single exploded projection — the
  // profile_outliers scan discipline), then the verdict is
  // domain-bounded-frame arithmetic; thresholds are scale-free shares
  // and cardinalities, not row counts.
  def layoutPartition(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    def stacked(df: DataFrame, table: String,
        cands: Seq[(String, Column)]): DataFrame =
      df.select(explode(array(cands.map { case (n, c) =>
        struct(lit(table).as("table_name"), lit(n).as("column_name"),
          c.cast("string").as("value"))
      }: _*)).as("cv")).select(col("cv.*"))
    val counts = stacked(t.documents, "documents",
        Seq("lang" -> col("lang"), "source" -> col("source")))
      .unionByName(stacked(t.events, "events",
        Seq("event_type" -> col("event_type"),
          "day" -> date_trunc("day", col("ts")))))
      .unionByName(stacked(t.orders, "orders",
        Seq("o_orderpriority" -> col("o_orderpriority"))))
      .groupBy(col("table_name"), col("column_name"), col("value"))
      .agg(count(lit(1)).as("cnt"))
    counts.groupBy(col("table_name"), col("column_name"))
      .agg(sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_parts"),
        max(col("cnt")).as("max_rows"))
      .withColumn("max_share_bp", expr("max_rows * 10000 div n_rows"))
      .withColumn("avg_rows", expr("n_rows div n_parts"))
      .withColumn("verdict",
        when(col("n_parts") < 4, "too_coarse")
          .when(col("n_parts") > 10000, "too_fine")
          .when(col("max_share_bp") > 2000, "skewed")
          .otherwise("ok"))
      .select(col("table_name"), col("column_name"), col("n_rows"),
        col("n_parts"), col("avg_rows"), col("max_rows"),
        col("max_share_bp"), col("verdict"))
      .orderBy(col("table_name"), col("column_name"))
  }

  val layoutPartitionSql: String =
    """WITH stacked AS (
      |  SELECT 'documents' AS table_name, 'lang' AS column_name,
      |    CAST(lang AS VARCHAR) AS value FROM documents
      |  UNION ALL
      |  SELECT 'documents', 'source', CAST(source AS VARCHAR) FROM documents
      |  UNION ALL
      |  SELECT 'events', 'event_type', CAST(event_type AS VARCHAR) FROM events
      |  UNION ALL
      |  SELECT 'events', 'day', CAST(date_trunc('day', ts) AS VARCHAR)
      |  FROM events
      |  UNION ALL
      |  SELECT 'orders', 'o_orderpriority', CAST(o_orderpriority AS VARCHAR)
      |  FROM orders),
      |counts AS (
      |  SELECT table_name, column_name, value, CAST(count(*) AS BIGINT) AS cnt
      |  FROM stacked GROUP BY 1, 2, 3),
      |agg AS (
      |  SELECT table_name, column_name,
      |    CAST(sum(cnt) AS BIGINT) AS n_rows,
      |    CAST(count(*) AS BIGINT) AS n_parts,
      |    CAST(max(cnt) AS BIGINT) AS max_rows
      |  FROM counts GROUP BY 1, 2)
      |SELECT table_name, column_name, n_rows, n_parts,
      |  n_rows // n_parts AS avg_rows, max_rows,
      |  max_rows * 10000 // n_rows AS max_share_bp,
      |  CASE WHEN n_parts < 4 THEN 'too_coarse'
      |       WHEN n_parts > 10000 THEN 'too_fine'
      |       WHEN max_rows * 10000 // n_rows > 2000 THEN 'skewed'
      |       ELSE 'ok' END AS verdict
      |FROM agg ORDER BY table_name, column_name""".stripMargin

  // ─── filter_bloom_curve: FPR operating curve across filter widths ───
  // The sizing table behind filter_bloom's M=4096 choice: build the
  // SAME K=3 filter at M ∈ {1024, 4096, 16384}, probe every
  // NON-member customer, and report measured false-positive rate next
  // to the fill-ratio prediction (fill_bp³ div 10⁸ ≈ (set/m)^K in
  // pure integers — no libm, both engines reproduce the digit). The
  // disclosed fill→FPR gap at each size is what justifies (or
  // refuses) a bitmap 4× smaller on the wire. Shapes: the K·|Ms|
  // position explode is a constant ×9 fan-out of the distinct key
  // set; each filter is ≤ M distinct-position rows (broadcast); the
  // probe side is an anti-join then the same bounded explode.
  private val bloomCurveMs = Seq(1024, 4096, 16384)

  private def bloomPosM(m: Int, k: Int, key: Column): Column =
    conv(substring(md5(concat(lit(s"bloomc$m:$k:"), key.cast("string"))), 1, 15), 16, 10)
      .cast("long") % m

  private def bloomPosMSql(m: Int, k: Int, key: String): String =
    s"(CAST(('0x' || substr(md5('bloomc$m:$k:' || CAST($key AS VARCHAR)), 1, 15)) AS BIGINT) % $m)"

  def filterBloomCurve(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val corpus = t.orders.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("key")).distinct()
    def posStructs(key: Column) = array((for {
      m <- bloomCurveMs; k <- 1 to bloomK
    } yield struct(lit(m.toLong).as("m"), bloomPosM(m, k, key).as("pos"))): _*)
    val bits = corpus.select(explode(posStructs(col("key"))).as("mp"))
      .select(col("mp.m").as("m"), col("mp.pos").as("pos")).distinct()
    val fill = bits.groupBy(col("m")).agg(count(lit(1)).as("n_bits_set"))
    val nonmember = t.customer.select(col("c_custkey"))
      .join(corpus.withColumnRenamed("key", "c_custkey"),
        Seq("c_custkey"), "left_anti")
    val fps = nonmember
      .select(col("c_custkey"), explode(posStructs(col("c_custkey"))).as("mp"))
      .select(col("c_custkey"), col("mp.m").as("m"), col("mp.pos").as("pos"))
      .join(broadcast(bits), Seq("m", "pos"))
      .groupBy(col("c_custkey"), col("m")).agg(count(lit(1)).as("n_hit"))
      .filter(col("n_hit") === bloomK)
      .groupBy(col("m")).agg(count(lit(1)).as("n_fp"))
    fill
      .join(fps, Seq("m"), "left")
      .crossJoin(broadcast(corpus.agg(count(lit(1)).as("n_keys"))))
      .crossJoin(broadcast(nonmember.agg(count(lit(1)).as("n_nonmember"))))
      .withColumn("n_fp", coalesce(col("n_fp"), lit(0L)))
      .withColumn("fill_bp", expr("n_bits_set * 10000 div m"))
      .select(col("m"), col("n_keys"), col("n_bits_set"), col("fill_bp"),
        col("n_nonmember"), col("n_fp"),
        expr("n_fp * 10000 div n_nonmember").as("fpr_bp"),
        expr("fill_bp * fill_bp * fill_bp div 100000000").as("fpr_pred_bp"))
      .orderBy(col("m"))
  }

  val filterBloomCurveSql: String = {
    def posList(key: String) = bloomCurveMs.flatMap(m =>
      (1 to bloomK).map(k =>
        s"struct_pack(m := CAST($m AS BIGINT), pos := ${bloomPosMSql(m, k, key)})"))
      .mkString(",\n      ")
    s"""WITH corpus AS (
       |  SELECT DISTINCT o_custkey AS key FROM orders WHERE o_orderstatus = 'F'),
       |bits AS (
       |  SELECT DISTINCT mp.m AS m, mp.pos AS pos FROM (
       |    SELECT unnest([
       |      ${posList("key")}]) AS mp
       |    FROM corpus)),
       |fill AS (SELECT m, CAST(count(*) AS BIGINT) AS n_bits_set
       |         FROM bits GROUP BY m),
       |nonmember AS (
       |  SELECT c_custkey FROM customer
       |  WHERE c_custkey NOT IN (SELECT key FROM corpus)),
       |probe AS (
       |  SELECT c_custkey, mp.m AS m, mp.pos AS pos FROM (
       |    SELECT c_custkey, unnest([
       |      ${posList("c_custkey")}]) AS mp
       |    FROM nonmember)),
       |fps AS (
       |  SELECT m, CAST(count(*) AS BIGINT) AS n_fp FROM (
       |    SELECT c_custkey, m FROM probe JOIN bits USING (m, pos)
       |    GROUP BY c_custkey, m HAVING count(*) = $bloomK)
       |  GROUP BY m),
       |nk AS (SELECT CAST(count(*) AS BIGINT) AS n_keys FROM corpus),
       |np AS (SELECT CAST(count(*) AS BIGINT) AS n_nonmember FROM nonmember)
       |SELECT f.m, nk.n_keys, f.n_bits_set,
       |  f.n_bits_set * 10000 // f.m AS fill_bp,
       |  np.n_nonmember, coalesce(p.n_fp, 0) AS n_fp,
       |  coalesce(p.n_fp, 0) * 10000 // np.n_nonmember AS fpr_bp,
       |  (f.n_bits_set * 10000 // f.m) * (f.n_bits_set * 10000 // f.m)
       |    * (f.n_bits_set * 10000 // f.m) // 100000000 AS fpr_pred_bp
       |FROM fill f LEFT JOIN fps p USING (m)
       |CROSS JOIN nk CROSS JOIN np
       |ORDER BY f.m""".stripMargin
  }

  // ─── sketch_cms: count-min sketch build + calibration probe ───
  // The fixed-memory frequency sketch of streaming telemetry: a
  // depth-4 × width-256 counter grid whose K=4 row positions derive
  // from md5 (cross-engine reproducible, like filter_bloom), so the
  // whole sketch — including its overestimates, which ARE the
  // interesting part — hash-matches the DuckDB replay exactly.
  // Build = one (j, pos)-keyed aggregate with map-side combine
  // (≤ 1024 counter rows at ANY corpus size — that boundedness is
  // the point of the sketch); probe = the top-20 exact-count keys
  // explode to their 4 cells, broadcast-join the counter grid, and
  // take min(c). over_bp audits the collision inflation per key the
  // way dedup_est_error audits MinHash.
  private val cmsDepth = 4
  private val cmsWidth = 256
  private val cmsTopK = 20

  private def cmsPos(j: Int, key: Column): Column =
    conv(substring(md5(concat(lit(s"cms$j:"), key.cast("string"))), 1, 15), 16, 10)
      .cast("long") % cmsWidth

  private def cmsPosSql(j: Int, key: String): String =
    s"(CAST(('0x' || substr(md5('cms$j:' || CAST($key AS VARCHAR)), 1, 15)) AS BIGINT) % $cmsWidth)"

  def sketchCms(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).parallelized("events").select(col("user_id"))
    // Round 17: all depth row positions from one native pass
    // (graft_cms_positions — the old per-cell cmsPos built the salted
    // string, rendered the full hex digest and conv-parsed it, ×4 per
    // row); posexplode's 0-based pos + 1 is the 1-based row index j.
    // Same md5 inputs, same positions (TextKernelsSpec).
    def cells(base: DataFrame, keep: Seq[Column]): DataFrame =
      base.select(keep :+ posexplode(call_function("graft_cms_positions",
          col("user_id").cast("string"), lit(cmsDepth), lit(cmsWidth)))
          .as(Seq("jm1", "pos")): _*)
        .select(keep :+ (col("jm1") + 1).as("j") :+ col("pos"): _*)
    val counters = cells(ev, Seq(col("user_id"))).drop("user_id")
      .groupBy(col("j"), col("pos")).agg(count(lit(1)).as("c"))
    val top = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("user_id")).limit(cmsTopK)
    cells(top, Seq(col("user_id"), col("n_exact")))
      .join(broadcast(counters), Seq("j", "pos"))
      .groupBy(col("user_id"), col("n_exact")).agg(min(col("c")).as("cms_est"))
      .select(col("user_id"), col("n_exact"), col("cms_est"),
        expr("(cms_est - n_exact) * 10000 div n_exact").as("over_bp"))
      .orderBy(col("user_id"))
  }

  val sketchCmsSql: String = {
    val buildBranches = (1 to cmsDepth).map(j =>
      s"SELECT $j AS j, ${cmsPosSql(j, "user_id")} AS pos FROM events")
      .mkString("\n    UNION ALL ")
    val probeBranches = (1 to cmsDepth).map(j =>
      s"SELECT user_id, n_exact, $j AS j, ${cmsPosSql(j, "user_id")} AS pos FROM top")
      .mkString("\n    UNION ALL ")
    s"""WITH counters AS (
       |  SELECT j, pos, count(*) AS c FROM (
       |    $buildBranches)
       |  GROUP BY j, pos),
       |top AS (
       |  SELECT user_id, count(*) AS n_exact FROM events GROUP BY user_id
       |  ORDER BY n_exact DESC, user_id LIMIT $cmsTopK),
       |probe AS (
       |    $probeBranches),
       |est AS (
       |  SELECT user_id, n_exact, CAST(min(c) AS BIGINT) AS cms_est
       |  FROM probe JOIN counters USING (j, pos)
       |  GROUP BY user_id, n_exact)
       |SELECT user_id, n_exact, cms_est,
       |  (cms_est - n_exact) * 10000 // n_exact AS over_bp
       |FROM est ORDER BY user_id""".stripMargin
  }

  // ─── sketch_hll: deterministic HyperLogLog build + error audit ───
  // sketch_stats already demonstrates Spark's built-in HLL++ tier (no
  // cross-engine oracle possible — sketch internals differ). This is
  // the complementary move from the sketch_cms playbook: derive the
  // ENTIRE sketch from md5, in integer math, so DuckDB replays the
  // registers bit-for-bit and the oracle hashes the estimate AND its
  // error. m=256 registers (first hex byte routes, next 32 hash bits
  // give the leading-zero rank via string scan — no float log2 whose
  // rounding could differ between libms); register sums are exact
  // BIGINTs (2^(40−ρ) terms, ρ ≤ 33); α·m²/Σ2^−ρ evaluated as scaled
  // integer divides. Per-(type, bucket) max is a bounded hash
  // aggregate (≤ |types|·256 rows at ANY corpus size — the point of
  // the sketch); map-side combine makes the shuffle a few KB at 100
  // TB. Raw HLL regime only (no linear-counting small-range branch:
  // it needs ln(), which is not reproducible cross-engine); the
  // estimator bias below n ≈ 2.5·m is accepted and AUDITED by err_bp
  // rather than hidden. err_bp keeps all divisions positive —
  // truncating DIV and floor-// agree only on non-negatives.
  private val hllM = 256
  private val hllScale = 40 // registers as 2^(40−ρ): exact in BIGINT
  private val hllAlphaPpm = 718272L // α_256 = 0.7213/(1+1.079/m), ×1e6
  private val hllMm2Scaled = (hllM.toLong * hllM) << hllScale // m²·2^40

  def sketchHll(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).parallelized("events")
      .select(col("event_type"), col("event_id"))
    val parts = ev
      .withColumn("h", md5(concat(lit("hll:"), col("event_id").cast("string"))))
      .withColumn("bucket", conv(substring(col("h"), 1, 2), 16, 10).cast("long"))
      .withColumn("vhex", substring(col("h"), 3, 8))
      .withColumn("nz", length(regexp_extract(col("vhex"), "^(0*)", 1)))
      .withColumn("rho", expr(
        """CASE WHEN nz = 8 THEN 33
          |     ELSE nz * 4 + 1 + CASE substring(vhex, nz + 1, 1)
          |       WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
          |       WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
          |       WHEN '7' THEN 1 ELSE 0 END END""".stripMargin))
    val regs = parts.groupBy(col("event_type"), col("bucket"))
      .agg(max(col("rho")).as("r"))
    val est = regs.groupBy(col("event_type"))
      .agg(sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($hllScale - r AS INT))"))
             .as("s_present"),
           count(lit(1)).as("n_regs"))
      .withColumn("hll_est", expr(
        s"""($hllAlphaPpm * ($hllMm2Scaled DIV
           |  (s_present + ($hllM - n_regs) * ${1L << hllScale}))) DIV 1000000"""
          .stripMargin))
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("event_id")).as("n_exact"))
    exact.join(broadcast(est.select(col("event_type"), col("n_regs"), col("hll_est"))),
        Seq("event_type"))
      .select(col("event_type"), col("n_exact"), col("hll_est"), col("n_regs"),
        expr("(hll_est * 10000) DIV n_exact - 10000").as("err_bp"))
      .orderBy(col("event_type"))
  }

  val sketchHllSql: String =
    s"""WITH parts AS (
       |  SELECT event_type,
       |    CAST(('0x' || substr(h, 1, 2)) AS BIGINT) AS bucket,
       |    substr(h, 3, 8) AS vhex,
       |    LENGTH(regexp_extract(substr(h, 3, 8), '^(0*)', 1)) AS nz
       |  FROM (SELECT event_type,
       |          md5('hll:' || CAST(event_id AS VARCHAR)) AS h
       |        FROM events)),
       |rho AS (
       |  SELECT event_type, bucket,
       |    CASE WHEN nz = 8 THEN 33
       |         ELSE nz * 4 + 1 + CASE substr(vhex, nz + 1, 1)
       |           WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
       |           WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
       |           WHEN '7' THEN 1 ELSE 0 END END AS rho
       |  FROM parts),
       |regs AS (
       |  SELECT event_type, bucket, max(rho) AS r FROM rho GROUP BY 1, 2),
       |est AS (
       |  SELECT event_type, count(*) AS n_regs,
       |    CAST(($hllAlphaPpm * ($hllMm2Scaled //
       |      (sum(CAST(1 AS BIGINT) << ($hllScale - r))
       |       + ($hllM - count(*)) * ${1L << hllScale}))) // 1000000
       |      AS BIGINT) AS hll_est
       |  FROM regs GROUP BY 1),
       |exact AS (
       |  SELECT event_type, count(DISTINCT event_id) AS n_exact
       |  FROM events GROUP BY 1)
       |SELECT e.event_type, x.n_exact, e.hll_est, e.n_regs,
       |  CAST((e.hll_est * 10000) // x.n_exact - 10000 AS BIGINT) AS err_bp
       |FROM est e JOIN exact x USING (event_type)
       |ORDER BY e.event_type""".stripMargin

  // ─── sketch_kmv: K-minimum-values distinct + cross-source overlap ───
  // The mergeable bounded-memory answer to "how big is each source's
  // distinct content, and how much do sources overlap?" — the
  // contamination dashboard at 100 TB, where mix_source_overlap's
  // NEAR-dup matrix is complemented by this EXACT-content one. A KMV
  // sketch is just the k smallest values of a uniform hash of the
  // distinct set: est_distinct = (k−1)·2^52/v_k (52 hash bits keep
  // (k−1)·2^52 inside BIGINT), and the k smallest of a pair's UNION
  // sketch estimate Jaccard as |U_k ∩ A ∩ B|/|U_k| — all integer, so
  // DuckDB replays it exactly. The exact hash-set figures (per-source
  // distinct counts, pairwise intersection) live in the SEPARATE
  // `sketch_kmv_audit` query below: they are precisely the corpus-
  // sized work the sketch replaces, so the shipped estimator plan
  // contains neither (round-12 split; the audit stays oracled as a
  // test-SF calibration harness, never run at corpus scale).
  // Scale shape: the k-smallest selection is TWO-LEVEL —
  // a per-(source, physical-partition) row_number over the
  // hash-distinct rows keeps every sort bounded by partition size,
  // then the global window only sees ≤ k·P candidate rows. (Which
  // partition a row lands in doesn't affect the result: the union of
  // local top-ks always contains the global top-k.) The pair frame is
  // |sources|², built by broadcast; union re-rank input is ≤ 2k rows
  // per pair.
  private val kmvK = 128
  private val kmvBits = 52

  def sketchKmv(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dv = Tables(spark, dir).documents
      .select(col("source"),
        conv(substring(md5(concat(lit("kmv:"), col("text"))), 1, 13), 16, 10)
          .cast("long").as("v"))
      .distinct()
    val localTop = dv
      .withColumn("pid", spark_partition_id())
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source"), col("pid")).orderBy(col("v"))))
      .filter(col("rn") <= kmvK).drop("rn", "pid")
    val sk = localTop
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("v"))))
      .filter(col("rn") <= kmvK).drop("rn")
    val estd = sk.groupBy(col("source"))
      .agg(max(col("v")).as("v_k"), count(lit(1)).as("k_sz"))
      .withColumn("est_distinct", expr(
        s"CASE WHEN k_sz < $kmvK THEN k_sz ELSE ${(kmvK - 1).toLong << kmvBits} DIV v_k END"))
    // Pair universe from the sketch frame itself (|sources| rows) —
    // the estimator never aggregates the corpus beyond the sketch.
    val srcs = estd.select(col("source"))
    val pairs = srcs.select(col("source").as("src_a"))
      .join(broadcast(srcs.select(col("source").as("src_b"))),
        col("src_a") < col("src_b"))
    // Pair × sketch as an EQUIJOIN: explode each pair to its two member
    // sources and join on source — never a nested loop over sketches.
    val mem = pairs
      .select(col("src_a"), col("src_b"),
        explode(array(col("src_a"), col("src_b"))).as("source"))
    val uni = broadcast(mem).join(sk, Seq("source"))
      .groupBy(col("src_a"), col("src_b"), col("v"))
      .agg(count(lit(1)).as("n_side"))
    val topu = uni
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("src_a"), col("src_b")).orderBy(col("v"))))
      .filter(col("rn") <= kmvK)
    val jac = topu.groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("u_sz"),
        sum(when(col("n_side") === 2, 1L).otherwise(0L)).as("n_both"))
    pairs
      .join(broadcast(estd.select(col("source").as("src_a"), col("est_distinct").as("est_a"))), Seq("src_a"))
      .join(broadcast(estd.select(col("source").as("src_b"), col("est_distinct").as("est_b"))), Seq("src_b"))
      .join(broadcast(jac), Seq("src_a", "src_b"))
      .select(col("src_a"), col("src_b"),
        col("est_a"), col("est_b"), col("u_sz"), col("n_both"),
        expr("(n_both * 10000) DIV u_sz").as("jacc_est_bp"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** The exact-side calibration audit the estimator used to bundle:
    * per-source exact distinct counts and the pairwise exact
    * intersection/Jaccard. This IS the corpus-sized work `sketch_kmv`
    * replaces — a full distinct aggregate plus a value-keyed self-join
    * — kept as its own oracled query so the gate can still measure the
    * estimator's error at test SF while the shipped estimator plan
    * stays sketch-only. Run this at sample scale, never per-corpus. */
  def sketchKmvAudit(spark: SparkSession, dir: String): DataFrame = {
    val dv = Tables(spark, dir).parallelized("documents")
      .select(col("source"),
        conv(substring(md5(concat(lit("kmv:"), col("text"))), 1, 13), 16, 10)
          .cast("long").as("v"))
      .distinct()
    val per = dv.groupBy(col("source")).agg(count(lit(1)).as("n_exact"))
    val pairs = per.select(col("source").as("src_a"))
      .join(broadcast(per.select(col("source").as("src_b"))),
        col("src_a") < col("src_b"))
    val inter = dv.as("x")
      .join(dv.as("y"),
        col("x.v") === col("y.v") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
      .agg(count(lit(1)).as("n_inter"))
    pairs
      .join(broadcast(per.select(col("source").as("src_a"), col("n_exact").as("n_a"))), Seq("src_a"))
      .join(broadcast(per.select(col("source").as("src_b"), col("n_exact").as("n_b"))), Seq("src_b"))
      .join(broadcast(inter), Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        coalesce(col("n_inter"), lit(0L)).as("n_inter"),
        expr("(COALESCE(n_inter, 0) * 10000) DIV (n_a + n_b - COALESCE(n_inter, 0))")
          .as("jacc_exact_bp"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val sketchKmvSql: String =
    s"""WITH dv AS (
       |  SELECT DISTINCT source,
       |    CAST(('0x' || substr(md5('kmv:' || text), 1, 13)) AS BIGINT) AS v
       |  FROM documents),
       |rk AS (
       |  SELECT source, v,
       |    row_number() OVER (PARTITION BY source ORDER BY v) AS rn
       |  FROM dv),
       |sk AS (SELECT source, v FROM rk WHERE rn <= $kmvK),
       |estd AS (
       |  SELECT source,
       |    CAST(CASE WHEN count(*) < $kmvK THEN count(*)
       |         ELSE ${(kmvK - 1).toLong << kmvBits} // max(v) END AS BIGINT)
       |      AS est_distinct
       |  FROM sk GROUP BY 1),
       |pairs AS (
       |  SELECT a.source AS src_a, b.source AS src_b
       |  FROM estd a JOIN estd b ON a.source < b.source),
       |uni AS (
       |  SELECT p.src_a, p.src_b, s.v, count(*) AS n_side
       |  FROM pairs p JOIN sk s ON s.source = p.src_a OR s.source = p.src_b
       |  GROUP BY 1, 2, 3),
       |topu AS (
       |  SELECT src_a, src_b, v, n_side,
       |    row_number() OVER (PARTITION BY src_a, src_b ORDER BY v) AS rn
       |  FROM uni),
       |jac AS (
       |  SELECT src_a, src_b, count(*) AS u_sz,
       |    CAST(sum(CASE WHEN n_side = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_both
       |  FROM topu WHERE rn <= $kmvK GROUP BY 1, 2)
       |SELECT p.src_a, p.src_b,
       |  ea.est_distinct AS est_a, eb.est_distinct AS est_b,
       |  j.u_sz, j.n_both,
       |  CAST((j.n_both * 10000) // j.u_sz AS BIGINT) AS jacc_est_bp
       |FROM pairs p
       |JOIN estd ea ON ea.source = p.src_a
       |JOIN estd eb ON eb.source = p.src_b
       |JOIN jac j ON j.src_a = p.src_a AND j.src_b = p.src_b
       |ORDER BY p.src_a, p.src_b""".stripMargin

  val sketchKmvAuditSql: String =
    s"""WITH dv AS (
       |  SELECT DISTINCT source,
       |    CAST(('0x' || substr(md5('kmv:' || text), 1, 13)) AS BIGINT) AS v
       |  FROM documents),
       |per AS (SELECT source, count(*) AS n_exact FROM dv GROUP BY 1),
       |pairs AS (
       |  SELECT a.source AS src_a, b.source AS src_b
       |  FROM per a JOIN per b ON a.source < b.source),
       |inter AS (
       |  SELECT x.source AS src_a, y.source AS src_b, count(*) AS n_inter
       |  FROM dv x JOIN dv y ON x.v = y.v AND x.source < y.source
       |  GROUP BY 1, 2)
       |SELECT p.src_a, p.src_b, pa.n_exact AS n_a, pb.n_exact AS n_b,
       |  CAST(COALESCE(i.n_inter, 0) AS BIGINT) AS n_inter,
       |  CAST((COALESCE(i.n_inter, 0) * 10000) //
       |       (pa.n_exact + pb.n_exact - COALESCE(i.n_inter, 0)) AS BIGINT)
       |    AS jacc_exact_bp
       |FROM pairs p
       |JOIN per pa ON pa.source = p.src_a
       |JOIN per pb ON pb.source = p.src_b
       |LEFT JOIN inter i ON i.src_a = p.src_a AND i.src_b = p.src_b
       |ORDER BY p.src_a, p.src_b""".stripMargin

  // ─── profile_corr: one-pass numeric correlation matrix ───
  // Data profiling's pairwise view: Pearson correlation for EVERY
  // pair of lineitem's numeric measures, from ONE ungrouped aggregate
  // pass that collects the full exact-integer moment matrix (n, four
  // sums, four squares, six cross products — all order-insensitive
  // longs, the q35_corr discipline widened to a matrix). The pair
  // readouts are fixed-shape double formulas over that single
  // broadcast row: profiling k columns costs one corpus scan and
  // O(k²) driver-free arithmetic, never k² passes. Measures are
  // integerized first (quantity as-is, price floored, discount/tax in
  // cents) so the moments are exact at any scale.
  def profileCorr(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq(
      "quantity" -> col("l_quantity").cast("long"),
      "price" -> floor(col("l_extendedprice")).cast("long"),
      "discount" -> floor(col("l_discount") * 100 + lit(0.5)).cast("long"),
      "tax" -> floor(col("l_tax") * 100 + lit(0.5)).cast("long"))
    val proj = Tables(spark, dir).lineitem
      .select(cols.map { case (n, c) => c.as(n) }: _*)
    val aggs = Seq(count(lit(1)).as("n")) ++
      cols.map { case (n, _) => sum(col(n)).as(s"s_$n") } ++
      (for {
        (a, i) <- cols.map(_._1).zipWithIndex
        (b, j) <- cols.map(_._1).zipWithIndex if i <= j
      } yield sum(col(a) * col(b)).as(s"p_${a}_$b"))
    val m = proj.agg(aggs.head, aggs.tail: _*)
    // all six pair readouts project off the SAME one-row aggregate —
    // an explode of literal structs, so the corpus is scanned once
    // (never a per-pair union re-running the aggregate)
    val pairStructs = for {
      (a, i) <- cols.map(_._1).zipWithIndex
      (b, j) <- cols.map(_._1).zipWithIndex if i < j
    } yield {
      val nd = col("n").cast("double")
      val num = nd * col(s"p_${a}_$b") -
        col(s"s_$a").cast("double") * col(s"s_$b")
      val da = nd * col(s"p_${a}_$a") -
        col(s"s_$a").cast("double") * col(s"s_$a")
      val db = nd * col(s"p_${b}_$b") -
        col(s"s_$b").cast("double") * col(s"s_$b")
      struct(lit(a).as("col_a"), lit(b).as("col_b"), col("n").as("n"),
        when(da > 0 && db > 0,
          floor(num * 10000 / sqrt(da * db)).cast("long"))
          .otherwise(lit(0L)).as("corr_bp"))
    }
    m.select(explode(array(pairStructs: _*)).as("p"))
      .select(col("p.col_a"), col("p.col_b"), col("p.n"), col("p.corr_bp"))
      .orderBy(col("col_a"), col("col_b"))
  }

  val profileCorrSql: String = {
    val names = Seq("quantity", "price", "discount", "tax")
    val pairSelects = (for {
      (a, i) <- names.zipWithIndex
      (b, j) <- names.zipWithIndex if i < j
    } yield
      s"""SELECT '$a' AS col_a, '$b' AS col_b, n,
         |  CASE WHEN (CAST(n AS DOUBLE) * p_${a}_$a
         |        - CAST(s_$a AS DOUBLE) * s_$a) > 0
         |    AND (CAST(n AS DOUBLE) * p_${b}_$b
         |        - CAST(s_$b AS DOUBLE) * s_$b) > 0
         |  THEN CAST(floor((CAST(n AS DOUBLE) * p_${a}_$b
         |      - CAST(s_$a AS DOUBLE) * s_$b) * 10000
         |    / sqrt((CAST(n AS DOUBLE) * p_${a}_$a
         |        - CAST(s_$a AS DOUBLE) * s_$a)
         |      * (CAST(n AS DOUBLE) * p_${b}_$b
         |        - CAST(s_$b AS DOUBLE) * s_$b))) AS BIGINT)
         |  ELSE 0 END AS corr_bp
         |FROM m""".stripMargin).mkString("\nUNION ALL\n")
    val sums = names.map(n => s"CAST(sum($n) AS BIGINT) AS s_$n").mkString(", ")
    val prods = (for {
      (a, i) <- names.zipWithIndex
      (b, j) <- names.zipWithIndex if i <= j
    } yield s"CAST(sum($a * $b) AS BIGINT) AS p_${a}_$b").mkString(",\n    ")
    s"""WITH proj AS (
       |  SELECT CAST(l_quantity AS BIGINT) AS quantity,
       |    CAST(floor(l_extendedprice) AS BIGINT) AS price,
       |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS discount,
       |    CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS tax
       |  FROM lineitem),
       |m AS (
       |  SELECT count(*) AS n, $sums,
       |    $prods
       |  FROM proj)
       |SELECT * FROM (
       |$pairSelects
       |) ORDER BY col_a, col_b""".stripMargin
  }

  // ─── layout_compact: small-file compaction planner ───
  // The table-maintenance decision every lake table needs (Delta
  // OPTIMIZE / Iceberg rewriteDataFiles): given a manifest of file
  // sizes, group small files into target-sized compaction bins. The
  // "manifest" is the (source, lang) partition grid of the documents
  // table with char mass as the size proxy — the same metadata-scale
  // frame a real table's file listing is. Assignment is SORTED
  // CUMULATIVE packing: files ordered by (size desc, key), running
  // total, bin = ⌊(cum − size) / cap⌋ — deterministic (no greedy
  // first-fit whose output depends on scan order), one pass, and
  // within 2× of optimal bin count like any FFD-family packer. The
  // capacity is relative (⅛ of total mass, floored at the largest
  // file so no file straddles alone). Planning windows run on the
  // MANIFEST (≤ |sources|·|langs| rows — the shard_skew bounded-frame
  // pattern), never the corpus; the corpus is touched once by the
  // sizing aggregate.
  def layoutCompact(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val files = Tables(spark, dir).documents
      .groupBy(col("source"), col("lang"))
      .agg(sum(col("n_chars")).as("size_chars"),
        count(lit(1)).as("n_docs"))
    val all = Window.partitionBy(lit(1))
    val ord = Window.partitionBy(lit(1))
      .orderBy(col("size_chars").desc, col("source"), col("lang"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val planned = files
      .withColumn("cap",
        greatest(ceil(sum(col("size_chars")).over(all) / 8).cast("long"),
          max(col("size_chars")).over(all)))
      .withColumn("cum", sum(col("size_chars")).over(ord))
      .withColumn("bin", expr("(cum - size_chars) div cap"))
    val fills = planned.groupBy(col("bin"), col("cap"))
      .agg(sum(col("size_chars")).as("bin_chars"))
    planned.join(broadcast(fills), Seq("bin", "cap"))
      .select(col("source"), col("lang"), col("size_chars"), col("n_docs"),
        col("bin"), col("bin_chars"),
        expr("bin_chars * 10000 div cap").as("fill_bp"))
      .orderBy(col("source"), col("lang"))
  }

  val layoutCompactSql: String =
    """WITH files AS (
      |  SELECT source, lang, CAST(sum(n_chars) AS BIGINT) AS size_chars,
      |    CAST(count(*) AS BIGINT) AS n_docs
      |  FROM documents GROUP BY source, lang),
      |planned AS (
      |  SELECT source, lang, size_chars, n_docs,
      |    greatest(CAST(ceil(sum(size_chars) OVER () / 8.0) AS BIGINT),
      |      max(size_chars) OVER ()) AS cap,
      |    CAST(sum(size_chars) OVER (ORDER BY size_chars DESC, source, lang
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum
      |  FROM files),
      |binned AS (
      |  SELECT *, (cum - size_chars) // cap AS bin FROM planned),
      |fills AS (
      |  SELECT bin, cap, CAST(sum(size_chars) AS BIGINT) AS bin_chars
      |  FROM binned GROUP BY bin, cap)
      |SELECT b.source, b.lang, b.size_chars, b.n_docs, b.bin, f.bin_chars,
      |  f.bin_chars * 10000 // b.cap AS fill_bp
      |FROM binned b JOIN fills f ON b.bin = f.bin AND b.cap = f.cap
      |ORDER BY b.source, b.lang""".stripMargin

  // ─── profile_freq: top-k frequent values per categorical column ───
  // profile_table's missing half: not just HOW MANY distincts a
  // column has but WHICH values dominate — the skew early-warning
  // (a 95 %-one-value join key salts or dies) and the enum-drift
  // check. Each profiled column contributes one map-combining
  // count aggregate (value cardinality = domain-bounded, so every
  // post-aggregate frame is metadata-sized); the top-5 rank windows
  // partition BY COLUMN over those bounded frames, never the data.
  // share_bp exact against the table's row count.
  def profileFreq(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    def freq(df: DataFrame, table: String, cols: Seq[String]): DataFrame =
      cols.map { c =>
        df.groupBy(col(c).as("value"))
          .agg(count(lit(1)).as("cnt"))
          .select(lit(table).as("table_name"), lit(c).as("column_name"),
            col("value"), col("cnt"))
      }.reduce(_ unionByName _)
    val colFrame = Window.partitionBy(col("table_name"), col("column_name"))
    val byCol = colFrame.orderBy(col("cnt").desc, col("value"))
    freq(t.orders, "orders", Seq("o_orderstatus", "o_orderpriority"))
      .unionByName(freq(t.lineitem, "lineitem",
        Seq("l_returnflag", "l_linestatus")))
      // n_rows = the column's count total — lazy, no driver action.
      .withColumn("n_rows", sum(col("cnt")).over(colFrame))
      .withColumn("rk", row_number().over(byCol).cast("long"))
      .filter(col("rk") <= 5)
      .select(col("table_name"), col("column_name"), col("value"), col("rk"),
        col("cnt"), expr("cnt * 10000 div n_rows").as("share_bp"))
      .orderBy(col("table_name"), col("column_name"), col("rk"))
  }

  val profileFreqSql: String =
    """WITH stacked AS (
      |  SELECT 'orders' AS table_name, 'o_orderstatus' AS column_name,
      |    o_orderstatus AS value FROM orders
      |  UNION ALL
      |  SELECT 'orders', 'o_orderpriority', o_orderpriority FROM orders
      |  UNION ALL
      |  SELECT 'lineitem', 'l_returnflag', l_returnflag FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem', 'l_linestatus', l_linestatus FROM lineitem),
      |tot AS (
      |  SELECT 'orders' AS table_name, count(*) AS n_rows FROM orders
      |  UNION ALL
      |  SELECT 'lineitem', count(*) FROM lineitem),
      |counted AS (
      |  SELECT table_name, column_name, value, CAST(count(*) AS BIGINT) AS cnt
      |  FROM stacked GROUP BY 1, 2, 3),
      |ranked AS (
      |  SELECT table_name, column_name, value, cnt,
      |    row_number() OVER (PARTITION BY table_name, column_name
      |      ORDER BY cnt DESC, value) AS rk
      |  FROM counted)
      |SELECT r.table_name, r.column_name, r.value, r.rk, r.cnt,
      |  r.cnt * 10000 // t.n_rows AS share_bp
      |FROM ranked r JOIN tot t USING (table_name)
      |WHERE r.rk <= 5
      |ORDER BY r.table_name, r.column_name, r.rk""".stripMargin

  // ─── profile_entropy: per-column entropy / uniformity profile ───
  // profile_table counts distincts and profile_freq names the top
  // values; this scores the SHAPE of each categorical column's
  // distribution with one number — Shannon entropy in the fl2
  // surrogate (fl2(x) = length(bin(x))−1 = ⌊log₂x⌋, exact in both
  // engines — the ev_entropy trick applied column-wise):
  // H_milli = Σ cᵢ·(fl2(n)−fl2(cᵢ))·1000 div n, plus the ceiling
  // fl2(n_distinct)·1000 a uniform column would score and the
  // uniformity ratio in bp — the one-glance signal that separates a
  // balanced enum from a 95 %-one-value key (which must salt or die
  // as a join key at scale). One map-combining count pass per
  // profiled column; every post-aggregate frame is domain-bounded
  // (the per-column value histogram), so output size is independent
  // of corpus size. A single-valued column has ceiling 0 and reports
  // uniform_bp = 10⁴ by the greatest(1, ·) guard.
  def profileEntropy(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // One scan per table (plan-guarded): a table's profiled columns
    // ride a single projection exploded to (table, column, value).
    def stackOf(df: DataFrame, table: String, cs: Seq[String]): DataFrame =
      df.select(explode(array(cs.map(c =>
        struct(lit(c).as("column_name"),
          col(c).cast("string").as("value"))): _*)).as("cv"))
        .select(lit(table).as("table_name"),
          col("cv.column_name").as("column_name"),
          col("cv.value").as("value"))
    val stacked =
      stackOf(t.orders, "orders", Seq("o_orderstatus", "o_orderpriority"))
        .unionByName(stackOf(t.lineitem, "lineitem",
          Seq("l_returnflag", "l_linestatus")))
        .unionByName(stackOf(t.customer, "customer", Seq("c_mktsegment")))
        .unionByName(stackOf(t.events, "events", Seq("event_type")))
        .unionByName(stackOf(t.documents, "documents", Seq("lang", "source")))
        .groupBy(col("table_name"), col("column_name"), col("value"))
        .agg(count(lit(1)).as("cnt"))
    stacked
      .withColumn("n", sum(col("cnt")).over(
        Window.partitionBy(col("table_name"), col("column_name"))))
      .groupBy(col("table_name"), col("column_name"))
      .agg(max(col("n")).as("n_rows"),
        count(lit(1)).as("n_distinct"),
        expr("sum(cnt * (length(bin(n)) - length(bin(cnt)))) * 1000 div max(n)")
          .as("h_milli"),
        expr("max(cnt) * 10000 div max(n)").as("top_share_bp"))
      .withColumn("h_max_milli",
        expr("cast((length(bin(n_distinct)) - 1) * 1000 AS BIGINT)"))
      .withColumn("uniform_bp",
        expr("h_milli * 10000 div greatest(1, h_max_milli)"))
      .select(col("table_name"), col("column_name"), col("n_rows"),
        col("n_distinct"), col("h_milli"), col("h_max_milli"),
        col("top_share_bp"), col("uniform_bp"))
      .orderBy(col("table_name"), col("column_name"))
  }

  val profileEntropySql: String =
    """WITH stacked AS (
      |  SELECT 'orders' AS table_name, 'o_orderstatus' AS column_name,
      |    CAST(o_orderstatus AS VARCHAR) AS value FROM orders
      |  UNION ALL
      |  SELECT 'orders', 'o_orderpriority', CAST(o_orderpriority AS VARCHAR)
      |  FROM orders
      |  UNION ALL
      |  SELECT 'lineitem', 'l_returnflag', CAST(l_returnflag AS VARCHAR)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem', 'l_linestatus', CAST(l_linestatus AS VARCHAR)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'customer', 'c_mktsegment', CAST(c_mktsegment AS VARCHAR)
      |  FROM customer
      |  UNION ALL
      |  SELECT 'events', 'event_type', CAST(event_type AS VARCHAR) FROM events
      |  UNION ALL
      |  SELECT 'documents', 'lang', CAST(lang AS VARCHAR) FROM documents
      |  UNION ALL
      |  SELECT 'documents', 'source', CAST(source AS VARCHAR) FROM documents),
      |counted AS (
      |  SELECT table_name, column_name, value, CAST(count(*) AS BIGINT) AS cnt
      |  FROM stacked GROUP BY 1, 2, 3),
      |withn AS (
      |  SELECT *, CAST(sum(cnt) OVER (PARTITION BY table_name, column_name)
      |    AS BIGINT) AS n
      |  FROM counted),
      |agg AS (
      |  SELECT table_name, column_name, max(n) AS n_rows,
      |    CAST(count(*) AS BIGINT) AS n_distinct,
      |    CAST(sum(cnt * (length(bin(n)) - length(bin(cnt)))) * 1000 // max(n)
      |      AS BIGINT) AS h_milli,
      |    max(cnt) * 10000 // max(n) AS top_share_bp
      |  FROM withn GROUP BY 1, 2)
      |SELECT table_name, column_name, n_rows, n_distinct, h_milli,
      |  (length(bin(n_distinct)) - 1) * 1000 AS h_max_milli, top_share_bp,
      |  h_milli * 10000 // greatest(1, (length(bin(n_distinct)) - 1) * 1000)
      |    AS uniform_bp
      |FROM agg ORDER BY table_name, column_name""".stripMargin

  // ─── sketch_ams: AMS tug-of-war second-moment (F2) sketch ───
  // The third classic bounded-state sketch next to CMS (point
  // frequency) and HLL/KMV (distincts): F2 = Σ f_k² — the self-join
  // size / repeat-rate moment that prices a key's join fan-out and
  // detects heavy-hitter drift without materializing per-key counts.
  // S=32 ±1 counters per group, sign from one md5 bit (cross-engine
  // reproducible like cms/bloom); each counter Z_i = Σ sign_i(key)
  // has E[Z_i²] = F2 exactly, so the estimate is mean(Z_i²) in pure
  // integer arithmetic and DuckDB replays the sketch bit-for-bit.
  // Build = one (type, i)-keyed map-combining aggregate over a ×S
  // explode (the sketch trade: S× map work for O(|types|·S) state at
  // ANY corpus size). The exact audit side is a per-(type,key) count
  // + one more combine — a grouped aggregate, never a self-join.
  private val amsS = 32

  def sketchAms(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).parallelized("events")
      .select(col("event_type"), col("user_id"))
    // ONE md5 per row: its 32 hex nibbles' low bits are 32 independent
    // sign hashes (a first cut hashed 32 separate salted md5s per row
    // — 32× the digest cost for the same estimator quality). Round 17:
    // the ×S explode is gone too — graft_ams_signs derives all S signs
    // from the digest bytes in one native pass (the old per-cell
    // substring(h, i+1, 1) + conv parsed the hex STRING 32 times per
    // row), and the S counter sums ride one hash-aggregate row per
    // event_type instead of S. F2 = mean of squared sums, computed
    // from the same aggregated row — z_i and f2_est are bit-identical
    // (TextKernelsSpec pins the sign parity).
    val zCols = (0 until amsS).map(i =>
      sum(element_at(col("sg"), i + 1)).as(s"z$i"))
    val est = ev
      .select(col("event_type"),
        call_function("graft_ams_signs",
          concat(lit("ams:"), col("user_id").cast("string")), lit(amsS)).as("sg"))
      .groupBy(col("event_type"))
      .agg(zCols.head, zCols.tail: _*)
      .select(col("event_type"),
        expr((0 until amsS).map(i => s"z$i * z$i").mkString("(", " + ", s") div $amsS"))
          .as("f2_est"))
    val exact = ev.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(sum(col("c") * col("c")).as("f2_exact"),
        sum(col("c")).as("n_rows"))
    exact.join(est, Seq("event_type"))
      .select(col("event_type"), col("n_rows"), col("f2_exact"),
        col("f2_est"),
        expr("(f2_est - f2_exact) * 10000 div f2_exact").as("err_bp"))
      .orderBy(col("event_type"))
  }

  val sketchAmsSql: String =
    s"""WITH cells AS (
       |  SELECT event_type, t.i,
       |    (CAST(('0x' || substr(md5('ams:' || CAST(user_id AS VARCHAR)),
       |       CAST(t.i AS INTEGER) + 1, 1)) AS BIGINT) % 2) * 2 - 1
       |      AS sgn
       |  FROM events CROSS JOIN range(0, $amsS) t(i)),
       |z AS (
       |  SELECT event_type, i, CAST(sum(sgn) AS BIGINT) AS z
       |  FROM cells GROUP BY event_type, i),
       |est AS (
       |  SELECT event_type, CAST(sum(z * z) // $amsS AS BIGINT) AS f2_est
       |  FROM z GROUP BY event_type),
       |exact AS (
       |  SELECT event_type, CAST(sum(c * c) AS BIGINT) AS f2_exact,
       |    CAST(sum(c) AS BIGINT) AS n_rows
       |  FROM (SELECT event_type, user_id, count(*) AS c
       |        FROM events GROUP BY 1, 2)
       |  GROUP BY event_type)
       |SELECT e.event_type, e.n_rows, e.f2_exact, s.f2_est,
       |  (s.f2_est - e.f2_exact) * 10000 // e.f2_exact AS err_bp
       |FROM exact e JOIN est s USING (event_type)
       |ORDER BY e.event_type""".stripMargin

  // ─── profile_histogram: equi-width histograms per numeric column ───
  // The numeric companion to profile_freq's categorical top-k: 16
  // equi-width bins over integer cents per column, edges derived from
  // the column's own min/max — the distribution-shape readout that
  // feeds layout_advisor-style decisions (skewed price → z-order
  // candidate) and drift alerts. All integer: W = (max−min) div 16 + 1
  // guarantees bin ∈ [0,15] with exact replayable edges. One stacked
  // pass: per-column extremes are a 3-row broadcast, the bin rollup is
  // one map-combining aggregate, and the share window partitions by
  // column over ≤16-row frames (domain-bounded, profile_freq's
  // discipline) — nothing driver-side, nothing unbounded.
  def profileHistogram(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    val stacked =
      li.select(lit("l_extendedprice").as("column_name"),
          cents(col("l_extendedprice")).as("v"))
        .unionByName(li.select(lit("l_quantity").as("column_name"),
          cents(col("l_quantity")).as("v")))
        .unionByName(li.select(lit("l_discount").as("column_name"),
          cents(col("l_discount")).as("v")))
    val ext = stacked.groupBy(col("column_name"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .withColumn("w", expr("(mx - mn) div 16 + 1"))
    val colFrame = Window.partitionBy(col("column_name"))
    stacked.join(broadcast(ext), Seq("column_name"))
      .withColumn("bin", expr("(v - mn) div w"))
      .groupBy(col("column_name"), col("bin"), col("mn"), col("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("column_name"), col("bin"),
        expr("mn + bin * w").as("lo_cents"),
        expr("mn + (bin + 1) * w - 1").as("hi_cents"), col("cnt"))
      .withColumn("n_rows", sum(col("cnt")).over(colFrame))
      .withColumn("share_bp", expr("cnt * 10000 div n_rows"))
      .drop("n_rows")
      .orderBy(col("column_name"), col("bin"))
  }

  val profileHistogramSql: String = {
    def cseq(c: String) =
      s"SELECT '$c' AS column_name, ${Tables.centsSql(c)} AS v FROM lineitem"
    s"""WITH stacked AS (
       |  ${cseq("l_extendedprice")}
       |  UNION ALL ${cseq("l_quantity")}
       |  UNION ALL ${cseq("l_discount")}),
       |ext AS (
       |  SELECT column_name, min(v) AS mn, max(v) AS mx,
       |    (max(v) - min(v)) // 16 + 1 AS w
       |  FROM stacked GROUP BY column_name),
       |binned AS (
       |  SELECT s.column_name, (s.v - e.mn) // e.w AS bin, e.mn, e.w,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM stacked s JOIN ext e USING (column_name)
       |  GROUP BY 1, 2, 3, 4)
       |SELECT column_name, bin, mn + bin * w AS lo_cents,
       |  mn + (bin + 1) * w - 1 AS hi_cents, cnt,
       |  CAST(cnt * 10000 // sum(cnt) OVER (PARTITION BY column_name)
       |    AS BIGINT) AS share_bp
       |FROM binned
       |ORDER BY column_name, bin""".stripMargin
  }

  // ─── profile_fd: approximate functional-dependency discovery ───
  // The Metanome/data-profiling question the column-wise profiles
  // can't see: does column A DETERMINE column B? Exact FD test =
  // |distinct(A,B)| vs |distinct A|; the g3 error = the minimum
  // fraction of rows to delete for the FD to hold (1 − Σ_a max_b
  // count(a,b) / n) — the standard approximate-FD measure, here in
  // exact bp. One (pair, lhs, rhs) map-combining count per direction
  // (domain-bounded output), a per-lhs max over those bounded frames,
  // one rollup — the corpus is scanned once per table, never joined.
  def profileFd(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    def dirPairs(df: DataFrame, table: String,
        pairs: Seq[(String, String)]): DataFrame =
      pairs.map { case (lhs, rhs) =>
        df.groupBy(col(lhs).as("a"), col(rhs).as("b"))
          .agg(count(lit(1)).as("c"))
          .select(lit(table).as("table_name"), lit(lhs).as("lhs"),
            lit(rhs).as("rhs"), col("a"), col("b"), col("c"))
      }.reduce(_ unionByName _)
    val counted =
      dirPairs(t.orders, "orders",
        Seq("o_orderstatus" -> "o_orderpriority",
          "o_orderpriority" -> "o_orderstatus"))
        .unionByName(dirPairs(t.lineitem, "lineitem",
          Seq("l_returnflag" -> "l_linestatus",
            "l_linestatus" -> "l_returnflag")))
    val perLhs = counted
      .groupBy(col("table_name"), col("lhs"), col("rhs"), col("a"))
      .agg(count(lit(1)).as("n_rhs"), max(col("c")).as("keep"),
        sum(col("c")).as("n"))
    perLhs.groupBy(col("table_name"), col("lhs"), col("rhs"))
      .agg(count(lit(1)).as("n_lhs"),
        sum(col("n_rhs")).as("n_pairs"),
        sum(col("n")).as("n_rows"),
        sum(col("keep")).as("keep_mass"))
      .select(col("table_name"), col("lhs"), col("rhs"), col("n_lhs"),
        col("n_pairs"), (col("n_pairs") === col("n_lhs")).as("fd_holds"),
        expr("(n_rows - keep_mass) * 10000 div n_rows").as("g3_bp"))
      .orderBy(col("table_name"), col("lhs"), col("rhs"))
  }

  val profileFdSql: String = {
    def branch(table: String, lhs: String, rhs: String) =
      s"""SELECT '$table' AS table_name, '$lhs' AS lhs, '$rhs' AS rhs,
         |    $lhs AS a, $rhs AS b, CAST(count(*) AS BIGINT) AS c
         |  FROM $table GROUP BY 4, 5""".stripMargin
    s"""WITH counted AS (
       |  ${branch("orders", "o_orderstatus", "o_orderpriority")}
       |  UNION ALL ${branch("orders", "o_orderpriority", "o_orderstatus")}
       |  UNION ALL ${branch("lineitem", "l_returnflag", "l_linestatus")}
       |  UNION ALL ${branch("lineitem", "l_linestatus", "l_returnflag")}),
       |per_lhs AS (
       |  SELECT table_name, lhs, rhs, a,
       |    CAST(count(*) AS BIGINT) AS n_rhs, max(c) AS keep,
       |    CAST(sum(c) AS BIGINT) AS n
       |  FROM counted GROUP BY 1, 2, 3, 4)
       |SELECT table_name, lhs, rhs,
       |  CAST(count(*) AS BIGINT) AS n_lhs,
       |  CAST(sum(n_rhs) AS BIGINT) AS n_pairs,
       |  sum(n_rhs) = count(*) AS fd_holds,
       |  CAST((sum(n) - sum(keep)) * 10000 // sum(n) AS BIGINT) AS g3_bp
       |FROM per_lhs GROUP BY 1, 2, 3
       |ORDER BY 1, 2, 3""".stripMargin
  }

  // ─── profile_benford: first-digit law screening of money columns ───
  // The classic synthetic-data / fraud smell test: organic magnitudes
  // follow Benford's law (P(d) = log₁₀(1+1/d)); fabricated or
  // uniformly generated ones don't. log is banned — the expected
  // distribution is nine CONSTANTS, so they're inlined in bp
  // (3010, 1761, …, 458) and the deviation is pure integer
  // arithmetic. One map-combining digit count per column (9-row
  // output frames); the verdict column flags |obs−exp| MAD above the
  // conventional 60 bp screening line. TPC-H prices are uniform-ish
  // by construction, so the op EXPECTS a flag here — the spec pins
  // both the constants and the arithmetic, not conformance.
  private val benfordBp = Seq(3010L, 1761L, 1249L, 969L, 792L, 669L, 580L, 512L, 458L)

  def profileBenford(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    val exp = benfordBp.zipWithIndex
      .map { case (bp, i) => (i + 1L, bp) }
      .toDF("digit", "exp_bp")
    def digits(df: DataFrame, cname: String): DataFrame =
      df.filter(col(cname) >= 1)
        .select(lit(cname).as("column_name"),
          expr(s"CAST(substring(CAST(CAST(floor($cname) AS BIGINT) AS STRING), 1, 1) AS BIGINT)")
            .as("digit"))
        .groupBy(col("column_name"), col("digit"))
        .agg(count(lit(1)).as("cnt"))
    val counted = digits(t.orders, "o_totalprice")
      .unionByName(digits(t.lineitem, "l_extendedprice"))
    val colFrame = Window.partitionBy(col("column_name"))
    counted
      .withColumn("n", sum(col("cnt")).over(colFrame))
      .withColumn("obs_bp", expr("cnt * 10000 div n"))
      .join(broadcast(exp), Seq("digit"))
      .withColumn("dev_bp", abs(col("obs_bp") - col("exp_bp")))
      .withColumn("sum_dev", sum(col("dev_bp")).over(colFrame))
      .withColumn("mad_bp", expr("sum_dev div 9"))
      .select(col("column_name"), col("digit"), col("cnt"), col("obs_bp"),
        col("exp_bp"), col("dev_bp"), col("mad_bp"),
        (col("mad_bp") > 60).as("suspicious"))
      .orderBy(col("column_name"), col("digit"))
  }

  val profileBenfordSql: String = {
    val expRows = benfordBp.zipWithIndex
      .map { case (bp, i) => s"(${i + 1}, $bp)" }.mkString(", ")
    def branch(table: String, cname: String) =
      s"""SELECT '$cname' AS column_name,
         |    CAST(substr(CAST(CAST(floor($cname) AS BIGINT) AS VARCHAR), 1, 1)
         |      AS BIGINT) AS digit
         |  FROM $table WHERE $cname >= 1""".stripMargin
    s"""WITH exp(digit, exp_bp) AS (VALUES $expRows),
       |counted AS (
       |  SELECT column_name, digit, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (
       |  ${branch("orders", "o_totalprice")}
       |  UNION ALL ${branch("lineitem", "l_extendedprice")})
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT column_name, digit, cnt,
       |    CAST(cnt * 10000 // sum(cnt) OVER (PARTITION BY column_name)
       |      AS BIGINT) AS obs_bp
       |  FROM counted),
       |dev AS (
       |  SELECT s.column_name, s.digit, s.cnt, s.obs_bp,
       |    CAST(e.digit AS BIGINT) AS exp_digit,
       |    CAST(e.exp_bp AS BIGINT) AS exp_bp,
       |    CAST(abs(s.obs_bp - e.exp_bp) AS BIGINT) AS dev_bp
       |  FROM scored s JOIN exp e ON e.digit = s.digit)
       |SELECT column_name, digit, cnt, obs_bp, exp_bp, dev_bp,
       |  CAST(sum(dev_bp) OVER (PARTITION BY column_name) // 9 AS BIGINT)
       |    AS mad_bp,
       |  CAST(sum(dev_bp) OVER (PARTITION BY column_name) // 9 AS BIGINT) > 60
       |    AS suspicious
       |FROM dev ORDER BY column_name, digit""".stripMargin
  }

  // ─── profile_outliers: exact Tukey-fence outlier counts per column ───
  // The robust companion to profile_histogram: per numeric column,
  // exact q1/q3 order statistics, the 1.5×IQR fences, and how much
  // mass sits outside them — the alarm that fires BEFORE a mean-based
  // metric silently absorbs a tail. Scale discipline: every profiled
  // column here is DOMAIN-BOUNDED in cents (quantity ≤ 50·100,
  // discount/tax ≤ 10s, events.value ≤ ~5·10⁴), so the per-(column,
  // value) count ledger — one map-combining pass per table — is
  // metadata-sized at ANY corpus scale, and BOTH the quantile lookup
  // (first value whose cumulative count reaches ⌈q·n⌉ — tie-order
  // independent by construction) and the outlier tally are computed
  // on the ledger alone: zero per-row windows, zero second scans.
  // Near-unique money columns (o_totalprice) are deliberately out of
  // scope for the value ledger — they ride Ranks.groupedRank's
  // range-bucket path (ts_winsorize). Fences stay integer by the ×2
  // trick: 2·fence = 2·q ∓ 3·IQR, compared against 2·v.
  def profileOutliers(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // One scan per table: the k profiled columns of a table ride a
    // single projection exploded to (column, value) rows — k-column
    // profiling must not cost k corpus scans (plan-guarded).
    val li = t.lineitem.select(explode(array(
      struct(lit("lineitem.l_quantity").as("column_name"),
        cents(col("l_quantity")).as("v")),
      struct(lit("lineitem.l_discount").as("column_name"),
        cents(col("l_discount")).as("v")),
      struct(lit("lineitem.l_tax").as("column_name"),
        cents(col("l_tax")).as("v")))).as("cv"))
      .select(col("cv.column_name").as("column_name"), col("cv.v").as("v"))
    val ev = t.events.select(lit("events.value").as("column_name"),
      cents(col("value")).as("v"))
    val ledger = li.unionByName(ev)
      .groupBy(col("column_name"), col("v")).agg(count(lit(1)).as("cnt"))
    val wBelow = Window.partitionBy(col("column_name")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(col("column_name"))
    // The cut points come back onto the ledger as WINDOW aggregates
    // over the same bounded partition (not a groupBy + re-join, which
    // would fork the lineage and replay the corpus scan once per
    // branch — the plan guard pins one scan per table).
    val l2 = ledger
      .withColumn("below", coalesce(sum(col("cnt")).over(wBelow), lit(0L)))
      .withColumn("n", sum(col("cnt")).over(wTot))
      .withColumn("q1_cents",
        min(when(col("below") < expr("(n + 3) div 4") &&
          col("below") + col("cnt") >= expr("(n + 3) div 4"), col("v")))
          .over(wTot))
      .withColumn("q3_cents",
        min(when(col("below") < expr("(3 * n + 3) div 4") &&
          col("below") + col("cnt") >= expr("(3 * n + 3) div 4"), col("v")))
          .over(wTot))
      .withColumn("iqr_cents", col("q3_cents") - col("q1_cents"))
    l2.groupBy(col("column_name"))
      .agg(max(col("n")).as("n"),
        max(col("q1_cents")).as("q1_cents"),
        max(col("q3_cents")).as("q3_cents"),
        max(col("iqr_cents")).as("iqr_cents"),
        sum(when(col("v") * 2 < col("q1_cents") * 2 - col("iqr_cents") * 3,
          col("cnt")).otherwise(0L)).as("n_low"),
        sum(when(col("v") * 2 > col("q3_cents") * 2 + col("iqr_cents") * 3,
          col("cnt")).otherwise(0L)).as("n_high"))
      .withColumn("out_bp",
        expr("(n_low + n_high) * 10000 div n"))
      .orderBy(col("column_name"))
  }

  val profileOutliersSql: String = {
    def branch(table: String, c: String) =
      s"""SELECT '$table.$c' AS column_name,
         |      CAST(floor($c * 100 + 0.5) AS BIGINT) AS v FROM $table"""
        .stripMargin
    s"""WITH vals AS (
       |  ${branch("lineitem", "l_quantity")}
       |  UNION ALL ${branch("lineitem", "l_discount")}
       |  UNION ALL ${branch("lineitem", "l_tax")}
       |  UNION ALL ${branch("events", "value")}),
       |ledger AS (
       |  SELECT column_name, v, CAST(count(*) AS BIGINT) AS cnt
       |  FROM vals GROUP BY 1, 2),
       |l2 AS (
       |  SELECT column_name, v, cnt,
       |    CAST(coalesce(sum(cnt) OVER (PARTITION BY column_name ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS below,
       |    CAST(sum(cnt) OVER (PARTITION BY column_name) AS BIGINT) AS n
       |  FROM ledger),
       |cuts AS (
       |  SELECT column_name, max(n) AS n,
       |    min(CASE WHEN below < (n + 3) // 4
       |      AND below + cnt >= (n + 3) // 4 THEN v END) AS q1_cents,
       |    min(CASE WHEN below < (3 * n + 3) // 4
       |      AND below + cnt >= (3 * n + 3) // 4 THEN v END) AS q3_cents
       |  FROM l2 GROUP BY column_name)
       |SELECT l.column_name, max(l.n) AS n, max(c.q1_cents) AS q1_cents,
       |  max(c.q3_cents) AS q3_cents,
       |  max(c.q3_cents - c.q1_cents) AS iqr_cents,
       |  CAST(sum(CASE WHEN l.v * 2 <
       |      c.q1_cents * 2 - (c.q3_cents - c.q1_cents) * 3
       |    THEN l.cnt ELSE 0 END) AS BIGINT) AS n_low,
       |  CAST(sum(CASE WHEN l.v * 2 >
       |      c.q3_cents * 2 + (c.q3_cents - c.q1_cents) * 3
       |    THEN l.cnt ELSE 0 END) AS BIGINT) AS n_high,
       |  (CAST(sum(CASE WHEN l.v * 2 <
       |      c.q1_cents * 2 - (c.q3_cents - c.q1_cents) * 3
       |    THEN l.cnt ELSE 0 END) AS BIGINT)
       |   + CAST(sum(CASE WHEN l.v * 2 >
       |      c.q3_cents * 2 + (c.q3_cents - c.q1_cents) * 3
       |    THEN l.cnt ELSE 0 END) AS BIGINT)) * 10000 // max(l.n) AS out_bp
       |FROM l2 l JOIN cuts c USING (column_name)
       |GROUP BY l.column_name
       |ORDER BY l.column_name""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "profile_outliers" -> profileOutliers,
    "layout_partition" -> layoutPartition,
    "profile_unique_keys" -> profileUniqueKeys,
    "profile_benford" -> profileBenford,
    "profile_fd" -> profileFd,
    "sketch_ams" -> sketchAms,
    "profile_histogram" -> profileHistogram,
    "profile_freq" -> profileFreq,
    "profile_entropy" -> profileEntropy,
    "profile_drift" -> profileDrift,
    "profile_corr" -> profileCorr,
    "layout_compact" -> layoutCompact,
    "sketch_cms" -> sketchCms,
    "sketch_hll" -> sketchHll,
    "sketch_kmv" -> sketchKmv,
    "sketch_kmv_audit" -> sketchKmvAudit,
    "sketch_quantile" -> sketchQuantile,
    "layout_prune" -> layoutPrune,
    "layout_advisor" -> layoutAdvisor,
    "filter_bloom" -> filterBloom,
    "filter_bloom_curve" -> filterBloomCurve,
    "shard_skew" -> shardSkew,
    "shard_rebalance" -> shardRebalance,
    "profile_table" -> profileTable,
    "q24_range_join" -> q24RangeJoin,
    "q25_skew_salt" -> q25SkewSalt,
    "sketch_stats" -> sketchStats,
    "layout_zorder" -> layoutZorder)

  val oracle: Map[String, String] = Map(
    "sketch_stats" -> sketchStatsSql,
    "profile_outliers" -> profileOutliersSql,
    "layout_partition" -> layoutPartitionSql,
    "profile_unique_keys" -> profileUniqueKeysSql,
    "profile_benford" -> profileBenfordSql,
    "profile_fd" -> profileFdSql,
    "sketch_ams" -> sketchAmsSql,
    "profile_histogram" -> profileHistogramSql,
    "profile_freq" -> profileFreqSql,
    "profile_entropy" -> profileEntropySql,
    "profile_drift" -> profileDriftSql,
    "profile_corr" -> profileCorrSql,
    "layout_compact" -> layoutCompactSql,
    "sketch_cms" -> sketchCmsSql,
    "sketch_hll" -> sketchHllSql,
    "sketch_kmv" -> sketchKmvSql,
    "sketch_kmv_audit" -> sketchKmvAuditSql,
    "sketch_quantile" -> sketchQuantileSql,
    "layout_prune" -> layoutPruneSql,
    "layout_advisor" -> layoutAdvisorSql,
    "filter_bloom" -> filterBloomSql,
    "filter_bloom_curve" -> filterBloomCurveSql,
    "shard_skew" -> shardSkewSql,
    "shard_rebalance" -> shardRebalanceSql,
    "profile_table" -> profileTableSql,
    "q24_range_join" -> q24Sql,
    "q25_skew_salt" -> q25Sql,
    "layout_zorder" -> layoutZorderSql)
}
