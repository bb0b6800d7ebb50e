package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  // internals differ across engines, so there is no DuckDB hash oracle
  // — the driver records rows-only; SketchSpec bounds the error vs the
  // exact answers instead (HLL++ rsd 5% → assert within 15%;
  // percentile within the group's observed [min, max]).
  def sketchStats(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), 0.05).as("approx_users"),
        cents(percentile_approx(col("value"), lit(0.5), lit(1000)))
          .as("p50_cents"),
        cents(percentile_approx(col("value"), lit(0.95), lit(1000)))
          .as("p95_cents"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

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
    val ev = Tables(spark, dir).events.select(col("user_id"))
    def cells(base: DataFrame, keep: Seq[Column]): DataFrame =
      base.select(keep :+ explode(array((1 to cmsDepth).map(j =>
        struct(lit(j).as("j"), cmsPos(j, col("user_id")).as("pos"))): _*)).as("jp"): _*)
        .select(keep :+ col("jp.j").as("j") :+ col("jp.pos").as("pos"): _*)
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_cms" -> sketchCms,
    "filter_bloom" -> filterBloom,
    "shard_skew" -> shardSkew,
    "profile_table" -> profileTable,
    "q24_range_join" -> q24RangeJoin,
    "q25_skew_salt" -> q25SkewSalt,
    "sketch_stats" -> sketchStats,
    "layout_zorder" -> layoutZorder)

  /** sketch_stats is deliberately absent: approximate sketches are not
    * cross-engine reproducible (driver does the rows-only check). */
  val oracle: Map[String, String] = Map(
    "sketch_cms" -> sketchCmsSql,
    "filter_bloom" -> filterBloomSql,
    "shard_skew" -> shardSkewSql,
    "profile_table" -> profileTableSql,
    "q24_range_join" -> q24Sql,
    "q25_skew_salt" -> q25Sql,
    "layout_zorder" -> layoutZorderSql)
}
