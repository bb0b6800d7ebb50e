package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable exact ranking: global (or per-group) row numbers and
  * ntile assignment WITHOUT a single-partition WindowExec.
  *
  * A window with an empty partition spec moves every row through one
  * task — the one plan shape that cannot survive a 100 TB input no
  * matter how fast the operator body is. The alternative used here is
  * the same two-level carry decomposition as `Events.evConcurrency`
  * (per-day carry + within-day cumsum), generalized:
  *
  *   rank(row) = (# rows of the group in earlier BUCKETS)
  *             + row_number within the row's bucket
  *
  * where `bucket` is a coarse, monotone quantization of the sort
  * order (e.g. the exact low-cardinality key, or `key >> shift` for
  * high-cardinality keys). Only the per-bucket COUNT LEDGER — bounded
  * by bucket cardinality, never by row count — crosses partitions
  * unpartitioned; the data itself takes exactly one hash shuffle on
  * the bucket key, with per-task input bounded by bucket width.
  */
object Ranks {

  /** Exact integer division on non-negative long columns (Column `/`
    * is IEEE double division; `(a - a mod b) / b` is exact in double
    * whenever the quotient fits 2^53, which ranks always do). */
  def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** Attach `rankName` — the exact 1-based rank of each row within its
    * `grp` group under the total order `sort` — and `totalName`, the
    * group's row count. `grp` may be empty for a global rank.
    *
    * `bucket` must be
    *  (i) a pure per-row function (both the ledger branch and the data
    *      branch recompute it; purity is what makes the two agree —
    *      the reason this does NOT use repartitionByRange, whose
    *      sampled boundaries can differ between plan branches),
    * (ii) monotone: for rows a, b in one group, sort(a) < sort(b) ⇒
    *      bucket(a) ≤ bucket(b) lexicographically (use the exact key,
    *      or `shiftright(key, s)` on the LEADING sort key only; a
    *      shifted tiebreak is only monotone after an exact key), and
    * (iii) bounded: grp × bucket cardinality is ledger size — keep it
    *      broadcast-sized by tuning the shift.
    */
  def groupedRank(df: DataFrame, grp: Seq[String], bucket: Seq[Column],
      sort: Seq[Column], rankName: String, totalName: String): DataFrame = {
    val bNames = bucket.indices.map(i => s"__rk_b$i")
    val withB = bucket.zip(bNames).foldLeft(df) {
      case (d, (c, n)) => d.withColumn(n, c)
    }
    val keyNames = grp ++ bNames
    val gCols = grp.map(col)
    // The ledger: per-(grp, bucket) counts, the running count of
    // earlier buckets, and the group total. The two windows run over
    // the LEDGER frame only (bounded by design), partitioned by grp.
    val wBelow = Window.partitionBy(gCols: _*).orderBy(bNames.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTotal = Window.partitionBy(gCols: _*)
    val ledger = withB
      .groupBy(keyNames.map(col): _*)
      .agg(count(lit(1)).as("__rk_cnt"))
      .withColumn("__rk_below",
        coalesce(sum(col("__rk_cnt")).over(wBelow), lit(0L)))
      .withColumn(totalName, sum(col("__rk_cnt")).over(wTotal))
      .drop("__rk_cnt")
    // Data path: one broadcast join on the bucket key, one hash
    // shuffle for the within-bucket row_number — never a global sort.
    val wIn = Window.partitionBy(keyNames.map(col): _*).orderBy(sort: _*)
    withB.join(broadcast(ledger), keyNames)
      .withColumn(rankName,
        (col("__rk_below") + row_number().over(wIn)).cast("long"))
      .drop("__rk_below" +: bNames: _*)
  }

  /** SQL-standard ntile(n) from an exact 1-based rank and total:
    * the first `total mod n` buckets take `total div n + 1` rows, the
    * rest `total div n` — the same remainder-to-early-buckets rule
    * Spark and DuckDB implement, so results hash-match an ntile
    * window over the identical total order. All-integer arithmetic. */
  def ntileFromRank(rank: Column, total: Column, n: Int): Column = {
    val nL = lit(n.toLong)
    val q = idiv(total, nL)
    val rem = pmod(total, nL)
    val fat = (q + lit(1L)) * rem // rows covered by the (q+1)-sized buckets
    when(rank <= fat, idiv(rank - lit(1L), q + lit(1L)) + lit(1L))
      .otherwise(rem + idiv(rank - fat - lit(1L), greatest(q, lit(1L))) + lit(1L))
      .cast("long")
  }
}
