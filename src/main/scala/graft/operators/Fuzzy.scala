package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) string matching — the entity-resolution
  * primitive. (The wildcard/deletion neighborhood blocking is the
  * classic partition-based edit-distance filter — cf. Li et al.,
  * "PassJoin: A Partition-based Method for Similarity Joins",
  * VLDB 2012, and the FastSS deletion-neighborhood technique.) A naive similarity join is a cross join with a
  * levenshtein() predicate: O(n²) compares and a nested-loop plan,
  * fatal at scale. For threshold t=1 the neighborhood-blocking
  * transform makes it an EQUIJOIN: two strings are within edit
  * distance 1 iff they are equal, differ by one substitution, or one
  * is a single-char deletion of the other. So every string generates
  * len(s) wildcard patterns (position i replaced by '*' — equal-length
  * substitution pairs collide on a pattern) and len(s) deletion
  * strings (indel pairs: the longer side's deletion equals the shorter
  * side verbatim). Candidates come from pattern-key equijoins —
  * shuffle on the pattern hash, block sizes bounded by true neighbor
  * density — then a levenshtein() verify keeps the semantics exact.
  * Linear blow-up (~len(s) rows per string), no cross join; the
  * classic spell-checker / record-linkage shape.
  */
object Fuzzy {

  /** Customers whose names are within edit distance 1 — on TPC-H-ish
    * "Customer#%09d" names these are the single-digit-typo pairs. */
  def fuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    // Small testdata arrives as one parquet split, which would run
    // the (interpreted, HOF) pattern generation on a single core —
    // explicit AQE-pinned repartition fans it out (docShingles has
    // the full rationale).
    val names = Tables(spark, dir).customer.select(col("c_custkey"), col("c_name"))
    val c = names
      .repartition(spark.sparkContext.defaultParallelism, col("c_custkey"))
    // One row per (string, position): the wildcard pattern. KEYS ONLY
    // through the blocking joins (the ann_lsh payload discipline —
    // round 16: carrying both full names through the pattern self-join
    // tripled the sort/shuffle payload and OOM'd the 16g bench heap at
    // sf10); names re-join by key onto the bounded pair set below.
    val wild = c.select(col("c_custkey"),
      posexplode(expr(
        """transform(sequence(1, length(c_name)),
          |  i -> concat(substring(c_name, 1, i - 1), '*', substring(c_name, i + 1)))"""
          .stripMargin)).as(Seq("pos", "pat")))
    val subPairs = wild.as("a").join(wild.as("b"),
        col("a.pos") === col("b.pos") && col("a.pat") === col("b.pat") &&
          col("a.c_custkey") < col("b.c_custkey"))
      .select(col("a.c_custkey").as("cust_a"), col("b.c_custkey").as("cust_b"))
    // Deletion neighborhood: a's deletion-at-i equals b's full name.
    val del = c.select(col("c_custkey"),
      explode(expr(
        """transform(sequence(1, length(c_name)),
          |  i -> concat(substring(c_name, 1, i - 1), substring(c_name, i + 1)))"""
          .stripMargin)).as("d"))
    // hint("merge"): the name side is CORPUS-scale — the column-pruned
    // static size estimate sits under the broadcast threshold and a
    // broadcast of every customer name can never survive growth.
    val delPairs = del.as("a").join(c.as("b").hint("merge"),
        col("a.d") === col("b.c_name") && col("a.c_custkey") =!= col("b.c_custkey"))
      .select(
        least(col("a.c_custkey"), col("b.c_custkey")).as("cust_a"),
        greatest(col("a.c_custkey"), col("b.c_custkey")).as("cust_b"))
    // Both name re-joins are pinned to sort-merge: the pair set is
    // corpus-density-scaled (sequential "Customer#%09d" keys have up
    // to 81 digit-typo neighbors each — ~60M pairs at sf10) and
    // Catalyst's post-distinct size estimate is unreliable enough that
    // AQE tried to BROADCAST it, which can never survive growth; a
    // shuffle join is the only shape that scales on both sides.
    subPairs.union(delPairs).distinct()
      .join(names.select(col("c_custkey").as("cust_a"),
        col("c_name").as("name_a")).hint("merge"), Seq("cust_a"))
      .join(names.select(col("c_custkey").as("cust_b"),
        col("c_name").as("name_b")).hint("merge"), Seq("cust_b"))
      // Verify: blocking is complete for t=1 by construction, but the
      // explicit check keeps semantics independent of the blocking.
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= 1)
      .select(col("cust_a"), col("cust_b"), col("dist"))
      .orderBy(col("cust_a"), col("cust_b"))
  }

  /** Oracle: the SAME wildcard/deletion blocking replayed in DuckDB
    * (round-17 — the old all-pairs levenshtein oracle was ~4 h at sf1
    * and forced a documented crosscheck SKIP; the blocked twin runs in
    * ~15 s and returns the identical verified pair set, because ANY
    * complete t≤1 blocking followed by the levenshtein verify yields
    * the same result — checked equal to the quadratic oracle at
    * sf0.01). chr(1) as the wildcard marker cannot collide with name
    * text; a false candidate would be filtered by the verify anyway. */
  val fuzzyJoinSql: String =
    """WITH c AS MATERIALIZED (SELECT c_custkey, c_name FROM customer),
      |wild AS MATERIALIZED (
      |  SELECT c_custkey, unnest(list_transform(range(1, length(c_name) + 1),
      |    i -> substr(c_name, 1, CAST(i - 1 AS INT)) || chr(1) ||
      |         substr(c_name, CAST(i + 1 AS INT)))) AS pat
      |  FROM c),
      |del AS MATERIALIZED (
      |  SELECT c_custkey, unnest(list_transform(range(1, length(c_name) + 1),
      |    i -> substr(c_name, 1, CAST(i - 1 AS INT)) ||
      |         substr(c_name, CAST(i + 1 AS INT)))) AS d
      |  FROM c),
      |pairs AS MATERIALIZED (
      |  SELECT DISTINCT cust_a, cust_b FROM (
      |    SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b
      |    FROM wild a JOIN wild b ON a.pat = b.pat AND a.c_custkey < b.c_custkey
      |    UNION ALL
      |    SELECT least(a.c_custkey, b.c_custkey), greatest(a.c_custkey, b.c_custkey)
      |    FROM del a JOIN c b ON a.d = b.c_name AND a.c_custkey <> b.c_custkey))
      |SELECT p.cust_a, p.cust_b,
      |  CAST(levenshtein(x.c_name, y.c_name) AS BIGINT) AS dist
      |FROM pairs p JOIN c x ON p.cust_a = x.c_custkey
      |  JOIN c y ON p.cust_b = y.c_custkey
      |WHERE levenshtein(x.c_name, y.c_name) <= 1
      |ORDER BY cust_a, cust_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fuzzy_join" -> fuzzyJoin)

  val oracle: Map[String, String] = Map(
    "fuzzy_join" -> fuzzyJoinSql)
}
