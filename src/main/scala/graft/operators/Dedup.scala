package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table: exact hash
  * dedup, MinHash+LSH banding, SimHash fingerprints, inverted-index
  * n-gram Jaccard verification, and embedding-cosine near-dup pairs.
  *
  * Scale posture (SURVEY §5): nothing here is O(n²) except the
  * embedding-cosine baseline. Candidate generation is always a
  * bucket-equijoin (LSH band hash, SimHash chunk, shared shingle), so
  * the shuffle keys on the bucket and candidate volume tracks true
  * duplicate density, not the pair count. The shared-shingle join caps
  * document frequency to bound skew on stop-shingles (the classic
  * prefix-filtering/df-cap trick). Everything is whole-stage-codegen
  * array expressions — no UDFs.
  */
object Dedup {

  // ─── shared: whitespace tokens, distinct word-3-shingles ───
  private def toks(c: Column): Column = filter(split(c, " "), w => w =!= "")

  /** Distinct 3-word shingles; empty when fewer than 3 tokens (guards
    * sequence()'s descending-range behavior on negative spans). */
  private def shingles(t: Column): Column =
    when(size(t) >= 3,
      array_distinct(transform(sequence(lit(0), size(t) - 3),
        i => concat_ws(" ",
          element_at(t, i + 1), element_at(t, i + 2), element_at(t, i + 3)))))
      .otherwise(array().cast("array<string>"))

  private def docShingles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), shingles(toks(col("text"))).as("sh"))
      .withColumn("n_sh", size(col("sh")))

  /** DuckDB twin of docShingles (list comprehension over 1-based w). */
  private val docShinglesSql: String =
    """shdocs AS (
      |  SELECT doc_id,
      |    list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
      |                   for i in range(1, len(w) - 1)]) AS sh
      |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS w
      |        FROM documents))""".stripMargin

  // ─── dedup_exact: normalized-text hash groupBy, keep min doc_id ───
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .withColumn("text_md5",
        md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))))
      .groupBy(col("text_md5"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("keep_doc_id"))

  val dedupExactSql: String =
    """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS text_md5,
      |  min(doc_id) AS keep_doc_id, count(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY keep_doc_id""".stripMargin

  // ─── dedup_ngram_jaccard: inverted-index join + exact Jaccard ───
  // Candidate pairs via shared-shingle equijoin (shuffle on shingle),
  // df-capped at 100 docs/shingle to bound hot-key skew; exact Jaccard
  // from shared count + per-doc shingle totals. Note: `shared` counts
  // df-filtered shingles while the denominator uses the full per-doc
  // totals — the standard conservative estimate under df-capping.
  private val dfCap = 100
  private val minShared = 3

  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val ex = docShingles(spark, dir)
      .select(col("doc_id"), col("n_sh"), explode(col("sh")).as("shingle"))
    val keep = ex.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap)
    val f = ex.join(keep.select("shingle"), Seq("shingle"))
    val a = f.select(col("shingle"), col("doc_id").as("doc_a"), col("n_sh").as("n_a"))
    val b = f.select(col("shingle"), col("doc_id").as("doc_b"), col("n_sh").as("n_b"))
    a.join(b, Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .withColumn("jaccard_bp",
        floor(col("shared") * 10000.0 / (col("n_a") + col("n_b") - col("shared")) + 0.5)
          .cast("long"))
      .select(col("doc_a"), col("doc_b"), col("shared"), col("jaccard_bp"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val dedupNgramJaccardSql: String =
    s"""WITH $docShinglesSql,
       |d AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM shdocs),
       |keep AS (SELECT shingle FROM d GROUP BY shingle HAVING count(*) <= $dfCap),
       |f AS (SELECT d.* FROM d JOIN keep USING (shingle)),
       |p AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    a.n_sh AS n_a, b.n_sh AS n_b, count(*) AS shared
       |  FROM f a JOIN f b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4 HAVING count(*) >= $minShared)
       |SELECT doc_a, doc_b, shared,
       |  CAST(floor(shared * 10000.0 / (n_a + n_b - shared) + 0.5) AS BIGINT) AS jaccard_bp
       |FROM p ORDER BY doc_a, doc_b""".stripMargin

  // ─── dedup_minhash_lsh: 64-perm MinHash, 16 bands × 4 rows ───
  // Permutation j's hash of shingle s is xxhash64(s, j); the signature
  // is the per-permutation min over the doc's shingles. Band hashes
  // bucket the signature 4 rows at a time; candidates are pairs
  // sharing ≥1 band bucket (equijoin on (band, hash) — never a cross
  // join). est_bp is the signature-agreement estimate of Jaccard.
  // Driver oracle: rows-only (xxhash64 has no DuckDB twin).
  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sigs = docShingles(spark, dir)
      .filter(size(col("sh")) > 0)
      .withColumn("sig", transform(sequence(lit(0), lit(63)),
        j => array_min(transform(col("sh"), s => xxhash64(s, j)))))
    val banded = sigs.select(col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(15)), b =>
        xxhash64(
          element_at(col("sig"), b * 4 + 1), element_at(col("sig"), b * 4 + 2),
          element_at(col("sig"), b * 4 + 3), element_at(col("sig"), b * 4 + 4))))
        .as(Seq("band", "bh")))
    val l = banded.select(col("band"), col("bh"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("bh"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    l.join(r, Seq("band", "bh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_bands"),
        first(col("sig_a")).as("sig_a"), first(col("sig_b")).as("sig_b"))
      .withColumn("est_bp",
        floor(aggregate(
          zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), (s, x) => s + x) * 10000.0 / 64 + 0.5).cast("long"))
      .select(col("doc_a"), col("doc_b"), col("n_bands"), col("est_bp"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ─── dedup_simhash: 64-bit SimHash + 4×16-bit chunk blocking ───
  // Per-bit vote over shingle hashes → 64-bit fingerprint; candidates
  // share an exact 16-bit chunk (pigeonhole: catches all pairs with
  // hamming ≤ 3 and most below the cutoff); verified by bit_count of
  // the XOR. Driver oracle: rows-only.
  private val hammingMax = 16

  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val fps = docShingles(spark, dir)
      .filter(size(col("sh")) > 0)
      .withColumn("votes", expr(
        """aggregate(transform(sh, s -> xxhash64(s)),
          |  array_repeat(0L, 64),
          |  (acc, h) -> zip_with(acc, sequence(0, 63),
          |    (a, i) -> a + CASE WHEN ((h >> i) & 1) = 1 THEN 1 ELSE -1 END))"""
          .stripMargin))
      .withColumn("fp", expr(
        """aggregate(zip_with(votes, sequence(0, 63),
          |  (c, i) -> CASE WHEN c > 0 THEN shiftleft(1L, i) ELSE 0L END),
          |  0L, (acc, x) -> acc + x)""".stripMargin))
    val chunked = fps.select(col("doc_id"), col("fp"),
      posexplode(expr(
        "transform(sequence(0, 3), c -> (fp >> (c * 16)) & 65535)"))
        .as(Seq("chunk", "cv")))
    val l = chunked.select(col("chunk"), col("cv"),
      col("doc_id").as("doc_a"), col("fp").as("fp_a"))
    val r = chunked.select(col("chunk"), col("cv"),
      col("doc_id").as("doc_b"), col("fp").as("fp_b"))
    l.join(r, Seq("chunk", "cv"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(fp_a ^ fp_b)").cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= hammingMax)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ─── dedup_embedding: cosine near-dup pairs (threshold 0.4) ───
  // The exact-pairs correctness baseline: broadcast nested-loop over
  // the small side with a doc_a < doc_b guard. At 100 TB the same
  // verification runs only on LSH-bucketed candidates (ann_lsh's
  // hyperplane blocking) — this query IS the verify stage semantics.
  private val cosThreshold = 0.4

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)

  private def vecs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))

  /** DuckDB twin: double-cast elements, left-fold in index order so the
    * summation order matches Spark's aggregate() exactly. */
  private def vecsSql(idCol: String): String =
    s"""SELECT $idCol, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
       |  sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |    list_transform(embedding, x -> CAST(x AS DOUBLE) * x)), (s, x) -> s + x)) AS norm
       |FROM embeddings""".stripMargin

  private val dotSql: String =
    """list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |    list_transform(list_zip(a.v, b.v), z -> CAST(z[1] AS DOUBLE) * z[2])),
      |    (s, x) -> s + x)""".stripMargin

  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val a = vecs(spark, dir)
      .select(col("vec_id").as("vec_a"), col("v").as("va"), col("norm").as("na"))
    val b = vecs(spark, dir)
      .select(col("vec_id").as("vec_b"), col("v").as("vb"), col("norm").as("nb"))
    a.join(broadcast(b), col("vec_a") < col("vec_b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= cosThreshold)
      .select(col("vec_a"), col("vec_b"),
        floor(col("cos") * 10000 + 0.5).cast("long").as("cos_bp"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  val dedupEmbeddingSql: String =
    s"""WITH n AS (${vecsSql("vec_id")})
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  CAST(floor(($dotSql) / (a.norm * b.norm) * 10000 + 0.5) AS BIGINT) AS cos_bp
       |FROM n a JOIN n b ON a.vec_id < b.vec_id
       |WHERE ($dotSql) / (a.norm * b.norm) >= $cosThreshold
       |ORDER BY vec_a, vec_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> dedupExact,
    "dedup_ngram_jaccard" -> dedupNgramJaccard,
    "dedup_minhash_lsh" -> dedupMinhashLsh,
    "dedup_simhash" -> dedupSimhash,
    "dedup_embedding" -> dedupEmbedding)

  /** minhash/simhash are rows-only (xxhash64 has no DuckDB twin). */
  val oracle: Map[String, String] = Map(
    "dedup_exact" -> dedupExactSql,
    "dedup_ngram_jaccard" -> dedupNgramJaccardSql,
    "dedup_embedding" -> dedupEmbeddingSql)
}
