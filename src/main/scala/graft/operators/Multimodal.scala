package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Media blob row as it would arrive from a multimodal lakehouse table:
  * an opaque binary payload plus typed metadata columns. */
final case class MediaBlob(doc_id: Long, source: String, payload: Array[Byte])

/** Typed output of the (stubbed) decoder. */
final case class MediaMeta(doc_id: Long, byte_len: Long, magic_hex: String,
  fp60: Long, width: Int, height: Int, channels: Int)

/** Multimodal-column plumbing: image/audio/video payloads modeled as
  * opaque `binary` columns with typed metadata, decoded in batches.
  *
  * The actual codec is STUBBED (no image/audio libraries in this
  * container): `decodeStub` derives deterministic fake dimensions from
  * an md5 fingerprint of the bytes. Everything around the stub is the real
  * large-scale shape: a typed `Dataset[MediaBlob]`, per-partition
  * batched iteration (the JVM twin of `mapInPandas` batch semantics —
  * swap `decodeStub` for a JNI/ONNX call and the plumbing holds), and
  * pure-column chunk sampling that never materializes the whole blob
  * set on any single node.
  *
  * The binary payloads are derived from `documents.text` (UTF-8 bytes)
  * so runs are deterministic against the shared testdata.
  */
object Multimodal {

  private val decodeBatchSize = 32

  /** Stub decoder: one batch of blobs → metadata. Deterministic: a
    * 60-bit md5 fingerprint of the payload seeds the fake
    * width/height (md5 so the DuckDB oracle replays it byte-exactly).
    * A real deployment replaces the body (and only the body) with the
    * codec call. */
  private def decodeStub(batch: Seq[MediaBlob]): Seq[MediaMeta] =
    batch.map { b =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(b.payload).map(x => f"$x%02x").mkString
      val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      val magic = b.payload.take(4).map(x => f"$x%02x").mkString
      MediaMeta(b.doc_id, b.payload.length.toLong, magic, h,
        width = (h % 1920).toInt + 1, height = ((h >> 11) % 1080).toInt + 1,
        channels = 3)
    }

  private def blobs(spark: SparkSession, dir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    // Layout-aware: every mm_* consumer does per-blob CPU work (hash,
    // chunk, decode), so a single-row-group store must not pin the
    // family to one scan task (Tables.parallelized is a no-op on a
    // healthy many-group layout).
    Tables(spark, dir).parallelized("documents", "doc_id")
      .select(col("doc_id"), col("source"),
        col("text").cast("binary").as("payload"))
      .as[MediaBlob]
  }

  // ─── mm_decode_meta: batched stub decode over typed partitions ───
  def mmDecodeMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    blobs(spark, dir) // layout-aware repartition lives in blobs now
      .mapPartitions(_.grouped(decodeBatchSize).flatMap(decodeStub))
      .toDF()
      .orderBy(col("doc_id"))
  }

  // ─── mm_frame_sample: every-4th fixed-size chunk, pure columns ───
  // Deterministic frame/chunk sampling: 64-byte chunks, stride 4.
  // Stays inside whole-stage codegen (sequence + substring on binary),
  // so at 100 TB it samples at scan speed with no decode round-trip.
  private val chunkBytes = 64
  private val stride = 4

  def mmFrameSample(spark: SparkSession, dir: String): DataFrame =
    blobs(spark, dir).toDF()
      .select(col("doc_id"),
        // Guard empty payloads: sequence(0, -1, 4) is an illegal Spark
        // sequence; empty blobs sample zero chunks instead of crashing.
        posexplode(expr(
          s"""CASE WHEN octet_length(payload) > 0 THEN transform(
             |  sequence(0, int(ceil(octet_length(payload) / $chunkBytes.0)) - 1, $stride),
             |  i -> substring(payload, i * $chunkBytes + 1, $chunkBytes))
             |ELSE array() END""".stripMargin))
          .as(Seq("sample_idx", "chunk")))
      .select(col("doc_id"), col("sample_idx").cast("long").as("sample_idx"),
        octet_length(col("chunk")).cast("long").as("chunk_len"),
        md5(col("chunk")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("sample_idx"))

  // ─── mm_dedup: exact binary-content dedup across re-uploads ───
  // Image/audio stores accumulate byte-identical re-uploads under new
  // ids; dedup keys on (md5, byte_len) — the length guard makes an
  // md5 collision also need a length collision. ONE shuffle on the
  // content key with map-side combine; at 100 TB the md5 is computed
  // at scan time per blob, never materializing two copies anywhere.
  // The testdata has no byte-identical payloads, so the fixture
  // re-uploads every 97th blob under a shifted id (deterministic in
  // both engines); groups of 2 must surface, canonical = min id.
  private val reuploadMod = 97
  private val reuploadShift = 1000000L

  def mmDedup(spark: SparkSession, dir: String): DataFrame = {
    val b = blobs(spark, dir).toDF()
    val reuploads = b.filter(col("doc_id") % reuploadMod === 0)
      .select((col("doc_id") + reuploadShift).as("doc_id"), col("payload"))
    b.select(col("doc_id"), col("payload")).unionByName(reuploads)
      .groupBy(md5(col("payload")).as("content_md5"),
        octet_length(col("payload")).cast("long").as("byte_len"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("canonical_id"))
  }

  /** Varchar twin (ASCII fixture — see oracle note above). */
  val mmDedupSql: String =
    s"""WITH all_blobs AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + $reuploadShift, text FROM documents
       |  WHERE doc_id % $reuploadMod = 0)
       |SELECT md5(text) AS content_md5,
       |  CAST(length(text) AS BIGINT) AS byte_len,
       |  min(doc_id) AS canonical_id, count(*) AS n_copies
       |FROM all_blobs GROUP BY 1, 2 ORDER BY canonical_id""".stripMargin

  // ─── mm_near_dup: chunk-fingerprint near-dup over media payloads ───
  // Exact dedup (mm_dedup) misses re-encodes that share most but not
  // all bytes — trims, appended metadata, partial re-uploads. The
  // storage-side answer is chunk fingerprinting (the rsync/CAS/
  // data-domain technique): split each payload into fixed 64-byte
  // chunks, hash each, and score pairs by shared-fingerprint count
  // over an inverted index — the binary-domain twin of
  // dedup_ngram_jaccard, with the same df-capped equijoin (never a
  // cross join) and containment-style overlap on the smaller payload.
  // Chunking/hashes run on the varchar twin of the payload (fixture
  // is pure ASCII — see oracle note above) so the oracle replays
  // byte-exactly.
  private val ndChunk = 64
  private val ndDfCap = 100

  def mmNearDup(spark: SparkSession, dir: String): DataFrame = {
    val ex = Tables(spark, dir).documents
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"),
        expr(s"cast(ceil(length(text) / $ndChunk.0) as bigint)").as("n_ch"),
        explode_outer(expr(
          s"""case when length(text) > 0 then
             |  transform(sequence(0, cast(ceil(length(text) / $ndChunk.0) as int) - 1),
             |    i -> md5(substring(text, i * $ndChunk + 1, $ndChunk)))
             |else cast(array() as array<string>) end""".stripMargin)).as("h"))
      .filter(col("h").isNotNull)
    val keep = ex.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= ndDfCap)
    val f = ex.join(keep.select("h"), Seq("h"))
    f.as("a").join(f.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n_ch").as("n_a"), col("b.n_ch").as("n_b"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("overlap_bp", expr("shared * 10000 div least(n_a, n_b)"))
      .select(col("doc_a"), col("doc_b"), col("shared"),
        col("n_a"), col("n_b"), col("overlap_bp"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val mmNearDupSql: String =
    s"""WITH c AS (
       |  SELECT doc_id, CAST(ceil(len(text) / $ndChunk.0) AS BIGINT) AS n_ch,
       |    md5(substring(text, CAST(i * $ndChunk + 1 AS INT), $ndChunk)) AS h
       |  FROM (SELECT doc_id, text,
       |          unnest(range(0, CAST(ceil(len(text) / $ndChunk.0) AS BIGINT))) AS i
       |        FROM documents)
       |), keep AS (SELECT h FROM c GROUP BY h HAVING count(*) <= $ndDfCap),
       |f AS (SELECT c.* FROM c JOIN keep USING (h)),
       |p AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    a.n_ch AS n_a, b.n_ch AS n_b, count(*) AS shared
       |  FROM f a JOIN f b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4)
       |SELECT doc_a, doc_b, shared, n_a, n_b,
       |  shared * 10000 // least(n_a, n_b) AS overlap_bp
       |FROM p ORDER BY doc_a, doc_b""".stripMargin

  // ─── mm_manifest: random-access shard manifest (byte offsets) ───
  // The packing index a multimodal loader needs for range reads:
  // blobs hash-sharded (md5 — placement is a pure function of the
  // id, the same discipline as Pipeline.splitHash), ordered within
  // the shard, each row carrying the byte offset where its payload
  // starts = cumulative length of its predecessors. One shuffle on
  // the shard key; the offset is a per-shard linear window scan.
  // Writing the blobs in this order then serving [offset,
  // offset+len) is exactly the tar/WebDataset layout.
  private val nShards = 8

  def mmManifest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shard = (conv(substring(md5(concat(lit("shard:"),
      col("doc_id").cast("string"))), 1, 15), 16, 10)
      .cast("long") % nShards).as("shard")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    blobs(spark, dir).toDF()
      .select(col("doc_id"), shard,
        octet_length(col("payload")).cast("long").as("byte_len"))
      .withColumn("offset", coalesce(sum(col("byte_len")).over(w), lit(0L)))
      .orderBy(col("shard"), col("doc_id"))
  }

  val mmManifestSql: String =
    s"""WITH s AS (
       |  SELECT doc_id,
       |    CAST(('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 15))
       |      AS BIGINT) % $nShards AS shard,
       |    CAST(strlen(text) AS BIGINT) AS byte_len
       |  FROM documents)
       |SELECT doc_id, shard, byte_len,
       |  CAST(coalesce(sum(byte_len) OVER (PARTITION BY shard ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |    AS "offset"
       |FROM s ORDER BY shard, doc_id""".stripMargin

  // ─── mm_shot_plan: video shot segmentation over the frame stream ───
  // The video twin of the tiling/framing plans: segment each clip
  // into SHOTS by thresholding frame-to-frame content change. Frames
  // are the stride-sampled 64-byte chunks (mm_frame_sample's grid);
  // the change signal is the stubbed decoder's domain — here the
  // Hamming-style distance between consecutive frames' md5-derived
  // 60-bit fingerprints (≥ 20 differing bits = cut), which a real
  // deployment swaps for a histogram/SSIM delta with the SAME
  // plumbing: one (doc)-partitioned lag pass over the bounded frame
  // explode, cumulative-sum shot ids, per-doc rollup.
  private val shotCutBits = 20

  def mmShotPlan(spark: SparkSession, dir: String): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("sample_idx"))
    val frames = blobs(spark, dir).toDF()
      .select(col("doc_id"),
        posexplode(expr(
          s"""CASE WHEN octet_length(payload) > 0 THEN transform(
             |  sequence(0, int(ceil(octet_length(payload) / $chunkBytes.0)) - 1, $stride),
             |  i -> substring(payload, i * $chunkBytes + 1, $chunkBytes))
             |ELSE array() END""".stripMargin))
          .as(Seq("sample_idx", "chunk")))
      .withColumn("fp",
        conv(substring(md5(col("chunk")), 1, 15), 16, 10).cast("long"))
    frames
      .withColumn("prev_fp", lag(col("fp"), 1).over(byDoc))
      .withColumn("is_cut",
        when(col("prev_fp").isNull, 1L)
          .when(expr("bit_count(fp ^ prev_fp)") >= shotCutBits, 1L)
          .otherwise(0L))
      .withColumn("shot_id",
        sum(col("is_cut")).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"), max(col("shot_id")).as("n_shots"))
      .withColumn("avg_shot_len_x100",
        expr("n_frames * 100 div n_shots"))
      .orderBy(col("doc_id"))
  }

  val mmShotPlanSql: String =
    s"""WITH idx AS (
       |  SELECT doc_id, text AS p,
       |    unnest(range(0, CAST(ceil(length(text) / $chunkBytes.0) AS BIGINT), $stride)) AS i
       |  FROM documents WHERE length(text) > 0),
       |fr AS (
       |  SELECT doc_id, (i // $stride) AS sample_idx,
       |    CAST(('0x' || substr(md5(substring(p, CAST(i * $chunkBytes + 1 AS INTEGER), $chunkBytes)), 1, 15))
       |      AS BIGINT) AS fp
       |  FROM idx),
       |cuts AS (
       |  SELECT doc_id, sample_idx, fp,
       |    CASE WHEN lag(fp) OVER w IS NULL THEN 1
       |      WHEN bit_count(xor(fp, lag(fp) OVER w)) >= $shotCutBits THEN 1
       |      ELSE 0 END AS is_cut
       |  FROM fr WINDOW w AS (PARTITION BY doc_id ORDER BY sample_idx)),
       |shots AS (
       |  SELECT doc_id,
       |    CAST(sum(is_cut) OVER (PARTITION BY doc_id ORDER BY sample_idx
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS shot_id
       |  FROM cuts)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
       |  CAST(max(shot_id) AS BIGINT) AS n_shots,
       |  count(*) * 100 // max(shot_id) AS avg_shot_len_x100
       |FROM shots GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ─── mm_audio_frames: overlapped framing plan (audio 25ms/10ms) ───
  // The 1-D twin of mm_tile_plan: speech features window the signal
  // into OVERLAPPING frames (classic 400-sample/160-hop ≈ 25 ms
  // window, 10 ms hop) — mm_frame_sample's disjoint stride can't
  // express the overlap. Full frames only (the torchaudio/Kaldi
  // "snip edges" convention); per-frame offset + content md5 as pure
  // codegen'd columns. Fan-out is len/hop — linear in media length,
  // the honest cost of framing, and each row stays 64 B + hash, so
  // the plan explodes metadata, never the waveform.
  private val frameLen = 400
  private val frameHop = 160

  def mmAudioFrames(spark: SparkSession, dir: String): DataFrame =
    blobs(spark, dir).toDF()
      .withColumn("len", octet_length(col("payload")).cast("long"))
      .filter(col("len") >= frameLen)
      .withColumn("n_frames",
        expr(s"(len - $frameLen) div $frameHop") + 1L)
      .withColumn("frame_idx", explode(sequence(lit(0L), col("n_frames") - 1)))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * frameHop).as("offset"),
        md5(expr(s"substring(payload, CAST(frame_idx * $frameHop + 1 AS INT), $frameLen)"))
          .as("frame_md5"))
      .orderBy(col("doc_id"), col("frame_idx"))

  val mmAudioFramesSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, text AS p, CAST(length(text) AS BIGINT) AS len
       |  FROM documents WHERE length(text) >= $frameLen),
       |f AS (
       |  SELECT doc_id, p,
       |    unnest(range(0, (len - $frameLen) // $frameHop + 1)) AS frame_idx
       |  FROM d)
       |SELECT doc_id, frame_idx,
       |  frame_idx * $frameHop AS "offset",
       |  md5(substring(p, CAST(frame_idx * $frameHop + 1 AS INTEGER), $frameLen))
       |    AS frame_md5
       |FROM f ORDER BY doc_id, frame_idx""".stripMargin

  // ─── mm_tile_plan: ViT-style image tiling plan, pure columns ───
  // The vision-model preprocessing shape: split each image into a
  // grid of 256 px tiles (partial edge tiles clipped to the image
  // bounds) so the decode stage downstream fetches exactly the tile
  // rectangles it needs. Dimensions come from the SAME md5-seeded
  // derivation as mm_decode_meta, but inline as codegen'd columns —
  // no mapPartitions round-trip — so the plan is scan → project →
  // bounded explode (≤ ⌈1920/256⌉·⌈1080/256⌉ = 40 tiles per image,
  // a constant fan-out, never data-dependent blowup).
  private val tilePx = 256

  def mmTilePlan(spark: SparkSession, dir: String): DataFrame = {
    val h = conv(substring(md5(col("payload")), 1, 15), 16, 10).cast("long")
    blobs(spark, dir).toDF()
      .select(col("doc_id"),
        (h % 1920 + 1).cast("long").as("width"),
        (shiftright(h, 11) % 1080 + 1).cast("long").as("height"))
      .withColumn("tx", expr(s"(width + ${tilePx - 1}) div $tilePx"))
      .withColumn("ty", expr(s"(height + ${tilePx - 1}) div $tilePx"))
      .withColumn("tile", explode(sequence(lit(0L), col("tx") * col("ty") - 1)))
      .select(col("doc_id"), col("width"), col("height"),
        (col("tx") * col("ty")).as("n_tiles"),
        (col("tile") % col("tx")).as("tile_x"),
        expr("tile div tx").as("tile_y"),
        (col("tile") % col("tx") * tilePx).as("x0"),
        expr(s"tile div tx * $tilePx").as("y0"),
        least(col("tile") % col("tx") * tilePx + tilePx, col("width")).as("x1"),
        least(expr(s"tile div tx * $tilePx + $tilePx"), col("height")).as("y1"))
      .orderBy(col("doc_id"), col("tile_y"), col("tile_x"))
  }

  val mmTilePlanSql: String =
    s"""WITH m AS (
       |  SELECT doc_id,
       |    (h % 1920) + 1 AS width, ((h >> 11) % 1080) + 1 AS height
       |  FROM (SELECT doc_id,
       |      CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h
       |    FROM documents)),
       |g AS (
       |  SELECT doc_id, width, height,
       |    (width + ${tilePx - 1}) // $tilePx AS tx,
       |    (height + ${tilePx - 1}) // $tilePx AS ty
       |  FROM m),
       |t AS (
       |  SELECT doc_id, width, height, tx, ty,
       |    unnest(range(0, tx * ty)) AS tile
       |  FROM g)
       |SELECT doc_id, width, height, tx * ty AS n_tiles,
       |  tile % tx AS tile_x, tile // tx AS tile_y,
       |  (tile % tx) * $tilePx AS x0, (tile // tx) * $tilePx AS y0,
       |  least((tile % tx) * $tilePx + $tilePx, width) AS x1,
       |  least((tile // tx) * $tilePx + $tilePx, height) AS y1
       |FROM t ORDER BY doc_id, tile_y, tile_x""".stripMargin

  // ─── mm_quality_gate: metadata admission filter per source ───
  // The multimodal twin of text_filter_gate: gate each media blob on
  // its decoded metadata — too-small frames (< 320×240), extreme
  // aspect ratios (beyond 4:1 either way, the fisheye/banner junk
  // band), undersized payloads (< 64 bytes) — and report per-source
  // pass rates with per-reason counts, the mixture-cut decision table
  // for the vision corpus. Dimensions are the same md5-seeded inline
  // columns as mm_tile_plan (scan → project → one rollup; swap the
  // seed for real decoder output and the plan holds). Reasons are
  // counted independently (a blob can fail several), pass = none.
  def mmQualityGate(spark: SparkSession, dir: String): DataFrame = {
    val h = conv(substring(md5(col("payload")), 1, 15), 16, 10).cast("long")
    blobs(spark, dir).toDF()
      .select(col("source"), length(col("payload")).cast("long").as("byte_len"),
        (h % 1920 + 1).cast("long").as("width"),
        (shiftright(h, 11) % 1080 + 1).cast("long").as("height"))
      .withColumn("too_small", col("width") < 320 || col("height") < 240)
      .withColumn("extreme_aspect",
        col("width") > col("height") * 4 || col("height") > col("width") * 4)
      .withColumn("tiny_payload", col("byte_len") < 64)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_media"),
        sum(when(!col("too_small") && !col("extreme_aspect") &&
          !col("tiny_payload"), 1L).otherwise(0L)).as("n_pass"),
        sum(when(col("too_small"), 1L).otherwise(0L)).as("n_too_small"),
        sum(when(col("extreme_aspect"), 1L).otherwise(0L)).as("n_aspect"),
        sum(when(col("tiny_payload"), 1L).otherwise(0L)).as("n_tiny"))
      .withColumn("pass_bp", expr("n_pass * 10000 div n_media"))
      .orderBy(col("source"))
  }

  val mmQualityGateSql: String =
    """WITH m AS (
      |  SELECT source, CAST(strlen(text) AS BIGINT) AS byte_len,
      |    (h % 1920) + 1 AS width, ((h >> 11) % 1080) + 1 AS height
      |  FROM (SELECT source, text,
      |      CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h
      |    FROM documents)),
      |f AS (
      |  SELECT source,
      |    (width < 320 OR height < 240) AS too_small,
      |    (width > height * 4 OR height > width * 4) AS extreme_aspect,
      |    (byte_len < 64) AS tiny_payload
      |  FROM m)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_media,
      |  CAST(sum(CASE WHEN NOT too_small AND NOT extreme_aspect
      |    AND NOT tiny_payload THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
      |  CAST(sum(CASE WHEN too_small THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_too_small,
      |  CAST(sum(CASE WHEN extreme_aspect THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_aspect,
      |  CAST(sum(CASE WHEN tiny_payload THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_tiny,
      |  CAST(sum(CASE WHEN NOT too_small AND NOT extreme_aspect
      |    AND NOT tiny_payload THEN 1 ELSE 0 END) AS BIGINT) * 10000
      |    // count(*) AS pass_bp
      |FROM f GROUP BY source ORDER BY source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_quality_gate" -> mmQualityGate,
    "mm_audio_frames" -> mmAudioFrames,
    "mm_shot_plan" -> mmShotPlan,
    "mm_tile_plan" -> mmTilePlan,
    "mm_manifest" -> mmManifest,
    "mm_near_dup" -> mmNearDup,
    "mm_decode_meta" -> mmDecodeMeta,
    "mm_frame_sample" -> mmFrameSample,
    "mm_dedup" -> mmDedup)

  /** Oracles operate on the varchar twin of the binary payload — the
    * fixture is pure ASCII (verified), so character ops equal byte ops
    * and both queries hash-match despite DuckDB 1.0 lacking BLOB
    * md5/substring. */
  val mmDecodeMetaSql: String =
    """SELECT doc_id, CAST(length(text) AS BIGINT) AS byte_len,
      |  lower(hex(substring(text, 1, 4))) AS magic_hex, h AS fp60,
      |  CAST((h % 1920) + 1 AS INTEGER) AS width,
      |  CAST(((h >> 11) % 1080) + 1 AS INTEGER) AS height,
      |  3 AS channels
      |FROM (SELECT doc_id, text,
      |    CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  val mmFrameSampleSql: String =
    s"""WITH idx AS (
       |  SELECT doc_id, text AS p,
       |    unnest(range(0, CAST(ceil(length(text) / $chunkBytes.0) AS BIGINT), $stride)) AS i
       |  FROM documents)
       |SELECT doc_id, (i // $stride) AS sample_idx,
       |  CAST(length(substring(p, CAST(i * $chunkBytes + 1 AS INTEGER), $chunkBytes)) AS BIGINT) AS chunk_len,
       |  md5(substring(p, CAST(i * $chunkBytes + 1 AS INTEGER), $chunkBytes)) AS chunk_md5
       |FROM idx ORDER BY doc_id, sample_idx""".stripMargin

  val oracle: Map[String, String] = Map(
    "mm_quality_gate" -> mmQualityGateSql,
    "mm_audio_frames" -> mmAudioFramesSql,
    "mm_shot_plan" -> mmShotPlanSql,
    "mm_tile_plan" -> mmTilePlanSql,
    "mm_manifest" -> mmManifestSql,
    "mm_near_dup" -> mmNearDupSql,
    "mm_decode_meta" -> mmDecodeMetaSql,
    "mm_frame_sample" -> mmFrameSampleSql,
    "mm_dedup" -> mmDedupSql)
}
