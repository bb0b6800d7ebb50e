package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-exact parity of the round-17 native kernels (TextKernels.scala,
  * HashKernels.scala) against the interpreted HOF chains they replace.
  * Each test evaluates OLD CHAIN and NEW KERNEL side by side over the
  * sf0.001 corpus plus adversarial synthetic rows (empty strings,
  * repeated/leading/trailing spaces, non-ASCII including surrogate
  * pairs, line terminators, parens) and asserts element-wise equality
  * — the equivalence proof backing the operator rewrites, on top of
  * the full DuckDB crosscheck. */
class TextKernelsSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test
  private val dir = "/root/testdata/sf0.001"

  private val synthetic = Seq(
    "", " ", "   ", "a", " a", "a ", "a  b", "  a b  c ",
    "one two three four five six seven eight nine ten",
    "the a of and to in the the a", // stopword runs for rake
    "dup dup dup dup dup dup", "x y x y x y x y",
    "héllo wörld ünd ünïcode", "日本語 のテスト です",
    "emoji 😀 pair 𝔘 test", "tab\tand space", "nl\nin token",
    "the quick brown fox jumps over the lazy dog the quick brown fox")

  private def corpus(): Seq[String] = {
    import spark.implicits._
    Tables(spark, dir).documents.select($"text").as[String].collect().toSeq
  }

  private def df(texts: Seq[String]): DataFrame = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private def allTexts = synthetic ++ corpus()

  /** Collects (old, new) per row and asserts equality with the row's
    * text in the failure message. */
  private def assertParity(d: DataFrame, oldCol: Column, newCol: Column): Unit = {
    val rows = d.select(col("text"), oldCol.as("o"), newCol.as("n")).collect()
    rows.foreach { r =>
      assert(r.get(1) == r.get(2),
        s"kernel mismatch on text=${r.getString(0).take(80)}: old=${r.get(1)} new=${r.get(2)}")
    }
  }

  private def toks(c: Column): Column = filter(split(c, " "), w => w =!= "")

  test("graft_tokens == filter(split)") {
    assertParity(df(allTexts), toks(col("text")),
      call_function("graft_tokens", col("text")))
  }

  test("graft_ntokens == size(filter(split)) / size(split)") {
    assertParity(df(allTexts),
      size(toks(col("text"))).cast("long"),
      call_function("graft_ntokens", col("text"), lit(1)))
    assertParity(df(allTexts),
      size(split(col("text"), " ")).cast("long"),
      call_function("graft_ntokens", col("text"), lit(0)))
  }

  test("graft_spans(filtered, distinct) == Dedup.shingles chain") {
    val t = toks(col("text"))
    val old = when(size(t) >= 3,
      array_distinct(transform(sequence(lit(0), size(t) - 3),
        i => concat_ws(" ",
          element_at(t, i + 1), element_at(t, i + 2), element_at(t, i + 3)))))
      .otherwise(array().cast("array<string>"))
    assertParity(df(allTexts), old,
      call_function("graft_spans", col("text"), lit(3), lit(1), lit(1)))
  }

  test("graft_spans(raw) == text_boilerplate shingle chain") {
    // the old chain only ran behind a size(ws) >= 5 filter; the kernel
    // returns [] below w — compare on the filtered set AND check the
    // kernel's [] on short docs
    val d = df(allTexts).withColumn("ws", split(col("text"), " "))
    val old = expr(
      "transform(sequence(1, size(ws) - 4), i -> array_join(slice(ws, i, 5), ' '))")
    assertParity(d.filter(size(col("ws")) >= 5), old,
      call_function("graft_spans", col("text"), lit(5), lit(0), lit(0)))
    val shorts = d.filter(size(col("ws")) < 5)
      .select(call_function("graft_spans", col("text"), lit(5), lit(0), lit(0)).as("s"))
      .collect()
    shorts.foreach(r => assert(r.getSeq[String](0).isEmpty))
  }

  test("graft_span_hashes == per-span md5/conv chain") {
    val t = toks(col("text"))
    def spanAt(i: Column, w: Int): Column =
      concat_ws(" ", (0 until w).map(o => element_at(t, i + o + 1)): _*)
    for ((prefix, w, nHex) <- Seq(("sub:", 5, 13), ("win:", 5, 10))) {
      val old = when(size(t) >= w,
        transform(sequence(lit(0), size(t) - w),
          i => conv(substring(md5(concat(lit(prefix), spanAt(i, w))), 1, nHex), 16, 10)
            .cast("long")))
        .otherwise(array().cast("array<long>"))
      assertParity(df(allTexts), old,
        call_function("graft_span_hashes", col("text"), lit(prefix), lit(w), lit(nHex)))
    }
  }

  test("graft_winnow_mins == posexplode/window/filter/distinct pipeline") {
    import org.apache.spark.sql.expressions.Window
    val winK = 5; val winW = 4; val posBits = 23
    val d = df(allTexts)
    // OLD pipeline, verbatim from text_winnowing (round-16 source)
    val base = d
      .select(col("doc_id"), toks(col("text")).as("t"))
      .withColumn("n_spans",
        greatest(size(col("t")) - (winK - 1), lit(0)).cast("long"))
      .filter(col("n_spans") > 0)
    val spans = base
      .select(col("doc_id"), col("n_spans"),
        posexplode(transform(sequence(lit(0), size(col("t")) - winK),
          i => concat_ws(" ",
            (0 until winK).map(o => element_at(col("t"), i + o + 1)): _*))))
      .select(col("doc_id"), col("n_spans"), col("pos"),
        conv(substring(md5(concat(lit("win:"), col("col"))), 1, 10), 16, 10)
          .cast("long").as("h"))
      .withColumn("key",
        col("h") * (1L << posBits) + (lit((1L << posBits) - 1) - col("pos")))
    val wFrame = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(0, winW - 1)
    val oldPicked = spans
      .withColumn("wmin", min(col("key")).over(wFrame))
      .filter(col("pos") <= col("n_spans") - winW || col("pos") === 0)
      .select(col("doc_id"), col("wmin"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // NEW kernel
    val newPicked = d
      .select(col("doc_id"),
        explode(call_function("graft_winnow_mins",
          call_function("graft_span_hashes", col("text"), lit("win:"), lit(winK), lit(10)),
          lit(winW), lit(posBits))).as("wmin"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(oldPicked == newPicked)
    // and the kernel emits no duplicates per doc (set semantics built in)
    val dup = d.select(col("doc_id"),
        call_function("graft_winnow_mins",
          call_function("graft_span_hashes", col("text"), lit("win:"), lit(winK), lit(10)),
          lit(winW), lit(posBits)).as("m"))
      .collect()
    dup.foreach(r => {
      val s = r.getSeq[Long](1)
      assert(s.size == s.distinct.size)
    })
  }

  test("graft_bigrams == zip_with bigramArr chain") {
    val t = toks(col("text"))
    val old = filter(
      zip_with(t, slice(t, lit(2), greatest(size(t) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b)),
      x => x.isNotNull)
    assertParity(df(allTexts), old,
      call_function("graft_bigrams", col("text")))
  }

  test("graft_poly_hash == aggregate(split('')) rolling-hash fold") {
    val old = expr("aggregate(filter(split(text, ''), c -> c <> ''), 0L, " +
      "(h, c) -> (h * 31 + ascii(c)) % 1000000007)")
    assertParity(df(allTexts), old,
      call_function("graft_poly_hash", col("text")))
  }

  test("graft_bpe_token_count == aggregate-replace fold") {
    // ranked pairs like textBpePairs mines (plus an unused one), and a
    // paren case to exercise the slow path
    val pairs = Seq("th", "he", " q", "qq", "ab", "aa")
    val ms = array(pairs.map(lit): _*)
    val old = {
      val enc = aggregate(ms,
        regexp_replace(col("text"), "(.)", "($1)"),
        (acc, p) => call_function("replace", acc,
          concat(lit("("), substring(p, 1, 1), lit(")("), substring(p, 2, 1), lit(")")),
          concat(lit("("), p, lit(")"))))
      (length(enc) - length(call_function("replace", enc, lit("("), lit("")))).cast("long")
    }
    val texts = allTexts ++ Seq("aaa ab thth", "with (parens) a(b",
      "qq qqq qqqq", "the the the")
    assertParity(df(texts), old,
      call_function("graft_bpe_token_count", col("text"), ms))
  }

  test("graft_rake_phrases == posexplode/window/groupBy phrase pipeline") {
    import org.apache.spark.sql.expressions.Window
    val stopwords = Seq("the", "a", "of", "and", "to", "in")
    val stopArr = array(stopwords.map(lit): _*)
    val d = df(allTexts)
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val oldPhrases = d
      .select(col("doc_id"), posexplode(toks(col("text"))).as(Seq("pos", "w")))
      .filter(!array_contains(stopArr, col("w")))
      .withColumn("grp", col("pos") - row_number().over(byDoc))
      .groupBy(col("doc_id"), col("grp"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("w")))),
          x => x.getField("w")), " ").as("phrase"),
        min(col("pos")).as("p0"), count(lit(1)).as("plen"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getInt(3)).map(r => (r.getString(2), r.getLong(4))).toSeq
      }
    val newPhrases = d
      .select(col("doc_id"),
        posexplode(call_function("graft_rake_phrases", col("text"), stopArr))
          .as(Seq("grp", "phrase")))
      .withColumn("plen", size(split(col("phrase"), " ")).cast("long"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getInt(1)).map(r => (r.getString(2), r.getLong(3))).toSeq
      }
    assert(oldPhrases.keySet == newPhrases.keySet)
    oldPhrases.keySet.foreach { id =>
      assert(oldPhrases(id) == newPhrases(id), s"doc $id phrase mismatch")
    }
  }

  test("graft_ams_signs == per-nibble conv chain") {
    val s = 32
    val h = md5(concat(lit("ams:"), col("text")))
    val old = array((0 until s).map(i =>
      conv(substring(h, i + 1, 1), 16, 10).cast("long") % 2L * 2L - 1L): _*)
    assertParity(df(allTexts.filter(_.nonEmpty)), old,
      call_function("graft_ams_signs", concat(lit("ams:"), col("text")), lit(s)))
  }

  test("graft_boot_weights == per-replicate md5/CASE chain") {
    val bootCdf = Seq(424136118829305344L, 848272237658610688L,
      1060340297073263360L, 1131029650211480960L, 1148701988496035328L,
      1152236456152946176L, 1152825534095764608L, 1152909688087595776L)
    def poissonW(h: Column): Column =
      bootCdf.zipWithIndex.foldRight(lit(8L): Column) {
        case ((t, k), rest) => when(h < t, k.toLong).otherwise(rest)
      }
    val b = 32
    val old = array((0 until b).map { i =>
      val h = conv(substring(md5(concat(lit("boot:"), lit(i.toString),
        lit(":"), col("text"))), 1, 15), 16, 10).cast("long")
      poissonW(h)
    }: _*)
    val ids = Seq("0", "1", "17", "123456789", "999999999999")
    assertParity(df(ids), old,
      call_function("graft_boot_weights", col("text"),
        array(bootCdf.map(lit): _*), lit(b)))
  }

  test("graft_cms_positions == per-depth md5/conv chain") {
    val depth = 4; val width = 256
    val old = array((1 to depth).map(j =>
      conv(substring(md5(concat(lit(s"cms$j:"), col("text"))), 1, 15), 16, 10)
        .cast("long") % width): _*)
    val ids = Seq("0", "1", "42", "987654321", "u-abc")
    assertParity(df(ids), old,
      call_function("graft_cms_positions", col("text"), lit(depth), lit(width)))
  }

  test("kernels propagate null and handle the empty corpus") {
    val d = spark.range(1).select(lit(null).cast("string").as("text"))
    val out = d.select(
      call_function("graft_tokens", col("text")),
      call_function("graft_ntokens", col("text"), lit(1)),
      call_function("graft_spans", col("text"), lit(3), lit(1), lit(1)),
      call_function("graft_span_hashes", col("text"), lit("sub:"), lit(5), lit(13)),
      call_function("graft_bigrams", col("text")),
      call_function("graft_poly_hash", col("text")),
      call_function("graft_winnow_mins",
        lit(null).cast("array<bigint>"), lit(4), lit(23)),
      call_function("graft_rake_phrases", col("text"), array(lit("the"))),
      call_function("graft_ams_signs", col("text"), lit(32)),
      call_function("graft_cms_positions", col("text"), lit(4), lit(256))
    ).collect()(0)
    (0 until out.length).foreach(i => assert(out.isNullAt(i), s"col $i not null"))
  }
}
