package graft

import org.apache.spark.sql.functions._
import graft.queries.CorpusStats

/** P69 q_dup_substring — exact duplicated-token-span semantics
  * (ExactSubstr, Lee et al. 2022), pinned on constructed corpora where
  * every span boundary is known by hand.  W = 5 tokens throughout. */
class DupSubstringSpec extends SparkSpec {

  /** Write docs as a documents.parquet the query can read. */
  private def corpus(texts: String*): String = {
    val dir = tmpDir("dupsub")
    import spark.implicits._
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def spans(dir: String): Seq[(Long, Long, Long, Long)] =
    CorpusStats.qDupSubstring(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  // Unique filler tokens (never repeated anywhere).
  private def u(n: Int, tag: String): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  test("a 5-token run shared by two docs yields one exact span in each") {
    val shared = "a b c d e"
    val dir = corpus(s"${u(6, "x")} $shared ${u(6, "y")}",
                     s"${u(6, "p")} $shared ${u(6, "q")}")
    // tokens 0-5 unique, 6-10 shared, 11-16 unique -> span [6, 11)
    assert(spans(dir) === Seq((0L, 6L, 11L, 5L), (1L, 6L, 11L, 5L)))
  }

  test("overlapping duplicated windows merge into one maximal span") {
    val shared = "a b c d e f g h" // 4 overlapping 5-windows
    val dir = corpus(s"$shared ${u(8, "x")}", s"${u(8, "y")} $shared")
    assert(spans(dir) === Seq((0L, 0L, 8L, 8L), (1L, 8L, 16L, 8L)))
  }

  test("two duplicated regions split by a long unique gap stay two spans") {
    val s1 = "a b c d e"
    val s2 = "f g h i j"
    // gap of 7 unique tokens > W, so the island merge must break
    val dir = corpus(s"$s1 ${u(7, "g")} $s2",
                     s"${u(3, "x")} $s1 ${u(9, "z")} $s2 ${u(2, "w")}")
    assert(spans(dir) === Seq(
      (0L, 0L, 5L, 5L), (0L, 12L, 17L, 5L),
      (1L, 3L, 8L, 5L), (1L, 17L, 22L, 5L)))
  }

  test("adjacent duplicated runs fuse across the shared boundary") {
    val s1 = "a b c d e"
    val s2 = "f g h i j"
    // Both docs carry s1 immediately followed by s2, so the windows
    // STRADDLING the boundary are duplicated too and the ten tokens
    // merge into one maximal span — [0, 10) in doc 0, [6, 16) in doc 1.
    val dir = corpus(s"$s1 $s2 ${u(6, "x")}", s"${u(6, "y")} $s1 $s2")
    assert(spans(dir) === Seq((0L, 0L, 10L, 10L), (1L, 6L, 16L, 10L)))
  }

  test("within-doc self-repetition counts as duplication (df >= 2)") {
    val rep = "a b c d e"
    val dir = corpus(s"$rep ${u(7, "x")} $rep", u(20, "z"))
    assert(spans(dir) === Seq((0L, 0L, 5L, 5L), (0L, 12L, 17L, 5L)))
  }

  test("docs with no duplicated window emit nothing; short docs are skipped") {
    val dir = corpus(u(20, "a"), u(20, "b"), "t0 t1 t2") // 3-token doc < W
    assert(spans(dir).isEmpty)
  }

  private def cuts(dir: String): Seq[(Long, String, Long)] =
    CorpusStats.qDupCut(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq

  test("cut removes exactly the span tokens and keeps the rest in order") {
    val shared = "a b c d e"
    val x = u(6, "x"); val y = u(6, "y"); val p = u(6, "p"); val q = u(6, "q")
    val dir = corpus(s"$x $shared $y", s"$p $shared $q")
    assert(cuts(dir) === Seq((0L, s"$x $y", 5L), (1L, s"$p $q", 5L)))
  }

  test("cut passes untouched docs through verbatim, including short ones") {
    val clean = u(20, "a")
    val short = "t0 t1 t2"
    val dir = corpus(clean, short)
    assert(cuts(dir) === Seq((0L, clean, 0L), (1L, short, 0L)))
  }

  test("a fully duplicated doc cuts to the empty string") {
    val t = "a b c d e f"
    val dir = corpus(t, t)
    assert(cuts(dir) === Seq((0L, "", 6L), (1L, "", 6L)))
  }

  test("graft_word_shingles equals the SQL spelling on adversarial inputs") {
    import spark.implicits._
    val cases = Seq(
      "",                      // 1 empty token
      "one",                   // single token < W
      "a b c d",               // W-1 tokens
      "a b c d e",             // exactly W
      "a b c d e f g",         // W+2
      " a b c d e",            // leading space -> empty first token
      "a b c d e ",            // trailing space -> empty last token
      "a  b c d e f",          // doubled space -> interior empty token
      "A b C d E f",           // case must be PRESERVED (raw, not lower)
      "é ü 漢 字 x y",          // multibyte UTF-8 around the 0x20 scan
      "a b c d e f g h i j k l m n o p q r s t")
    val df = cases.toDF("text")
    val sql = df.selectExpr(
      "CASE WHEN size(split(text, ' ')) >= 5 THEN " +
        "transform(sequence(0, size(split(text, ' ')) - 5), i -> " +
        "concat_ws(' ', slice(split(text, ' '), i + 1, 5))) " +
        "ELSE array() END AS sh")
    val kernel = df.selectExpr("graft_word_shingles(text, 5) AS sh")
    assert(kernel.collect().map(_.getSeq[String](0)).toSeq ===
      sql.collect().map(_.getSeq[String](0)).toSeq)
  }

  test("graft_word_shingles rejects n < 1 at analysis; non-foldable n < 1 yields empty (r12 ADVICE)") {
    import spark.implicits._
    val df = Seq("a b c").toDF("text")
    // foldable n=0 / n=-1: clean analysis failure (used to read past
    // the starts table and build negative-length slices)
    Seq(0, -1).foreach { n =>
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        df.selectExpr(s"graft_word_shingles(text, $n)").collect()
      }
      assert(e.getMessage.contains("graft_word_shingles"), e.getMessage)
    }
    // non-foldable n evaluating < 1 degrades to empty, like wordNgrams
    val out = Seq(("a b c", 0), ("a b c", -3), ("a b c", 2))
      .toDF("text", "n")
      .selectExpr("graft_word_shingles(text, n) AS sh")
      .collect().map(_.getSeq[String](0)).toSeq
    assert(out === Seq(Seq.empty, Seq.empty, Seq("a b", "b c")))
  }

  test("random small-vocab corpora match a brute-force reference (5 seeds)") {
    // Brute force in plain Scala: count every 5-shingle across the
    // corpus, mark positions, merge [p, p+5) intervals per doc.
    def reference(texts: Seq[String]): Seq[(Long, Long, Long, Long)] = {
      val toks = texts.map(_.split(" ", -1).toSeq)
      val counts = scala.collection.mutable.Map[Seq[String], Int]()
      for (t <- toks if t.length >= 5; i <- 0 to t.length - 5)
        counts.updateWith(t.slice(i, i + 5))(c => Some(c.getOrElse(0) + 1))
      toks.zipWithIndex.flatMap { case (t, doc) =>
        val marked = (0 to t.length - 5).filter(i => counts(t.slice(i, i + 5)) >= 2)
        val spans = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
        for (p <- marked) spans.lastOption match {
          case Some((a, b)) if p <= b => spans(spans.length - 1) = (a, p + 5)
          case _ => spans += ((p, p + 5))
        }
        spans.map { case (a, b) => (doc.toLong, a.toLong, b.toLong, (b - a).toLong) }
      }
    }
    // The cut is the spans' denotation applied: drop token i of doc d
    // iff some span [a, b) of d covers it, rejoin with single spaces.
    def referenceCut(texts: Seq[String]): Seq[(Long, String, Long)] = {
      val sp = reference(texts).groupBy(_._1)
      texts.zipWithIndex.map { case (t, doc) =>
        val spans = sp.getOrElse(doc.toLong, Seq())
        val toks = t.split(" ", -1)
        val kept = toks.zipWithIndex.collect {
          case (tok, i) if !spans.exists(s => i >= s._2 && i < s._3) => tok
        }
        (doc.toLong, kept.mkString(" "), spans.map(_._4).sum)
      }
    }
    val vocab = Array("w0", "w1", "w2", "w3", "w4")
    for (seed <- 0 until 5) {
      val rnd = new scala.util.Random(seed)
      // tiny vocab => organic cross-doc and within-doc duplication
      val texts = Seq.fill(30)(
        Seq.fill(3 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      val dir = corpus(texts: _*)
      assert(spans(dir) === reference(texts), s"spans seed=$seed")
      assert(cuts(dir) === referenceCut(texts), s"cut seed=$seed")
    }
  }

  test("graft_word_shingles randomized parity with the SQL spelling (300 strings)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val alphabet = "ab é漢"  // includes space (doubled runs) and multibyte
    val cases = Seq.fill(300)(
      (0 until rnd.nextInt(30)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = cases.toDF("text")
    def arrs(c: org.apache.spark.sql.DataFrame) =
      c.collect().map(_.getSeq[String](0)).toSeq
    for (n <- Seq(1, 2, 5)) {
      val sql = df.selectExpr(
        s"CASE WHEN size(split(text, ' ')) >= $n THEN " +
          s"transform(sequence(0, size(split(text, ' ')) - $n), i -> " +
          s"concat_ws(' ', slice(split(text, ' '), i + 1, $n))) " +
          "ELSE array() END AS sh")
      val kernel = df.selectExpr(s"graft_word_shingles(text, $n) AS sh")
      assert(arrs(kernel) === arrs(sql), s"n=$n")
    }
  }

  test("matches the DuckDB oracle construction on real corpus data") {
    // Structural cross-check at sf0.001 without DuckDB: re-spell the
    // oracle's window-count construction in Spark and compare.
    val d = "/root/testdata/sf0.001"
    val got = CorpusStats.qDupSubstring(spark, d)
    val sh = Tables.documents(spark, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 5)
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, size(toks) - 5), i -> " +
          "concat_ws(' ', slice(toks, i + 1, 5)))")).as(Seq("pos", "s")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("s"))
    val byWindow = sh
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("s")))
      .filter(col("df") >= 2)
      .select("doc_id", "pos")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val expect = byWindow
      .withColumn("brk", when(col("pos") - lag("pos", 1).over(w) > 5, 1L)
        .otherwise(0L))
      .withColumn("island", sum("brk").over(w))
      .groupBy("doc_id", "island")
      .agg(min("pos").as("tok_start"), (max("pos") + 5).as("tok_end"))
      .select(col("doc_id"), col("tok_start"), col("tok_end"),
        (col("tok_end") - col("tok_start")).as("span_toks"))
    assert(got.count() > 0) // non-vacuous on the real corpus
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
  }
}
