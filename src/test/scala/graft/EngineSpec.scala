package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.streaming.Sessionize

class FunctionsSpec extends SparkSpec {

  test("graft_dot / graft_cosine match the SQL aggregate formulation exactly") {
    import spark.implicits._
    val df = spark.createDataset(Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(0.5f, -1.0f, 2.0f)),
      (Array(0.1f, 0.2f, 0.3f), Array(0.3f, 0.2f, 0.1f))
    )).toDF("a", "b")
    val rows = df.select(
      GraftFunctions.dot(col("a"), col("b")).as("d1"),
      expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)").as("d2"),
      GraftFunctions.cosineSim(col("a"), col("b")).as("c1")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1)) // bit-identical
    }
    val c = rows.head.getDouble(2)
    val expected = (1.0 * 0.5 + 2.0 * -1.0 + 3.0 * 2.0) /
      (math.sqrt(1 + 4 + 9) * math.sqrt(0.25 + 1 + 4))
    assert(math.abs(c - expected) < 1e-12)
  }

  test("graft_doti equals the HOF formulation on BIGINT vectors") {
    import spark.implicits._
    val df = spark.createDataset(Seq(
      (Array(1000000L, -2000000L, 3L), Array(7L, 500000L, -123456789L)),
      (Array.empty[Long], Array(1L)),
      (Array(Long.MaxValue / 4, 2L), Array(2L, 3L))
    )).toDF("a", "b")
    val rows = df.select(
      expr("graft_doti(a, b)").as("d1"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS BIGINT), " +
        "(acc, v) -> acc + v)").as("d2")).collect()
    rows.foreach { r =>
      // zip_with pads the shorter side with null → HOF yields null for
      // unequal lengths; the kernel folds min(len) instead, so compare
      // only where the HOF is defined
      if (!r.isNullAt(1)) assert(r.getLong(0) === r.getLong(1))
    }
    assert(rows(0).getLong(0) === 1000000L * 7L + -2000000L * 500000L + 3L * -123456789L)
    assert(rows(1).getLong(0) === 0L)
  }

  test("graft_grampack unpacks to the struct-HOF Gram formulation") {
    import spark.implicits._
    val rng = new scala.util.Random(9)
    val df = spark.createDataset((0 until 25).map(_ =>
      Array.fill(1 + rng.nextInt(80))((rng.nextInt(4000001) - 2000000).toLong)))
      .toDF("qv")
    val viaKernel = df.select(expr("explode(graft_grampack(qv))").as("p"))
      .select(expr("shiftright(p, 52)").as("d1"),
        expr("shiftright(p, 40) & 4095").as("d2"),
        expr("(p & 1099511627775) - 549755813888").as("xy"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val viaHof = df.select(expr(
      """explode(flatten(transform(sequence(0, size(qv) - 1), i ->
        |  transform(sequence(i, size(qv) - 1), j -> struct(
        |    CAST(i AS BIGINT) AS d1, CAST(j AS BIGINT) AS d2,
        |    (element_at(qv, i + 1) * element_at(qv, j + 1)) DIV 1000000 AS xy)))))"""
        .stripMargin).as("p"))
      .select("p.d1", "p.d2", "p.xy")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(viaKernel === viaHof)
  }

  test("graft_simhash32 equals the per-bit HOF vote formulation") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val df = spark.createDataset((0 until 40).map(_ =>
      Array.fill(1 + rng.nextInt(50))(rng.nextLong() & 0xffffffffL)))
      .toDF("hs")
    val hof = "aggregate(sequence(0, 31), CAST(0 AS BIGINT), (acc, b) -> acc + " +
      "IF(aggregate(hs, CAST(0 AS BIGINT), (w, h) -> w + (shiftright(h, b) & 1) * 2 - 1) > 0, " +
      "shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT)))"
    df.select(expr("graft_simhash32(hs)").as("k"), expr(hof).as("h")).collect()
      .foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("graft_hamming64 counts differing bits") {
    import spark.implicits._
    val df = Seq((0L, -1L), (5L, 6L), (255L, 0L)).toDF("a", "b")
    val got = df.select(GraftFunctions.hamming64(col("a"), col("b"))).as[Int].collect()
    assert(got.toSeq === Seq(64, 2, 8))
  }

  test("graft_phred_shift converts sanger to illumina encodings") {
    import spark.implicits._
    val got = Seq("!I5").toDF("q")
      .select(GraftFunctions.phredShift(col("q"), 31)).as[String].head()
    assert(got === "@hT")
  }

  test("graft_revcomp reverse complements with IUPAC codes") {
    import spark.implicits._
    val got = Seq("ACGTN", "acgtRYKM").toDF("s")
      .select(GraftFunctions.reverseComplement(col("s"))).as[String].collect()
    assert(got.toSeq === Seq("NACGT", "KMRYacgt"))
  }

  test("graft_hash32 equals the md5-hex-digit SQL formulation (oracle parity)") {
    import spark.implicits._
    val df = Seq("", "a", "hello world", "shingle one two", "好 的 文").toDF("s")
    val rows = df.select(
      expr("graft_hash32(s)").as("h1"),
      expr("aggregate(sequence(1, 8), CAST(0 AS BIGINT), (acc, i) -> acc * 16 + " +
        "CAST(instr('0123456789abcdef', substring(md5(s), i, 1)) - 1 AS BIGINT))").as("h2"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("graft_minhash128 equals the higher-order-function formulation") {
    import spark.implicits._
    val df = Seq(Seq(17L, 123456789L, 42L, 2147483646L)).toDF("hs")
    val r = df.select(
      expr("graft_minhash128(hs)").as("m1"),
      expr("transform(sequence(0, 127), k -> " +
        "array_min(transform(hs, h -> ((2 * k + 1) * h + k * k + 7) % 2147483647)))").as("m2"))
      .head()
    assert(r.getSeq[Long](0) === r.getSeq[Long](1))
  }

  test("graft_winnow equals the slice/array_min formulation") {
    import spark.implicits._
    val df = Seq(Seq(9L, 3L, 7L, 3L, 8L, 1L, 5L, 6L, 2L)).toDF("gh")
    val r = df.select(
      expr("graft_winnow(gh, 4)").as("w1"),
      expr("array_distinct(transform(sequence(0, size(gh) - 4), j -> array_min(slice(gh, j + 1, 4))))").as("w2"))
      .head()
    assert(r.getSeq[Long](0).sorted === r.getSeq[Long](1).sorted)
  }

  test("graft_shingles32/64 match the SQL shingle chain + hashes") {
    import spark.implicits._
    val df = Seq("the quick brown fox jumps", "one two", "solo").toDF("text")
    val tok = "split(lower(text), ' ')"
    val shingleSql = s"CASE WHEN size($tok) < 3 THEN array('') ELSE " +
      s"array_distinct(transform(sequence(0, size($tok) - 3), " +
      s"i -> concat_ws(' ', slice($tok, i + 1, 3)))) END"
    val rows = df.select(
      expr("graft_shingles32(text, 3)").as("k32"),
      expr(s"transform($shingleSql, x -> graft_hash32(x))").as("s32"),
      expr("graft_shingles64(text, 3)").as("k64"),
      expr(s"array_sort(transform($shingleSql, x -> graft_hash64(x)))").as("s64"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
      assert(r.getSeq[Long](2) === r.getSeq[Long](3))
    }
  }

  test("graft_word_ngrams matches the transform/concat SQL chain") {
    import spark.implicits._
    val df = Seq("The quick Brown fox", "one two", "solo", "a  b").toDF("text")
    val rows = df.select(
      expr("graft_word_ngrams(text, 2)").as("k"),
      expr("CASE WHEN size(split(lower(text), ' ')) < 2 THEN array() " +
        "ELSE transform(sequence(0, size(split(lower(text), ' ')) - 2), " +
        "i -> concat(split(lower(text), ' ')[i], ' ', split(lower(text), ' ')[i + 1])) END")
        .as("s"))
      .collect()
    rows.foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
  }

  test("graft_intersect_size equals array_intersect size on sorted arrays") {
    import spark.implicits._
    val df = Seq((Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 11L))).toDF("a", "b")
    val r = df.select(
      expr("graft_intersect_size(a, b)").as("i1"),
      expr("size(array_intersect(a, b))").as("i2")).head()
    assert(r.getInt(0) === r.getInt(1))
  }

  test("graft_charclass equals the regexp_replace length-delta formulation") {
    import spark.implicits._
    val df = Seq("The quick  Brown\tfox 42!\n", "", "abc123", "好 的 文 9",
      "  \t\n", "MiXeD CaSe 007 @#$").toDF("text")
    val rows = df.select(
      expr("graft_charclass(text)").as("cc"),
      length(expr("regexp_replace(text, '[^a-zA-Z]', '')")).cast("long").as("alpha"),
      length(expr("regexp_replace(text, '[^0-9]', '')")).cast("long").as("digit"),
      length(expr("regexp_replace(text, '[^ \\t\\n]', '')")).cast("long").as("ws"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === Seq(r.getLong(1), r.getLong(2), r.getLong(3)))
    }
  }

  test("graft_charclass counts match a per-char reference on random unicode text") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.listOf(Gen.frequency(
      8 -> Gen.choose(' ', '~'), 2 -> Gen.oneOf('\t', '\n'),
      2 -> Gen.oneOf('好', 'é', 'Ω', '\ud835', 'ÿ', '߿')))
      .map(_.mkString)
    (0 until 200).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach { s =>
        val got = GraftFunctions
          .charClass(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val ref = Seq(
          s.count(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')).toLong,
          s.count(c => c >= '0' && c <= '9').toLong,
          s.count(c => c == ' ' || c == '\t' || c == '\n').toLong)
        assert(got.toLongArray().toSeq === ref, s"text=${s.take(40)}")
      }
    }
  }

  test("functions resolve via SQL names through the extension injection") {
    val r = spark.sql("SELECT graft_hamming64(12, 10) h, graft_revcomp('ACGT') rc").head()
    assert(r.getInt(0) === java.lang.Long.bitCount(12L ^ 10L))
    assert(r.getString(1) === "ACGT") // ACGT is its own reverse complement
  }

  test("expressions stay inside whole-stage codegen") {
    val df = spark.range(100)
      .select(GraftFunctions.hamming64(col("id"), col("id") * 3).as("h"))
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().trim.startsWith("*("), plan)
    assert(df.agg(sum("h")).head().getLong(0) > 0)
  }
}

class RangeJoinRuleSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  private def naiveJoin(): DataFrame = {
    import spark.implicits._
    val reads = (0 until 2000).map(i => (i.toLong, "c" + (i % 3), (i * 7L) % 500, (i * 7L) % 500 + 20))
      .toDF("read_id", "contig", "rstart", "rend")
    val targets = (0 until 300).map(i => (i.toLong, "c" + (i % 3), (i * 13L) % 500, (i * 13L) % 500 + 30))
      .toDF("target_id", "tcontig", "tstart", "tend")
    reads.join(targets,
      $"contig" === $"tcontig" && $"rstart" <= $"tend" && $"tstart" <= $"rend")
  }

  test("naive overlap join is rewritten to a binned equi-join (no cartesian)") {
    val plan = naiveJoin().queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("__graft_bin"), plan)
    // the bulk path must be a hash join on the bin keys; the only
    // nested-loop joins allowed are the broadcast fallbacks for rows
    // wider than the fan-out cap (empty here)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"), plan)
  }

  test("uncapped mode plans no nested-loop fallback branches") {
    withConf("spark.graft.rangejoin.maxBinsPerRow" -> "0") {
      val plan = naiveJoin().queryExecution.executedPlan.toString
      assert(plan.contains("__graft_bin"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
    }
  }

  test("spark.graft.rangejoin.enabled=false leaves the join untouched") {
    withConf("spark.graft.rangejoin.enabled" -> "false") {
      val plan = naiveJoin().queryExecution.executedPlan.toString
      assert(!plan.contains("__graft_bin"), plan)
    }
  }

  test("invalid binwidth disables the rewrite instead of failing the query") {
    withConf("spark.graft.rangejoin.binwidth" -> "0") {
      assert(!naiveJoin().queryExecution.executedPlan.toString.contains("__graft_bin"))
      assert(naiveJoin().count() > 0)
    }
    withConf("spark.graft.rangejoin.binwidth" -> "bogus") {
      assert(!naiveJoin().queryExecution.executedPlan.toString.contains("__graft_bin"))
    }
  }

  test("garbage enabled conf degrades to enabled instead of throwing") {
    withConf("spark.graft.rangejoin.enabled" -> "yes") {
      // not a valid boolean: warn + default true, query still works
      val df = naiveJoin()
      assert(df.queryExecution.executedPlan.toString.contains("__graft_bin"))
      assert(df.count() > 0)
    }
  }

  test("intervals wider than maxBinsPerRow still return exact pairs (fallback path)") {
    import spark.implicits._
    // cap = 4 bins @ width 64 = 256 bases; the wide rows span far more
    withConf("spark.graft.rangejoin.maxBinsPerRow" -> "4") {
      val a = Seq((1L, 0L, 1000000L), (2L, 100L, 150L), (3L, 500L, 520L)).toDF("id", "s1", "e1")
      val b = Seq((10L, 120L, 2000000L), (11L, 510L, 515L), (12L, 5000000L, 5000100L))
        .toDF("id2", "s2", "e2")
      val joined = a.join(b, $"s1" <= $"e2" && $"s2" <= $"e1")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("__graft_bin"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
      val got = joined.select("id", "id2").as[(Long, Long)].collect().sorted
      val expect = (for {
        (i, s1, e1) <- Seq((1L, 0L, 1000000L), (2L, 100L, 150L), (3L, 500L, 520L))
        (j2, s2, e2) <- Seq((10L, 120L, 2000000L), (11L, 510L, 515L), (12L, 5000000L, 5000100L))
        if s1 <= e2 && s2 <= e1
      } yield (i, j2)).sorted
      assert(got.toSeq === expect)
    }
  }

  private def withConf(kv: (String, String))(body: => Unit): Unit = {
    val prev = spark.conf.getOption(kv._1)
    spark.conf.set(kv._1, kv._2)
    try body finally prev match {
      case Some(v) => spark.conf.set(kv._1, v)
      case None => spark.conf.unset(kv._1)
    }
  }

  test("rewritten join returns exactly the overlap pairs, once each") {
    import spark.implicits._
    val got = naiveJoin().select("read_id", "target_id")
      .as[(Long, Long)].collect().sorted
    // ground truth computed driver-side
    val reads = (0 until 2000).map(i => (i.toLong, "c" + (i % 3), (i * 7L) % 500, (i * 7L) % 500 + 20))
    val targets = (0 until 300).map(i => (i.toLong, "c" + (i % 3), (i * 13L) % 500, (i * 13L) % 500 + 30))
    val expect = (for {
      (rid, rc, rs, re) <- reads
      (tid, tc, ts, te) <- targets
      if rc == tc && rs <= te && ts <= re
    } yield (rid, tid)).sorted
    assert(got.length === expect.length)
    assert(got.toSeq === expect)
  }

  test("ambiguous multi-<= conditions are left untouched; inverted bounds don't crash") {
    import spark.implicits._
    // two '<='-conjuncts in the same orientation → pairing ambiguous → no rewrite
    val a = Seq((1L, 5L, 10L, 20L)).toDF("id", "prio", "s1", "e1")
    val b = Seq((9L, 7L, 15L, 25L)).toDF("id2", "cap", "s2", "e2")
    val ambiguous = a.join(b,
      $"prio" <= $"cap" && $"s1" <= $"e2" && $"s2" <= $"e1")
    assert(!ambiguous.queryExecution.executedPlan.toString.contains("__graft_bin"))
    assert(ambiguous.count() === 1)
    // inverted interval rows must not produce an illegal Sequence
    val inv = Seq((1L, 30L, 10L), (2L, 5L, 50L)).toDF("id", "s1", "e1")
    val tgt = Seq((9L, 12L, 40L)).toDF("id2", "s2", "e2")
    val joined = inv.join(tgt, $"s1" <= $"e2" && $"s2" <= $"e1")
    assert(joined.queryExecution.executedPlan.toString.contains("__graft_bin"))
    // row 1 (30,10): 30<=40 && 12<=10 false → no match; row 2 matches
    assert(joined.select("id").as[Long].collect().sorted === Array(2L))
  }

  test("outer overlap joins are NOT rewritten (rule is inner-only)") {
    import spark.implicits._
    val a = Seq((1L, 10L, 20L), (2L, 100L, 110L)).toDF("id", "s1", "e1")
    val b = Seq((9L, 15L, 25L)).toDF("id2", "s2", "e2")
    val joined = a.join(b, $"s1" <= $"e2" && $"s2" <= $"e1", "left_outer")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("__graft_bin"), plan)
    // semantics preserved: unmatched left row survives with nulls
    assert(joined.count() === 2)
    assert(joined.filter($"id2".isNull).count() === 1)
  }

  test("equality-only joins are left untouched") {
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val b = Seq((1L, "p")).toDF("k2", "w")
    val plan = a.join(b, $"k" === $"k2").queryExecution.executedPlan.toString
    assert(!plan.contains("__graft_bin"), plan)
  }
}

class MultimodalSpec extends SparkSpec {
  import graft.queries.Multimodal
  import org.apache.spark.sql.functions.{col => c}

  private def payloads = {
    import spark.implicits._
    Seq((1L, "image-bytes-one"), (2L, "image-bytes-two"))
      .toDF("doc_id", "text")
      .select(c("doc_id"), c("text").cast("binary").as("payload"))
  }

  test("media header parse reads real PNG/JPEG/GIF/WEBP/BMP dimensions") {
    import spark.implicits._
    val body = "pixels".getBytes("UTF-8")
    // a real 2x3 BMP prefix (the one format with no graft builder)
    val bmp = Array[Byte]('B', 'M') ++ new Array[Byte](16) ++
      Array[Byte](2, 0, 0, 0) ++ Array[Byte](3, 0, 0, 0) ++ new Array[Byte](4)
    val in = Seq(
      (1L, Multimodal.buildPng(640, 480, body)),
      (2L, Multimodal.buildJpeg(1920, 1080, body)),
      (3L, Multimodal.buildGif(13, 37, body)),
      (4L, Multimodal.buildWebp(16384, 16384, body)),
      (5L, bmp),
      (6L, "not an image at all".getBytes("UTF-8")),
      (7L, Multimodal.buildAviHeader(720, 576, body)),
      // the FULL real container parses to the same dims as its prefix
      (8L, Multimodal.buildAvi(8L, nFrames = 2, w = 12, h = 9)))
      .toDF("doc_id", "payload")
    val rows = Multimodal.decodeMeta(spark, in).orderBy("doc_id")
      .select("fmt", "width", "height")
      .as[(String, Long, Long)].collect().toSeq
    assert(rows === Seq(
      ("png", 640L, 480L), ("jpeg", 1920L, 1080L), ("gif", 13L, 37L),
      ("webp", 16384L, 16384L), ("bmp", 2L, 3L), ("unknown", 0L, 0L),
      ("avi", 720L, 576L), ("avi", 12L, 9L)))
    // JPEG parse must skip leading non-frame segments (APP0 etc.)
    val app0 = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte,
      0, 6, 'J', 'F', 'I', 'F') ++ Multimodal.buildJpeg(320, 200, body).drop(2)
    val r2 = Multimodal.decodeMeta(spark,
      Seq((1L, app0)).toDF("doc_id", "payload"))
      .select("fmt", "width", "height").as[(String, Long, Long)].head()
    assert(r2 === (("jpeg", 320L, 200L)))
  }

  test("decode runs as a scan-stage scalar: no shuffle, no serde") {
    // a parquet-backed input (a local relation would be constant-folded
    // by ConvertToLocalRelation, hiding the plan shape under test)
    val dir = tmpDir("media_plan") + "/payloads.parquet"
    payloads.write.mode("overwrite").parquet(dir)
    val meta = Multimodal.decodeMeta(spark, spark.read.parquet(dir))
    val plan = meta.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("graft_media_dims"), plan)
    assert(!plan.contains("DeserializeToObject"), plan)
    // `*(1)` marks the whole-stage-codegen span containing the kernel
    assert(plan.contains("*(1) Project"), plan)
  }

  test("PNG encode round-trips through the JVM's foreign ImageIO decoder") {
    val rnd = new scala.util.Random(7)
    for ((w, h) <- Seq((1, 1), (3, 1), (1, 5), (17, 23), (111, 83))) {
      val pix = Array.fill(w * h)(rnd.nextInt(256))
      val (dw, dh, got) = Multimodal.decodeGray(Multimodal.encodePngGray(w, h, pix))
      assert((dw, dh) === ((w, h)))
      assert(got.toSeq === pix.toSeq, s"${w}x$h pixel mismatch")
    }
    // non-image bytes must throw, not silently zero
    intercept[IllegalArgumentException] {
      Multimodal.decodeGray("not an image".getBytes("UTF-8"))
    }
  }

  test("integer average pool matches a brute-force window sum, real resize round-trips") {
    val rnd = new scala.util.Random(11)
    val (w, h, tw, th) = (37, 29, 9, 7)
    val pix = Array.fill(w * h)(rnd.nextInt(256))
    val pooled = Multimodal.poolGray(w, h, pix, tw, th)
    // brute force: bucket by the same floor mapping
    val sums = Array.fill(tw * th)(0L); val cnts = Array.fill(tw * th)(0L)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * th / h) * tw + (x * tw / w)
      sums(i) += pix(y * w + x); cnts(i) += 1
    }
    assert(pooled.toSeq === (0 until tw * th).map(i => (sums(i) / cnts(i)).toInt))
    // resizePooled: decode the emitted PNG, expect exactly the pooled pixels
    import spark.implicits._
    val in = Seq((1L, Multimodal.encodePngGray(w, h, pix))).toDF("doc_id", "payload")
    val out = Multimodal.resizePooled(spark, in, tw, th).collect()
    assert(out.length === 1 && out(0).getLong(1) === tw && out(0).getLong(2) === th)
    val (rw, rh, rpix) = Multimodal.decodeGray(out(0).getAs[Array[Byte]](3))
    assert((rw, rh) === ((tw, th)) && rpix.toSeq === pooled.toSeq)
    assert(!Multimodal.resizePooled(spark, in, tw, th)
      .queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("frame sampler seeks via the AVI idx1 index and decodes only sampled frames") {
    val video = Multimodal.buildAvi(5L, nFrames = 7, w = 12, h = 9)
    // a real RIFF AVI: outer form + both required lists present
    assert(new String(video, 0, 4, "US-ASCII") === "RIFF")
    assert(new String(video, 8, 4, "US-ASCII") === "AVI ")
    val sampled = Multimodal.sampleFrames(video, stride = 2).toSeq
    assert(sampled.map(_._1) === Seq(0, 2, 4, 6))
    sampled.foreach { case (f, png) =>
      val (w, h, pix) = Multimodal.decodeGray(png)
      assert((w, h) === ((12, 9)))
      assert(pix.toSeq === (0 until w * h).map(i =>
        Multimodal.pixFormula(i % w, i / w, 5L, f)))
    }
    // stride that leaves a trailing unsampled frame: hasNext stays exact
    assert(Multimodal.sampleFrames(video, stride = 3).map(_._1).toSeq === Seq(0, 3, 6))
    // stride 1 = every frame; odd-length frames are even-padded per RIFF
    assert(Multimodal.sampleFrames(video, stride = 1).length === 7)
  }

  test("AVI round-trip holds under randomized frame counts, sizes and strides") {
    val rnd = new scala.util.Random(23)
    for (_ <- 0 until 20) {
      val n = rnd.nextInt(12) + 1
      val frames = Seq.fill(n)(Array.fill(rnd.nextInt(400) + 1)(rnd.nextInt.toByte))
      val avi = Multimodal.buildAviFrom(frames, 16, 16)
      val stride = rnd.nextInt(4) + 1
      val got = Multimodal.sampleFrames(avi, stride).toSeq
      assert(got.map(_._1) === (0 until n by stride))
      got.foreach { case (f, bytes) => assert(bytes.toSeq === frames(f).toSeq) }
    }
  }

  test("AVI container round-trips arbitrary frame bytes and survives odd lengths") {
    val frames = Seq(Array[Byte](1), Array[Byte](2, 3), Array[Byte](4, 5, 6),
      Array.tabulate(257)(i => (i % 127).toByte))
    val avi = Multimodal.buildAviFrom(frames, 4, 3)
    val back = Multimodal.sampleFrames(avi, stride = 1).toSeq
    assert(back.map(_._1) === Seq(0, 1, 2, 3))
    back.zip(frames).foreach { case ((_, got), want) =>
      assert(got.toSeq === want.toSeq)
    }
  }

  test("corrupt AVI containers fail with a ctx-carrying message, not a raw bounds error") {
    val good = Multimodal.buildAvi(9L, nFrames = 3, w = 8, h = 8)
    def msgOf(payload: Array[Byte]): String =
      intercept[IllegalArgumentException] {
        Multimodal.sampleFrames(payload, 2, ctx = "doc_id=9").toSeq
      }.getMessage
    // truncated mid-movi: idx1 missing entirely
    assert(msgOf(java.util.Arrays.copyOfRange(good, 0, good.length / 2))
      .contains("doc_id=9"))
    // not RIFF at all
    assert(msgOf("garbage not an avi".getBytes("UTF-8")).contains("doc_id=9"))
    // an idx1 offset pointing past the end of the file
    val bad = good.clone()
    val idxPos = {
      var p = -1
      var i = 12
      while (p < 0 && i + 8 <= bad.length) {
        if (new String(bad, i, 4, "US-ASCII") == "idx1") p = i
        else {
          val sz = (bad(i + 4) & 0xff) | ((bad(i + 5) & 0xff) << 8) |
            ((bad(i + 6) & 0xff) << 16) | ((bad(i + 7) & 0xff) << 24)
          i += 8 + sz + (sz & 1)
        }
      }
      p
    }
    assert(idxPos > 0)
    bad(idxPos + 8 + 8) = 0x7f.toByte // first entry's offset low byte → huge
    bad(idxPos + 8 + 11) = 0x7f.toByte // and high byte
    val m = msgOf(bad)
    // a nonsense offset fails both spec-sanctioned idx1 conventions,
    // and the message names both attempted positions plus the doc
    assert(m.contains("doc_id=9") && m.contains("chunk header mismatch") &&
      m.contains("movi-relative") && m.contains("absolute"))
    // stride 0 would loop forever on the old framing; now a clear require
    intercept[IllegalArgumentException] {
      Multimodal.sampleFrames(good, 0, ctx = "doc_id=9")
    }
  }

  test("idx1 absolute-file offsets (the other spec convention) decode identically") {
    // real-world AVI writers emit EITHER movi-relative or absolute
    // idx1 offsets (both spec-sanctioned); the sampler accepts both
    val frames = Seq(
      Array.tabulate(33)(i => (i * 5 + 1).toByte),
      Array.tabulate(64)(i => (i ^ 0x2a).toByte),
      Array.tabulate(257)(i => (i % 127).toByte))
    val rel = Multimodal.buildAviFrom(frames, 4, 3)
    val abs = Multimodal.buildAviFrom(frames, 4, 3, absoluteIdx = true)
    assert(!java.util.Arrays.equals(rel, abs)) // the idx1 bytes DO differ
    for (stride <- Seq(1, 2, 3)) {
      val a = Multimodal.sampleFrames(abs, stride).toSeq
      val r = Multimodal.sampleFrames(rel, stride).toSeq
      assert(a.map(_._1) === r.map(_._1))
      a.zip(r).foreach { case ((_, ga), (_, gr)) => assert(ga.toSeq === gr.toSeq) }
    }
  }

  test("RGB PNG encode round-trips through ImageIO; poolRgb pools channels independently") {
    val rnd = new scala.util.Random(13)
    for ((w, h) <- Seq((1, 1), (5, 3), (17, 23))) {
      val rgb = Array.fill(w * h)(rnd.nextInt(1 << 24))
      val (dw, dh, got) = Multimodal.decodeRgb(Multimodal.encodePngRgb(w, h, rgb))
      assert((dw, dh) === ((w, h)))
      assert(got.toSeq === rgb.toSeq, s"${w}x$h rgb mismatch")
    }
    // per-channel brute force against the packed pool
    val (w, h, tw, th) = (19, 13, 6, 4)
    val rgb = Array.fill(w * h)(rnd.nextInt(1 << 24))
    val pooled = Multimodal.poolRgb(w, h, rgb, tw, th)
    def chan(shift: Int): Seq[Int] = {
      val pix = rgb.map(v => (v >>> shift) & 0xff)
      Multimodal.poolGray(w, h, pix, tw, th).toSeq
    }
    assert(pooled.map(v => (v >>> 16) & 0xff).toSeq === chan(16))
    assert(pooled.map(v => (v >>> 8) & 0xff).toSeq === chan(8))
    assert(pooled.map(v => v & 0xff).toSeq === chan(0))
    // a gray decode of an RGB image reads band 0 (red) — still well-defined
    val (_, _, grayOfRgb) = Multimodal.decodeGray(Multimodal.encodePngRgb(3, 2,
      Array.tabulate(6)(i => (i * 40) << 16)))
    assert(grayOfRgb.toSeq === (0 until 6).map(_ * 40))
  }

  test("real BMP bytes decode through the generic ImageIO branch to the same pixels") {
    val rnd = new scala.util.Random(17)
    for ((w, h) <- Seq((1, 1), (4, 4), (5, 3), (21, 10))) { // incl. row-pad widths
      val pix = Array.fill(w * h)(rnd.nextInt(256))
      val bmp = Multimodal.encodeBmpGray(w, h, pix)
      assert(bmp(0) === 'B'.toByte && bmp(1) === 'M'.toByte)
      val (dw, dh, got) = Multimodal.decodeGray(bmp)
      assert((dw, dh) === ((w, h)))
      assert(got.toSeq === pix.toSeq, s"${w}x$h bmp mismatch")
      // the PNG of the same pixels decodes identically: the mixed-codec
      // key's invariant
      val (_, _, viaPng) = Multimodal.decodeGray(Multimodal.encodePngGray(w, h, pix))
      assert(viaPng.toSeq === got.toSeq)
    }
  }

  test("real GIF bytes (LZW + identity palette) decode to the same pixels") {
    val rnd = new scala.util.Random(19)
    // > 200 px exercises the mid-stream CLEAR; sub-block split at 255B too
    for ((w, h) <- Seq((1, 1), (7, 5), (23, 17), (64, 48))) {
      val pix = Array.fill(w * h)(rnd.nextInt(256))
      val gif = Multimodal.encodeGifGray(w, h, pix)
      assert(gif.take(6).map(_.toChar).mkString === "GIF89a")
      val (dw, dh, got) = Multimodal.decodeGray(gif)
      assert((dw, dh) === ((w, h)))
      assert(got.toSeq === pix.toSeq, s"${w}x$h gif mismatch")
      // header parse agrees with the decoder
      val dims = graft.functions.GraftFunctions.mediaDims(gif)
      assert((dims.getLong(0), dims.getLong(1), dims.getLong(2)) === ((3L, w.toLong, h.toLong)))
    }
  }

  test("unsniffed formats decode through the generic ImageIO fallback (real JPEG)") {
    // the JVM's own JPEG encoder makes a payload our sniffer does not
    // claim — it must reach ImageIO.read and still decode
    val img = new java.awt.image.BufferedImage(17, 11,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 11; x <- 0 until 17)
      img.getRaster.setSample(x, y, 0, Multimodal.pixFormula(x, y, 3L, 0))
    val baos = new java.io.ByteArrayOutputStream
    assert(javax.imageio.ImageIO.write(img, "jpeg", baos))
    val (w, h, pix) = Multimodal.decodeGray(baos.toByteArray)
    // JPEG is lossy: dims and band reads are the claim, not exact pixels
    assert((w, h) === ((17, 11)) && pix.length === 17 * 11)
    assert(pix.forall(v => v >= 0 && v <= 255))
  }

  test("poolGray/poolRgb misuse fails with the geometry, not ArithmeticException") {
    val pix = Array.fill(12)(7)
    intercept[IllegalArgumentException] { Multimodal.poolGray(4, 3, pix, 5, 3) }
    intercept[IllegalArgumentException] { Multimodal.poolGray(4, 3, pix, 4, 0) }
    intercept[IllegalArgumentException] { Multimodal.poolRgb(4, 3, pix, 2, 4) }
  }

  test("q_frame_sample: real per-frame decode, stride-2, sig = positional pixel checksum") {
    val sf = "/root/testdata/sf0.001"
    val rows = Multimodal.qFrameSample(spark, sf).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (id, fr) =>
      assert(fr.length == ((id % 9 + 1) + 1) / 2, s"doc $id")
      assert(fr.forall(_.getLong(1) % 2 == 0))
      val (w, h) = (id % 24 + 8, id % 18 + 8)
      assert(fr.forall(r => (r.getLong(2), r.getLong(3)) == ((w, h))))
      fr.foreach { r =>
        val f = r.getLong(1).toInt
        val expect = (0 until (w * h).toInt).map(i =>
          Multimodal.pixFormula((i % w).toInt, (i / w).toInt, id, f).toLong * (i + 1)).sum
        assert(r.getLong(4) === expect, s"doc $id frame $f")
      }
    }
  }

  test("thumbnail geometry never upscales: sub-box images keep their own dims") {
    // pooling with tw > w would leave empty buckets (div-by-zero) —
    // found by the streaming face's 1x1 sentinel payload
    assert(Multimodal.thumbDims(1, 1, 16) === ((1, 1)))
    assert(Multimodal.thumbDims(5, 3, 16) === ((5, 3)))
    assert(Multimodal.thumbDims(9, 23, 16) === ((6, 16)))
    assert(Multimodal.thumbDims(64, 48, 16) === ((16, 12)))
    assert(Multimodal.thumbDims(111, 83, 16) === ((16, 11)))
    // identity pool on a sub-box image round-trips the pixels
    val pix = Array.tabulate(5 * 3)(i => i * 7 % 256)
    assert(Multimodal.poolGray(5, 3, pix, 5, 3).toSeq === pix.toSeq)
  }

  test("q_thumbnail: decoded dims drive the geometry; checksums match brute force") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.queries.Multimodal.qThumbnail(spark, sf).collect()
    rows.take(20).foreach { r =>
      val id = r.getLong(0)
      val (w, h) = ((id % 96 + 16).toInt, (id % 72 + 12).toInt)
      assert((r.getLong(1), r.getLong(2)) === ((w.toLong, h.toLong)))
      val mx = math.max(w, h)
      val (tw, th) = (math.max(1, w * Multimodal.ThumbBox / mx),
        math.max(1, h * Multimodal.ThumbBox / mx))
      assert((r.getLong(3), r.getLong(4)) === ((tw.toLong, th.toLong)))
      val pix = Array.tabulate(w * h)(i => Multimodal.pixFormula(i % w, i / w, id, 0))
      val pooled = Multimodal.poolGray(w, h, pix, tw, th)
      assert(r.getLong(5) === pooled.map(_.toLong).sum, s"doc $id pix_sum")
      assert(r.getLong(6) === pooled.zipWithIndex.map {
        case (v, i) => v.toLong * (i + 1) }.sum, s"doc $id pix_hash")
    }
  }

  test("q_thumbnail_rgb: 3-band decode + per-channel pooling match brute force") {
    val sf = "/root/testdata/sf0.001"
    val rows = Multimodal.qThumbnailRgb(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.take(20).foreach { r =>
      val id = r.getLong(0)
      val (w, h) = ((id % 96 + 16).toInt, (id % 72 + 12).toInt)
      assert((r.getLong(1), r.getLong(2)) === ((w.toLong, h.toLong)))
      val (tw, th) = Multimodal.thumbDims(w, h, Multimodal.ThumbBox)
      assert((r.getLong(3), r.getLong(4)) === ((tw.toLong, th.toLong)))
      val rgb = Array.tabulate(w * h) { i =>
        val (x, y) = (i % w, i / w)
        (Multimodal.pixFormula(x, y, id, 0) << 16) |
          (Multimodal.pixFormula(x, y, id, 1) << 8) |
          Multimodal.pixFormula(x, y, id, 2)
      }
      val pooled = Multimodal.poolRgb(w, h, rgb, tw, th)
      assert(r.getLong(5) === pooled.map(v => ((v >>> 16) & 0xff).toLong).sum, s"doc $id sum_r")
      assert(r.getLong(6) === pooled.map(v => ((v >>> 8) & 0xff).toLong).sum, s"doc $id sum_g")
      assert(r.getLong(7) === pooled.map(v => (v & 0xff).toLong).sum, s"doc $id sum_b")
      assert(r.getLong(8) === pooled.zipWithIndex.map {
        case (v, i) => v.toLong * (i + 1) }.sum, s"doc $id pix_hash_rgb")
    }
  }

  test("q_thumbnail_mixed: PNG, BMP and GIF payloads land on the same checksums") {
    val sf = "/root/testdata/sf0.001"
    val rows = Multimodal.qThumbnailMixed(spark, sf).collect()
    // all three codecs actually present in the gate corpus
    assert((0 to 2).forall(m => rows.exists(_.getLong(0) % 3 == m)))
    rows.take(24).foreach { r =>
      val id = r.getLong(0)
      val (w, h) = ((id % 80 + 20).toInt, (id % 60 + 15).toInt)
      assert((r.getLong(1), r.getLong(2)) === ((w.toLong, h.toLong)))
      val (tw, th) = Multimodal.thumbDims(w, h, Multimodal.ThumbBox)
      val pix = Array.tabulate(w * h)(i => Multimodal.pixFormula(i % w, i / w, id, 0))
      val pooled = Multimodal.poolGray(w, h, pix, tw, th)
      val fmt = Seq("png", "bmp", "gif")((id % 3).toInt)
      assert(r.getLong(5) === pooled.map(_.toLong).sum, s"doc $id pix_sum (fmt=$fmt)")
      assert(r.getLong(6) === pooled.zipWithIndex.map {
        case (v, i) => v.toLong * (i + 1) }.sum, s"doc $id pix_hash (fmt=$fmt)")
    }
  }
}

class SkewSpec extends SparkSpec {
  import graft.operators.Skew

  test("salted join equals the plain join on a hot-key distribution") {
    import spark.implicits._
    // 90% of rows share one key — the pathological case
    val big = (0 until 20000).map(i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toLong)).toDF("k", "v")
    val small = Seq(("hot", 1), ("k0", 2), ("k3", 3)).toDF("k", "w")
    val plain = big.join(small, "k").agg(sum($"v" * $"w")).head().getLong(0)
    val salted = Skew.saltedJoin(big, small, "k", $"v", nSalts = 8)
      .agg(sum($"v" * $"w")).head().getLong(0)
    assert(salted === plain)
  }

  test("packed salted join equals the plain join, negative keys included") {
    import spark.implicits._
    // integral keys incl. negatives (within the |key| < 2^63/nSalts
    // packing contract); 80% of rows on one hot key
    val big = (0 until 20000).map(i =>
      (if (i % 5 == 0) (i % 9).toLong - 4L else 17L, i.toLong)).toDF("k", "v")
    val small = Seq((17L, 1), (-4L, 2), (0L, 3), (3L, 5)).toDF("k", "w")
    val plain = big.join(small, "k").agg(sum($"v" * $"w")).head().getLong(0)
    val packed = Skew.saltedJoinPacked(big, small, "k", $"v", nSalts = 8)
      .agg(sum($"v" * $"w")).head().getLong(0)
    assert(packed === plain)
    // column set preserved (salt machinery internal)
    assert(Skew.saltedJoinPacked(big, small, "k", $"v", 8).columns.sorted
      === big.join(small, "k").columns.sorted)
  }

  test("salted two-phase aggregation equals plain groupBy") {
    import spark.implicits._
    val df = (0 until 10000).map(i => ("hot", i.toLong)).toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v"), count(lit(1))).head()
    val salted = Skew.saltedSum(df, "k", "v", $"v", 16).head()
    assert(salted.getLong(1) === plain.getLong(1))
    assert(salted.getLong(2) === plain.getLong(2))
  }
}

class SessionizeStreamSpec extends SparkSpec {

  test("flatMapGroupsWithState sessionization emits closed sessions on watermark") {
    val sq = spark
    import sq.implicits._
    implicit val sc = sq.sqlContext
    val mem = MemoryStream[Sessionize.Event]
    val sessions = Sessionize.sessions(mem.toDS(), gapSec = 60, watermarkDelay = "0 seconds")
    val query = sessions.writeStream.format("memory")
      .queryName("sessions_out").outputMode("append").start()
    try {
      val base = 1700000000000000L // µs
      // user 1: two bursts 10 min apart; user 2: one burst
      mem.addData(
        Sessionize.Event(1, base, 1.0),
        Sessionize.Event(1, base + 30L * 1000000, 2.0),
        Sessionize.Event(2, base, 5.0))
      query.processAllAvailable()
      mem.addData(Sessionize.Event(1, base + 600L * 1000000, 3.0))
      query.processAllAvailable()
      // watermark at base+600s: user1 burst1 (end base+30s, timeout
      // base+90s) and user2 (timeout base+60s) must have closed
      mem.addData(Sessionize.Event(2, base + 1200L * 1000000, 7.0))
      query.processAllAvailable()
      val out = spark.table("sessions_out")
        .as[Sessionize.Session].collect().sortBy(s => (s.user_id, s.session_start_us))
      assert(out.exists(s => s.user_id == 1 && s.n_events == 2 && s.total_value == 3.0),
        out.mkString(", "))
      assert(out.exists(s => s.user_id == 2 && s.n_events == 1 && s.total_value == 5.0),
        out.mkString(", "))
    } finally query.stop()
  }

  test("file-source streaming windowed counts equal the batch result") {
    import org.apache.spark.sql.streaming.Trigger
    val batchIn = Sessionize.eventsAsStreamInput(spark, "/root/testdata/sf0.001")
    val dir = tmpDir("stream_in")
    batchIn.write.mode("overwrite").parquet(dir)
    val streamIn = spark.readStream.schema(batchIn.schema).parquet(dir)
    val q = Sessionize.windowedCounts(streamIn)
      .writeStream.format("memory").queryName("wc_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("wc_out").collect()
    val batch = Sessionize.windowedCounts(batchIn).collect()
    assert(streamed.map(_.getLong(2)).sum === batch.map(_.getLong(2)).sum)
    assert(streamed.length === batch.length)
  }

  test("windowed aggregation with watermark over the events table (batch parity)") {
    val events = Sessionize.eventsAsStreamInput(spark, "/root/testdata/sf0.001")
    // batch execution of the same streaming query shape
    val counts = Sessionize.windowedCounts(events).collect()
    assert(counts.nonEmpty)
    val total = counts.map(_.getLong(2)).sum
    assert(total === events.count())
  }

  test("streaming as-of enrichment equals the batch AsOf operator") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.functions.{col, max}
    import graft.operators.AsOf
    import spark.implicits._
    val events = Sessionize.eventsAsStreamInput(spark, "/root/testdata/sf0.001")
    val tagged = Sessionize.purchasesAndClicks(events)
    val dir = tmpDir("asof_stream_in")
    tagged.write.mode("overwrite").parquet(dir)
    val streamIn = spark.readStream.schema(tagged.schema).parquet(dir).as[Sessionize.Tagged]
    val q = Sessionize.enrichAsOf(streamIn)
      .writeStream.format("memory").queryName("asof_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("asof_out").as[Sessionize.Enriched]
      .collect().filter(_.c_event.isDefined)
      .map(e => (e.p_event, e.c_event.get, e.c_us.get)).sorted

    // batch: AsOf operator on purchases vs per-(user, ts) deduped clicks
    val purchases = tagged.filter(_.is_query).toDF()
      .select(col("event_id").as("p_event"), col("user_id"), col("ts_us").as("p_us"))
    val clicks = tagged.filter(!_.is_query).toDF()
      .groupBy(col("user_id"), col("ts_us").as("c_us"))
      .agg(max("event_id").as("c_event"))
    val batch = AsOf.joinAsOf(purchases, clicks, Seq("user_id"), "p_us", "c_us")
      .filter(col("c_event").isNotNull)
      .select("p_event", "c_event", "c_us")
      .as[(Long, Long, Long)].collect().sorted
    assert(streamed.length === batch.length)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("streaming as-of state stays bounded by the watermark (prune check)") {
    import spark.implicits._
    val sq = spark
    implicit val sc = sq.sqlContext
    val mem = MemoryStream[Sessionize.Tagged]
    val out = Sessionize.enrichAsOf(mem.toDS(), watermarkDelay = "0 seconds")
    val query = out.writeStream.format("memory")
      .queryName("asof_prune_out").outputMode("append").start()
    try {
      val base = 1700000000000000L
      def t(us: Long) = new java.sql.Timestamp(us / 1000)
      // batch 1: two old clicks, then a purchase after them
      mem.addData(
        Sessionize.Tagged(1, base, 10, is_query = false, t(base)),
        Sessionize.Tagged(1, base + 1000000, 11, is_query = false, t(base + 1000000)),
        Sessionize.Tagged(1, base + 2000000, 100, is_query = true, t(base + 2000000)))
      query.processAllAvailable()
      // batch 2: watermark has advanced past both clicks; only the
      // latest (id 11) may remain in state and must still match
      mem.addData(
        Sessionize.Tagged(1, base + 3000000, 101, is_query = true, t(base + 3000000)))
      query.processAllAvailable()
      val got = spark.table("asof_prune_out").as[Sessionize.Enriched]
        .collect().sortBy(_.p_event)
      assert(got.length === 2)
      assert(got(0).c_event === Some(11L)) // latest click at purchase time
      assert(got(1).c_event === Some(11L)) // pruned state still serves
      // batch 3: a purchase BELOW the watermark must be dropped, not
      // mis-matched against pruned state (NoTimeout does not filter
      // late input rows for us — the function must)
      mem.addData(
        Sessionize.Tagged(1, base + 500000, 102, is_query = true, t(base + 500000)))
      query.processAllAvailable()
      val after = spark.table("asof_prune_out").as[Sessionize.Enriched].collect()
      assert(after.length === 2, after.mkString(", "))
    } finally query.stop()
  }
}

class AsOfSpec extends SparkSpec {
  import graft.operators.AsOf

  test("as-of join matches a brute-force point-in-time lookup, ties inclusive") {
    import spark.implicits._
    // left: (id, key, ts); right: (key, ts, payload)
    val left = Seq(
      (1L, "a", 100L), (2L, "a", 205L), (3L, "a", 50L),
      (4L, "b", 100L), (5L, "b", 400L), (6L, "c", 10L))
      .toDF("id", "k", "lts")
    val right = Seq(
      ("a", 100L, 10L), ("a", 200L, 11L), ("a", 300L, 12L),
      ("b", 90L, 20L), ("b", 400L, 21L))
      .toDF("k", "rts", "payload")
    val got = AsOf.joinAsOf(left, right, on = Seq("k"), leftTs = "lts", rightTs = "rts")
      .select("id", "payload").as[(Long, Option[Long])].collect().toMap
    // brute force: max rts <= lts per key
    val rs = Seq(("a", 100L, 10L), ("a", 200L, 11L), ("a", 300L, 12L),
      ("b", 90L, 20L), ("b", 400L, 21L))
    val lf = Seq((1L, "a", 100L), (2L, "a", 205L), (3L, "a", 50L),
      (4L, "b", 100L), (5L, "b", 400L), (6L, "c", 10L))
    lf.foreach { case (id, k, lts) =>
      val expect = rs.filter(r => r._1 == k && r._2 <= lts).sortBy(_._2).lastOption.map(_._3)
      assert(got(id) === expect, s"id=$id")
    }
    // id=1 is the inclusive tie (lts == rts == 100) and must match
    assert(got(1L) === Some(10L))
    // id=6 has no right row at all -> null payload survives as None
    assert(got(6L) === None)
  }

  test("null right timestamps never match (not 'earliest known state')") {
    import spark.implicits._
    val left = Seq((1L, "a", 100L)).toDF("id", "k", "lts")
    val right = Seq(("a", Option.empty[Long], 5L), ("a", Some(400L), 6L))
      .toDF("k", "rts", "payload")
    val got = AsOf.joinAsOf(left, right, Seq("k"), "lts", "rts")
      .select("payload").as[Option[Long]].head()
    // the only non-null right ts (400) is after lts=100 -> no match;
    // the null-ts row must not be carried forward by the window
    assert(got === None)
  }

  test("as-of join tie-break picks the largest right row at equal (key, ts)") {
    import spark.implicits._
    val left = Seq((1L, "a", 100L)).toDF("id", "k", "lts")
    val right = Seq(("a", 100L, 7L), ("a", 100L, 9L), ("a", 100L, 8L))
      .toDF("k", "rts", "payload")
    val got = AsOf.joinAsOf(left, right, Seq("k"), "lts", "rts",
      rightTieBreak = Seq("payload"))
      .select("payload").as[Long].head()
    assert(got === 9L)
  }

  test("as-of join rejects ambiguous or empty right payloads") {
    import spark.implicits._
    val left = Seq((1L, "a", 100L, 5L)).toDF("id", "k", "lts", "payload")
    val right = Seq(("a", 90L, 7L)).toDF("k", "rts", "payload")
    // right's `payload` collides with left's -> ambiguous output
    val e1 = intercept[IllegalArgumentException] {
      AsOf.joinAsOf(left, right, Seq("k"), "lts", "rts")
    }
    assert(e1.getMessage.contains("payload"))
    // right side with nothing beyond the keys: nothing to attach
    val e2 = intercept[IllegalArgumentException] {
      AsOf.joinAsOf(left.select("id", "k", "lts"),
        right.select("k"), Seq("k"), "lts", "rts")
    }
    assert(e2.getMessage.contains("payload"))
  }

  test("as-of join plans one shuffle on the key, no nested-loop join") {
    import spark.implicits._
    val left = (0 until 5000).map(i => (i.toLong, s"k${i % 37}", (i * 13L) % 10000))
      .toDF("id", "k", "lts")
    val right = (0 until 2000).map(i => (s"k${i % 37}", (i * 29L) % 10000, i.toLong))
      .toDF("k", "rts", "payload")
    val df = AsOf.joinAsOf(left, right, Seq("k"), "lts", "rts", Seq("payload"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("Window"), plan)
    // correctness at this size too, vs brute force on a sample
    val got = df.filter($"id" < 50).select("id", "payload")
      .as[(Long, Option[Long])].collect().toMap
    val rs = (0 until 2000).map(i => (s"k${i % 37}", (i * 29L) % 10000, i.toLong))
    (0 until 50).foreach { i =>
      val (k, lts) = (s"k${i % 37}", (i * 13L) % 10000)
      val expect = rs.filter(r => r._1 == k && r._2 <= lts)
        .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
      assert(got(i.toLong) === expect, s"id=$i")
    }
  }
}
