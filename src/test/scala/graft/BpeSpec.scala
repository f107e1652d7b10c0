package graft

import org.apache.spark.sql.functions._

import graft.queries.Packing

/** P59 distributed BPE — kernel semantics + reference-implementation
  * parity for the driver-loop trainer (not SQL-expressible, so this
  * spec IS its correctness gate), plus the P58 plan pin: packing must
  * run on the keyless RankedPrefixSum operator, not a single-task
  * global window. */
class BpeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("graft_bpe_apply merges greedily left-to-right, non-overlapping") {
    import spark.implicits._
    val cases = Seq(
      (Seq("a", "b", "c"), "a", "b", Seq("ab", "c")),
      // leftmost wins on an overlapping run: [a,a,a] + (a,a) -> [aa, a]
      (Seq("a", "a", "a"), "a", "a", Seq("aa", "a")),
      (Seq("a", "a", "a", "a"), "a", "a", Seq("aa", "aa")),
      // a merged token does NOT re-merge within the same pass
      (Seq("a", "b", "b"), "a", "b", Seq("ab", "b")),
      (Seq("x", "y"), "a", "b", Seq("x", "y")),
      (Seq("a"), "a", "a", Seq("a")),
      (Seq.empty[String], "a", "b", Seq.empty[String]))
    cases.foreach { case (toks, l, r, want) =>
      val got = Seq(toks).toDF("t")
        .select(call_function("graft_bpe_apply", col("t"), lit(l), lit(r)))
        .as[Seq[String]].collect()(0)
      assert(got === want, s"bpe_apply($toks, $l, $r)")
    }
  }

  test("graft_bpe_encode equals chaining graft_bpe_apply per merge") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val alphabet = Vector("a", "b", "c", "</w>")
    val rows = (0 until 500).map(_ =>
      Vector.fill(rnd.nextInt(30))(alphabet(rnd.nextInt(alphabet.size))))
    val merges = Seq(("a", "b"), ("b", "b"), ("ab", "c"), ("a", "a"), ("aa", "</w>"))
    val df = rows.toDF("t")
    val chained = merges.foldLeft(df) { case (d, (l, r)) =>
      d.withColumn("t", call_function("graft_bpe_apply", col("t"), lit(l), lit(r)))
    }.as[Seq[String]].collect()
    val fused = df.select(call_function("graft_bpe_encode", col("t"),
      array(merges.flatMap(m => Seq(m._1, m._2)).map(lit): _*)))
      .as[Seq[String]].collect()
    assert(fused.toSeq === chained.toSeq)
  }

  test("property: kernels agree with a scala reference on random inputs") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.GraftFunctions
    def refApply(toks: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += toks(i); i += 1 }
      }
      out.result()
    }
    val rnd = new scala.util.Random(37)
    val alpha = Vector("a", "b", "ab", "</w>", "c")
    (0 until 300).foreach { _ =>
      val toks = Vector.fill(rnd.nextInt(40))(alpha(rnd.nextInt(alpha.size)))
      val merges = Vector.fill(1 + rnd.nextInt(5))(
        (alpha(rnd.nextInt(alpha.size)), alpha(rnd.nextInt(alpha.size))))
      def arr(v: Vector[String]) =
        new GenericArrayData(v.map(UTF8String.fromString).toArray[Any])
      // single apply
      val (l0, r0) = merges.head
      val gotApply = GraftFunctions.bpeApply(arr(toks),
        UTF8String.fromString(l0), UTF8String.fromString(r0))
      assert((0 until gotApply.numElements())
        .map(gotApply.getUTF8String(_).toString) === refApply(toks, l0, r0))
      // full table via bpeEncode
      val want = merges.foldLeft(toks) { case (t, (l, r)) => refApply(t, l, r) }
      val gotEnc = GraftFunctions.bpeEncode(arr(toks),
        arr(merges.flatMap(m => Vector(m._1, m._2))))
      assert((0 until gotEnc.numElements())
        .map(gotEnc.getUTF8String(_).toString) === want)
    }
    // bpeStats vs reference over random word-soup texts
    (0 until 100).foreach { _ =>
      val words = Vector.fill(rnd.nextInt(12))(
        Vector.fill(1 + rnd.nextInt(6))(('a' + rnd.nextInt(3)).toChar).mkString)
      val text = words.mkString(" ".repeat(1 + rnd.nextInt(2)))
      val merges = Vector.fill(1 + rnd.nextInt(4))(
        (('a' + rnd.nextInt(3)).toChar.toString, ('a' + rnd.nextInt(3)).toChar.toString))
      val syms = words.filter(_.nonEmpty)
        .map(w => w.map(_.toString).toVector :+ "</w>")
      val pre = syms.map(_.length.toLong).sum
      val post = syms.map(s => merges.foldLeft(s) {
        case (t, (l, r)) => refApply(t, l, r)
      }.length.toLong).sum
      val got = GraftFunctions.bpeStats(UTF8String.fromString(text),
        new GenericArrayData(
          merges.flatMap(m => Vector(m._1, m._2)).map(UTF8String.fromString).toArray[Any]))
      assert((got.getLong(0), got.getLong(1)) === ((pre, post)), s"text='$text' $merges")
    }
  }

  test("graft_bpe_stats equals the explicit symbol-array + chained-apply form") {
    import spark.implicits._
    val merges = Seq(("e", "r"), ("e", "</w>"), ("er", "</w>"), ("a", "a"))
    val flat = merges.flatMap(m => Seq(m._1, m._2))
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .union(Seq((90001L, ""), (90002L, "  aaa  x  "), (90003L, "er er"),
        // astral code points: Spark length()/substring() count CODE
        // POINTS, so the fused kernel must yield one symbol per 😀,
        // never a surrogate half
        (90004L, "a😀b 😀😀")
        ).toDF("doc_id", "text"))
    val explicitBase = docs
      .select(col("doc_id"), expr(
        "flatten(transform(filter(split(lower(text), ' '), w -> w <> ''), " +
          "w -> concat(transform(sequence(1, length(w)), i -> substring(w, i, 1)), " +
          "array('</w>'))))").as("syms"))
      .withColumn("pre", expr("CAST(size(syms) AS BIGINT)"))
    val chained = merges.foldLeft(explicitBase) { case (d, (l, r)) =>
      d.withColumn("syms", call_function("graft_bpe_apply", col("syms"), lit(l), lit(r)))
    }.select(col("doc_id"), col("pre"), expr("CAST(size(syms) AS BIGINT)").as("post"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val fused = docs
      .select(col("doc_id"), call_function("graft_bpe_stats", col("text"),
        array(flat.map(lit): _*)).as("st"))
      .select(col("doc_id"), col("st")(0), col("st")(1))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(fused.toSeq === chained.toSeq)
  }

  /** Straightforward in-memory BPE (Sennrich ACL'16 §3 as published):
    * word-freq table, symbols = chars + '</w>', per round count
    * weighted adjacent pairs, merge the (count desc, pair asc) argmax
    * greedily left-to-right.  `batch` > 1 mirrors learnMerges'
    * batched contract: top-N picks from the PRE-batch counts, applied
    * sequentially in picked order; stops early when no pair remains. */
  private def referenceBpe(texts: Seq[String], rounds: Int,
                           batch: Int = 1): Seq[(Long, String, String, Long)] = {
    val freq = scala.collection.mutable.Map[String, Long]()
    texts.foreach(_.toLowerCase.split(" ", -1).filter(_.nonEmpty)
      .foreach(w => freq(w) = freq.getOrElse(w, 0L) + 1L))
    var vocab: Map[Vector[String], Long] =
      freq.toMap.map { case (w, f) => (w.map(_.toString).toVector :+ "</w>", f) }
    def applyMerge(l: String, r: String): Unit =
      vocab = vocab.groupMapReduce { case (syms, _) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        out.result()
      }(_._2)(_ + _)
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var step = 0
    var dry = false
    while (step < rounds && !dry) {
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach(p => pairs(p) = pairs.getOrElse(p, 0L) + f)
      }
      if (pairs.isEmpty) dry = true
      else {
        val picks = pairs.toSeq
          .sortBy { case ((a, b), n) => (-n, a, b) }
          .take(math.min(batch, rounds - step))
        picks.foreach { case ((l, r), c) =>
          step += 1
          merges += ((step.toLong, l, r, c))
          applyMerge(l, r)
        }
      }
    }
    merges.result()
  }

  test("q_bpe_train matches the in-memory reference on the sf0.001 corpus") {
    import spark.implicits._
    val texts = Tables.documents(spark, sf)
      .select("text").as[String].collect().toSeq
    val want = referenceBpe(texts, 6)
    val got = Packing.qBpeTrain(spark, sf)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(got === want)
  }

  test("q_bpe_encode matches reference per-doc encoding and compresses") {
    import spark.implicits._
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val merges = referenceBpe(texts.map(_._2), 6).map(m => (m._2, m._3))
    // reference: per-word char symbols + '</w>', each merge applied
    // greedily left-to-right in learned order
    def applyMerge(syms: Vector[String], l: String, r: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    val want = texts.map { case (id, t) =>
      val words = t.toLowerCase.split(" ", -1).filter(_.nonEmpty).toVector
      val pre = words.map(_.length + 1).sum.toLong
      val post = words.map { w =>
        merges.foldLeft(w.map(_.toString).toVector :+ "</w>") {
          case (syms, (l, r)) => applyMerge(syms, l, r)
        }.length.toLong
      }.sum
      (id, pre, post, pre - post)
    }.sortBy(_._1)
    val got = Packing.qBpeEncode(spark, sf)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === want)
    // and the merges genuinely compress the corpus
    assert(got.map(_._4).sum > 0, "BPE merges saved zero symbols")
  }

  test("batched learnMerges matches the batched reference for every N; N=1 is strict Sennrich") {
    import spark.implicits._
    val texts = Tables.documents(spark, sf)
      .select("text").as[String].collect().toSeq
    for (batch <- Seq(1, 2, 3, 6)) {
      val got = Packing.learnMerges(spark, sf, batch = batch)
      assert(got === referenceBpe(texts, 6, batch), s"batch=$batch")
    }
    // N=1 must reproduce the strict sequential order exactly
    assert(Packing.learnMerges(spark, sf, batch = 1) === referenceBpe(texts, 6))
  }

  test("a batched merge table applies cleanly and compresses the corpus") {
    import spark.implicits._
    val merges = Packing.learnMerges(spark, sf, batch = 3)
    assert(merges.nonEmpty)
    val flat = merges.flatMap(m => Seq(m._2, m._3))
    val stats = Tables.documents(spark, sf)
      .select(call_function("graft_bpe_stats", col("text"),
        array(flat.map(lit): _*)).as("st"))
      .select(col("st")(0).as("pre"), col("st")(1).as("post"))
      .as[(Long, Long)].collect()
    assert(stats.forall { case (pre, post) => post <= pre })
    assert(stats.map(s => s._1 - s._2).sum > 0, "batched merges saved zero symbols")
  }

  test("learnMerges stops gracefully when no pair remains (ADVICE r10)") {
    // every word collapses to ONE symbol after the first merge — the
    // loop must emit the merges learned so far, never throw
    val tmp = java.nio.file.Files.createTempDirectory("bpe_dry").toString
    Tables.documents(spark, sf).limit(3)
      .withColumn("text", lit("a a a"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Packing.learnMerges(spark, tmp, batch = 2, rounds = 6)
    assert(got.map(m => (m._1, m._2, m._3)) === Seq((1L, "a", "</w>")))
  }

  test("q_pack_sequences plans through the keyless RankedPrefixSum operator") {
    val plan = Packing.qPackSequences(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("RankedPrefixSum"),
      "packing must use the distributed prefix-sum operator")
    assert(!plan.contains("Window "),
      "no window exec expected — the keyless window would serialize")
  }
}
