package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.queries.{Corpus, CorpusStats, Pipeline, Quality}

/** P52–P55: the banded hamming join and the Bloom-prefiltered
  * decontamination must be BIT-IDENTICAL to the exact forms they
  * accelerate (pigeonhole coverage / no-false-negative inserts make
  * both lossless); redaction and quality rules are pinned by
  * invariants the oracle can't see (no residual matches, rule
  * composition). */
class QualitySpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  test("q_simhash_hamming ≡ exact all-pairs hamming filter") {
    val sigs = Pipeline.simhashFrame(spark, sf)
    val naive = sigs.as("a").join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("graft_hamming64(a.simhash, b.simhash)").as("dist"))
      .filter(col("dist") <= 2)
      .orderBy("doc_a", "doc_b")
      .collect().toSeq
    val got = Quality.qSimhashHamming(spark, sf).collect().toSeq
    assert(got == naive)
    assert(naive.nonEmpty) // the corpus must actually exercise the path
    // and the distance spectrum isn't degenerate (not only exact dups)
    assert(got.exists(_.getInt(2) == 0) && got.exists(_.getInt(2) > 0))
  }

  test("q_simhash_hamming_count ≡ groupBy-dist of the pair list, no pair rows") {
    val fromPairs = Quality.qSimhashHamming(spark, sf)
      .groupBy("dist").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val got = Quality.qSimhashHammingCount(spark, sf)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == fromPairs)
    assert(got.getOrElse(0, 0L) > 0 && got.keys.exists(_ > 0))
  }

  test("q_decontaminate_bloom ≡ exact q_decontaminate") {
    val exact = Corpus.qDecontaminate(spark, sf).collect().toSeq
    val bloom = Quality.qDecontaminateBloom(spark, sf).collect().toSeq
    assert(bloom == exact)
    assert(exact.nonEmpty)
  }

  test("bloom filter: inserted keys always probe true; non-keys reject") {
    val keys = Array.tabulate(5000)(i => GraftFunctions.hash64(s"key$i".getBytes))
    val bits = GraftFunctions.bloomBuild(keys, 20)
    keys.foreach(k => assert(GraftFunctions.bloomContains(k, bits)))
    // 2^20 bits / 5k keys ⇒ FP odds ~(3·5000·3/2^20)³ ≈ 1e-4 per probe
    // set; this fixed non-key sample is deterministic, so no flake
    val nonKeys = Array.tabulate(2000)(i => GraftFunctions.hash64(s"other$i".getBytes))
    val fps = nonKeys.count(k => GraftFunctions.bloomContains(k, bits))
    assert(fps <= 2, s"implausible FP count: $fps")
  }

  test("bloom expression matches the scala helper through SQL") {
    import spark.implicits._
    val keys = Array(1L, -7L, 42L, Long.MinValue, Long.MaxValue)
    val bits = GraftFunctions.bloomBuild(keys, 10)
    val probe = (keys ++ Array(2L, 99L, -1L)).toSeq.toDF("h")
      .withColumn("c", call_function("graft_bloom_contains", col("h"), lit(bits)))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    (keys ++ Array(2L, 99L, -1L)).foreach { k =>
      assert(probe(k) == GraftFunctions.bloomContains(k, bits), s"key $k")
    }
    keys.foreach(k => assert(probe(k)))
  }

  test("q_pii_redact leaves no residual PII matches and counts them all") {
    val red = Quality.qPiiRedact(spark, sf)
    // residual scan with the SAME patterns over the redacted text
    val residual = CorpusStats.piiCounts(red, "red")
      .filter(col("emails") + col("phones") + col("ips") > 0)
      .count()
    assert(residual == 0L, s"$residual docs still match PII patterns")
    val rows = red.collect()
    assert(rows.exists(_.getLong(2) > 0) && rows.exists(_.getLong(2) == 0))
    // every doc with redactions carries a placeholder, and vice versa
    rows.foreach { r =>
      val hasPh = Seq("[EMAIL]", "[PHONE]", "[IP]").exists(r.getString(1).contains)
      assert(hasPh == (r.getLong(2) > 0), s"doc ${r.getLong(0)}")
    }
  }

  test("q_gopher_rules: keep is the conjunction and every rule discriminates") {
    val rows = Quality.qGopherRules(spark, sf).collect()
    rows.foreach { r =>
      val rules = (2 to 6).map(r.getBoolean)
      assert(r.getBoolean(7) == rules.forall(identity), s"doc ${r.getLong(0)}")
    }
    (2 to 7).foreach { i =>
      assert(rows.exists(_.getBoolean(i)) && rows.exists(!_.getBoolean(i)),
        s"column $i is degenerate")
    }
  }

  test("q_quantize_embed: codes saturate the int8 range, error ≤ half-step") {
    val sq = spark
    import sq.implicits._
    val stats = Tables.embeddings(spark, sf)
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("dim").agg(min("v").as("lo"), max("v").as("hi"))
      .as[(Int, Float, Float)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val rows = Quality.qQuantizeEmbed(spark, sf).collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      val (dim, cmin, cmax) = (r.getInt(0), r.getInt(2), r.getInt(3))
      // min/max of every dim map to the range ends by construction
      assert(cmin == -128 && cmax == 127, s"dim $dim: [$cmin, $cmax]")
      // |v - dequant(v)| ≤ half a quantization step (+1 µu rounding slack)
      val (lo, hi) = stats(dim)
      val halfStepU = ((hi - lo).toDouble / 255.0 / 2.0 * 1e6).ceil.toLong + 1
      assert(r.getLong(5) <= halfStepU, s"dim $dim: max_err ${r.getLong(5)} > $halfStepU")
    }
  }

  test("entropy kernel: known values, codepoint semantics, profile discriminates") {
    import spark.implicits._
    val got = Seq("aaaa", "ab", "abcd", "漢漢字字", "")
      .toDF("text").selectExpr("graft_entropy_mb(text)")
      .as[Long].collect().toSeq
    // H("aaaa")=0, H("ab")=1 bit, H("abcd")=2 bits, H(2×2 cps)=1 bit
    assert(got == Seq(0L, 1000L, 2000L, 1000L, 0L))
    val prof = Quality.qCharEntropy(spark, sf).collect()
    assert(prof.nonEmpty)
    // the low-entropy bucket must split real docs, not be degenerate
    val low = prof.map(_.getLong(5)).sum
    val n = prof.map(_.getLong(1)).sum
    assert(low > 0 && low < n, s"low=$low of $n")
  }

  test("bloom property: no false negatives over seeded random key sets") {
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { trial =>
      val keys = Array.fill(1000)(rnd.nextLong())
      val bits = GraftFunctions.bloomBuild(keys, 17)
      keys.foreach(k => assert(GraftFunctions.bloomContains(k, bits), s"trial $trial"))
      // fill ratio sanity: k·n probes can set at most k·n of 2^17 bits
      val set = bits.map(b => java.lang.Integer.bitCount(b & 0xff)).sum
      assert(set > 0 && set <= 3000, s"trial $trial set $set")
    }
  }

  test("entropy property: bounds 0 ≤ H ≤ log2(distinct codepoints)") {
    val rnd = new scala.util.Random(11)
    (1 to 20).foreach { _ =>
      val alpha = 1 + rnd.nextInt(40)
      val s = Array.fill(5 + rnd.nextInt(400))(('a' + rnd.nextInt(alpha)).toChar).mkString
      val h = GraftFunctions.entropyMb(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      val distinct = s.distinct.length
      val hi = math.floor(1000.0 * math.log(distinct.toDouble) / math.log(2.0) + 0.5).toLong
      assert(h >= 0L && h <= hi, s"H=$h hi=$hi for '$s'")
    }
  }

  test("q_quantize_embed broadcasts the dim stats, keeps partial agg") {
    val plan = Quality.qQuantizeEmbed(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("partial_"), plan)
  }

  test("hamming join plans as an equi-join on (band, bits), no cartesian") {
    val plan = Quality.qSimhashHamming(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), plan)
  }

  test("bloom decontaminate prefilters at the scan and broadcasts the eval join") {
    val df = Quality.qDecontaminateBloom(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_contains"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), s"train shingles must not shuffle-join:\n$plan")
  }
}
