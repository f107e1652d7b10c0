package graft

import graft.queries.{Audio, AudioDedup}

/** Audio fingerprint near-dup (P72): envelope-dHash kernel properties,
  * the cross-container (WAV/AIFF) fixture pairing, and the plan shape
  * (banded equi-join, never all-pairs). */
class AudioDedupSpec extends SparkSpec {

  test("envHash64 matches a brute-force zone build on random signals") {
    val rnd = new scala.util.Random(47)
    for (n <- Seq(65, 600, 2399)) {
      val samples = Array.fill(n)(rnd.nextInt(65536) - 32768)
      val zones = new Array[Long](AudioDedup.Zones)
      for (i <- 0 until n)
        zones((i.toLong * AudioDedup.Zones / n).toInt) += math.abs(samples(i)).toLong
      var want = 0L
      for (k <- 0 until AudioDedup.Zones - 1)
        if (zones(k + 1) > zones(k)) want |= 1L << k
      assert(AudioDedup.envHash64(samples) === want, s"n=$n")
    }
  }

  test("the envelope hash is invariant to uniform gain on an unambiguous envelope") {
    // the dHash robustness property in the audio domain: scaling every
    // sample scales every zone sum together, so no gradient sign flips
    val n = 1300
    def signal(gain: Int) = Array.tabulate(n)(i => ((i % 130) - 65) * gain)
    val base = AudioDedup.envHash64(signal(3))
    assert(java.lang.Long.bitCount(base ^ AudioDedup.envHash64(signal(7))) === 0,
      "uniform gain must not flip envelope gradient signs")
  }

  test("the fixture's WAV/AIFF twins land within MaxDist for most groups") {
    // the near-dup property the corpus is built on: the DC-offset twin
    // (re-encoded through a DIFFERENT container in the OPPOSITE byte
    // order) stays within a few envelope bits of its base
    var within = 0
    var flipped = 0
    val groups = 0L until 200L
    groups.foreach { g =>
      val rate = (8000 + (g % 4) * 4000).toInt
      val n = (g % 1800 + 600).toInt
      val wav = Audio.buildWav(rate, Array.tabulate(n)(AudioDedup.baseSample(_, g)))
      val aiff = Audio.buildAiff(rate, Array.tabulate(n)(AudioDedup.twinSample(_, g)))
      val (_, _, _, bs) = Audio.decodePcm(wav)
      val (_, _, _, ts) = Audio.decodePcm(aiff)
      val d = java.lang.Long.bitCount(
        AudioDedup.envHash64(bs) ^ AudioDedup.envHash64(ts))
      if (d <= AudioDedup.MaxDist) within += 1
      if (d > 0) flipped += 1
    }
    // not all groups need land inside (|s| folding near 0 and the
    // 32767 clamp perturb tie-adjacent zone sums), but the fixture
    // must be a real near-dup corpus, not noise ...
    assert(within >= groups.size * 3 / 4, s"only $within/${groups.size} within")
    // ... and the distance spectrum must be non-trivial (the offset is
    // sized to flip a bit somewhere, or the hamming verify never runs
    // off the dist-0 fast path)
    assert(flipped > 0, "every twin at dist 0 — TwinOffset too small to matter")
  }

  test("q_audio_dedup finds cross-container pairs via banding, identical to brute force") {
    val d = "/root/testdata/sf0.001"
    val got = AudioDedup.qAudioDedup(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // brute force over the SAME signature frame
    val sigs = AudioDedup.sigFrame(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val want = for {
      i <- sigs.indices
      j <- (i + 1) until sigs.length
      dist = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2)
      if dist <= AudioDedup.MaxDist
    } yield (sigs(i)._1, sigs(j)._1, dist)
    assert(got.toSeq === want.sortBy(p => (p._1, p._2)))
    // the fixture's point: pairs that cross the WAV/AIFF boundary
    val crossContainer = got.count { case (a, b, _) => a % 2 == 0 && b % 2 == 1 }
    assert(crossContainer > 0, "no cross-container near-dup pair found")
    // and the count form agrees with the pair form
    val counts = AudioDedup.qAudioDedupCount(spark, d)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val wantCounts = want.groupBy(_._3).map { case (k, v) => (k, v.size.toLong) }
    assert(counts === wantCounts)
  }

  test("the candidate plan is a banded equi-join, never all-pairs") {
    val plan = AudioDedup.qAudioDedup(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q_audio_cluster_keep keeps the longest recording per connected component") {
    val d = "/root/testdata/sf0.001"
    val got = AudioDedup.qAudioClusterKeep(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // brute force: pairs -> union-find -> keeper by (n_samples desc, doc asc)
    val rows = AudioDedup.sigFrame(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pairs = for {
      i <- rows.indices
      j <- (i + 1) until rows.length
      if java.lang.Long.bitCount(rows(i)._2 ^ rows(j)._2) <= AudioDedup.MaxDist
    } yield (rows(i)._1, rows(j)._1)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val len = rows.map(r => r._1 -> r._3).toMap
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val want = members.groupBy(find).toSeq.map { case (root, ms) =>
      val keeper = ms.minBy(m => (-len(m), m))
      (root, keeper, len(keeper))
    }.sortBy(_._1)
    assert(got.toSeq === want)
    assert(got.nonEmpty, "no multi-member audio cluster at sf0.001")
    assert(got.length < members.length)
    assert(got.forall { case (cid, k, _) => k >= cid })
  }
}
