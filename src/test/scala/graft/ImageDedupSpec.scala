package graft

import graft.queries.{ImageDedup, Multimodal}

/** Perceptual-hash image near-dup (P71): dHash kernel properties, the
  * cross-codec fixture pairing, and the plan shape (banded equi-join,
  * never all-pairs). */
class ImageDedupSpec extends SparkSpec {

  test("dHash64 matches a brute-force bit build on random images") {
    val rnd = new scala.util.Random(31)
    for ((w, h) <- Seq((9, 8), (24, 18), (87, 65))) {
      val pix = Array.fill(w * h)(rnd.nextInt(256))
      val pooled = Multimodal.poolGray(w, h, pix, ImageDedup.PoolW, ImageDedup.PoolH)
      var want = 0L
      for (ty <- 0 until 8; tx <- 0 until 8)
        if (pooled(ty * 9 + tx + 1) > pooled(ty * 9 + tx))
          want |= 1L << (ty * 8 + tx)
      assert(ImageDedup.dHash64(w, h, pix) === want, s"${w}x$h")
    }
  }

  test("dHash is invariant to uniform brightness shift and 1-px translation on a smooth ramp") {
    // the classic dHash robustness properties, on an image whose
    // gradients are unambiguous: a monotone diagonal ramp
    val (w, h) = (40, 32)
    def ramp(dx: Int, off: Int) =
      Array.tabulate(w * h)(i => math.min(255, (i % w + dx) * 3 + (i / w) * 2 + off))
    val base = ImageDedup.dHash64(w, h, ramp(0, 0))
    assert(java.lang.Long.bitCount(base ^ ImageDedup.dHash64(w, h, ramp(0, 7))) === 0,
      "brightness shift must not flip gradient signs")
    assert(java.lang.Long.bitCount(base ^ ImageDedup.dHash64(w, h, ramp(1, 0))) <= 2,
      "1-px translation moves at most edge-bucket bits")
  }

  test("the fixture's PNG/BMP twins land within MaxDist for most groups") {
    // the near-dup property the corpus is built on: the brightness
    // twin (re-encoded through a DIFFERENT real codec) stays within a
    // few dHash bits of its base
    var within = 0
    val groups = 0L until 200L
    groups.foreach { g =>
      val w = (g % 64 + 24).toInt
      val h = (g % 48 + 18).toInt
      val basePng = Multimodal.encodePngGray(w, h,
        Array.tabulate(w * h)(i => ImageDedup.basePix(i % w, i / w, g)))
      val twinBmp = Multimodal.encodeBmpGray(w, h,
        Array.tabulate(w * h)(i => ImageDedup.twinPix(i % w, i / w, g)))
      val (bw, bh, bp) = Multimodal.decodeGray(basePng)
      val (tw, th, tp) = Multimodal.decodeGray(twinBmp)
      val d = java.lang.Long.bitCount(
        ImageDedup.dHash64(bw, bh, bp) ^ ImageDedup.dHash64(tw, th, tp))
      if (d <= ImageDedup.MaxDist) within += 1
    }
    // not all groups need land inside (clamp distortion near 255 can
    // flip tie-adjacent gradients), but the fixture must be a real
    // near-dup corpus, not noise
    assert(within >= groups.size * 3 / 4, s"only $within/${groups.size} within")
  }

  test("q_image_dedup finds cross-codec pairs via banding, identical to brute force") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val got = queries.ImageDedup.qImageDedup(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // brute force over the SAME signature frame
    val sigs = queries.ImageDedup.dhashFrame(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val want = for {
      i <- sigs.indices
      j <- (i + 1) until sigs.length
      dist = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2)
      if dist <= ImageDedup.MaxDist
    } yield (sigs(i)._1, sigs(j)._1, dist)
    assert(got.toSeq === want.sortBy(p => (p._1, p._2)))
    // the fixture's point: pairs that cross the PNG/BMP codec boundary
    val crossCodec = got.count { case (a, b, _) => a % 2 == 0 && b % 2 == 1 }
    assert(crossCodec > 0, "no cross-codec near-dup pair found")
    // and the count form agrees with the pair form
    val counts = queries.ImageDedup.qImageDedupCount(spark, d)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val wantCounts = want.groupBy(_._3).map { case (k, v) => (k, v.size.toLong) }
    assert(counts === wantCounts)
  }

  test("the candidate plan is a banded equi-join, never all-pairs") {
    val plan = queries.ImageDedup.qImageDedup(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q_image_cluster_keep keeps the largest image per connected component") {
    val d = "/root/testdata/sf0.001"
    val got = queries.ImageDedup.qImageClusterKeep(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // brute force: pairs -> union-find -> keeper by (area desc, doc asc)
    val rows = queries.ImageDedup.dhashFrame(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pairs = for {
      i <- rows.indices
      j <- (i + 1) until rows.length
      if java.lang.Long.bitCount(rows(i)._2 ^ rows(j)._2) <= ImageDedup.MaxDist
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
    val area = rows.map(r => r._1 -> r._3).toMap
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val want = members.groupBy(find).toSeq.map { case (root, ms) =>
      val keeper = ms.minBy(m => (-area(m), m))
      (root, keeper, area(keeper))
    }.sortBy(_._1)
    assert(got.toSeq === want)
    assert(got.nonEmpty, "no multi-member image cluster at sf0.001")
    // the keep-list is the ACTION form: strictly fewer keepers than
    // clustered members (a real corpus shrink), and cluster ids are
    // the min member (the P2b label convention)
    assert(got.length < members.length)
    assert(got.forall { case (cid, k, _) => k >= cid })
  }
}
