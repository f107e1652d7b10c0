package graft

import graft.queries.{ImageDedup, Multimodal, VideoDedup}

/** Video near-dup via shared frame fingerprints (P73): the re-cut
  * fixture's pairing property, equivalence to a brute-force frame-set
  * intersection, and the plan shape (sig equi-join, never all-pairs). */
class VideoDedupSpec extends SparkSpec {

  test("a re-cut video shares exactly its even source frames' fingerprints") {
    for (g <- 0L until 200L) {
      val w = (g % 24 + 16).toInt
      val h = (g % 18 + 16).toInt
      val nf = VideoDedup.frameCount(g)
      def sigOf(f: Int): Long = {
        val png = Multimodal.encodePngGray(w, h,
          Array.tabulate(w * h)(i => VideoDedup.framePix(i % w, i / w, g, f)))
        val (dw, dh, pix) = Multimodal.decodeGray(png)
        ImageDedup.dHash64(dw, dh, pix)
      }
      val baseSigs = (0 until nf).map(sigOf).toSet
      val twinSigs = (0 until nf by 2).map(sigOf).toSet
      assert(twinSigs.subsetOf(baseSigs), s"g=$g")
      assert(twinSigs.size >= VideoDedup.MinShared,
        s"g=$g: re-cut carries ${twinSigs.size} distinct fingerprints")
    }
  }

  test("q_video_dedup equals a brute-force frame-set intersection count") {
    val d = "/root/testdata/sf0.001"
    val got = VideoDedup.qVideoDedup(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rows = VideoDedup.frameSigs(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // the stop-frame guard, replayed: drop sigs carried by > MaxSigDf videos
    val df = rows.groupBy(_._2).view.mapValues(_.size).toMap
    val byDoc = rows.filter(p => df(p._2) <= VideoDedup.MaxSigDf)
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val docs = byDoc.keys.toSeq.sorted
    val want = for {
      i <- docs.indices
      j <- (i + 1) until docs.length
      shared = (byDoc(docs(i)) & byDoc(docs(j))).size.toLong
      if shared >= VideoDedup.MinShared
    } yield (docs(i), docs(j), shared)
    assert(got.toSeq === want.sortBy(p => (p._1, p._2)))
    // every fixture pair (2g, 2g+1) must land: the re-cut construction
    // guarantees >= MinShared shared fingerprints across two containers
    val fixturePairs = got.count { case (a, b, _) => b == a + 1 && a % 2 == 0 }
    assert(fixturePairs === docs.length / 2,
      s"$fixturePairs of ${docs.length / 2} re-cut pairs found")
  }

  test("the stop-frame guard drops ubiquitous signatures, keeps discriminative ones") {
    import spark.implicits._
    // sig 999 is carried by MaxSigDf+6 videos (a "black frame"); docs
    // 0 and 1 additionally share two discriminative sigs.  Without the
    // guard the ubiquitous sig alone would emit C(70,2) pairs.
    val ubiq = (0L until (VideoDedup.MaxSigDf + 6).toLong).map(d => (d, 999L))
    val real = Seq((0L, 5L), (1L, 5L), (0L, 6L), (1L, 6L))
    val all = (ubiq ++ real).toDF("doc_id", "fsig")
    val got = VideoDedup.sharedFramePairs(all)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((0L, 1L, 2L)))
  }

  test("the pair plan is a sig equi-join, never all-pairs") {
    val plan = VideoDedup.qVideoDedup(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("the lossy twin's frames land within TolDist of their source, rarely exactly on it") {
    // the r16 fixture property: the +4-clamp perturbation moves a
    // frame's dHash a FEW bits (tolerant matching's target), and at
    // least some frames move off exact equality (else the tolerant
    // key would test nothing beyond the exact one)
    var within = 0
    var moved = 0
    var total = 0
    for (g <- 0L until 120L) {
      val w = (g % 24 + 16).toInt
      val h = (g % 18 + 16).toInt
      def sigOf(f: Int, tol: Boolean): Long = {
        val png = Multimodal.encodePngGray(w, h,
          Array.tabulate(w * h) { i =>
            if (tol) VideoDedup.framePixTol(i % w, i / w, g, f)
            else VideoDedup.framePix(i % w, i / w, g, f)
          })
        val (dw, dh, pix) = Multimodal.decodeGray(png)
        ImageDedup.dHash64(dw, dh, pix)
      }
      for (f <- 0 until VideoDedup.frameCount(g) by 2) {
        val d = java.lang.Long.bitCount(sigOf(f, tol = false) ^ sigOf(f, tol = true))
        total += 1
        if (d <= VideoDedup.TolDist) within += 1
        if (d > 0) moved += 1
      }
    }
    assert(within >= total * 3 / 4, s"only $within/$total within TolDist")
    assert(moved > 0, "no frame moved at all -- the perturbation is a no-op")
  }

  test("q_video_dedup_tol equals brute force and catches pairs exact matching misses") {
    val d = "/root/testdata/sf0.001"
    val got = VideoDedup.qVideoDedupTol(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rows = VideoDedup.frameSigs(spark, d, perturb = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // replay: df guard, then the bipartite hamming-<=TolDist match count
    val df = rows.groupBy(_._2).view.mapValues(_.size).toMap
    val byDoc = rows.filter(p => df(p._2) <= VideoDedup.MaxSigDf)
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val docs = byDoc.keys.toSeq.sorted
    def matched(a: Set[Long], b: Set[Long]): Long =
      (for (fa <- a.toSeq; fb <- b.toSeq
            if java.lang.Long.bitCount(fa ^ fb) <= VideoDedup.TolDist)
        yield 1L).sum
    val want = for {
      i <- docs.indices
      j <- (i + 1) until docs.length
      shared = matched(byDoc(docs(i)), byDoc(docs(j)))
      if shared >= VideoDedup.MinShared
    } yield (docs(i), docs(j), shared)
    assert(got.toSeq === want.sortBy(p => (p._1, p._2)))
    // the tolerant form's point: over the SAME perturbed corpus, exact
    // sig matching misses re-cut pairs the tolerant match recovers
    val exactPairs = VideoDedup
      .sharedFramePairs(VideoDedup.frameSigs(spark, d, perturb = true))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tolPairs = got.map(p => (p._1, p._2)).toSet
    val fixtureTol = tolPairs.count { case (a, b) => b == a + 1 && a % 2 == 0 }
    val fixtureExact = exactPairs.count { case (a, b) => b == a + 1 && a % 2 == 0 }
    assert(fixtureTol > fixtureExact,
      s"tolerant found $fixtureTol re-cut pairs vs exact's $fixtureExact -- " +
        "the perturbation should defeat exact matching on some pairs")
  }

  test("the tolerant plan is banded equi-joins, never all-pairs") {
    val plan = VideoDedup.qVideoDedupTol(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q_video_cluster_keep keeps the most distinct frames per connected component") {
    val d = "/root/testdata/sf0.001"
    val got = VideoDedup.qVideoClusterKeep(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // brute force: tolerant pairs -> union-find -> keeper by
    // (n_frames desc, doc asc); n_frames = distinct fingerprints
    val rows = VideoDedup.frameSigs(spark, d, perturb = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val df = rows.groupBy(_._2).view.mapValues(_.size).toMap
    val byDocAll = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val byDoc = rows.filter(p => df(p._2) <= VideoDedup.MaxSigDf)
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val docs = byDoc.keys.toSeq.sorted
    def matched(a: Set[Long], b: Set[Long]): Long =
      (for (fa <- a.toSeq; fb <- b.toSeq
            if java.lang.Long.bitCount(fa ^ fb) <= VideoDedup.TolDist)
        yield 1L).sum
    val pairs = for {
      i <- docs.indices
      j <- (i + 1) until docs.length
      if matched(byDoc(docs(i)), byDoc(docs(j))) >= VideoDedup.MinShared
    } yield (docs(i), docs(j))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val want = members.groupBy(find).toSeq.map { case (root, ms) =>
      val keeper = ms.minBy(m => (-byDocAll(m).size, m))
      (root, keeper, byDocAll(keeper).size.toLong)
    }.sortBy(_._1)
    assert(got.toSeq === want)
    assert(got.nonEmpty, "no multi-member video cluster at sf0.001")
    // the keeper criterion bites: the re-cut twin carries FEWER
    // distinct frames than its source, so in a plain (2g, 2g+1) pair
    // cluster the even source doc must win regardless of doc order
    val twoMember = want.filter { case (cid, _, _) =>
      members.count(find(_) == cid) == 2 }
    assert(twoMember.nonEmpty)
    twoMember.foreach { case (cid, keeper, _) =>
      assert(keeper % 2 == 0, s"cluster $cid kept re-cut $keeper over its source")
    }
  }

  test("clusterKeepBySet: equal frame-sets cluster by equality; the df guard counts sets, not docs") {
    import spark.implicits._
    // 70 byte-identical copies of a 2-frame video: under the r17
    // doc-level guard every sig had df = 70 > MaxSigDf = 64 -> TOTAL
    // frame loss, no cluster.  Set-level df is 2 (the copies are ONE
    // set; the richer 3-frame twin the other), so the twin pairs in
    // through the tolerant match (sigs 1,2,3 are within hamming 2 of
    // each other) and the whole group forms one cluster whose keeper
    // is the richest cut.
    val rows =
      (0L until 70L).flatMap(i => Seq(1L, 2L).map(sg => (i, sg))) ++
        Seq(1L, 2L, 3L).map(sg => (100L, sg)) ++
        // two identical 1-frame videos: below MinShared for any PAIR,
        // but identical videos are dups by definition -> equality-only
        // cluster (sig 999 is > TolDist from 1/2/3: no cross match)
        Seq((200L, 999L), (201L, 999L))
    val got = VideoDedup.clusterKeepBySet(spark, rows.toDF("doc_id", "fsig"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((0L, 100L, 3L), (200L, 200L, 1L)))
  }

  test("the frame-set hash key's collision audit refuses loudly, passes clean frames (r19)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def checked(rows: Seq[(Long, Seq[Long], Seq[Long], Long)]) = rows
      .toDF("fset_id", "fmin", "fmax", "fhash")
      .select(VideoDedup.checkedFsetId(
        col("fset_id"), col("fmin"), col("fmax"), col("fhash")).as("id"))
    // clean bucket: min(fset) == max(fset) -> the id passes through
    assert(checked(Seq((7L, Seq(1L, 2L), Seq(1L, 2L), 42L)))
      .collect().map(_.getLong(0)).toSeq === Seq(7L))
    // a bucket whose min/max arrays differ = a real 64-bit collision
    // -> evaluating the id must refuse, never silently merge clusters
    val e = intercept[Exception] {
      checked(Seq((7L, Seq(1L), Seq(1L, 2L), 42L))).collect()
    }
    assert(e.getMessage.contains("collision"), e.getMessage)
    // end-to-end: the hashed key path still answers the fixture
    // corpus (no collision on real data) with a well-formed keep-list
    val got = VideoDedup.qVideoClusterKeep(spark, "/root/testdata/sf0.001")
    assert(got.columns.toSeq === Seq("cluster_id", "keeper", "n_frames"))
    assert(got.count() > 0)
  }

  test("q_video_cluster_keep_dup: k identical uploads + one re-cut resolve to one cluster per group") {
    val d = "/root/testdata/sf0.001"
    val got = VideoDedup.qVideoClusterKeepDup(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 500 docs / DupK=100 -> 5 groups; each group's DupK-1 identical
    // copies collapse to ONE set node, the lossy re-cut joins through
    // the tolerant pair path; keeper = the group's first copy (max
    // n_frames, doc_id tiebreak), never the re-cut
    assert(got.length === 5, got.mkString(","))
    got.foreach { case (cid, keeper, nf) =>
      assert(cid % VideoDedup.DupK === 0, s"cluster_id $cid not a group head")
      assert(keeper === cid, s"group $cid kept $keeper, not its first copy")
      assert(nf >= 2)
    }
    // the set-graph never expands identical copies to pairs: the pair
    // frame under the hood is over set REPRESENTATIVES (<= 2 per
    // group), bounded by sets, not by C(k,2) docs
    val repPairs = VideoDedup.sharedFramePairsTol(
      VideoDedup.sigsOf(spark, VideoDedup.videoPayloadsDup(spark, d))
        .groupBy("doc_id")
        .agg(org.apache.spark.sql.functions.sort_array(
          org.apache.spark.sql.functions.collect_set("fsig")).as("fset"))
        .groupBy("fset")
        .agg(org.apache.spark.sql.functions.min("doc_id").as("doc_id"))
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.explode(
            org.apache.spark.sql.functions.col("fset")).as("fsig")))
      .count()
    assert(repPairs <= 5L, s"expected <= 1 representative pair per group, got $repPairs")
  }
}
