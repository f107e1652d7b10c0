package graft

import graft.queries.{AudioDedup, ImageDedup, Pipeline}

/** P51b — the multimodal release filter: the P51 text gates joined
  * with per-modality media-dedup keep gates (VERDICT r16 item 6). */
class ReleaseFilterMediaSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("media gates drop exactly the non-keeper cluster members") {
    val rfm = Pipeline.qReleaseFilterMedia(spark, d).collect()
    // image: members of any near-dup cluster minus the keep-list
    val ipairs = ImageDedup.qImageDedup(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val imembers = ipairs.flatMap(p => Seq(p._1, p._2)).toSet
    val ikeepers = ImageDedup.qImageClusterKeep(spark, d)
      .collect().map(_.getLong(1)).toSet
    assert(rfm.filter(_.getInt(5) == 0).map(_.getLong(0)).toSet
      === imembers -- ikeepers)
    // audio, same composition
    val apairs = AudioDedup.qAudioDedup(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val amembers = apairs.flatMap(p => Seq(p._1, p._2)).toSet
    val akeepers = AudioDedup.qAudioClusterKeep(spark, d)
      .collect().map(_.getLong(1)).toSet
    assert(rfm.filter(_.getInt(6) == 0).map(_.getLong(0)).toSet
      === amembers -- akeepers)
    // the gates bite at sf0.001 (the paired fixtures guarantee
    // multi-member clusters, each contributing >= 1 non-keeper)
    assert((imembers -- ikeepers).nonEmpty)
    assert((amembers -- akeepers).nonEmpty)
  }

  test("keep is the product of all six gates; text gates match P51 row-for-row") {
    val rfm = Pipeline.qReleaseFilterMedia(spark, d).collect()
    rfm.foreach { r =>
      assert(r.getInt(7) === r.getInt(1) * r.getInt(2) * r.getInt(3)
        * r.getInt(4) * r.getInt(5) * r.getInt(6), r)
    }
    val rf = Pipeline.qReleaseFilter(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toMap
    assert(rfm.length === rf.size)
    rfm.foreach { r =>
      assert(rf(r.getLong(0)) === ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))),
        s"text gates drifted for doc ${r.getLong(0)}")
    }
    // and the media gates change real verdicts: some doc passes all
    // four text gates yet is dropped as a media duplicate
    assert(rfm.exists(r => r.getInt(1) * r.getInt(2) * r.getInt(3) * r.getInt(4) == 1
      && r.getInt(7) == 0))
  }
}
