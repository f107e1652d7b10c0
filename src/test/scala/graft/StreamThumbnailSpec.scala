package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.queries.Multimodal
import graft.streaming.StreamThumbnail
import graft.streaming.StreamThumbnail.MediaEvent

/** The streaming pixel path must be bit-identical to the batch one:
  * per-image checksum rows equal `q_thumbnail`'s construction on the
  * same payloads, and the per-window audit equals the batch aggregate
  * over that window's rows — with real PNG payloads decoding through
  * ImageIO inside micro-batches that split windows, and a plan pin
  * that the decode runs stateless (exactly ONE stateful aggregate in
  * the audit plan, none in the per-image face).
  */
class StreamThumbnailSpec extends SparkSpec {

  private val winUs = 60L * 1000000

  private def mkEvents: Seq[MediaEvent] = (0 until 120).map { i =>
    val id = i.toLong
    val w = (id % 37 + 9).toInt
    val h = (id % 23 + 7).toInt
    MediaEvent(id, Multimodal.encodePngGray(w, h,
      Array.tabulate(w * h)(p => Multimodal.pixFormula(p % w, p / w, id, 0))),
      (id % 3) * winUs + (id * 997L) % winUs)
  }

  test("streamed per-image checksums and per-window audit match batch exactly") {
    import spark.implicits._
    val events = mkEvents
    val dir = tmpDir("thumb_stream_in")
    events.toDS().repartition(3).write.mode("overwrite").parquet(dir)
    Thread.sleep(1200)
    Seq(MediaEvent(-1L, Multimodal.encodePngGray(1, 1, Array(0)),
      365L * 86400L * 1000000L))
      .toDS().write.mode("append").parquet(dir)

    val streamIn = spark.readStream.schema(events.toDS().schema)
      .option("maxFilesPerTrigger", 1).parquet(dir).as[MediaEvent]
    val q = StreamThumbnail.audit(streamIn, "1 minute",
        watermarkDelay = "3 minutes")
      .writeStream.format("memory").queryName("thumb_audit")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    // per-window audit vs the batch aggregate over the same rows
    val got = spark.table("thumb_audit")
      .filter(col("window_start_us") < 3 * winUs)
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    val want = StreamThumbnail.thumbs(events.toDS())
      .groupBy(((col("ts_us") / winUs).cast("long") * winUs).as("window_start_us"))
      .agg(count(lit(1)).as("n_imgs"),
        sum(col("width") * col("height")).as("px_in"),
        sum(col("thumb_w") * col("thumb_h")).as("px_out"),
        sum(col("pix_hash")).as("sum_pix_hash"))
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(got === want)
    assert(got.size === 3 && got.map(_._2).sum === 120L)

    // per-image face equals q_thumbnail's exact construction
    val perImage = StreamThumbnail.thumbs(events.toDS())
      .select("doc_id", "width", "height", "thumb_w", "thumb_h",
        "pix_sum", "pix_hash")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    perImage.foreach { case (id, w, h, tw, th, sum, hash) =>
      val pix = Array.tabulate((w * h).toInt)(p =>
        Multimodal.pixFormula((p % w).toInt, (p / w).toInt, id, 0))
      val pooled = Multimodal.poolGray(w.toInt, h.toInt, pix, tw.toInt, th.toInt)
      assert(sum === pooled.map(_.toLong).sum, s"doc $id")
      assert(hash === pooled.zipWithIndex.map { case (v, i) =>
        v.toLong * (i + 1) }.sum, s"doc $id")
    }

    // state story pinned: decode is stateless — exactly one stateful
    // aggregate in the audit plan
    val progress = q.lastProgress
    assert(progress.stateOperators.length === 1,
      progress.stateOperators.map(_.operatorName).mkString(","))
  }

  test("streamed RGB thumbnails are bit-identical to the batch color kernel") {
    import spark.implicits._
    val events = (0 until 60).map { i =>
      val id = i.toLong
      val w = (id % 29 + 10).toInt
      val h = (id % 19 + 8).toInt
      MediaEvent(id, Multimodal.encodePngRgb(w, h, Array.tabulate(w * h) { p =>
        val (x, y) = (p % w, p / w)
        (Multimodal.pixFormula(x, y, id, 0) << 16) |
          (Multimodal.pixFormula(x, y, id, 1) << 8) |
          Multimodal.pixFormula(x, y, id, 2)
      }), id * 1000L)
    }
    val dir = tmpDir("thumb_rgb_stream_in")
    events.toDS().repartition(3).write.mode("overwrite").parquet(dir)

    val streamIn = spark.readStream.schema(events.toDS().schema)
      .option("maxFilesPerTrigger", 1).parquet(dir).as[MediaEvent]
    val q = StreamThumbnail.thumbsRgb(streamIn)
      .writeStream.format("memory").queryName("thumb_rgb")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("thumb_rgb")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    val want = StreamThumbnail.thumbsRgb(events.toDS())
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got === want && got.size === 60)
    // and the batch face equals the q_thumbnail_rgb construction
    got.foreach { case (id, w, h, tw, th, sr, sg, sb, hash, _) =>
      val rgb = Array.tabulate((w * h).toInt) { p =>
        val (x, y) = ((p % w).toInt, (p / w).toInt)
        (Multimodal.pixFormula(x, y, id, 0) << 16) |
          (Multimodal.pixFormula(x, y, id, 1) << 8) |
          Multimodal.pixFormula(x, y, id, 2)
      }
      val pooled = Multimodal.poolRgb(w.toInt, h.toInt, rgb, tw.toInt, th.toInt)
      assert(sr === pooled.map(v => ((v >>> 16) & 0xff).toLong).sum, s"doc $id")
      assert(sg === pooled.map(v => ((v >>> 8) & 0xff).toLong).sum, s"doc $id")
      assert(sb === pooled.map(v => (v & 0xff).toLong).sum, s"doc $id")
      assert(hash === pooled.zipWithIndex.map { case (v, i) =>
        v.toLong * (i + 1) }.sum, s"doc $id")
    }
    // stateless: no stateful operator in the per-image plan
    assert(q.lastProgress.stateOperators.isEmpty)
  }
}
