package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.queries.Audio
import graft.streaming.StreamAudioEnergy
import graft.streaming.StreamAudioEnergy.AudioEvent

/** The audio leg of the multimodal column story: WAV bytes built from
  * the public RIFF spec must decode through the JVM's own parser
  * (javax.sound.sampled — a foreign decoder for our encoder) back to
  * the exact samples; the framed-energy features must match brute
  * force; and the streaming face must be bit-identical to batch. */
class AudioSpec extends SparkSpec {

  test("WAV encode round-trips through the JVM's foreign audio decoder") {
    val rnd = new scala.util.Random(29)
    for (n <- Seq(1, 255, 256, 257, 4000)) {
      val samples = Array.fill(n)(rnd.nextInt(65536) - 32768)
      val (rate, ch, got) = Audio.decodeWav(Audio.buildWav(16000, samples))
      assert(rate === 16000 && ch === 1)
      assert(got.toSeq === samples.toSeq, s"n=$n sample mismatch")
    }
    // extremes survive the 16-bit round-trip
    val (_, _, ext) = Audio.decodeWav(Audio.buildWav(8000, Array(-32768, 32767, 0, -1)))
    assert(ext.toSeq === Seq(-32768, 32767, 0, -1))
    // non-audio bytes fail with the ctx, not a raw parser error
    val e = intercept[IllegalArgumentException] {
      Audio.decodeWav("not audio".getBytes("UTF-8"), ctx = "doc_id=3")
    }
    assert(e.getMessage.contains("doc_id=3"))
  }

  test("stereo / 24-bit / 8-bit WAV and big-endian AIFF round-trip through the SPI readers") {
    val rnd = new scala.util.Random(41)
    // 16-bit stereo: interleave survives
    val st = Array.fill(2 * 333)(rnd.nextInt(65536) - 32768)
    val (rSt, cSt, bSt, gSt) = Audio.decodePcm(Audio.buildWavPcm(22050, 2, 16, st))
    assert((rSt, cSt, bSt) === ((22050, 2, 16)))
    assert(gSt.toSeq === st.toSeq)
    // 24-bit mono: sign extension at the extremes
    val s24 = Array(-8388608, 8388607, 0, -1, 1, 65536, -65536) ++
      Array.fill(200)(rnd.nextInt(1 << 24) - (1 << 23))
    val (_, _, b24, g24) = Audio.decodePcm(Audio.buildWavPcm(8000, 1, 24, s24))
    assert(b24 === 24)
    assert(g24.toSeq === s24.toSeq)
    // 8-bit mono: the unsigned container recentres to signed
    val s8 = Array(-128, 127, 0, -1, 1) ++ Array.fill(200)(rnd.nextInt(256) - 128)
    val (_, _, b8, g8) = Audio.decodePcm(Audio.buildWavPcm(8000, 1, 8, s8))
    assert(b8 === 8)
    assert(g8.toSeq === s8.toSeq)
    // AIFF: the JVM's OTHER parser, big-endian — byte-order analog of
    // the image leg's BMP/GIF codec test
    val sa = Array(-32768, 32767, 0, -1, 256) ++ Array.fill(300)(rnd.nextInt(65536) - 32768)
    for (rate <- Seq(8000, 11025, 44100)) {
      val (rA, cA, bA, gA) = Audio.decodePcm(Audio.buildAiff(rate, sa))
      assert((rA, cA, bA) === ((rate, 1, 16)), s"rate $rate")
      assert(gA.toSeq === sa.toSeq)
    }
  }

  test("extended80 encodes integer sample rates exactly (AIFF COMM field)") {
    // decode the 80-bit float back by hand: value = mant * 2^(exp-16383-63)
    def back(b: Array[Byte]): Double = {
      val exp = ((b(0) & 0xff) << 8) | (b(1) & 0xff)
      var mant = 0L
      for (i <- 0 until 8) mant = (mant << 8) | (b(2 + i) & 0xff)
      // top bit is the explicit integer bit (mant is UNSIGNED);
      // scale = exp - 16383 - 63
      BigInt(java.lang.Long.toUnsignedString(mant)).toDouble *
        math.pow(2.0, exp - 16383 - 63)
    }
    for (r <- Seq(1, 2, 3, 8000, 11025, 22050, 44100, 48000, 96000))
      assert(back(Audio.extended80(r)) === r.toDouble, s"rate $r")
  }

  test("q_audio_mixed: five real encodings, one blind feature gate") {
    val rows = Audio.qAudioMixed(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.take(25).foreach { r =>
      val id = r.getLong(0)
      val v = id % 5
      assert(r.getString(1) === (if (v == 4) "aiff" else "wav"), s"doc $id container")
      assert(r.getLong(2) === (if (v == 2) 24L else if (v == 3) 8L else 16L))
      assert(r.getLong(3) === (if (v == 1) 2L else 1L))
      assert(r.getLong(5) === id % 1500 + 400, s"doc $id n_frames")
      // brute-force features from the generator formulas
      val n = (id % 1500 + 400).toInt
      val ch = if (v == 1) 2 else 1
      def smp(i: Int, c: Int): Long = v match {
        case 2 => Audio.sample24Formula(i, id).toLong
        case 3 => Audio.sample8Formula(i, id).toLong
        case _ => Audio.sampleFormula(i, id + c).toLong
      }
      var sumAbs = 0L; var hash = 0L
      for (i <- 0 until n; c <- 0 until ch) {
        sumAbs += math.abs(smp(i, c)); hash += smp(i, c) * (i + 1) * (c + 1)
      }
      assert(r.getLong(6) === sumAbs, s"doc $id sum_abs")
      assert(r.getLong(7) === hash, s"doc $id hash")
    }
  }

  test("q_audio_meta: header metadata parsed back by the foreign decoder") {
    val rows = Audio.qAudioMeta(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.take(20).foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === 8000 + (id % 4) * 4000, s"doc $id rate")
      assert(r.getLong(2) === 1L)
      assert(r.getLong(3) === id % 2000 + 500, s"doc $id n_samples")
      assert(r.getLong(4) === (id % 2000 + 500) * 1000 / (8000 + (id % 4) * 4000))
    }
  }

  test("q_audio_energy: framed integer energies match brute force") {
    val rows = Audio.qAudioEnergy(spark, "/root/testdata/sf0.001").collect()
    rows.take(20).foreach { r =>
      val id = r.getLong(0)
      val n = (id % 2000 + 500).toInt
      val samples = Array.tabulate(n)(i => Audio.sampleFormula(i, id))
      val frames = samples.grouped(Audio.FrameLen)
        .map(_.map(s => math.abs(s).toLong).sum).toSeq
      assert(r.getLong(1) === frames.length.toLong, s"doc $id n_frames")
      assert(r.getLong(2) === frames.sum, s"doc $id sum_abs")
      assert(r.getLong(3) === frames.max, s"doc $id peak")
      assert(r.getLong(4) === frames.zipWithIndex.map {
        case (e, f) => e * (f + 1) }.sum, s"doc $id hash")
    }
  }

  test("streamed audio energies are bit-identical to batch; audit matches; stateless") {
    import spark.implicits._
    val winUs = 60L * 1000000
    val events = (0 until 50).map { i =>
      val id = i.toLong
      val n = (id % 700 + 100).toInt
      AudioEvent(id,
        Audio.buildWav((8000 + (id % 3) * 4000).toInt,
          Array.tabulate(n)(j => Audio.sampleFormula(j, id))),
        (id % 3) * winUs + (id * 977L) % winUs)
    }
    val dir = tmpDir("audio_stream_in")
    events.toDS().repartition(3).write.mode("overwrite").parquet(dir)
    Thread.sleep(1200)
    // far-future mover: advances the watermark past every real window
    // so the append-mode audit below finalizes them
    Seq(AudioEvent(-1L, Audio.buildWav(8000, Array(0)),
      365L * 86400L * 1000000L))
      .toDS().write.mode("append").parquet(dir)

    val streamIn = spark.readStream.schema(events.toDS().schema)
      .option("maxFilesPerTrigger", 1).parquet(dir).as[AudioEvent]
    val q = StreamAudioEnergy.energies(streamIn)
      .writeStream.format("memory").queryName("audio_rows")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("audio_rows").filter(col("doc_id") >= 0)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val want = StreamAudioEnergy.energies(events.toDS())
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === want && got.size === 50)
    assert(q.lastProgress.stateOperators.isEmpty)

    // windowed audit equals the batch aggregate over the same rows
    val q2 = StreamAudioEnergy.audit(streamIn, "1 minute", "3 minutes")
      .writeStream.format("memory").queryName("audio_audit")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)
    val gotW = spark.table("audio_audit")
      .filter(col("window_start_us") < 3 * winUs)
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    val wantW = StreamAudioEnergy.energies(events.toDS())
      .groupBy(((col("ts_us") / winUs).cast("long") * winUs).as("w"))
      .agg(count(lit(1)).as("n_clips"), sum("n_frames").as("n_frames"),
        sum("sum_abs").as("sum_abs"), sum("energy_hash").as("h"))
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(gotW === wantW)
    assert(q2.lastProgress.stateOperators.length === 1)
  }
}
