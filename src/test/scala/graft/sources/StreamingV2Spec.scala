package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Streaming face of the DSv2 text formats: `spark.readStream
  * .format("fastq").load(dir)` tails an append-only directory, each
  * micro-batch covering exactly the newly landed files, with offsets
  * that survive a checkpointed restart.
  */
class StreamingV2Spec extends SparkSpec {

  private def fastqRecord(i: Int): String =
    s"@read$i run:1:lane:2:3:$i:${i * 2}\nACGTACGT\n+\nIIIIIIII\n"

  private def writeFile(dir: String, name: String, records: Range): Unit = {
    val body = records.map(fastqRecord).mkString
    Files.write(Paths.get(dir, name), body.getBytes("UTF-8"))
  }

  test("fastq micro-batch stream reads files as they land, incrementally") {
    val dir = tmpDir("fq_stream")
    val ckpt = tmpDir("fq_ckpt")
    val out = tmpDir("fq_out")
    writeFile(dir, "part-00000.fastq", 0 until 40)
    writeFile(dir, "part-00001.fastq", 40 until 70)

    // parquet sink: fault-tolerant, so AvailableNow + the same
    // checkpoint resumes from the committed offset on each restart
    def runOnce(): Long = {
      val q = spark.readStream.format("fastq").load(dir)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      spark.read.parquet(out).count()
    }

    // first run drains both existing files
    assert(runOnce() === 70L)

    // a new file lands; the checkpointed restart appends ONLY it
    writeFile(dir, "part-00002.fastq", 70 until 95)
    assert(runOnce() === 95L)

    // nothing new: restart appends nothing
    assert(runOnce() === 95L)

    // a late file whose name sorts BEFORE committed ones lands while
    // the stream is down — the persisted file log (not listing order)
    // defines offsets, so it must still be read exactly once
    writeFile(dir, "a-late.fastq", 95 until 105)
    assert(runOnce() === 105L)
    assert(runOnce() === 105L)
  }

  test("bam micro-batch stream tails a directory of alignment shards") {
    import spark.implicits._
    import graft.model.{SamHeader, SamRecord, SamRef}
    val header = SamHeader(
      "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:100000",
      Array(SamRef("chr1", 100000)))
    def rec(i: Int) = SamRecord(s"r$i", 0, "chr1", 1 + i, 60, "10M", "*", 0, 0,
      "ACGTACGTAC", "IIIIIIIIII", Array.empty)
    val dir = tmpDir("bam_stream")
    val ckpt = tmpDir("bam_ckpt")
    val out = tmpDir("bam_out")
    def writeShard(name: String, range: Range): Unit =
      BamIO.writeSorted(spark.createDataset(range.map(rec)).coalesce(1),
        header, s"$dir/$name")
    writeShard("shard-000.bam", 0 until 30)

    def runOnce(): Long = {
      val q = spark.readStream.format("bam").load(dir)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      spark.read.parquet(out).count()
    }

    assert(runOnce() === 30L)
    writeShard("shard-001.bam", 30 until 50)
    assert(runOnce() === 50L)
    assert(runOnce() === 50L)
  }

  test("streamed rows carry the same parsed fields as the batch reader") {
    val dir = tmpDir("fq_stream_eq")
    writeFile(dir, "part-00000.fastq", 0 until 25)
    val q = spark.readStream.format("fastq").load(dir)
      .writeStream.format("memory").queryName("fq_eq_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("fq_eq_out")
    val batch = spark.read.format("fastq").load(s"$dir/part-00000.fastq")
    assert(streamed.schema === batch.schema)
    val key = streamed.columns.head
    assert(streamed.orderBy(key).collect().toSeq ===
      batch.orderBy(key).collect().toSeq)
  }
}
