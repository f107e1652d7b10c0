package graft.sources

import java.io.{BufferedInputStream, BufferedReader, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{SamHeader, SamRecord, SamRef}

/** SAM text source/sink (S1, S2, S15).
  *
  * Read: Spark's own splittable text scan (predicate pushdown + whole
  * stage codegen preserved) + a native SQL-expression parser — no
  * UDFs, no per-record JVM lambdas (field semantics per
  * SAMRecordReader.java; header reading per util/SAMHeaderReader.java).
  *
  * Write: partition shards (header-less) + driver-side merge that
  * prepends one header — the SAMFileMerger.java:32 shape.
  */
object Sam {

  /** Header text read driver-side (headers are KBs; records are TBs). */
  def readHeader(path: String): SamHeader = {
    val (fs, p) = Fs.get(path)
    val _ = (fs, p)
    val in = new BufferedReader(new InputStreamReader(
      RangedText.openDecoded(path), UTF_8))
    try {
      val sb = new StringBuilder
      var line = in.readLine()
      while (line != null && line.startsWith("@")) {
        if (sb.nonEmpty) sb.append('\n')
        sb.append(line)
        line = in.readLine()
      }
      parseHeader(sb.toString)
    } finally in.close()
  }

  def parseHeader(text: String): SamHeader = {
    val refs = text.split("\n").filter(_.startsWith("@SQ")).flatMap { l =>
      val fields = l.split("\t")
      for {
        sn <- fields.find(_.startsWith("SN:")).map(_.drop(3))
        ln <- fields.find(_.startsWith("LN:")).map(_.drop(3).toInt)
      } yield SamRef(sn, ln)
    }
    SamHeader(text, refs)
  }

  /** Records as a typed Dataset; the parse is pure Catalyst
    * expressions over the splittable text scan.  BGZF-compressed SAM
    * (.sam.bgz — S14) rides the graft ranged-BGZF line reader with the
    * same expression parse. */
  def read(spark: SparkSession, path: String): Dataset[SamRecord] = {
    import spark.implicits._
    val lines: org.apache.spark.sql.DataFrame =
      RangedText.compression(path) match {
        case RangedText.PlainText => spark.read.textFile(path).toDF("value")
        // BGZF splits at block bounds; plain gzip decodes as one
        // whole-file range (the BGZFEnhancedGzipCodec fallback)
        case _ => RangedText.lines(spark, path).map(_.text).toDF("value")
      }
    parseLines(lines).as[SamRecord]
  }

  /** Parse SAM record lines out of a text DataFrame (header filtered). */
  def parseLines(lines: DataFrame): DataFrame =
    lines.filter(!col("value").startsWith("@") && length(col("value")) > 0)
      .select(expr("split(value, '\t')").as("p"))
      .select(
        expr("element_at(p, 1)").as("qname"),
        expr("CAST(element_at(p, 2) AS INT)").as("flag"),
        expr("element_at(p, 3)").as("rname"),
        expr("CAST(element_at(p, 4) AS INT)").as("pos"),
        expr("CAST(element_at(p, 5) AS INT)").as("mapq"),
        expr("element_at(p, 6)").as("cigar"),
        expr("element_at(p, 7)").as("rnext"),
        expr("CAST(element_at(p, 8) AS INT)").as("pnext"),
        expr("CAST(element_at(p, 9) AS INT)").as("tlen"),
        expr("element_at(p, 10)").as("seq"),
        expr("element_at(p, 11)").as("qual"),
        expr("CASE WHEN size(p) > 11 THEN slice(p, 12, size(p) - 11) " +
          "ELSE CAST(array() AS ARRAY<STRING>) END").as("tags"))

  /** Format records back to SAM lines (inverse expression chain). */
  def formatLines(ds: Dataset[SamRecord]): DataFrame =
    ds.toDF()
      .withColumn("_base", expr(
        "concat_ws('\t', qname, CAST(flag AS STRING), rname, " +
          "CAST(pos AS STRING), CAST(mapq AS STRING), cigar, rnext, " +
          "CAST(pnext AS STRING), CAST(tlen AS STRING), seq, qual)"))
      .select(expr("CASE WHEN size(tags) = 0 THEN _base " +
        "ELSE concat(_base, '\t', array_join(tags, '\t')) END").as("value"))

  /** Write as header-less text shards under `dir`. */
  def writeShards(ds: Dataset[SamRecord], dir: String): Unit =
    formatLines(ds).write.mode("overwrite").text(dir)

  /** Merge text shards into one .sam with a single header
    * (ref: util/SAMFileMerger.java). */
  def mergeShards(shardDir: String, out: String, header: SamHeader): Unit = {
    val (fs, dir) = Fs.get(shardDir)
    val (_, outPath) = Fs.get(out)
    val parts = fs.listStatus(dir).map(_.getPath)
      .filter(p => p.getName.startsWith("part-")).sortBy(_.getName)
    val w = new OutputStreamWriter(fs.create(outPath, true), UTF_8)
    try {
      if (header.text.nonEmpty) { w.write(header.text); w.write('\n') }
      parts.foreach { p =>
        val in = new BufferedReader(new InputStreamReader(fs.open(p), UTF_8))
        var line = in.readLine()
        while (line != null) {
          w.write(line); w.write('\n')
          line = in.readLine()
        }
        in.close()
      }
    } finally w.close()
  }

  /** Write records as-is (partition order preserved, no sort; the
    * reference's KeyIgnoringSAMRecordWriter shape): parallel text
    * shards + single-header merge. */
  def write(ds: Dataset[SamRecord], header: SamHeader, out: String): Unit = {
    val tmp = out + ".shards"
    writeShards(ds, tmp)
    mergeShards(tmp, out, header)
    val (fs, t) = Fs.get(tmp)
    fs.delete(t, true)
  }

  /** One-call sorted write: coordinate-sort (range partition — no
    * single-reducer funnel), write shards, merge with a header
    * rewritten to SO:coordinate (ref: util/GetSortedBAMHeader.java). */
  def writeSorted(ds: Dataset[SamRecord], header: SamHeader, out: String): Unit = {
    val spark = ds.sparkSession
    val refOrder = header.refs.map(_.name).zipWithIndex.toMap
    import org.apache.spark.sql.functions.typedLit
    val orderMap = typedLit(refOrder)
    val sorted = ds.toDF()
      .withColumn("_refIdx", coalesce(orderMap(col("rname")), lit(Int.MaxValue)))
      .repartitionByRange(col("_refIdx"), col("pos"))
      .sortWithinPartitions(col("_refIdx"), col("pos"))
      .drop("_refIdx")
    import spark.implicits._
    write(sorted.as[SamRecord], header.asCoordinateSorted, out)
  }
}
