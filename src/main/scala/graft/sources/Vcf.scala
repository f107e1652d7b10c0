package graft.sources

import java.io.{BufferedInputStream, BufferedReader, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.VcfVariant

/** VCF text source/sink (S9, S10; ref: VCFInputFormat.java,
  * VCFRecordReader.java, util/VCFHeaderReader.java,
  * util/VCFFileMerger.java).  Plain and BGZF-compressed (.vcf.bgz)
  * files both ride [[RangedText]] — the BGZF path is the S14
  * "splittable codec for any text" case.
  */
object Vcf {

  final case class VcfHeader(lines: Seq[String]) {
    def samples: Seq[String] = {
      lines.lastOption.filter(_.startsWith("#CHROM")).toSeq
        .flatMap(_.split("\t").drop(9))
    }
    def infoTypes: Map[String, String] =
      lines.filter(_.startsWith("##INFO=")).flatMap { l =>
        for {
          id <- "ID=([^,>]+)".r.findFirstMatchIn(l).map(_.group(1))
          ty <- "Type=([^,>]+)".r.findFirstMatchIn(l).map(_.group(1))
        } yield id -> ty
      }.toMap
    def text: String = lines.mkString("\n")
  }

  def readHeader(path: String): VcfHeader = {
    val (fs, p) = Fs.get(path)
    val in = new BufferedReader(new InputStreamReader(
      if (RangedText.isBgzf(path)) new Bgzf.BgzfInputStream(new BufferedInputStream(fs.open(p)))
      else new BufferedInputStream(fs.open(p)), UTF_8))
    try {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var line = in.readLine()
      while (line != null && line.startsWith("#")) {
        out += line
        line = in.readLine()
      }
      VcfHeader(out.toSeq)
    } finally in.close()
  }

  /** Parse one record line (8+ tab fields).  INFO decomposes into
    * parallel key/value arrays (flag keys get value "");
    * genotype columns stay raw with the FORMAT key list — lazy decode
    * like LazyVCFGenotypesContext.java. */
  def parseLine(l: String): VcfVariant = {
    val f = l.split("\t", -1)
    val info = f(7)
    val (ik, iv) =
      if (info == "." || info.isEmpty) (Array.empty[String], Array.empty[String])
      else {
        val pairs = info.split(";").map { kv =>
          val i = kv.indexOf('=')
          if (i < 0) (kv, "") else (kv.substring(0, i), kv.substring(i + 1))
        }
        (pairs.map(_._1), pairs.map(_._2))
      }
    VcfVariant(
      chrom = f(0),
      pos = f(1).toLong,
      id = f(2),
      ref = f(3),
      alt = if (f(4) == ".") Array.empty else f(4).split(","),
      qual = if (f(5) == ".") None else Some(f(5).toDouble),
      filter = f(6),
      infoKeys = ik,
      infoValues = iv,
      format = if (f.length > 8 && f(8) != ".") f(8).split(":") else Array.empty,
      genotypes = if (f.length > 9) f.drop(9) else Array.empty)
  }

  def formatLine(v: VcfVariant): String = {
    val info =
      if (v.infoKeys.isEmpty) "."
      else v.infoKeys.zip(v.infoValues).map { case (k, vv) =>
        if (vv.isEmpty) k else s"$k=$vv"
      }.mkString(";")
    val base = Seq(
      v.chrom, v.pos.toString, v.id, v.ref,
      if (v.alt.isEmpty) "." else v.alt.mkString(","),
      v.qual.map(q => if (q == q.floor && !q.isInfinite) q.toLong.toString else q.toString).getOrElse("."),
      v.filter, info)
    val tail =
      if (v.format.isEmpty && v.genotypes.isEmpty) Seq.empty
      else Seq(if (v.format.isEmpty) "." else v.format.mkString(":")) ++ v.genotypes
    (base ++ tail).mkString("\t")
  }

  /** Distributed read (plain or BGZF). */
  def read(spark: SparkSession, path: String,
           splitSize: Long = 64L * 1024 * 1024): Dataset[VcfVariant] = {
    import spark.implicits._
    RangedText.lines(spark, path, splitSize)
      .filter(l => l.text.nonEmpty && !l.text.startsWith("#"))
      .map(l => parseLine(l.text))
      .toDS()
  }

  /** Write a BGZF-compressed VCF (.vcf.bgz) with terminator — the
    * splittable compressed form our own ranged reader (and tabix-era
    * tooling) consumes. */
  def writeBgzf(ds: Dataset[VcfVariant], header: VcfHeader, out: String): Unit = {
    import ds.sparkSession.implicits._
    val tmp = out + ".shards"
    ds.map(formatLine).write.mode("overwrite").text(tmp)
    val (fs, dir) = Fs.get(tmp)
    val (_, outPath) = Fs.get(out)
    val bg = new Bgzf.BgzfOutputStream(fs.create(outPath, true))
    try {
      if (header.lines.nonEmpty) bg.write((header.text + "\n").getBytes(UTF_8))
      Fs.concatParts(fs, dir, bg)
    } finally bg.close() // BgzfOutputStream close appends the EOF terminator
    fs.delete(dir, true)
  }

  /** Write shards then merge into one .vcf with a single header
    * (ref: util/VCFFileMerger.java). */
  def write(ds: Dataset[VcfVariant], header: VcfHeader, out: String): Unit = {
    import ds.sparkSession.implicits._
    val tmp = out + ".shards"
    ds.map(formatLine).write.mode("overwrite").text(tmp)
    val (fs, dir) = Fs.get(tmp)
    val (_, outPath) = Fs.get(out)
    val w = fs.create(outPath, true)
    try {
      if (header.lines.nonEmpty) w.write((header.text + "\n").getBytes(UTF_8))
      Fs.concatParts(fs, dir, w)
    } finally w.close()
    fs.delete(dir, true)
  }
}
