package graft.sources

import java.io.BufferedInputStream

/** Format autodetection by magic bytes + extension (S13;
  * ref: AnySAMInputFormat.java, SAMFormat.java, VCFFormat.java —
  * magic sniffing wins over extension, extension breaks ties).
  */
object GraftIO {

  sealed trait Format
  case object BamFormat extends Format
  case object SamFormat extends Format
  case object CramFormat extends Format
  case object VcfFormat extends Format
  case object BcfFormat extends Format
  case object FastqFormat extends Format
  case object QseqFormat extends Format
  case object FastaFormat extends Format
  case object UnknownFormat extends Format

  def detect(path: String): Format = {
    // a BGZF member can span up to 64 KiB compressed; read enough that
    // the peek-inside path below has one whole block to inflate
    val head = readHead(path, (1 << 16) + 4096)
    detectBytes(head, path)
  }

  /** Read alignments whatever the container — SAM text (plain or
    * BGZF), BAM, or graft-profile CRAM — like the reference's
    * AnySAMInputFormat. */
  def readAlignments(spark: org.apache.spark.sql.SparkSession, path: String):
      org.apache.spark.sql.Dataset[graft.model.SamRecord] = detect(path) match {
    case BamFormat => BamIO.read(spark, path)
    case SamFormat => Sam.read(spark, path)
    case CramFormat => CramIO.read(spark, path)
    case other => throw new IllegalArgumentException(
      s"$path: not an alignment container (detected $other)")
  }

  /** Header for any alignment container. */
  def readAlignmentHeader(path: String): graft.model.SamHeader = detect(path) match {
    case BamFormat => BamIO.readHeader(path)
    case SamFormat => Sam.readHeader(path)
    case CramFormat => CramIO.readHeader(path)
    case other => throw new IllegalArgumentException(s"$path: detected $other")
  }

  /** Read variants whatever the container — VCF text (plain or BGZF)
    * or BCF2 — like the reference's VCFInputFormat, which sniffs
    * VCFFormat vs BCF by magic. */
  def readVariants(spark: org.apache.spark.sql.SparkSession, path: String):
      org.apache.spark.sql.Dataset[graft.model.VcfVariant] = detect(path) match {
    case VcfFormat => Vcf.read(spark, path)
    case BcfFormat => BcfIO.read(spark, path)
    case other => throw new IllegalArgumentException(
      s"$path: not a variant container (detected $other)")
  }

  /** Write alignments in the container the path's extension names
    * (ref: KeyIgnoringAnySAMOutputFormat — format from output path). */
  def writeAlignments(ds: org.apache.spark.sql.Dataset[graft.model.SamRecord],
                      header: graft.model.SamHeader, path: String): Unit = {
    val name = path.toLowerCase
    if (name.endsWith(".bam")) BamIO.write(ds, header, path)
    else if (name.endsWith(".cram")) CramIO.write(ds, header, path)
    else if (name.endsWith(".sam")) Sam.write(ds, header, path)
    else throw new IllegalArgumentException(s"$path: unknown alignment extension")
  }

  private def readHead(path: String, n: Int): Array[Byte] = {
    val (fs, p) = Fs.get(path)
    val in = new BufferedInputStream(fs.open(p))
    try {
      val buf = new Array[Byte](n)
      var off = 0
      var r = 0
      while (off < n && r >= 0) { r = in.read(buf, off, n - off); if (r > 0) off += r }
      java.util.Arrays.copyOf(buf, off)
    } finally in.close()
  }

  def detectBytes(head0: Array[Byte], path: String): Format = {
    if (head0.length >= 4 && head0(0) == 'C' && head0(1) == 'R' &&
      head0(2) == 'A' && head0(3) == 'M') return CramFormat

    // BGZF/gzip wrapper? peek inside.  When the sniff window holds only
    // part of the first block (large BGZF members), inflate the partial
    // deflate stream directly — magic detection needs a few bytes, not
    // the whole block (the reference's misnamedBam.sam is exactly this:
    // a BAM whose first block exceeds a small sniff window).
    val head: Array[Byte] =
      if (head0.length >= 18 && Bgzf.parseBsize(head0, 0) > 0) {
        val full = try {
          val in = new Bgzf.BgzfInputStream(new java.io.ByteArrayInputStream(head0))
          val buf = new Array[Byte](4096)
          val n = in.read(buf)
          if (n > 0) java.util.Arrays.copyOf(buf, n) else Array.emptyByteArray
        } catch { case _: Exception => Array.emptyByteArray }
        if (full.nonEmpty) full
        else {
          val xlen = (head0(10) & 0xff) | ((head0(11) & 0xff) << 8)
          val cstart = 12 + xlen
          val inf = new java.util.zip.Inflater(true)
          try {
            inf.setInput(head0, cstart, head0.length - cstart)
            val buf = new Array[Byte](4096)
            val n = try inf.inflate(buf) catch { case _: Exception => 0 }
            if (n > 0) java.util.Arrays.copyOf(buf, n) else Array.emptyByteArray
          } finally inf.end()
        }
      } else head0

    if (head.length >= 4 && head(0) == 'B' && head(1) == 'A' && head(2) == 'M' &&
      head(3) == 1) return BamFormat
    if (head.length >= 5 && head(0) == 'B' && head(1) == 'C' && head(2) == 'F')
      return BcfFormat

    val text = new String(head, java.nio.charset.StandardCharsets.ISO_8859_1)
    if (text.startsWith("##fileformat=VCF")) return VcfFormat
    if (text.startsWith("@HD") || text.startsWith("@SQ") ||
      text.startsWith("@RG") || text.startsWith("@PG") || text.startsWith("@CO"))
      return SamFormat
    if (text.startsWith(">")) return FastaFormat

    // extension fallback (reference: extension map in AnySAMInputFormat)
    val name = path.toLowerCase.stripSuffix(".gz").stripSuffix(".bgz")
    if (name.endsWith(".sam")) return SamFormat
    if (name.endsWith(".bam")) return BamFormat
    if (name.endsWith(".cram")) return CramFormat
    if (name.endsWith(".vcf")) return VcfFormat
    if (name.endsWith(".bcf")) return BcfFormat
    if (name.endsWith(".fq") || name.endsWith(".fastq")) return FastqFormat
    if (name.endsWith(".qseq") || name.endsWith(".txt")) return QseqFormat
    if (name.endsWith(".fa") || name.endsWith(".fasta")) return FastaFormat

    // content heuristics for headerless text
    val lines = text.split("\n")
    if (lines.length >= 4 && lines(0).startsWith("@") && lines(2).startsWith("+"))
      return FastqFormat
    if (lines.nonEmpty && lines(0).split("\t").length >= 11 &&
      lines(0).split("\t").lift(1).exists(f => f.nonEmpty && f.forall(_.isDigit)))
      return SamFormat
    UnknownFormat
  }
}
