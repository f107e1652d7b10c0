package graft.model

/** Record models for the genomics formats (SURVEY §3).  Plain case
  * classes with Spark `Encoder`s derived implicitly — every source
  * yields a typed `Dataset` of one of these.
  */

/** One aligned (or unaligned) read — the 11 mandatory SAM columns plus
  * raw tag string (ref field semantics: SAMRecordReader.java; the tag
  * map is kept textual "TAG:TYPE:VALUE" per tag, lazily parsed like
  * LazyBAMRecordFactory.java defers decode).
  *
  * `pos` is 1-based like SAM text; 0 means unmapped-without-position.
  */
final case class SamRecord(
    qname: String,
    flag: Int,
    rname: String,
    pos: Int,
    mapq: Int,
    cigar: String,
    rnext: String,
    pnext: Int,
    tlen: Int,
    seq: String,
    qual: String,
    tags: Array[String]) {

  def isPaired: Boolean = (flag & 0x1) != 0
  def isProperPair: Boolean = (flag & 0x2) != 0
  def isUnmapped: Boolean = (flag & 0x4) != 0
  def mateUnmapped: Boolean = (flag & 0x8) != 0
  def isReverse: Boolean = (flag & 0x10) != 0
  def isSecondary: Boolean = (flag & 0x100) != 0
  def failsVendorQc: Boolean = (flag & 0x200) != 0
  def isDuplicate: Boolean = (flag & 0x400) != 0
  def isSupplementary: Boolean = (flag & 0x800) != 0

  /** End position (1-based inclusive) from the CIGAR reference span. */
  def end: Int = if (cigar == "*" || pos == 0) pos else pos + Cigar.referenceLength(cigar) - 1
}

object Cigar {
  /** Reference-consuming ops: M/D/N/=/X. */
  def referenceLength(cigar: String): Int = {
    var i = 0; var n = 0; var total = 0
    while (i < cigar.length) {
      val c = cigar.charAt(i)
      if (c >= '0' && c <= '9') n = n * 10 + (c - '0')
      else {
        if (c == 'M' || c == 'D' || c == 'N' || c == '=' || c == 'X') total += n
        n = 0
      }
      i += 1
    }
    total
  }
}

/** A reference sequence entry from @SQ. */
final case class SamRef(name: String, length: Int)

/** SAM/BAM header: raw @-line text plus the parsed reference dictionary
  * (ref: util/SAMHeaderReader.java).  Carried on the driver and
  * broadcast — headers are small; records never embed them.
  */
final case class SamHeader(text: String, refs: Array[SamRef]) {
  def sortOrder: String = {
    val m = "(?m)^@HD\\t.*SO:([A-Za-z]+)".r.findFirstMatchIn(text)
    m.map(_.group(1)).getOrElse("unknown")
  }
  /** Header rewritten to claim coordinate sort (the reference ships a
    * whole tool for this: util/GetSortedBAMHeader.java). */
  def asCoordinateSorted: SamHeader = {
    val lines = text.split("\n", -1).toBuffer
    val hdIdx = lines.indexWhere(_.startsWith("@HD"))
    if (hdIdx >= 0) {
      val parts = lines(hdIdx).split("\t").filterNot(_.startsWith("SO:"))
      lines(hdIdx) = (parts :+ "SO:coordinate").mkString("\t")
    } else {
      lines.prepend("@HD\tVN:1.6\tSO:coordinate")
    }
    copy(text = lines.mkString("\n"))
  }
}

/** One unaligned sequenced read (FASTQ/QSEQ shared model,
  * ref: SequencedFragment.java) with the casava/Illumina read-name
  * metadata parsed out when present.
  */
final case class SequencedFragment(
    name: String,
    sequence: String,
    quality: String,
    instrument: String,
    runNumber: Int,
    lane: Int,
    tile: Int,
    xpos: Int,
    ypos: Int,
    read: Int,
    filterPassed: Boolean)

/** A fragment of reference sequence with its 1-based start position
  * within the contig (ref: ReferenceFragment.java). */
final case class ReferenceFragment(contig: String, start: Long, sequence: String)

/** One VCF variant site.  INFO is kept as parallel key/value arrays
  * (Spark-friendly map alternative with stable ordering); genotype
  * columns are raw sample strings plus the FORMAT key list
  * (lazy decode per ref: LazyVCFGenotypesContext.java).
  */
final case class VcfVariant(
    chrom: String,
    pos: Long,
    id: String,
    ref: String,
    alt: Array[String],
    qual: Option[Double],
    filter: String,
    infoKeys: Array[String],
    infoValues: Array[String],
    format: Array[String],
    genotypes: Array[String])
