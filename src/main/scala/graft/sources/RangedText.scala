package graft.sources

import java.io.{BufferedInputStream, InputStream}

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession

/** Byte-range splittable line reading — the Hadoop text-split
  * discipline re-expressed without Hadoop InputFormats, for plain AND
  * BGZF-compressed text (S14: BGZF as a splittable codec for any text
  * format; boundaries go on BGZF block starts found by the split
  * guesser, ref: util/BGZFCodec.java + BGZFSplitGuesser.java).
  *
  * Ownership protocol (classic text-split semantics): with range
  * bounds b_0 < b_1 < ... in the position domain (byte offset for
  * plain files, virtual offset for BGZF), range [b_i, b_{i+1}) owns
  * every line whose first byte sits at position p with
  * b_i < p <= b_{i+1} (range 0 also owns p = 0).  A reader skips its
  * first (possibly partial) line unless it starts at 0, and reads past
  * its end to finish the last owned line.  Exactly one reader owns
  * each line, with no coordination between tasks.
  */
object RangedText {

  /** Line + the position of its first byte (byte offset for plain
    * files, BGZF virtual offset for compressed ones). */
  final case class Line(offset: Long, text: String)

  /** Container compression of a text file, sniffed by magic (never
    * extension — a `.gz` may be either BGZF or plain gzip, ref:
    * util/BGZFEnhancedGzipCodec.java).  BGZF splits at block bounds;
    * plain gzip is NOT splittable and reads as one whole-file range,
    * exactly the reference codec's fallback. */
  sealed trait Compression extends Serializable
  case object PlainText extends Compression
  case object BgzfText extends Compression
  case object GzipText extends Compression

  def compression(path: String): Compression = {
    val (fs, p) = Fs.get(path)
    val in = fs.open(p)
    try {
      val hdr = new Array[Byte](18)
      var n = 0
      var r = 0
      while (n < hdr.length && r >= 0) { r = in.read(hdr, n, hdr.length - n); if (r > 0) n += r }
      if (n >= 18 && Bgzf.parseBsize(hdr, 0) > 0) BgzfText
      else if (n >= 2 && (hdr(0) & 0xff) == 0x1f && (hdr(1) & 0xff) == 0x8b) GzipText
      else PlainText
    } finally in.close()
  }

  def isBgzf(path: String): Boolean = compression(path) == BgzfText

  /** One decoded stream from offset 0 whatever the container —
    * for header reads and magic sniffing. */
  def openDecoded(path: String): InputStream = {
    val (fs, p) = Fs.get(path)
    val buf = new BufferedInputStream(fs.open(p))
    compression(path) match {
      case BgzfText => new Bgzf.BgzfInputStream(buf)
      case GzipText => new java.util.zip.GZIPInputStream(buf)
      case PlainText => buf
    }
  }

  /** Compressed-domain range bounds: [start, end) pairs. */
  def ranges(path: String, splitSize: Long): Seq[(Long, Long)] = {
    val (fs, p) = Fs.get(path)
    val len = fs.getFileStatus(p).getLen
    val bounds: Seq[Long] = compression(path) match {
      case PlainText => ((0L until len by splitSize) :+ len).distinct
      case BgzfText => blockAlignedBounds(path, len, splitSize)
      case GzipText => Seq(0L, len) // not splittable: one whole-file range
    }
    bounds.sliding(2).collect { case Seq(a, b) if a < b => (a, b) }.toSeq
  }

  /** Upper bound on owned line-start positions for range [start, end)
    * in the reader's position domain (virtual offsets for BGZF,
    * decompressed offsets for gzip — where the single range owns
    * everything). */
  def endBound(end: Long, comp: Compression): Long = comp match {
    case BgzfText => Bgzf.virtualOffset(end, 0)
    case GzipText => Long.MaxValue
    case PlainText => end
  }

  /** RDD of owned lines with positions, split into ~splitSize ranges. */
  def lines(spark: SparkSession, path: String,
            splitSize: Long = 64L * 1024 * 1024): RDD[Line] = {
    val rs = ranges(path, splitSize)
    val comp = compression(path)
    spark.sparkContext.parallelize(rs, math.max(1, rs.size))
      .flatMap { case (start, end) => readLines(path, start, end, comp) }
  }

  /** BGZF: place range bounds on verified block starts near each
    * splitSize target — from the `.gbi` block index when one exists
    * (binary search, no I/O per target), else by window-scanning for
    * block magic at each target. */
  private def blockAlignedBounds(path: String, len: Long, splitSize: Long): Seq[Long] = {
    val (fs, p) = Fs.get(path)
    BgzfBlockIndex.read(fs, BgzfBlockIndex.indexPath(p)) match {
      case Some((offsets, idxLen)) if idxLen == len =>
        val out = scala.collection.mutable.ArrayBuffer(0L)
        var t = splitSize
        while (t < len) {
          val b = BgzfBlockIndex.ceilOffset(offsets, len, t)
          if (b < len) out += b
          t += splitSize
        }
        out += len
        out.distinct.sorted.toSeq
      case _ =>
        val raw = fs.open(p)
        try {
          val out = scala.collection.mutable.ArrayBuffer(0L)
          var t = splitSize
          while (t < len) {
            raw.seek(t)
            val window = new Array[Byte](256 * 1024)
            var n = 0; var r = 0
            while (n < window.length && r >= 0) { r = raw.read(window, n, window.length - n); if (r > 0) n += r }
            val off = Bgzf.findBlockStart(java.util.Arrays.copyOf(window, n), 0)
            if (off >= 0 && t + off < len) out += t + off
            t += splitSize
          }
          out += len
          out.distinct.sorted.toSeq
        } finally raw.close()
    }
  }

  /** Iterator of lines owned by the compressed-domain range
    * [start, end) under the protocol above.  With `stopAtEnd = false`
    * the iterator keeps yielding past the bound to EOF — used by
    * multi-line framers (FASTQ) that stop on their own record-head
    * ownership rule but need the tail lines of their last record. */
  def readLines(path: String, start: Long, end: Long, comp: Compression,
                stopAtEnd: Boolean = true): Iterator[Line] =
    openLines(path, start, end, comp, stopAtEnd)._1

  /** Lines of a BGZF VIRTUAL-OFFSET chunk [startVo, endVo): reading
    * starts exactly at startVo (an index-supplied record start — no
    * first-line skip, unlike the split-ownership protocol above) and
    * stops at the first line whose start VO reaches endVo.  This is
    * the read shape of tabix/BAI chunk resolution, where both bounds
    * point at record boundaries. */
  def openLinesAtVo(path: String, startVo: Long, endVo: Long)
      : (Iterator[Line], () => Unit) = {
    val (fs, p) = Fs.get(path)
    val raw = fs.open(p)
    raw.seek(Bgzf.voCompressed(startVo))
    val in = new Bgzf.BgzfInputStream(new BufferedInputStream(raw),
      Bgzf.voCompressed(startVo))
    in.seekInBlock(Bgzf.voUncompressed(startVo))
    val it = new Iterator[Line] {
      private var nextLine: Line = _
      private var finished = false
      private def fetch(): Unit = {
        if (finished) return
        val lineStart = in.virtualPos
        if (lineStart >= endVo) { finished = true; in.close(); return }
        var c = in.read()
        if (c < 0) { finished = true; in.close(); return }
        val sb = new java.lang.StringBuilder(120)
        while (c >= 0 && c != '\n') { sb.append(c.toChar); c = in.read() }
        if (sb.length() > 0 && sb.charAt(sb.length() - 1) == '\r')
          sb.setLength(sb.length() - 1)
        nextLine = Line(lineStart, sb.toString)
      }
      override def hasNext: Boolean = {
        if (nextLine == null && !finished) fetch()
        nextLine != null
      }
      override def next(): Line = {
        if (!hasNext) throw new NoSuchElementException
        val l = nextLine; nextLine = null; l
      }
    }
    (it, () => try in.close() catch { case _: java.io.IOException => () })
  }

  /** [[readLines]] plus an explicit closer for consumers that may
    * abandon the iterator early (DataSource V2 readers under LIMIT):
    * the stream otherwise closes only at range end / EOF. */
  def openLines(path: String, start: Long, end: Long, comp: Compression,
                stopAtEnd: Boolean = true): (Iterator[Line], () => Unit) = {
    require(comp != GzipText || start == 0,
      s"plain gzip is not splittable; got range start $start for $path")
    val (fs, p) = Fs.get(path)
    val raw = fs.open(p)
    raw.seek(start)
    val bgzf = comp == BgzfText
    var plainPos = start // byte offset (plain) / decompressed offset (gzip)
    val in: InputStream = comp match {
      case BgzfText => new Bgzf.BgzfInputStream(new BufferedInputStream(raw), start)
      case GzipText => new java.util.zip.GZIPInputStream(new BufferedInputStream(raw))
      case PlainText => new BufferedInputStream(raw)
    }
    def position: Long = in match {
      case b: Bgzf.BgzfInputStream => b.virtualPos
      case _ => plainPos
    }
    val endBound: Long = RangedText.endBound(end, comp)

    val it = new Iterator[Line] {
      private var nextLine: Line = _
      private var finished = false
      private var first = true

      /** Read the line at the current position, or null at EOF. */
      private def readOne(): Line = {
        val lineStart = position
        var c = in.read()
        if (c < 0) return null
        if (!bgzf) plainPos += 1
        val sb = new java.lang.StringBuilder(120)
        while (c >= 0 && c != '\n') {
          sb.append(c.toChar)
          c = in.read()
          if (c >= 0 && !bgzf) plainPos += 1
        }
        if (sb.length() > 0 && sb.charAt(sb.length() - 1) == '\r')
          sb.setLength(sb.length() - 1)
        Line(lineStart, sb.toString)
      }

      private def fetch(): Unit = {
        if (finished) return
        if (first) {
          first = false
          if (start > 0) readOne() // discard the unowned first line
        }
        val pos = position
        if (stopAtEnd && pos > endBound) { finished = true; in.close(); return }
        val l = readOne()
        if (l == null) { finished = true; in.close() } else nextLine = l
      }
      override def hasNext: Boolean = {
        if (nextLine == null && !finished) fetch()
        nextLine != null
      }
      override def next(): Line = {
        if (!hasNext) throw new NoSuchElementException
        val l = nextLine; nextLine = null; l
      }
    }
    (it, () => try in.close() catch { case _: java.io.IOException => () })
  }
}
