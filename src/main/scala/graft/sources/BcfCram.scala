package graft.sources

import java.io.{ByteArrayOutputStream, DataOutputStream, EOFException, InputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

import graft.model.VcfVariant

/** BCF2 binary codec over BGZF (S11; ref: BCFRecordReader.java /
  * BCFRecordWriter.java re-expressed against the public BCF2 spec).
  *
  * Site-level fields (CHROM/POS/ID/REF/ALT/QUAL/FILTER + INFO as
  * typed string values) round-trip; the INFO/genotype typed-value
  * system implements the BCF2 atomic types over strings (the
  * reference delegates the same decode to htsjdk).
  */
object Bcf {

  val Magic: Array[Byte] = Array('B', 'C', 'F', 2, 2).map(_.toByte)

  // BCF2 typed values: (type byte = len<<4 | type), type 1=int8,
  // 2=int16, 3=int32, 5=float, 7=char
  private def writeTyped(o: DataOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8)
    if (b.length < 15) o.write((b.length << 4) | 7)
    else { o.write((15 << 4) | 7); writeTypedInt(o, b.length) }
    o.write(b)
  }

  private def writeTypedInt(o: DataOutputStream, v: Int): Unit = {
    if (v >= Byte.MinValue && v <= Byte.MaxValue) { o.write((1 << 4) | 1); o.write(v) }
    else if (v >= Short.MinValue && v <= Short.MaxValue) {
      o.write((1 << 4) | 2); o.write(v & 0xff); o.write((v >> 8) & 0xff)
    } else {
      o.write((1 << 4) | 3)
      o.write(v & 0xff); o.write((v >> 8) & 0xff); o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff)
    }
  }

  private def readTyped(b: ByteBuffer): (Int, Int) = { // (type, len)
    val tb = b.get & 0xff
    val t = tb & 0xf
    var len = tb >>> 4
    if (len == 15) {
      val (innerType, innerLen) = readTyped(b)
      require(innerLen == 1, s"typed length must be scalar, got $innerLen")
      len = readInt(b, innerType)
    }
    (t, len)
  }

  private def readInt(b: ByteBuffer, sizeCode: Int): Int = sizeCode match {
    case 1 => b.get.toInt
    case 2 => b.getShort.toInt
    case _ => b.getInt
  }

  private def readTypedIntV(b: ByteBuffer): Int = {
    val (t, len) = readTyped(b)
    require(len == 1, s"expected scalar int, len=$len")
    readInt(b, t)
  }

  private def readTypedString(b: ByteBuffer): String = {
    val (t, len) = readTyped(b)
    require(t == 7, s"expected char vector, type=$t")
    val buf = new Array[Byte](len)
    b.get(buf)
    new String(buf, UTF_8)
  }

  /** Encode one variant's shared (site) block. `contigIdx`/`filterIdx`
    * map names to header dictionary offsets. */
  def encode(v: VcfVariant, contigIdx: Map[String, Int],
             filterIdx: Map[String, Int],
             infoIdx: Map[String, Int]): Array[Byte] = {
    val buf = new ByteArrayOutputStream(96)
    val o = new DataOutputStream(buf)
    def w32(x: Int): Unit = { o.write(x & 0xff); o.write((x >> 8) & 0xff); o.write((x >> 16) & 0xff); o.write((x >> 24) & 0xff) }
    w32(contigIdx(v.chrom))
    w32(v.pos.toInt - 1) // 0-based
    w32(v.ref.length) // rlen
    w32(v.qual.map(q => java.lang.Float.floatToIntBits(q.toFloat))
      .getOrElse(0x7f800001)) // missing float
    val nAllele = 1 + v.alt.length
    w32((v.infoKeys.length & 0xffff) | (nAllele << 16)) // n_info | n_allele<<16
    w32(0) // n_fmt<<24 | n_sample (sites only)
    writeTyped(o, if (v.id == ".") "" else v.id)
    writeTyped(o, v.ref)
    v.alt.foreach(a => writeTyped(o, a))
    // FILTER: int16 vector of header dictionary offsets
    if (v.filter == "." || v.filter.isEmpty) o.write(0) // empty vector
    else {
      val fs = v.filter.split(";").map(filterIdx)
      if (fs.length < 15) o.write((fs.length << 4) | 2)
      else { o.write((15 << 4) | 2); writeTypedInt(o, fs.length) }
      fs.foreach { f => o.write(f & 0xff); o.write((f >> 8) & 0xff) }
    }
    // INFO: header-dictionary offset of the key (typed int) + value
    v.infoKeys.zip(v.infoValues).foreach { case (k, value) =>
      writeTypedInt(o, infoIdx(k))
      writeTyped(o, value)
    }
    o.flush()
    buf.toByteArray
  }

  def decode(data: Array[Byte], contigs: Array[String], filters: Array[String],
             infoKeys: Array[String]): VcfVariant = {
    val b = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val chrom = contigs(b.getInt)
    val pos = b.getInt + 1L
    b.getInt // rlen
    val qualBits = b.getInt
    val qual = if (qualBits == 0x7f800001) None else Some(java.lang.Float.intBitsToFloat(qualBits).toDouble)
    val nInfoAllele = b.getInt
    val nInfo = nInfoAllele & 0xffff
    val nAllele = nInfoAllele >>> 16
    b.getInt // n_fmt/n_sample
    val id0 = readTypedString(b)
    val ref = readTypedString(b)
    val alts = (1 until nAllele).map(_ => readTypedString(b)).toArray
    val (ft, flen) = readTyped(b)
    val filter =
      if (flen == 0) "."
      else (0 until flen).map(_ => filters(readInt(b, ft))).mkString(";")
    val ik = new Array[String](nInfo)
    val iv = new Array[String](nInfo)
    (0 until nInfo).foreach { i =>
      val keyIdx = readTypedIntV(b)
      ik(i) = infoKeys(keyIdx)
      iv(i) = readTypedString(b)
    }
    VcfVariant(chrom, pos, if (id0.isEmpty) "." else id0, ref, alts, qual,
      filter, ik, iv, Array.empty, Array.empty)
  }

  /** Write sites as a BCF file (BGZF-wrapped, header text + records). */
  def write(path: String, headerText: String, variants: Seq[VcfVariant],
            contigs: Array[String], filters: Array[String],
            infoKeys: Array[String]): Unit = {
    val (fs, p) = Fs.get(path)
    val out = new Bgzf.BgzfOutputStream(fs.create(p, true))
    val o = new DataOutputStream(out)
    o.write(Magic)
    val ht = (headerText + "\u0000").getBytes(UTF_8)
    o.write(ht.length & 0xff); o.write((ht.length >> 8) & 0xff)
    o.write((ht.length >> 16) & 0xff); o.write((ht.length >> 24) & 0xff)
    o.write(ht)
    val contigIdx = contigs.zipWithIndex.toMap
    val filterIdx = filters.zipWithIndex.toMap
    val infoIdx = infoKeys.zipWithIndex.toMap
    variants.foreach { v =>
      val shared = encode(v, contigIdx, filterIdx, infoIdx)
      def w32(x: Int): Unit = { o.write(x & 0xff); o.write((x >> 8) & 0xff); o.write((x >> 16) & 0xff); o.write((x >> 24) & 0xff) }
      w32(shared.length)
      w32(0) // l_indiv
      o.write(shared)
    }
    o.flush()
    out.close()
  }

  def read(path: String, contigs: Array[String], filters: Array[String],
           infoKeys: Array[String]): (String, Seq[VcfVariant]) = {
    val (fs, p) = Fs.get(path)
    val in = new Bgzf.BgzfInputStream(new java.io.BufferedInputStream(fs.open(p)))
    val magic = new Array[Byte](5)
    readFully(in, magic)
    require(java.util.Arrays.equals(magic, Magic), "not BCF2")
    val lh = readIntLe(in)
    val ht = new Array[Byte](lh)
    readFully(in, ht)
    val headerText = new String(ht, 0, lh - 1, UTF_8)
    val out = scala.collection.mutable.ArrayBuffer[VcfVariant]()
    var lShared = readIntLeOrEof(in)
    while (lShared >= 0) {
      val lIndiv = readIntLe(in)
      val shared = new Array[Byte](lShared)
      readFully(in, shared)
      if (lIndiv > 0) { val skip = new Array[Byte](lIndiv); readFully(in, skip) }
      out += decode(shared, contigs, filters, infoKeys)
      lShared = readIntLeOrEof(in)
    }
    in.close()
    (headerText, out.toSeq)
  }

  private def readFully(in: InputStream, buf: Array[Byte]): Unit = {
    var off = 0
    while (off < buf.length) {
      val r = in.read(buf, off, buf.length - off)
      if (r < 0) throw new EOFException()
      off += r
    }
  }
  private def readIntLe(in: InputStream): Int = {
    val a = in.read()
    if (a < 0) throw new EOFException()
    val b = in.read(); val c = in.read(); val d = in.read()
    if ((b | c | d) < 0) throw new EOFException()
    a | (b << 8) | (c << 16) | (d << 24)
  }

  /** -1 on clean EOF before the first byte. */
  private def readIntLeOrEof(in: InputStream): Int = {
    val a = in.read()
    if (a < 0) return -1
    val b = in.read(); val c = in.read(); val d = in.read()
    if ((b | c | d) < 0) throw new EOFException()
    a | (b << 8) | (c << 16) | (d << 24)
  }
}

/** Distributed BCF read/write: the BAM pattern applied to BCF2 —
  * parallel header-less BGZF shards with per-shard record-start
  * virtual offsets, driver-side concat + shifted [[SplittingIndex]],
  * ranged read with records owned by start virtual offset.  The site
  * codec is [[Bcf]]; dictionaries (contigs/filters/info keys) ride the
  * header text like the reference's header-driven decode.
  */
object BcfIO {

  final case class Dicts(contigs: Array[String], filters: Array[String],
                        infoKeys: Array[String]) {
    def headerText: String =
      s"##fileformat=VCFv4.3\n##graft_contigs=${contigs.mkString(",")}\n" +
        s"##graft_filters=${filters.mkString(",")}\n##graft_info=${infoKeys.mkString(",")}"
  }

  object Dicts {
    def fromHeader(text: String): Dicts = {
      def grab(k: String): Array[String] =
        text.linesIterator.find(_.startsWith(s"##graft_$k="))
          .map(_.substring(s"##graft_$k=".length).split(",").filter(_.nonEmpty))
          .getOrElse(Array.empty)
      Dicts(grab("contigs"), grab("filters"), grab("info"))
    }
  }

  def write(ds: org.apache.spark.sql.Dataset[VcfVariant], dicts: Dicts,
            file: String, granularity: Int = 1000): Unit = {
    val (fs, path) = Fs.get(file)
    val tmpDir = new org.apache.hadoop.fs.Path(path.getParent, "." + path.getName + ".shards")
    fs.mkdirs(tmpDir)
    val tmpDirStr = tmpDir.toString
    val contigIdx = dicts.contigs.zipWithIndex.toMap
    val filterIdx = dicts.filters.zipWithIndex.toMap
    val infoIdx = dicts.infoKeys.zipWithIndex.toMap

    val shardInfo = ds.rdd.mapPartitionsWithIndex { (pid, it) =>
      val (tfs, _) = Fs.get(tmpDirStr)
      val shardPath = new org.apache.hadoop.fs.Path(tmpDirStr, f"part-$pid%05d.bcf")
      val out = new Bgzf.BgzfOutputStream(tfs.create(shardPath, true))
      val entries = scala.collection.mutable.ArrayBuffer[(Long, Int, Int)]()
      var n = 0L
      it.foreach { v =>
        if (n % granularity == 0) {
          out.blockBoundary()
          entries += ((Bgzf.virtualOffset(out.compressedOffset, 0),
            contigIdx.getOrElse(v.chrom, -1), v.pos.toInt - 1))
        }
        val shared = Bcf.encode(v, contigIdx, filterIdx, infoIdx)
        val len = shared.length
        out.write(Array[Byte](len.toByte, (len >> 8).toByte, (len >> 16).toByte, (len >> 24).toByte))
        out.write(Array[Byte](0, 0, 0, 0)) // l_indiv (sites only)
        out.write(shared)
        n += 1
      }
      out.blockBoundary()
      val shardLen = out.compressedOffset
      out.closeWithoutTerminator()
      Iterator.single((pid, shardLen, entries.toArray))
    }.collect().sortBy(_._1)

    val out = new java.io.BufferedOutputStream(fs.create(path, true))
    val headerBuf = new ByteArrayOutputStream()
    val o = new DataOutputStream(headerBuf)
    o.write(Bcf.Magic)
    val ht = (dicts.headerText + "\u0000").getBytes(UTF_8)
    o.write(ht.length & 0xff); o.write((ht.length >> 8) & 0xff)
    o.write((ht.length >> 16) & 0xff); o.write((ht.length >> 24) & 0xff)
    o.write(ht)
    o.flush()
    var coffset = 0L
    coffset += Bgzf.writeBlocksTo(out, headerBuf.toByteArray, 0, headerBuf.size())
    val allEntries = scala.collection.mutable.ArrayBuffer[SplittingIndex.Entry]()
    shardInfo.foreach { case (pid, shardLen, entries) =>
      entries.foreach { case (vo, refId, pos) =>
        allEntries += SplittingIndex.Entry(
          Bgzf.virtualOffset(Bgzf.voCompressed(vo) + coffset, Bgzf.voUncompressed(vo)),
          refId, pos)
      }
      val shardPath = new org.apache.hadoop.fs.Path(tmpDirStr, f"part-$pid%05d.bcf")
      val sin = fs.open(shardPath)
      val buf = new Array[Byte](1 << 20)
      var r = sin.read(buf)
      while (r > 0) { out.write(buf, 0, r); r = sin.read(buf) }
      sin.close()
      coffset += shardLen
    }
    out.write(Bgzf.EofMarker)
    out.close()
    fs.delete(tmpDir, true)
    SplittingIndex.write(fs, SplittingIndex.indexPath(path), granularity,
      allEntries.toSeq, Bgzf.virtualOffset(coffset, 0))
  }

  def readDicts(file: String): Dicts = {
    val (fs, path) = Fs.get(file)
    val in = new Bgzf.BgzfInputStream(new java.io.BufferedInputStream(fs.open(path)))
    try {
      val magic = new Array[Byte](5)
      var got = 0
      while (got < 5) { val r = in.read(magic, got, 5 - got); require(r > 0); got += r }
      require(java.util.Arrays.equals(magic, Bcf.Magic), "not BCF2")
      var lh = 0
      (0 until 4).foreach(i => lh |= in.read() << (8 * i))
      val ht = new Array[Byte](lh)
      var o = 0
      while (o < lh) { val r = in.read(ht, o, lh - o); require(r > 0); o += r }
      Dicts.fromHeader(new String(ht, 0, lh - 1, UTF_8))
    } finally in.close()
  }

  def read(spark: org.apache.spark.sql.SparkSession, file: String):
      org.apache.spark.sql.Dataset[VcfVariant] = {
    import spark.implicits._
    val (fs, path) = Fs.get(file)
    val dicts = readDicts(file)
    // header end vo: re-open and track
    val hin = new Bgzf.BgzfInputStream(new java.io.BufferedInputStream(fs.open(path)))
    val skip = new Array[Byte](4096)
    var lh = -1
    var consumed = 0
    run {
      val magic = new Array[Byte](5)
      var got = 0
      while (got < 5) { val r = hin.read(magic, got, 5 - got); require(r > 0); got += r }
      var l = 0
      (0 until 4).foreach(i => l |= hin.read() << (8 * i))
      lh = l
      while (consumed < lh) {
        val r = hin.read(skip, 0, math.min(skip.length, lh - consumed))
        require(r > 0)
        consumed += r
      }
    }
    val headerEndVo = hin.virtualPos
    hin.close()
    val sidx = SplittingIndex.read(fs, SplittingIndex.indexPath(path))
      .getOrElse(throw new IllegalStateException(s"no splitting index for $file"))
    val bounds = (headerEndVo +: sidx.entries.map(_.vo).toSeq :+ sidx.endVo).distinct.sorted
    val ranges = bounds.sliding(2).collect { case Seq(a, b) if a < b => (a, b) }.toSeq
    val contigs = dicts.contigs; val filters = dicts.filters; val infoKeys = dicts.infoKeys
    spark.sparkContext.parallelize(ranges, math.max(1, ranges.size))
      .flatMap { case (startVo, endVo2) =>
        val (tfs, tpath) = Fs.get(file)
        val raw = tfs.open(tpath)
        raw.seek(Bgzf.voCompressed(startVo))
        val in = new Bgzf.BgzfInputStream(
          new java.io.BufferedInputStream(raw), Bgzf.voCompressed(startVo))
        in.seekInBlock(Bgzf.voUncompressed(startVo))
        new Iterator[VcfVariant] {
          private var nextV: VcfVariant = _
          private var done = false
          private def fetch(): Unit = {
            while (nextV == null && !done) {
              if (in.virtualPos >= endVo2) { done = true; in.close(); return }
              val a = in.read()
              if (a < 0) { done = true; in.close(); return }
              val lShared = a | (in.read() << 8) | (in.read() << 16) | (in.read() << 24)
              var lIndiv = 0
              (0 until 4).foreach(i => lIndiv |= in.read() << (8 * i))
              val shared = new Array[Byte](lShared)
              var o = 0
              while (o < lShared) { val r = in.read(shared, o, lShared - o); require(r > 0); o += r }
              if (lIndiv > 0) {
                val sk = new Array[Byte](lIndiv)
                var o2 = 0
                while (o2 < lIndiv) { val r = in.read(sk, o2, lIndiv - o2); require(r > 0); o2 += r }
              }
              nextV = Bcf.decode(shared, contigs, filters, infoKeys)
            }
          }
          override def hasNext: Boolean = { if (nextV == null) fetch(); nextV != null }
          override def next(): VcfVariant = {
            if (!hasNext) throw new NoSuchElementException
            val v = nextV; nextV = null; v
          }
        }
      }.toDS()
  }

  private def run(body: => Unit): Unit = body
}

/** CRAM container structure (S12).  Decode of compressed record data
  * is NOT implemented — the reference delegates it wholesale to
  * htsjdk (CRAMInputFormat.java); what the I/O layer itself owns is
  * the container framing used for split enumeration, which is
  * implemented here: file definition + ITF8 varints + container
  * headers, enough to walk container boundaries for splits.
  */
object Cram {

  final case class Container(offset: Long, length: Int, refSeqId: Int,
                             startPos: Int, span: Int, nRecords: Int)

  /** ITF8: CRAM's variable-length int (public CRAM spec §2.3).
    * Every byte is EOF-checked: a truncation mid-varint must surface
    * as EOFException rather than OR-ing -1 into the value as data.
    */
  def readItf8(in: InputStream): Int = {
    val b0 = rd(in)
    if ((b0 & 0x80) == 0) b0
    else if ((b0 & 0x40) == 0) ((b0 & 0x3f) << 8) | rd(in)
    else if ((b0 & 0x20) == 0) ((b0 & 0x1f) << 16) | (rd(in) << 8) | rd(in)
    else if ((b0 & 0x10) == 0) ((b0 & 0x0f) << 24) | (rd(in) << 16) | (rd(in) << 8) | rd(in)
    else ((b0 & 0x0f) << 28) | (rd(in) << 20) | (rd(in) << 12) | (rd(in) << 4) | (rd(in) & 0x0f)
  }

  private def rd(in: InputStream): Int = {
    val b = in.read()
    if (b < 0) throw new EOFException("truncated varint")
    b
  }

  /** LTF8: CRAM's variable-length long (public CRAM spec §2.3).  The
    * count of leading 1-bits in the first byte gives the number of
    * additional payload bytes (0..8); unlike ITF8 there is no 4-bit
    * tail trick — all continuation bytes carry 8 value bits.  Used by
    * the container header's record-counter and bases fields, which
    * exceed ITF8's range on real WGS files (counter > 2^28 reads).
    */
  def readLtf8(in: InputStream): Long = {
    val b0 = rd(in)
    var extra = 0
    while (extra < 8 && ((b0 << extra) & 0x80) != 0) extra += 1
    var v: Long = if (extra >= 8) 0L else (b0 & (0xff >>> (extra + 1))).toLong
    var i = 0
    while (i < extra) { v = (v << 8) | rd(in); i += 1 }
    v
  }

  def writeLtf8(o: java.io.OutputStream, v: Long): Unit = {
    // Smallest width whose value-bit capacity holds v: (7 - extra)
    // bits in byte 0 plus 8 per extra byte = 7 + 7*extra total.
    var extra = 0
    while (extra < 8 && (v >>> (7 + 7 * extra)) != 0) extra += 1
    if (extra == 0) o.write(v.toInt & 0x7f)
    else if (extra >= 8) {
      o.write(0xff)
      var i = 7
      while (i >= 0) { o.write(((v >>> (8 * i)) & 0xff).toInt); i -= 1 }
    } else {
      val prefix = (0xff << (8 - extra)) & 0xff // `extra` leading ones, then a zero
      o.write(prefix | ((v >>> (8 * extra)) & (0xff >>> (extra + 1))).toInt)
      var i = extra - 1
      while (i >= 0) { o.write(((v >>> (8 * i)) & 0xff).toInt); i -= 1 }
    }
  }

  def writeItf8(o: java.io.OutputStream, v: Int): Unit = {
    if (v >>> 7 == 0) o.write(v)
    else if (v >>> 14 == 0) { o.write(0x80 | (v >> 8)); o.write(v & 0xff) }
    else if (v >>> 21 == 0) { o.write(0xc0 | (v >> 16)); o.write((v >> 8) & 0xff); o.write(v & 0xff) }
    else if (v >>> 28 == 0) {
      o.write(0xe0 | (v >> 24)); o.write((v >> 16) & 0xff); o.write((v >> 8) & 0xff); o.write(v & 0xff)
    } else {
      o.write(0xf0 | (v >>> 28)); o.write((v >> 20) & 0xff); o.write((v >> 12) & 0xff)
      o.write((v >> 4) & 0xff); o.write(v & 0x0f)
    }
  }

  /** Walk container headers to enumerate split points (every container
    * start is a valid split; ref: CRAMInputFormat.getSplits). */
  def enumerateContainers(path: String): Seq[Container] = {
    val (fs, p) = Fs.get(path)
    val len = fs.getFileStatus(p).getLen
    val in = new java.io.BufferedInputStream(fs.open(p))
    val magic = new Array[Byte](4)
    var off = 0L
    (0 until 4).foreach(i => magic(i) = in.read().toByte)
    require(new String(magic, UTF_8) == "CRAM", "not a CRAM file")
    in.skip(2) // version major/minor
    val fileId = new Array[Byte](20)
    var r = 0
    var got = 0
    while (got < 20 && r >= 0) { r = in.read(fileId, got, 20 - got); if (r > 0) got += r }
    off = 26
    val out = scala.collection.mutable.ArrayBuffer[Container]()
    var continue = off < len
    while (continue) {
      val counting = new CountingInputStream(in)
      try {
        val clen = readInt32Le(counting)
        val refId = readItf8(counting)
        val start = readItf8(counting)
        val span = readItf8(counting)
        val nRec = readItf8(counting)
        out += Container(off, clen, refId, start, span, nRec)
        // Remaining header per CRAM 3.0 §8: record counter (LTF8),
        // bases (LTF8), nBlocks (ITF8), landmarks (array<ITF8>),
        // crc32; then `clen` bytes of compressed container body.
        readLtf8(counting); readLtf8(counting); readItf8(counting)
        val nLandmarks = readItf8(counting)
        (0 until nLandmarks).foreach(_ => readItf8(counting))
        counting.skipFully(4) // crc
        counting.skipFully(clen)
        off += counting.count
        continue = off < len
      } catch {
        case e: EOFException =>
          // EOF before the first byte of a container = clean end of
          // file; EOF mid-container = truncated input, surface it.
          if (counting.count > 0)
            throw new java.io.IOException(
              s"truncated CRAM container at offset $off (${counting.count} bytes into header)", e)
          continue = false
      }
    }
    in.close()
    out.toSeq
  }

  private def readInt32Le(in: InputStream): Int = {
    val a = in.read(); val b = in.read(); val c = in.read(); val d = in.read()
    if ((a | b | c | d) < 0) throw new EOFException()
    a | (b << 8) | (c << 16) | (d << 24)
  }

  private final class CountingInputStream(in: InputStream) extends InputStream {
    var count = 0L
    override def read(): Int = { val v = in.read(); if (v >= 0) count += 1; v }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      val r = in.read(b, off, len); if (r > 0) count += r; r
    }
    def skipFully(n: Long): Unit = {
      var left = n
      val buf = new Array[Byte](8192)
      while (left > 0) {
        val r = read(buf, 0, math.min(left, buf.length).toInt)
        if (r < 0) throw new EOFException()
        left -= r
      }
    }
  }
}
