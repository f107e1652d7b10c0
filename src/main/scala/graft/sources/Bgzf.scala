package graft.sources

import java.io.{ByteArrayOutputStream, EOFException, InputStream, OutputStream}
import java.util.zip.{CRC32, Deflater, Inflater}

/** From-scratch BGZF (blocked gzip) codec.
  *
  * BGZF is the splittable-compression foundation of BAM/BCF/bgzipped
  * VCF: a stream of independent ≤64 KiB gzip members, each carrying its
  * own compressed size (BSIZE) in a gzip extra subfield (SI1='B',
  * SI2='C'), terminated by a fixed 28-byte empty block.  Because every
  * block is self-contained, any worker can start decoding at any block
  * boundary — that is what makes a 100 TB BAM scan parallelizable.
  *
  * Spec: SAM/BAM specification §4.1 (public).  Behavioral reference:
  * util/BGZFCodec.java + util/BGZFSplitGuesser.java in
  * HadoopGenomics/Hadoop-BAM (re-expressed, not ported — this is a
  * self-contained JVM codec with no Hadoop types).
  *
  * Virtual file offsets: `coffset << 16 | uoffset` packs the compressed
  * block start and the offset within the inflated block into one long
  * (ref: FileVirtualSplit.java semantics).
  */
object Bgzf {

  /** Fixed empty terminator block (spec §4.1.2). */
  val EofMarker: Array[Byte] = Array(
    0x1f, 0x8b, 0x08, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00, 0xff, 0x06, 0x00,
    0x42, 0x43, 0x02, 0x00, 0x1b, 0x00, 0x03, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00).map(_.toByte)

  val MaxBlockSize = 65536

  final case class Block(compressedStart: Long, compressedSize: Int, data: Array[Byte])

  def virtualOffset(coffset: Long, uoffset: Int): Long = (coffset << 16) | uoffset
  def voCompressed(vo: Long): Long = vo >>> 16
  def voUncompressed(vo: Long): Int = (vo & 0xffff).toInt

  // ---------------------------------------------------------------- read

  private def u8(b: Byte): Int = b & 0xff
  private def u16(a: Byte, b: Byte): Int = u8(a) | (u8(b) << 8)

  /** Reads exactly n bytes or returns null at clean EOF (0 bytes). */
  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) {
        if (off == 0) return null
        throw new EOFException(s"truncated BGZF block: expected $n bytes, got $off")
      }
      off += r
    }
    buf
  }

  /** Parse one BGZF block header from `hdr` (≥18 bytes starting at a
    * gzip member); returns BSIZE (total compressed block length) or -1
    * if this is not a valid BGZF header. */
  def parseBsize(hdr: Array[Byte], off: Int): Int = {
    if (hdr.length - off < 18) return -1
    if (u8(hdr(off)) != 0x1f || u8(hdr(off + 1)) != 0x8b) return -1
    if (u8(hdr(off + 2)) != 8 || (u8(hdr(off + 3)) & 4) == 0) return -1
    val xlen = u16(hdr(off + 10), hdr(off + 11))
    // walk extra subfields for SI1='B' SI2='C'
    var p = off + 12
    val end = off + 12 + xlen
    if (hdr.length < end) return -1
    while (p + 4 <= end) {
      val si1 = u8(hdr(p)); val si2 = u8(hdr(p + 1))
      val slen = u16(hdr(p + 2), hdr(p + 3))
      if (si1 == 66 && si2 == 67 && slen == 2) {
        if (p + 6 > end) return -1
        return u16(hdr(p + 4), hdr(p + 5)) + 1
      }
      p += 4 + slen
    }
    -1
  }

  /** Read the next block from a stream positioned at a block start.
    * Returns null at clean EOF.  `coffset` is the block's byte offset
    * (for virtual-offset bookkeeping). */
  def readBlock(in: InputStream, coffset: Long): Block = {
    val hdr0 = readFully(in, 18)
    if (hdr0 == null) return null
    val xlen = u16(hdr0(10), hdr0(11))
    // ensure we hold the full extra field before locating BSIZE (the
    // BC subfield need not be first, spec allows other subfields)
    val hdr = if (xlen > 6) {
      val more = readFully(in, xlen - 6)
      if (more == null) throw new EOFException("truncated BGZF header")
      hdr0 ++ more
    } else hdr0
    val bsize = parseBsize(hdr, 0)
    if (bsize < 0) throw new IllegalStateException(
      f"not a BGZF block at offset $coffset%d")
    val rest = readFully(in, bsize - hdr.length)
    if (rest == null) throw new EOFException("truncated BGZF block")
    val cdataLen = bsize - 12 - xlen - 8
    val cdata = new Array[Byte](cdataLen)
    System.arraycopy(rest, 0, cdata, 0, cdataLen)
    // rest layout: [cdata][crc32 4][isize 4]
    val isize = {
      val o = rest.length - 4
      u8(rest(o)) | (u8(rest(o + 1)) << 8) | (u8(rest(o + 2)) << 16) | (u8(rest(o + 3)) << 24)
    }
    val out = new Array[Byte](isize)
    if (isize > 0) {
      // per-thread Inflater reuse: this runs once per 64 KB block on
      // the scan hot path — reset() instead of fresh native zlib state
      val inf = inflaterTL.get()
      inf.reset()
      inf.setInput(cdata)
      var n = 0
      while (n < isize && !inf.finished()) n += inf.inflate(out, n, isize - n)
      if (n != isize) throw new IllegalStateException(
        s"BGZF inflate: expected $isize bytes, got $n")
    }
    Block(coffset, bsize, out)
  }

  /** Decompressing InputStream over BGZF with virtual-offset tracking. */
  final class BgzfInputStream(raw: InputStream, startOffset: Long = 0L) extends InputStream {
    private var blockStart = startOffset
    private var nextBlockStart = startOffset
    private var data: Array[Byte] = Array.emptyByteArray
    private var pos = 0
    private var eof = false

    /** Virtual offset of the next byte to be read. */
    def virtualPos: Long = virtualOffset(if (pos == data.length) nextBlockStart else blockStart,
      if (pos == data.length) 0 else pos)

    private def advance(): Boolean = {
      var b = Bgzf.readBlock(raw, nextBlockStart)
      // skip empty blocks (incl. EOF marker) but keep offsets honest
      while (b != null && b.data.isEmpty) {
        nextBlockStart += b.compressedSize
        b = Bgzf.readBlock(raw, nextBlockStart)
      }
      if (b == null) { eof = true; false }
      else {
        blockStart = nextBlockStart
        nextBlockStart += b.compressedSize
        data = b.data
        pos = 0
        true
      }
    }

    override def read(): Int = {
      if (eof) return -1
      if (pos == data.length && !advance()) return -1
      val v = data(pos) & 0xff
      pos += 1
      v
    }

    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (eof) return -1
      if (pos == data.length && !advance()) return -1
      val n = math.min(len, data.length - pos)
      System.arraycopy(data, pos, b, off, n)
      pos += n
      n
    }

    /** Skip to an uncompressed offset within the CURRENT block (used
      * when seeking to a virtual offset after positioning the raw
      * stream at its compressed offset). */
    def seekInBlock(uoffset: Int): Unit = {
      if (pos == data.length && uoffset > 0) advance()
      pos = uoffset
    }

    override def close(): Unit = raw.close()
  }

  // --------------------------------------------------------------- write

  /** Compressing OutputStream producing BGZF blocks + EOF marker.
    * Flushes a block whenever the uncompressed buffer reaches
    * `blockSize`; `blockBoundary()` forces one (used by writers that
    * must align records to block starts for the splitting index). */
  /** BGZF block writer.  `workers > 1` turns on PIPELINED deflate: a
    * bounded queue of filled blocks fans out to a worker pool while
    * the stream thread keeps filling — 3-5× single-stream throughput
    * when cores are idle (DeflateProbe).  Blocks are written strictly
    * in order, so the byte stream is identical to the synchronous
    * path.  `blockBoundary()` drains all in-flight blocks before
    * returning, so `compressedOffset` keeps its contract (exact right
    * after a boundary) and index sidecars are unaffected.
    *
    * Default stays synchronous: a Spark write stage usually runs as
    * many shard-writer tasks as the executor has cores, which already
    * saturates deflate; in-stream workers pay off for UNDER-
    * parallelized stages — the classic `coalesce(1)` final export. */
  final class BgzfOutputStream(raw: OutputStream, level: Int = 6,
                               blockSize: Int = 0xff00,
                               workers: Int = 0) extends OutputStream {
    require(blockSize <= 0xff00, "BGZF uncompressed block payload must be < 64KiB")
    private val buf = new Array[Byte](blockSize)
    private var n = 0
    private var coffset = 0L

    private val pool =
      if (workers > 1)
        java.util.concurrent.Executors.newFixedThreadPool(workers,
          new java.util.concurrent.ThreadFactory {
            def newThread(r: Runnable): Thread = {
              val t = new Thread(r, "bgzf-deflate"); t.setDaemon(true); t
            }
          })
      else null
    private val inFlight =
      new java.util.ArrayDeque[java.util.concurrent.Future[Array[Byte]]]()
    // compressed start offset of every block written so far — lets a
    // boundary be MARKED without draining the pipeline (deferred
    // resolution via offsetOfBlock once the stream is drained)
    private val blockStarts = new scala.collection.mutable.ArrayBuffer[Long]()
    private var blocksEnqueued = 0

    /** Compressed offset of the block that the NEXT written byte will
      * start (valid right after blockBoundary()/construction). */
    def compressedOffset: Long = coffset
    def pendingBytes: Int = n

    /** Mark a block boundary WITHOUT draining the deflate pipeline:
      * returns the index of the block the next byte will start, to be
      * resolved with [[offsetOfBlock]] after a draining boundary
      * (blockBoundary/close).  This is what keeps index-granularity
      * markers from serializing the pipelined writer. */
    def markBoundary(): Int = {
      if (n > 0) flushBlock()
      blocksEnqueued
    }

    /** Compressed start offset of block `i` — valid once every block
      * up to `i` has been physically written (after blockBoundary()/
      * close()). */
    def offsetOfBlock(i: Int): Long =
      if (i < blockStarts.length) blockStarts(i) else coffset

    override def write(b: Int): Unit = {
      buf(n) = b.toByte
      n += 1
      if (n == blockSize) flushBlock()
    }

    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      var o = off; var remaining = len
      while (remaining > 0) {
        val c = math.min(remaining, blockSize - n)
        System.arraycopy(b, o, buf, n, c)
        n += c; o += c; remaining -= c
        if (n == blockSize) flushBlock()
      }
    }

    def blockBoundary(): Unit = {
      if (n > 0) flushBlock()
      drainAll()
    }

    private def flushBlock(): Unit = {
      if (pool == null) {
        blockStarts += coffset
        coffset += writeBlockTo(raw, buf, 0, n, level)
      } else {
        val copy = java.util.Arrays.copyOf(buf, n)
        // bound in-flight memory to ~2 blocks per worker
        while (inFlight.size >= workers * 2) drainOne()
        inFlight.add(pool.submit(new java.util.concurrent.Callable[Array[Byte]] {
          def call(): Array[Byte] = {
            val b = new java.io.ByteArrayOutputStream(copy.length / 2 + 64)
            writeBlockTo(b, copy, 0, copy.length, level)
            b.toByteArray
          }
        }))
      }
      blocksEnqueued += 1
      n = 0
    }

    private def drainOne(): Unit = {
      val b = inFlight.poll().get()
      blockStarts += coffset
      raw.write(b)
      coffset += b.length
    }

    private def drainAll(): Unit = while (!inFlight.isEmpty) drainOne()

    override def flush(): Unit = { drainAll(); raw.flush() }

    override def close(): Unit = {
      blockBoundary()
      if (pool != null) pool.shutdown()
      raw.write(EofMarker)
      raw.flush()
      raw.close()
    }

    /** Close flushing pending data but WITHOUT the EOF terminator —
      * used for shards that will be concatenated (the merger appends
      * one terminator at the very end, ref: SAMOutputPreparer). */
    def closeWithoutTerminator(): Unit = {
      blockBoundary()
      if (pool != null) pool.shutdown()
      raw.flush()
      raw.close()
    }
  }

  /** Deflate a payload of ANY size as one or more BGZF blocks;
    * returns bytes written.  (Large BAM/BCF headers exceed one block.) */
  def writeBlocksTo(out: OutputStream, data: Array[Byte], off: Int, len: Int,
                    level: Int = 6): Long = {
    var written = 0L
    var o = off
    var remaining = len
    do {
      val c = math.min(remaining, 0xff00)
      written += writeBlockTo(out, data, o, c, level)
      o += c
      remaining -= c
    } while (remaining > 0)
    written
  }

  // Per-thread Deflater + scratch buffer reuse: a BGZF write calls
  // writeBlockTo once per 64 KB, and Deflater construction allocates
  // native zlib state each time; reset() reuses it.  Keyed by level
  // (writers use one level; the map stays size-1 per thread).
  private val deflaterTL =
    ThreadLocal.withInitial[java.util.HashMap[Integer, Deflater]](
      () => new java.util.HashMap[Integer, Deflater]())
  private val cbufTL =
    ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](MaxBlockSize))
  private val inflaterTL =
    ThreadLocal.withInitial[Inflater](() => new Inflater(true))

  /** Deflate one payload as a single BGZF block; returns bytes written.
    * Payload must fit one block — use [[writeBlocksTo]] otherwise. */
  def writeBlockTo(out: OutputStream, data: Array[Byte], off: Int, len: Int,
                   level: Int = 6): Int = {
    require(len <= 0xff00, s"BGZF block payload $len exceeds 65280 bytes")
    val m = deflaterTL.get()
    var def_ = m.get(level)
    if (def_ == null) { def_ = new Deflater(level, true); m.put(level, def_) }
    else def_.reset()
    def_.setInput(data, off, len)
    def_.finish()
    val cbuf = cbufTL.get()
    var cn = 0
    while (!def_.finished()) cn += def_.deflate(cbuf, cn, cbuf.length - cn)
    val crc = new CRC32()
    crc.update(data, off, len)
    val bsize = cn + 12 + 6 + 8 // header(12) + extra(6) + cdata + crc/isize(8)
    val hdr = new ByteArrayOutputStream()
    def w8(v: Int): Unit = hdr.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    def w32(v: Long): Unit = { w8(v.toInt); w8((v >> 8).toInt); w8((v >> 16).toInt); w8((v >> 24).toInt) }
    w8(0x1f); w8(0x8b); w8(8); w8(4) // magic, deflate, FEXTRA
    w32(0); w8(0); w8(0xff) // mtime, xfl, os
    w16(6) // xlen
    w8('B'); w8('C'); w16(2); w16(bsize - 1)
    hdr.write(cbuf, 0, cn)
    w32(crc.getValue)
    w32(len.toLong)
    val arr = hdr.toByteArray
    out.write(arr)
    arr.length
  }

  // ------------------------------------------------------- split guessing

  /** Find the next BGZF block boundary at or after `off` in `bytes`,
    * validating that `confirm` consecutive block headers chain
    * correctly (ref semantics: util/BGZFSplitGuesser.java:37 — scan for
    * the gzip magic and confirm by following BSIZE links).  Returns the
    * index within `bytes`, or -1. */
  def findBlockStart(bytes: Array[Byte], off: Int, confirm: Int = 2): Int = {
    var p = off
    while (p <= bytes.length - 18) {
      if (parseBsize(bytes, p) > 0) {
        // confirm by following BSIZE links; running off the end of the
        // window counts as confirmation (we can't disprove there)
        var q = p
        var seen = 0
        var ok = true
        while (ok && seen < confirm && q <= bytes.length - 18) {
          val bs = parseBsize(bytes, q)
          if (bs > 0) { q += bs; seen += 1 } else ok = false
        }
        if (ok) return p
      }
      p += 1
    }
    -1
  }
}

/** BGZF block index sidecar (".gbi") — re-expression of
  * util/BGZFBlockIndexer.java / BGZFBlockIndex.java: verified block
  * start offsets sampled every ~`granularity` compressed bytes, so
  * split placement for ANY BGZF-compressed file (text or binary) is a
  * binary search instead of a 256 KB window scan per target.  At
  * 100 TB that turns driver-side split planning from hundreds of GB
  * of reads into one small sidecar fetch.  Built in one header-seek
  * pass (payloads are never read).
  */
object BgzfBlockIndex {

  private val Magic = 0x47424958 // "GBIX"

  def indexPath(file: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(file.getParent, file.getName + ".gbi")

  def write(fs: org.apache.hadoop.fs.FileSystem, path: org.apache.hadoop.fs.Path,
            offsets: Seq[Long], fileLen: Long): Unit = {
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(fs.create(path, true)))
    out.writeInt(Magic); out.writeInt(1)
    out.writeLong(fileLen)
    out.writeInt(offsets.length)
    offsets.foreach(out.writeLong)
    out.close()
  }

  /** (sampled block offsets ascending, indexed file length). */
  def read(fs: org.apache.hadoop.fs.FileSystem,
           path: org.apache.hadoop.fs.Path): Option[(Array[Long], Long)] = {
    if (!fs.exists(path)) return None
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(fs.open(path)))
    try {
      if (in.readInt() != Magic) return None
      in.readInt() // version
      val len = in.readLong()
      val n = in.readInt()
      Some((Array.fill(n)(in.readLong()), len))
    } finally in.close()
  }

  /** Walk block headers (seek + 18 bytes each; payloads untouched) and
    * sample one offset per `granularity` compressed bytes. */
  def build(file: String, granularity: Long = 1L << 20): Seq[Long] = {
    val (fs, p) = Fs.get(file)
    val len = fs.getFileStatus(p).getLen
    val raw = fs.open(p)
    try {
      val out = scala.collection.mutable.ArrayBuffer[Long]()
      var off = 0L
      var nextSample = 0L
      val hdr = new Array[Byte](18)
      while (off < len - Bgzf.EofMarker.length) {
        // Long min BEFORE narrowing: (len - off).toInt overflows past
        // 2 GiB — exactly the files this index is for
        raw.readFully(off, hdr, 0, math.min(18L, len - off).toInt)
        val bsize = Bgzf.parseBsize(hdr, 0)
        require(bsize > 0, s"not a BGZF block at offset $off")
        if (off >= nextSample) {
          out += off
          nextSample = off + granularity
        }
        off += bsize
      }
      out.toSeq
    } finally raw.close()
  }

  def buildAndWrite(file: String, granularity: Long = 1L << 20): Unit = {
    val (fs, p) = Fs.get(file)
    write(fs, indexPath(p), build(file, granularity), fs.getFileStatus(p).getLen)
  }

  /** Smallest indexed offset >= target (file length if none). */
  def ceilOffset(offsets: Array[Long], fileLen: Long, target: Long): Long = {
    var lo = 0; var hi = offsets.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (offsets(mid) < target) lo = mid + 1 else hi = mid
    }
    if (lo < offsets.length) offsets(lo) else fileLen
  }
}
