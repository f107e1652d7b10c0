package graft.sources

import java.io.ByteArrayOutputStream

import graft.sources.CramForeign.ByteStream

/** rANS Nx16 — the CRAM 3.1 entropy coder (public hts-specs
  * "CRAM compression method specifications" §rANS Nx16; block
  * compression method 5).  Differences from the 3.0 rANS 4x8 coder
  * ([[CramForeign.Rans]]): 16-bit renormalization with a 2^15 lower
  * bound, 4- or 32-way interleaved states, variable-length uint7
  * sizes, and a set of pre-transforms signalled by the flags byte —
  * PACK (bit-pack small alphabets), RLE (run-length), CAT (stored
  * verbatim), STRIPE (N interleaved sub-streams compressed
  * independently), NOSZ (size carried out of band).
  *
  * The reference project never decodes CRAM itself (it delegates to
  * htsjdk, CRAMRecordReader.java:30); this implementation is written
  * from the public spec.  No htslib-written 3.1 fixture is available
  * offline, so conformance is pinned the same way the 3.0 path was in
  * round 7: codec-level round-trips over every flag combination plus
  * a re-framed real container (ForeignCramSpec) — with the residual
  * risk that a live htslib 3.1 byte stream exercises a meta-layout
  * corner our own encoder never produces.
  */
object RansNx16 {

  // flags byte (spec §rANS Nx16 "Format byte")
  val Order1 = 0x01
  val N32 = 0x04
  val Stripe = 0x08
  val NoSz = 0x10
  val Cat = 0x20
  val Rle = 0x40
  val Pack = 0x80

  private final val Low = 1L << 15 // renormalization lower bound
  private final val Shift0 = 12    // order-0 frequency precision

  // ------------------------------------------------------------ uint7

  private[sources] def readUint7(bs: ByteStream): Int = {
    var v = 0
    var c = bs.byte()
    while ((c & 0x80) != 0) { v = (v << 7) | (c & 0x7f); c = bs.byte() }
    (v << 7) | c
  }

  private[sources] def writeUint7(out: ByteArrayOutputStream, v0: Int): Unit = {
    require(v0 >= 0)
    var started = false
    var shift = 28
    while (shift > 0) {
      val part = (v0 >>> shift) & 0x7f
      if (part != 0 || started) { out.write(0x80 | part); started = true }
      shift -= 7
    }
    out.write(v0 & 0x7f)
  }

  // ------------------------------------------------------- alphabet

  /** Symbols present, ascending; consecutive runs elided via a count
    * byte after the second element of a run; terminated by 0 (which
    * can only legitimately appear as the FIRST symbol). */
  private def readAlphabet(bs: ByteStream): Array[Int] = {
    val syms = scala.collection.mutable.ArrayBuffer[Int]()
    var sym = bs.byte()
    var last = sym
    var rle = 0
    var done = false
    while (!done) {
      syms += sym
      if (rle > 0) { rle -= 1; sym += 1 }
      else {
        sym = bs.byte()
        if (sym == last + 1) rle = bs.byte()
      }
      last = sym
      if (sym == 0 && rle == 0) done = true
    }
    syms.toArray
  }

  private def writeAlphabet(out: ByteArrayOutputStream, syms: Array[Int]): Unit = {
    var idx = 0
    while (idx < syms.length) {
      out.write(syms(idx))
      if (idx > 0 && syms(idx) == syms(idx - 1) + 1) {
        // run of consecutive symbols: emit the remaining length once
        var k = idx + 1
        while (k < syms.length && syms(k) == syms(k - 1) + 1) k += 1
        out.write(k - idx - 1)
        idx = k
      } else idx += 1
    }
    out.write(0)
  }

  // ------------------------------------------------- frequency tables

  private def normalize(count: Array[Long], total: Long, target: Int): Array[Int] = {
    val freq = new Array[Int](256)
    var assigned = 0
    var maxI = 0
    var i = 0
    while (i < 256) {
      if (count(i) > 0) {
        val f = math.max(1L, count(i) * target / total).toInt
        freq(i) = f
        assigned += f
        if (freq(i) > freq(maxI) || count(maxI) == 0) maxI = i
      }
      i += 1
    }
    freq(maxI) += target - assigned
    require(freq(maxI) > 0, "rans nx16 normalization underflow")
    freq
  }

  private def cumFrom(freq: Array[Int]): Array[Int] = {
    val cum = new Array[Int](257)
    var i = 0
    while (i < 256) { cum(i + 1) = cum(i) + freq(i); i += 1 }
    cum
  }

  private def lutFrom(freq: Array[Int], cum: Array[Int], size: Int): Array[Byte] = {
    val lut = new Array[Byte](size)
    var s = 0
    while (s < 256) {
      var i = cum(s)
      val e = cum(s) + freq(s)
      while (i < e && i < size) { lut(i) = s.toByte; i += 1 }
      s += 1
    }
    lut
  }

  // ------------------------------------------------------- rANS core

  private def readState(bs: ByteStream): Long =
    (bs.byte() | (bs.byte() << 8) | (bs.byte() << 16) |
      (bs.byte().toLong << 24)) & 0xffffffffL

  private def read16(bs: ByteStream): Int = bs.byte() | (bs.byte() << 8)

  /** Encode one symbol (reverse direction) with 16-bit renorm; emitted
    * byte pairs land in `bytes` little-endian and the whole buffer is
    * reversed pairwise on flush. */
  private def encSym(x: Long, f: Int, c: Int, shift: Int,
                     bytes: ByteArrayOutputStream): Long = {
    var v = x
    val xMax = ((Low >> shift) << 16) * f
    while (v >= xMax) {
      bytes.write((v & 0xff).toInt); bytes.write(((v >> 8) & 0xff).toInt)
      v >>>= 16
    }
    ((v / f) << shift) + (v % f) + c
  }

  private def writeStatesAndWords(payload: ByteArrayOutputStream,
                                  r: Array[Long],
                                  bytes: ByteArrayOutputStream): Unit = {
    r.foreach { s =>
      payload.write((s & 0xff).toInt); payload.write(((s >> 8) & 0xff).toInt)
      payload.write(((s >> 16) & 0xff).toInt); payload.write(((s >> 24) & 0xff).toInt)
    }
    // 16-bit words were emitted in reverse order; un-reverse pairwise
    val b = bytes.toByteArray
    var i = b.length - 2
    while (i >= 0) { payload.write(b(i)); payload.write(b(i + 1)); i -= 2 }
  }

  // --------------------------------------------------------- order 0

  private def decode0(bs: ByteStream, out: Array[Byte], n: Int): Unit = {
    val syms = readAlphabet(bs)
    val freq = new Array[Int](256)
    syms.foreach(s => freq(s) = readUint7(bs))
    val cum = cumFrom(freq)
    val lut = lutFrom(freq, cum, 1 << Shift0)
    val r = Array.fill(n)(readState(bs))
    val mask = (1 << Shift0) - 1
    var i = 0
    while (i < out.length) {
      val j = i % n
      val f = (r(j) & mask).toInt
      val s = lut(f) & 0xff
      out(i) = s.toByte
      r(j) = freq(s) * (r(j) >>> Shift0) + f - cum(s)
      while (r(j) < Low) r(j) = (r(j) << 16) | read16(bs)
      i += 1
    }
  }

  private def encode0(raw: Array[Byte], n: Int,
                      payload: ByteArrayOutputStream): Unit = {
    val count = new Array[Long](256)
    raw.foreach(b => count(b & 0xff) += 1)
    val freq = normalize(count, raw.length.toLong, 1 << Shift0)
    val cum = cumFrom(freq)
    val syms = (0 until 256).filter(freq(_) > 0).toArray
    writeAlphabet(payload, syms)
    syms.foreach(s => writeUint7(payload, freq(s)))
    val bytes = new ByteArrayOutputStream(raw.length)
    val r = Array.fill(n)(Low)
    var i = raw.length - 1
    while (i >= 0) {
      val j = i % n
      val s = raw(i) & 0xff
      r(j) = encSym(r(j), freq(s), cum(s), Shift0, bytes)
      i -= 1
    }
    writeStatesAndWords(payload, r, bytes)
  }

  // --------------------------------------------------------- order 1

  private def decode1(bs: ByteStream, out: Array[Byte], n: Int): Unit = {
    val desc = bs.byte()
    val shift = desc >> 4
    val tableBs =
      if ((desc & 1) == 0) bs
      else {
        // the table itself rides an order-0 Nx16 stream
        val uSize = readUint7(bs)
        val cSize = readUint7(bs)
        val sub = new Array[Byte](cSize)
        System.arraycopy(bs.data, bs.p, sub, 0, cSize)
        bs.p += cSize
        new ByteStream(decode(sub, uSize))
      }
    val syms = readAlphabet(tableBs)
    val freq = new Array[Array[Int]](256)
    val cum = new Array[Array[Int]](256)
    val lut = new Array[Array[Byte]](256)
    syms.foreach { c =>
      val f = new Array[Int](256)
      var jj = 0
      while (jj < syms.length) {
        val v = readUint7(tableBs)
        f(syms(jj)) = v
        if (v == 0) jj += tableBs.byte() // run of zero rows entries
        jj += 1
      }
      freq(c) = f
      cum(c) = cumFrom(f)
      lut(c) = lutFrom(f, cum(c), 1 << shift)
    }
    val r = Array.fill(n)(readState(bs))
    val last = new Array[Int](n)
    val mask = (1 << shift) - 1
    val chunk = out.length / n
    def step(j: Int, pos: Int): Unit = {
      val c = last(j)
      val f = (r(j) & mask).toInt
      val s = lut(c)(f) & 0xff
      out(pos) = s.toByte
      r(j) = freq(c)(s) * (r(j) >>> shift) + f - cum(c)(s)
      while (r(j) < Low) r(j) = (r(j) << 16) | read16(bs)
      last(j) = s
    }
    var i = 0
    while (i < chunk) {
      var j = 0
      while (j < n) { step(j, j * chunk + i); j += 1 }
      i += 1
    }
    i = n * chunk
    while (i < out.length) { step(n - 1, i); i += 1 }
  }

  private def encode1(raw: Array[Byte], n: Int,
                      payload: ByteArrayOutputStream): Unit = {
    val shift = 12
    val chunk = raw.length / n
    val count = Array.fill(256)(new Array[Long](256))
    val totals = new Array[Long](256)
    var j = 0
    while (j < n) { // chunk starts carry context 0
      val start = j * chunk
      if (start < raw.length) { count(0)(raw(start) & 0xff) += 1; totals(0) += 1 }
      j += 1
    }
    var i = 1
    while (i < raw.length) {
      // way n-1 runs contiguously through the tail; ways 0..n-2 each
      // cover exactly one chunk
      var isStart = false
      var k = 1
      while (k < n && !isStart) { if (i == k * chunk) isStart = true; k += 1 }
      if (!isStart) {
        val c = raw(i - 1) & 0xff
        count(c)(raw(i) & 0xff) += 1
        totals(c) += 1
      }
      i += 1
    }
    val freq = new Array[Array[Int]](256)
    val cum = new Array[Array[Int]](256)
    var c = 0
    while (c < 256) {
      if (totals(c) > 0) {
        freq(c) = normalize(count(c), totals(c), 1 << shift)
        cum(c) = cumFrom(freq(c))
      }
      c += 1
    }
    // alphabet = all symbols appearing as value or context, plus the
    // initial context 0 (symbols ascend, 0 may only appear first)
    val present = new Array[Boolean](256)
    present(0) = true
    raw.foreach(b => present(b & 0xff) = true)
    val syms = (0 until 256).filter(present).toArray
    payload.write((shift << 4) | 0) // uncompressed table
    writeAlphabet(payload, syms)
    syms.foreach { ci =>
      val f = if (freq(ci) != null) freq(ci) else new Array[Int](256)
      var jj = 0
      while (jj < syms.length) {
        writeUint7(payload, f(syms(jj)))
        if (f(syms(jj)) == 0) {
          // count following zero entries within this row
          var k = jj + 1
          while (k < syms.length && f(syms(k)) == 0) k += 1
          payload.write(k - jj - 1)
          jj = k
        } else jj += 1
      }
    }
    val bytes = new ByteArrayOutputStream(raw.length)
    val r = Array.fill(n)(Low)
    def ctxOf(pos: Int, streamStart: Int): Int =
      if (pos == streamStart) 0 else raw(pos - 1) & 0xff
    def enc1(j: Int, pos: Int, streamStart: Int): Unit = {
      val cc = ctxOf(pos, streamStart)
      val s = raw(pos) & 0xff
      r(j) = encSym(r(j), freq(cc)(s), cum(cc)(s), shift, bytes)
    }
    i = raw.length - 1
    while (i >= n * chunk) { enc1(n - 1, i, (n - 1) * chunk); i -= 1 }
    var row = chunk - 1
    while (row >= 0) {
      var jj = n - 1
      while (jj >= 0) { enc1(jj, jj * chunk + row, jj * chunk); jj -= 1 }
      row -= 1
    }
    writeStatesAndWords(payload, r, bytes)
  }

  // ------------------------------------------------- pre-transforms

  private[sources] def packBits(nsym: Int): Int =
    if (nsym <= 1) 0 else if (nsym <= 2) 1 else if (nsym <= 4) 2
    else if (nsym <= 16) 4 else 8

  private[sources] def packData(raw: Array[Byte], map: Array[Int]): Array[Byte] = {
    val bits = packBits(map.length)
    if (bits == 0) return Array.emptyByteArray
    val inv = new Array[Int](256)
    map.zipWithIndex.foreach { case (s, i) => inv(s) = i }
    val out = new Array[Byte]((raw.length * bits + 7) / 8)
    var i = 0
    while (i < raw.length) {
      val v = inv(raw(i) & 0xff)
      val bit = i * bits
      out(bit >> 3) = (out(bit >> 3) | (v << (bit & 7))).toByte
      i += 1
    }
    out
  }

  private[sources] def unpackData(packed: Array[Byte], map: Array[Int],
                         outLen: Int): Array[Byte] = {
    val bits = packBits(map.length)
    val out = new Array[Byte](outLen)
    if (bits == 0) {
      java.util.Arrays.fill(out, map.headOption.getOrElse(0).toByte)
      return out
    }
    val mask = (1 << bits) - 1
    var i = 0
    while (i < outLen) {
      val bit = i * bits
      val v = ((packed(bit >> 3) & 0xff) >> (bit & 7)) & mask
      out(i) = map(v).toByte
      i += 1
    }
    out
  }

  /** RLE split: returns (literal stream, meta = runSyms ++ runLens).
    * A run symbol's every occurrence in the literal stream is followed
    * (in the meta stream) by its extra-repeat count. */
  private[sources] def rleSplit(raw: Array[Byte]): (Array[Byte], Array[Int], Array[Int]) = {
    // symbols worth run-length encoding: net savings per symbol
    val saving = new Array[Long](256)
    var i = 0
    while (i < raw.length) {
      val s = raw(i) & 0xff
      var j2 = i + 1
      while (j2 < raw.length && raw(j2) == raw(i)) j2 += 1
      saving(s) += (j2 - i - 2) // run collapses to 1 literal + ~1 meta byte
      i = j2
    }
    val runSyms = (0 until 256).filter(saving(_) > 0).toArray
    val isRun = new Array[Boolean](256)
    runSyms.foreach(isRun(_) = true)
    val lits = new ByteArrayOutputStream(raw.length)
    val lens = scala.collection.mutable.ArrayBuffer[Int]()
    i = 0
    while (i < raw.length) {
      val s = raw(i) & 0xff
      if (isRun(s)) {
        var j2 = i + 1
        while (j2 < raw.length && raw(j2) == raw(i)) j2 += 1
        lits.write(s)
        lens += (j2 - i - 1)
        i = j2
      } else { lits.write(s); i += 1 }
    }
    (lits.toByteArray, runSyms, lens.toArray)
  }

  private[sources] def rleExpand(lits: Array[Byte], runSyms: Array[Int],
                        lens: ByteStream, outLen: Int): Array[Byte] = {
    val isRun = new Array[Boolean](256)
    runSyms.foreach(isRun(_) = true)
    val out = new Array[Byte](outLen)
    var o = 0
    var i = 0
    while (i < lits.length) {
      val s = lits(i) & 0xff
      out(o) = lits(i); o += 1
      if (isRun(s)) {
        var extra = readUint7(lens)
        while (extra > 0) { out(o) = lits(i); o += 1; extra -= 1 }
      }
      i += 1
    }
    require(o == outLen, s"rle expansion produced $o of $outLen bytes")
    out
  }

  /** Read spec-framed RLE metadata (hts-specs Nx16 RLE layout): uint7
    * `rle_meta_len` whose LOW BIT discriminates raw (1) from
    * order-0-rANS-compressed (0) metadata, then uint7 literal length,
    * then the metadata bytes (raw `rle_meta_len>>1` bytes, or uint7
    * compressed length + payload decoding to `rle_meta_len>>1`).
    * Returns (runSyms, runLens stream, literal length). */
  private[sources] def readRleMeta(bs: ByteStream): (Array[Int], ByteStream, Int) = {
    val metaRaw = readUint7(bs)
    val litLen = readUint7(bs)
    val mlen = metaRaw >>> 1
    val meta = new Array[Byte](mlen)
    if ((metaRaw & 1) != 0) {
      System.arraycopy(bs.data, bs.p, meta, 0, mlen)
      bs.p += mlen
    } else {
      val clen = readUint7(bs)
      val sub = new Array[Byte](clen)
      System.arraycopy(bs.data, bs.p, sub, 0, clen)
      bs.p += clen
      decode0(new ByteStream(sub), meta, 4)
    }
    val mbs = new ByteStream(meta)
    val l = mbs.byte()
    val runSyms = Array.fill(if (l == 0) 256 else l)(mbs.byte())
    (runSyms, mbs, litLen)
  }

  /** Write spec-framed RLE metadata (always the raw form: low bit 1). */
  private[sources] def writeRleMeta(out: ByteArrayOutputStream,
                                    meta: ByteArrayOutputStream,
                                    litLen: Int): Unit = {
    writeUint7(out, (meta.size() << 1) | 1)
    writeUint7(out, litLen)
    meta.writeTo(out)
  }

  // ----------------------------------------------------------- API

  /** Decode one rANS Nx16 stream.  `expectedLen` is required when the
    * stream carries the NOSZ flag (size known out of band). */
  def decode(comp: Array[Byte], expectedLen: Int = -1): Array[Byte] = {
    val bs = new ByteStream(comp)
    val flags = bs.byte()
    val outLen =
      if ((flags & NoSz) != 0) {
        require(expectedLen >= 0, "NOSZ stream needs an expected length")
        expectedLen
      } else readUint7(bs)
    if (outLen == 0) return Array.emptyByteArray

    if ((flags & Stripe) != 0) {
      val nStripe = bs.byte()
      val clens = Array.fill(nStripe)(readUint7(bs))
      val out = new Array[Byte](outLen)
      var j = 0
      var off = bs.p
      while (j < nStripe) {
        val ulen = (outLen - j + nStripe - 1) / nStripe
        val sub = new Array[Byte](clens(j))
        System.arraycopy(bs.data, off, sub, 0, clens(j))
        off += clens(j)
        val dec = decode(sub, ulen)
        require(dec.length == ulen, s"stripe $j decoded ${dec.length} of $ulen")
        var k = 0
        while (k < ulen) { out(j + k * nStripe) = dec(k); k += 1 }
        j += 1
      }
      return out
    }

    val n = if ((flags & N32) != 0) 32 else 4

    // PACK meta precedes RLE meta; both precede the entropy payload
    var packMap: Array[Int] = null
    var packedLen = outLen
    if ((flags & Pack) != 0) {
      val nsym = bs.byte()
      packMap = Array.fill(nsym)(bs.byte())
      packedLen = readUint7(bs)
    }
    var runSyms: Array[Int] = null
    var runLens: ByteStream = null
    var litLen = packedLen
    if ((flags & Rle) != 0) {
      val (rs, rl, ll) = readRleMeta(bs)
      runSyms = rs; runLens = rl; litLen = ll
    }

    val lits = new Array[Byte](litLen)
    if (litLen == 0) {
      // e.g. PACK with a single-symbol alphabet: nothing was stored
    } else if ((flags & Cat) != 0) {
      System.arraycopy(bs.data, bs.p, lits, 0, litLen)
      bs.p += litLen
    } else if ((flags & Order1) != 0) decode1(bs, lits, n)
    else decode0(bs, lits, n)

    val expanded =
      if (runSyms != null) rleExpand(lits, runSyms, runLens, packedLen)
      else lits
    if (packMap != null) unpackData(expanded, packMap, outLen)
    else expanded
  }

  /** Encode with the given flags (any combination of [[Order1]],
    * [[N32]], [[Cat]], [[Rle]], [[Pack]], [[Stripe]], [[NoSz]]).
    * PACK silently drops when the alphabet exceeds 16 symbols. */
  def encode(raw: Array[Byte], flags0: Int): Array[Byte] = {
    var flags = flags0
    val out = new ByteArrayOutputStream(raw.length + 64)
    if (raw.isEmpty) { // length-0 stream: flags + size, no payload
      out.write(flags)
      if ((flags & NoSz) == 0) writeUint7(out, 0)
      return out.toByteArray
    }

    if ((flags & Stripe) != 0) {
      val nStripe = if ((flags & N32) != 0) 8 else 4
      val subs = (0 until nStripe).map { j =>
        val ulen = (raw.length - j + nStripe - 1) / nStripe
        val sub = new Array[Byte](ulen)
        var k = 0
        while (k < ulen) { sub(k) = raw(j + k * nStripe); k += 1 }
        encode(sub, (flags & ~Stripe & ~NoSz) | NoSz)
      }
      out.write(flags)
      if ((flags & NoSz) == 0) writeUint7(out, raw.length)
      out.write(nStripe)
      subs.foreach(s => writeUint7(out, s.length))
      subs.foreach(s => out.write(s))
      return out.toByteArray
    }

    val n = if ((flags & N32) != 0) 32 else 4

    var data = raw
    var packMeta: ByteArrayOutputStream = null
    if ((flags & Pack) != 0) {
      val present = (0 until 256).filter(s => raw.exists(b => (b & 0xff) == s))
      if (present.length > 16) flags &= ~Pack
      else {
        val map = present.toArray
        data = packData(data, map)
        packMeta = new ByteArrayOutputStream()
        packMeta.write(map.length)
        map.foreach(packMeta.write)
        // packed length written after the map (decoder reads it next)
      }
    }
    var rleMeta: ByteArrayOutputStream = null
    var packedLen = data.length
    if ((flags & Rle) != 0) {
      val (lits, runSyms, lens) = rleSplit(data)
      if (runSyms.isEmpty || runSyms.length > 255) flags &= ~Rle
      else {
        rleMeta = new ByteArrayOutputStream()
        rleMeta.write(runSyms.length)
        runSyms.foreach(rleMeta.write)
        lens.foreach(writeUint7(rleMeta, _))
        data = lits
      }
    }

    out.write(flags)
    if ((flags & NoSz) == 0) writeUint7(out, raw.length)
    if (packMeta != null) {
      packMeta.writeTo(out)
      writeUint7(out, packedLen)
    }
    if (rleMeta != null) writeRleMeta(out, rleMeta, data.length)
    if (data.isEmpty) return out.toByteArray
    if ((flags & Cat) != 0) out.write(data)
    else {
      val payload = new ByteArrayOutputStream(data.length + 64)
      if ((flags & Order1) != 0) encode1(data, n, payload)
      else encode0(data, n, payload)
      payload.writeTo(out)
    }
    out.toByteArray
  }
}
