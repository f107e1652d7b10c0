package graft.sources

import java.io.ByteArrayOutputStream

import graft.sources.CramForeign.ByteStream

/** CRAM 3.1 adaptive arithmetic coder (block compression method 6;
  * public hts-specs "CRAM compression method specifications",
  * adaptive arithmetic coding section).
  *
  * An LZMA-style carry-handling range coder over adaptive frequency
  * models: every symbol starts at frequency 1, gains STEP on each
  * occurrence, and the model halves when its total crosses the cap —
  * so the code adapts to local statistics with no stored tables.
  * Order-0 keeps one model; order-1 keeps one model per previous
  * byte.  The stream reuses the Nx16 container conventions: the same
  * flags byte (order bit, CAT, RLE, PACK, STRIPE, NOSZ), uint7 sizes,
  * and the same pre-transforms ([[RansNx16]] helpers).
  *
  * Conformance caveat identical to [[RansNx16]]/[[NameTok]]: no
  * htslib-written 3.1 fixture exists offline, so the coder is pinned
  * by round-trips, not live foreign bytes.
  */
object Arith {

  // range coder + adaptive model are shared with the fqzcomp codec:
  // [[RangeEncoder]]/[[RangeDecoder]]/[[SimpleModel]] (RangeCoder.scala)

  // ----------------------------------------------------------- API

  /** Decode one method-6 stream.  `expectedLen` required for NOSZ. */
  def decode(comp: Array[Byte], expectedLen: Int = -1): Array[Byte] = {
    val bs = new ByteStream(comp)
    val flags = bs.byte()
    // in the method-6 spec, bit 0x04 (N32 in the Nx16 vocabulary) marks
    // EXTERNAL compression of the stream; decoding past it would treat
    // externally-compressed literals as range-coded and silently corrupt
    if ((flags & RansNx16.N32) != 0)
      throw new UnsupportedOperationException(
        "arith codec: external-compression flag (0x04) not supported")
    val outLen =
      if ((flags & RansNx16.NoSz) != 0) {
        require(expectedLen >= 0, "NOSZ stream needs an expected length")
        expectedLen
      } else RansNx16.readUint7(bs)
    if (outLen == 0) return Array.emptyByteArray

    if ((flags & RansNx16.Stripe) != 0) {
      val nStripe = bs.byte()
      val clens = Array.fill(nStripe)(RansNx16.readUint7(bs))
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

    var packMap: Array[Int] = null
    var packedLen = outLen
    if ((flags & RansNx16.Pack) != 0) {
      val nsym = bs.byte()
      packMap = Array.fill(nsym)(bs.byte())
      packedLen = RansNx16.readUint7(bs)
    }
    var runSyms: Array[Int] = null
    var runLens: ByteStream = null
    var litLen = packedLen
    if ((flags & RansNx16.Rle) != 0) {
      val (rs, rl, ll) = RansNx16.readRleMeta(bs)
      runSyms = rs; runLens = rl; litLen = ll
    }

    val lits = new Array[Byte](litLen)
    if (litLen == 0) {
      // e.g. PACK with a single-symbol alphabet: nothing was stored
    } else if ((flags & RansNx16.Cat) != 0) {
      System.arraycopy(bs.data, bs.p, lits, 0, litLen)
      bs.p += litLen
    } else {
      val rc = new RangeDecoder(bs)
      if ((flags & RansNx16.Order1) != 0) {
        val models = Array.fill(256)(new SimpleModel(256))
        var prev = 0
        var i = 0
        while (i < litLen) {
          val s = models(prev).decodeSym(rc)
          lits(i) = s.toByte
          prev = s
          i += 1
        }
      } else {
        val m = new SimpleModel(256)
        var i = 0
        while (i < litLen) { lits(i) = m.decodeSym(rc).toByte; i += 1 }
      }
    }

    val expanded =
      if (runSyms != null) RansNx16.rleExpand(lits, runSyms, runLens, packedLen)
      else lits
    if (packMap != null) RansNx16.unpackData(expanded, packMap, outLen)
    else expanded
  }

  /** Encode with the given flags (the [[RansNx16]] flag vocabulary;
    * N32 is meaningless here and ignored). */
  def encode(raw: Array[Byte], flags0: Int): Array[Byte] = {
    var flags = flags0 & ~RansNx16.N32
    val out = new ByteArrayOutputStream(raw.length / 2 + 64)
    if (raw.isEmpty) {
      out.write(flags)
      if ((flags & RansNx16.NoSz) == 0) RansNx16.writeUint7(out, 0)
      return out.toByteArray
    }

    if ((flags & RansNx16.Stripe) != 0) {
      val nStripe = 4
      val subs = (0 until nStripe).map { j =>
        val ulen = (raw.length - j + nStripe - 1) / nStripe
        val sub = new Array[Byte](ulen)
        var k = 0
        while (k < ulen) { sub(k) = raw(j + k * nStripe); k += 1 }
        encode(sub, (flags & ~RansNx16.Stripe) | RansNx16.NoSz)
      }
      out.write(flags)
      if ((flags & RansNx16.NoSz) == 0) RansNx16.writeUint7(out, raw.length)
      out.write(nStripe)
      subs.foreach(s => RansNx16.writeUint7(out, s.length))
      subs.foreach(s => out.write(s))
      return out.toByteArray
    }

    var data = raw
    var packMeta: ByteArrayOutputStream = null
    if ((flags & RansNx16.Pack) != 0) {
      val present = (0 until 256).filter(s => raw.exists(b => (b & 0xff) == s))
      if (present.length > 16) flags &= ~RansNx16.Pack
      else {
        val map = present.toArray
        data = RansNx16.packData(data, map)
        packMeta = new ByteArrayOutputStream()
        packMeta.write(map.length)
        map.foreach(packMeta.write)
      }
    }
    var rleMeta: ByteArrayOutputStream = null
    val packedLen = data.length
    if ((flags & RansNx16.Rle) != 0) {
      val (lits, runSyms, lens) = RansNx16.rleSplit(data)
      if (runSyms.isEmpty || runSyms.length > 255) flags &= ~RansNx16.Rle
      else {
        rleMeta = new ByteArrayOutputStream()
        rleMeta.write(runSyms.length)
        runSyms.foreach(rleMeta.write)
        lens.foreach(RansNx16.writeUint7(rleMeta, _))
        data = lits
      }
    }

    out.write(flags)
    if ((flags & RansNx16.NoSz) == 0) RansNx16.writeUint7(out, raw.length)
    if (packMeta != null) {
      packMeta.writeTo(out)
      RansNx16.writeUint7(out, packedLen)
    }
    if (rleMeta != null) RansNx16.writeRleMeta(out, rleMeta, data.length)
    if (data.isEmpty) return out.toByteArray
    if ((flags & RansNx16.Cat) != 0) out.write(data)
    else {
      val rc = new RangeEncoder(out)
      if ((flags & RansNx16.Order1) != 0) {
        val models = Array.fill(256)(new SimpleModel(256))
        var prev = 0
        var i = 0
        while (i < data.length) {
          val s = data(i) & 0xff
          models(prev).encodeSym(rc, s)
          prev = s
          i += 1
        }
      } else {
        val m = new SimpleModel(256)
        var i = 0
        while (i < data.length) { m.encodeSym(rc, data(i) & 0xff); i += 1 }
      }
      rc.finish()
    }
    out.toByteArray
  }
}
