package graft.sources

import java.io.ByteArrayOutputStream

import graft.sources.CramForeign.ByteStream

/** Shared range coder + adaptive model for the CRAM 3.1 coders that
  * need one (method 6 [[Arith]] and method 7 [[Fqz]]; public
  * hts-specs "CRAM compression method specifications").
  *
  * The coder is the spec's LZMA-style carry-handling range coder: a
  * 64-bit low with byte cache for carry propagation on the encode
  * side, a 32-bit sliding code window on the decode side.
  *
  * [[SimpleModel]] is the spec's adaptive frequency model: every
  * symbol starts at frequency 1, gains STEP per occurrence, the
  * model halves past MAX_FREQ, and the symbol table keeps itself
  * approximately frequency-sorted by swapping a bumped symbol ahead
  * of its (now lighter) predecessor — the sort order is part of the
  * coded stream contract because cumulative frequencies depend on it,
  * and encoder and decoder evolve it identically.
  */
private[sources] object RangeCoder {
  final val Top = 1L << 24
}

private[sources] final class RangeEncoder(val out: ByteArrayOutputStream) {
  private var low = 0L
  private var range = 0xFFFFFFFFL
  private var cache = 0
  private var cacheSize = 1L

  private def shiftLow(): Unit = {
    if (low < 0xFF000000L || low > 0xFFFFFFFFL) {
      val carry = (low >>> 32).toInt
      out.write(cache + carry)
      var i = 1L
      while (i < cacheSize) { out.write(0xFF + carry); i += 1 }
      cacheSize = 0
      cache = ((low >>> 24) & 0xFF).toInt
    }
    cacheSize += 1
    low = (low << 8) & 0xFFFFFFFFL
  }

  def encode(cumFreq: Int, freq: Int, tot: Int): Unit = {
    val r = range / tot
    low += cumFreq * r
    range = freq * r
    while (range < RangeCoder.Top) { range <<= 8; shiftLow() }
  }

  def finish(): Unit = {
    var i = 0
    while (i < 5) { shiftLow(); i += 1 }
  }
}

private[sources] final class RangeDecoder(bs: ByteStream) {
  private var range = 0xFFFFFFFFL
  private var code = 0L
  // first byte is the encoder's initial cache (always 0): skip it
  bs.byte()
  (0 until 4).foreach(_ => code = (code << 8) | bs.byte())

  private var r = 0L
  def freqAt(tot: Int): Int = {
    r = range / tot
    math.min(tot - 1, (code / r).toInt)
  }
  def decode(cumFreq: Int, freq: Int): Unit = {
    code -= cumFreq * r
    range = freq * r
    while (range < RangeCoder.Top) {
      range <<= 8
      code = ((code << 8) | bs.byte()) & 0xFFFFFFFFL
    }
  }
}

/** Adaptive model over `nsym` symbols with a frequency-sorted symbol
  * table (spec SIMPLE_MODEL).  Encoder and decoder mutate identically,
  * so no table is stored in the stream. */
private[sources] final class SimpleModel(nsym: Int) {
  private final val Step = 8
  private final val MaxFreq = (1 << 16) - 32

  private val freq = Array.fill(nsym)(1)
  private val sym = Array.tabulate(nsym)(identity)
  private var total = nsym

  private def rescale(): Unit = {
    var t = 0
    var i = 0
    while (i < nsym) {
      freq(i) -= freq(i) >> 1
      t += freq(i)
      i += 1
    }
    total = t
  }

  private def bump(i: Int): Unit = {
    freq(i) += Step
    total += Step
    if (total > MaxFreq) rescale()
    if (i > 0 && freq(i) > freq(i - 1)) {
      val tf = freq(i); freq(i) = freq(i - 1); freq(i - 1) = tf
      val ts = sym(i); sym(i) = sym(i - 1); sym(i - 1) = ts
    }
  }

  def encodeSym(rc: RangeEncoder, s: Int): Unit = {
    var i = 0
    var acc = 0
    while (sym(i) != s) { acc += freq(i); i += 1 }
    rc.encode(acc, freq(i), total)
    bump(i)
  }

  def decodeSym(rc: RangeDecoder): Int = {
    val f = rc.freqAt(total)
    var i = 0
    var acc = 0
    while (acc + freq(i) <= f) { acc += freq(i); i += 1 }
    rc.decode(acc, freq(i))
    val s = sym(i)
    bump(i)
    s
  }
}
