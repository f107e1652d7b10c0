package graft.sources

import java.io.ByteArrayOutputStream

import graft.sources.CramForeign.ByteStream

/** CRAM 3.1 read-name tokenisation codec (block compression method 8;
  * public hts-specs "CRAM compression method specifications", name
  * tokenisation section).
  *
  * Model (per the spec): each name splits into a token list — alpha
  * runs, single chars, digit runs with and without leading zeros —
  * and every token is encoded RELATIVE to the same-position token of
  * a previous name: identical tokens become MATCH, digit tokens
  * within +255 become small deltas, identical whole names become DUP.
  * Every (position, type) pair owns a byte stream; each stream is
  * independently entropy-coded with rANS Nx16 ([[RansNx16]]).  The
  * uncompressed form is the RN data-series byte run: each name
  * followed by its NUL stop byte.
  *
  * Conformance caveat (same as [[RansNx16]], documented once there):
  * no htslib-written 3.1 fixture exists offline, so the exact token
  * id table and stream framing are validated by round-trip plus the
  * re-framed container test, not against live htslib bytes.
  */
object NameTok {

  // token types (spec name-tokeniser type table)
  private val TType = 0 // per-name stream 0 entry: DUP or DIFF
  private val TAlpha = 1
  private val TChar = 2
  private val TDigits0 = 3 // digits with leading zeros (fixed width)
  private val TDzLen = 4   // width stream for TDigits0
  private val TDup = 5
  private val TDiff = 6
  private val TDigits = 7
  private val TDDelta = 8  // digit delta vs previous name, 0..255
  private val TDDelta0 = 9 // same, fixed-width token
  private val TMatch = 10
  private val TEnd = 12

  private final case class Tok(typ: Int, s: String, v: Long, width: Int)

  private def tokenize(name: String): Array[Tok] = {
    val out = scala.collection.mutable.ArrayBuffer[Tok]()
    var i = 0
    while (i < name.length) {
      val c = name.charAt(i)
      if (c.isDigit) {
        var j = i
        while (j < name.length && name.charAt(j).isDigit) j += 1
        val run = name.substring(i, j)
        // leading zero or too wide for u32 → fixed-width form
        if ((run.length > 1 && run.charAt(0) == '0') || run.length > 9)
          out += Tok(TDigits0, run, 0L, run.length)
        else out += Tok(TDigits, run, run.toLong, 0)
        i = j
      } else if (c.isLetter) {
        var j = i
        while (j < name.length && name.charAt(j).isLetter) j += 1
        out += Tok(TAlpha, name.substring(i, j), 0L, 0)
        i = j
      } else {
        out += Tok(TChar, c.toString, 0L, 0)
        i += 1
      }
    }
    out.toArray
  }

  private final class Streams {
    val m = scala.collection.mutable.LinkedHashMap[(Int, Int), ByteArrayOutputStream]()
    def apply(pos: Int, typ: Int): ByteArrayOutputStream =
      m.getOrElseUpdate((pos, typ), new ByteArrayOutputStream(64))
    def u32(pos: Int, typ: Int, v: Long): Unit = {
      val s = apply(pos, typ)
      s.write((v & 0xff).toInt); s.write(((v >> 8) & 0xff).toInt)
      s.write(((v >> 16) & 0xff).toInt); s.write(((v >> 24) & 0xff).toInt)
    }
  }

  /** Compress the RN byte run (`name NUL` repeated). */
  def encode(raw: Array[Byte]): Array[Byte] = {
    // split on NUL; a trailing run without NUL is kept as a name too
    val names = scala.collection.mutable.ArrayBuffer[String]()
    var start = 0
    var i = 0
    while (i < raw.length) {
      if (raw(i) == 0) { names += new String(raw, start, i - start, "US-ASCII"); start = i + 1 }
      i += 1
    }
    if (start < raw.length) names += new String(raw, start, raw.length - start, "US-ASCII")

    val s = new Streams
    var prev: Array[Tok] = null
    var prevName: String = null
    names.foreach { name =>
      if (prevName != null && name == prevName) {
        s(0, TType).write(TDup)
        s(0, TDup).write(1) // distance: always the previous name
      } else {
        s(0, TType).write(TDiff)
        s(0, TDiff).write(if (prevName == null) 0 else 1)
        val toks = tokenize(name)
        toks.zipWithIndex.foreach { case (t, ti) =>
          val pos = ti + 1
          val p = if (prev != null && ti < prev.length) prev(ti) else null
          if (p != null && p == t) s(pos, TType).write(TMatch)
          else if (p != null && p.typ == TDigits && t.typ == TDigits &&
            t.v >= p.v && t.v - p.v <= 255) {
            s(pos, TType).write(TDDelta)
            s(pos, TDDelta).write((t.v - p.v).toInt)
          } else if (p != null && p.typ == TDigits0 && t.typ == TDigits0 &&
            t.width == p.width && {
              val d = BigInt(t.s) - BigInt(p.s); d >= 0 && d <= 255
            }) {
            s(pos, TType).write(TDDelta0)
            s(pos, TDDelta0).write((BigInt(t.s) - BigInt(p.s)).toInt)
          } else t.typ match {
            case TDigits =>
              s(pos, TType).write(TDigits)
              s.u32(pos, TDigits, t.v)
            case TDigits0 =>
              s(pos, TType).write(TDigits0)
              s(pos, TDzLen).write(t.width)
              // value may exceed u32 at large widths: store the digits
              s(pos, TDigits0).write(t.s.getBytes("US-ASCII"))
            case TAlpha =>
              s(pos, TType).write(TAlpha)
              s(pos, TAlpha).write(t.s.getBytes("US-ASCII")); s(pos, TAlpha).write(0)
            case TChar =>
              s(pos, TType).write(TChar)
              s(pos, TChar).write(t.s.charAt(0))
            case other => throw new IllegalStateException(s"token type $other")
          }
        }
        s(toks.length + 1, TType).write(TEnd)
        prev = toks
        prevName = name
      }
    }

    val out = new ByteArrayOutputStream(raw.length / 2 + 64)
    def w32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    w32(raw.length)
    w32(names.length)
    out.write(0) // use_arith = 0: streams ride rANS Nx16
    var lastPos = -1
    s.m.toSeq.sortBy(_._1).foreach { case ((pos, typ), data) =>
      val newPos = pos != lastPos
      lastPos = pos
      out.write(typ | (if (newPos) 0x80 else 0))
      val payload = data.toByteArray
      val comp =
        if (payload.isEmpty) Array.emptyByteArray
        else RansNx16.encode(payload,
          if (payload.length > 512) RansNx16.Order1 else 0)
      // uint7 compressed length, then the Nx16 stream (sizes inside)
      var v = comp.length
      val stack = scala.collection.mutable.Stack[Int]()
      do { stack.push(v & 0x7f); v >>>= 7 } while (v != 0)
      while (stack.size > 1) out.write(0x80 | stack.pop())
      out.write(stack.pop())
      out.write(comp)
    }
    out.toByteArray
  }

  private def readUint7(bs: ByteStream): Int = {
    var v = 0
    var c = bs.byte()
    while ((c & 0x80) != 0) { v = (v << 7) | (c & 0x7f); c = bs.byte() }
    (v << 7) | c
  }

  /** Decompress to the RN byte run (`name NUL` repeated). */
  def decode(comp: Array[Byte]): Array[Byte] = {
    val bs = new ByteStream(comp)
    def r32(): Int = bs.byte() | (bs.byte() << 8) | (bs.byte() << 16) | (bs.byte() << 24)
    val ulen = r32()
    val nnames = r32()
    val useArith = bs.byte()
    require(useArith == 0, "arithmetic-coded name streams not supported")
    // read the (pos, type) streams
    val streams = scala.collection.mutable.LinkedHashMap[(Int, Int), ByteStream]()
    var pos = -1
    while (bs.remaining > 0) {
      val tb = bs.byte()
      if ((tb & 0x80) != 0) pos += 1
      // 0x40 is the spec's duplicate-stream flag (share bytes with an
      // earlier stream); silently masking it would decode wrong names,
      // so reject it like useArith != 0 until fixtures pin the layout.
      if ((tb & 0x40) != 0)
        throw new UnsupportedOperationException(
          "name codec: duplicate-stream flag (0x40) not supported")
      val typ = tb & 0x3f
      val clen = readUint7(bs)
      val sub = new Array[Byte](clen)
      System.arraycopy(bs.data, bs.p, sub, 0, clen)
      bs.p += clen
      streams((pos, typ)) =
        new ByteStream(if (clen == 0) Array.emptyByteArray else RansNx16.decode(sub))
    }
    def stream(p: Int, t: Int): ByteStream =
      streams.getOrElse((p, t), throw new IllegalStateException(
        s"name codec: missing stream (pos $p, type $t)"))

    val out = new ByteArrayOutputStream(ulen)
    var prev: Array[Tok] = null
    var prevName: String = null
    var n = 0
    while (n < nnames) {
      val t0 = stream(0, TType).byte()
      if (t0 == TDup) {
        // only distance-1 duplicates are implemented; a conformant
        // stream may reference any earlier name, which would silently
        // decode to the WRONG name if we substituted the previous one
        val dist = stream(0, TDup).byte()
        if (dist != 1)
          throw new UnsupportedOperationException(
            s"name codec: DUP distance $dist not supported (only 1)")
        out.write(prevName.getBytes("US-ASCII")); out.write(0)
      } else {
        val ddist = stream(0, TDiff).byte()
        val expect = if (prev == null) 0 else 1
        if (ddist != expect)
          throw new UnsupportedOperationException(
            s"name codec: DIFF distance $ddist not supported (only $expect)")
        val toks = scala.collection.mutable.ArrayBuffer[Tok]()
        val sb = new StringBuilder
        var ti = 1
        var done = false
        while (!done) {
          val ty = stream(ti, TType).byte()
          if (ty == TEnd) done = true
          else {
            val p = if (prev != null && ti - 1 < prev.length) prev(ti - 1) else null
            val tok = ty match {
              case TMatch => p
              case TDDelta =>
                Tok(TDigits, "", p.v + stream(ti, TDDelta).byte(), 0)
              case TDDelta0 =>
                val v = BigInt(p.s) + stream(ti, TDDelta0).byte()
                val str = v.toString.reverse.padTo(p.width, '0').reverse.mkString
                Tok(TDigits0, str, 0L, p.width)
              case TDigits =>
                val st = stream(ti, TDigits)
                val v = (st.byte() | (st.byte() << 8) | (st.byte() << 16) |
                  (st.byte().toLong << 24)) & 0xffffffffL
                Tok(TDigits, "", v, 0)
              case TDigits0 =>
                val w = stream(ti, TDzLen).byte()
                val st = stream(ti, TDigits0)
                val b = new Array[Byte](w)
                var k = 0
                while (k < w) { b(k) = st.byte().toByte; k += 1 }
                Tok(TDigits0, new String(b, "US-ASCII"), 0L, w)
              case TAlpha =>
                val st = stream(ti, TAlpha)
                val b = new ByteArrayOutputStream(16)
                var c = st.byte()
                while (c != 0) { b.write(c); c = st.byte() }
                Tok(TAlpha, new String(b.toByteArray, "US-ASCII"), 0L, 0)
              case TChar =>
                Tok(TChar, stream(ti, TChar).byte().toChar.toString, 0L, 0)
              case other =>
                throw new IllegalStateException(s"name codec: token type $other")
            }
            toks += tok
            sb.append(tok.typ match {
              case TDigits => tok.v.toString
              case _ => tok.s
            })
            ti += 1
          }
        }
        prev = toks.map(t => if (t.typ == TDigits && t.s.isEmpty)
          t.copy(s = t.v.toString) else t).toArray
        prevName = sb.toString
        out.write(prevName.getBytes("US-ASCII")); out.write(0)
      }
      n += 1
    }
    val bytes = out.toByteArray
    // the RN run may omit the final NUL when framed by block length
    if (bytes.length == ulen + 1 && bytes.last == 0)
      java.util.Arrays.copyOf(bytes, ulen)
    else bytes
  }
}
