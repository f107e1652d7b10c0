package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Graft's native Catalyst expressions (I2).  All implement
  * `doGenCode` so they stay inside whole-stage codegen — the hot-path
  * kernels (vector dot/cosine, simhash hamming, phred shift, reverse
  * complement) never fall back to interpreted eval or UDF calls.
  *
  * The float kernels accumulate in DOUBLE with a sequential
  * index-order fold — bit-identical to the SQL `aggregate(zip_with(…))`
  * formulation they replace (and to the DuckDB oracle), so swapping
  * them into gated queries cannot change results.
  */
object GraftFunctions {

  private def check(ok: Boolean, msg: => String): TypeCheckResult =
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(msg)

  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  /** dot(a, b): Σ (double)a_i · (double)b_i over two float/double arrays. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(isFloatArray(left.dataType) && isFloatArray(right.dataType),
        s"$prettyName expects two ARRAY<FLOAT> args")
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** doti(a, b): Σ a_i · b_i over two BIGINT arrays — the exact-integer
    * dot used by the quantized-vector paths (k-means).  Plain Long
    * arithmetic (wrapping like the SQL operator would); callers bound
    * magnitudes so products stay in range. */
  case class DotProductLong(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(isLongArray(left.dataType) && isLongArray(right.dataType),
        s"$prettyName expects two ARRAY<BIGINT> args")
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_doti"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0L
      var i = 0
      while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |long $acc = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += $a.getLong($i) * $b.getLong($i);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** grampack(qv): the upper-triangle Gram products of a quantized
    * BIGINT vector, each pair packed into ONE long —
    * d1(12 bits) | d2(12 bits) | biased product DIV 10⁶ (40 bits) —
    * so the explode moves primitive longs, never per-pair structs
    * (the graft_packgrams move).  Unpack after the aggregate collapse:
    * d1 = p >> 52, d2 = (p >> 40) & 4095, xy = (p & (2⁴⁰−1)) − 2³⁹. */
  case class GramPack(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(isLongArray(child.dataType), s"$prettyName expects ARRAY<BIGINT>")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_grampack"

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      require(n <= 4096, s"$prettyName supports up to 4096 dims, got $n")
      val out = new Array[Long](n * (n + 1) / 2)
      var k = 0
      var i = 0
      while (i < n) {
        val xi = x.getLong(i)
        var j = i
        while (j < n) {
          val v = xi * x.getLong(j) / 1000000L
          require(v > -(1L << 39) && v < (1L << 39),
            s"$prettyName scaled product $v exceeds the 40-bit pack range")
          out(k) = (i.toLong << 52) | (j.toLong << 40) | (v + (1L << 39))
          k += 1
          j += 1
        }
        i += 1
      }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val out = ctx.freshName("out")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val k = ctx.freshName("k")
        val xi = ctx.freshName("xi")
        val v = ctx.freshName("v")
        s"""
           |int $n = $a.numElements();
           |if ($n > 4096) throw new IllegalArgumentException(
           |  "graft_grampack supports up to 4096 dims, got " + $n);
           |long[] $out = new long[$n * ($n + 1) / 2];
           |int $k = 0;
           |for (int $i = 0; $i < $n; $i++) {
           |  long $xi = $a.getLong($i);
           |  for (int $j = $i; $j < $n; $j++) {
           |    long $v = $xi * $a.getLong($j) / 1000000L;
           |    if ($v <= -(1L << 39) || $v >= (1L << 39))
           |      throw new IllegalArgumentException(
           |        "graft_grampack scaled product exceeds the 40-bit pack range");
           |    $out[$k++] = ((long) $i << 52) | ((long) $j << 40) | ($v + (1L << 39));
           |  }
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** simhash32(hs): classic SimHash vote over 32 bit positions of the
    * given 64-bit token hashes — bit b of the result is set iff
    * Σ_h ((h>>b)&1)·2−1 > 0.  Single counter-array pass (the HOF
    * formulation re-folds the hash list once per bit). */
  case class Simhash32(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(isLongArray(child.dataType), s"$prettyName expects ARRAY<BIGINT>")
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_simhash32"

    override def nullSafeEval(a: Any): Any = {
      val hs = a.asInstanceOf[ArrayData]
      val votes = new Array[Int](32)
      var i = 0
      val n = hs.numElements()
      while (i < n) {
        val h = hs.getLong(i)
        var b = 0
        while (b < 32) {
          votes(b) += (((h >> b) & 1L) * 2 - 1).toInt
          b += 1
        }
        i += 1
      }
      var sig = 0L
      var b = 0
      while (b < 32) { if (votes(b) > 0) sig |= 1L << b; b += 1 }
      sig
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val b = ctx.freshName("b")
        val h = ctx.freshName("h")
        val votes = ctx.freshName("votes")
        val sig = ctx.freshName("sig")
        s"""
           |int $n = $a.numElements();
           |int[] $votes = new int[32];
           |for (int $i = 0; $i < $n; $i++) {
           |  long $h = $a.getLong($i);
           |  for (int $b = 0; $b < 32; $b++) {
           |    $votes[$b] += (int) ((($h >> $b) & 1L) * 2 - 1);
           |  }
           |}
           |long $sig = 0L;
           |for (int $b = 0; $b < 32; $b++) {
           |  if ($votes[$b] > 0) $sig |= 1L << $b;
           |}
           |${ev.value} = $sig;
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** cosine(a, b) = dot/(‖a‖·‖b‖), norms inline (same fold order). */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(isFloatArray(left.dataType) && isFloatArray(right.dataType),
        s"$prettyName expects two ARRAY<FLOAT> args")
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_cosine"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xv = x.getFloat(i).toDouble; val yv = y.getFloat(i).toDouble
        dot += xv * yv; na += xv * xv; nb += yv * yv
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0, $na = 0.0, $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xv = (double) $a.getFloat($i);
           |  double $yv = (double) $b.getFloat($i);
           |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
           |}
           |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** hamming64(a, b) = popcount(a ^ b) — SimHash distance. */
  case class Hamming64(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(Seq(left, right).forall(e => e.dataType == LongType || e.dataType == IntegerType),
        s"$prettyName expects integral args")
    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_hamming64"

    private def toL(v: Any): Long = v match {
      case i: java.lang.Integer => i.toLong
      case l: java.lang.Long => l
      case other => other.asInstanceOf[Long]
    }

    override def nullSafeEval(a: Any, b: Any): Any =
      java.lang.Long.bitCount(toL(a) ^ toL(b))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = java.lang.Long.bitCount((long) $a ^ (long) $b);")

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** phred_shift(qual, delta): shift every quality char by delta
    * (sanger↔illumina = ±31, ref: FormatConstants.java). */
  case class PhredShift(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(left.dataType == StringType && right.dataType == IntegerType,
        s"$prettyName expects (STRING, INT)")
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_phred_shift"

    override def nullSafeEval(q: Any, d: Any): Any = {
      val s = q.asInstanceOf[UTF8String].toString
      val delta = d.asInstanceOf[Int]
      val out = new Array[Char](s.length)
      var i = 0
      while (i < s.length) { out(i) = (s.charAt(i) + delta).toChar; i += 1 }
      UTF8String.fromString(new String(out))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (q, d) => {
        val i = ctx.freshName("i")
        val bytes = ctx.freshName("bytes")
        val out = ctx.freshName("out")
        // quality strings are ASCII: shift bytes directly
        s"""
           |byte[] $bytes = $q.getBytes();
           |byte[] $out = new byte[$bytes.length];
           |for (int $i = 0; $i < $bytes.length; $i++) {
           |  $out[$i] = (byte) ($bytes[$i] + $d);
           |}
           |${ev.value} = UTF8String.fromBytes($out);
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** reverse_complement(seq): reverse the read and complement each
    * base (IUPAC-aware), '*' passes through. */
  case class ReverseComplement(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(child.dataType == StringType, s"$prettyName expects STRING")
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_revcomp"

    override def nullSafeEval(v: Any): Any = {
      val b = v.asInstanceOf[UTF8String].getBytes
      val out = new Array[Byte](b.length)
      var i = 0
      while (i < b.length) {
        out(b.length - 1 - i) = complement(b(i))
        i += 1
      }
      UTF8String.fromBytes(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = GraftFunctions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, v => {
        val i = ctx.freshName("i")
        val bytes = ctx.freshName("bytes")
        val out = ctx.freshName("out")
        s"""
           |byte[] $bytes = $v.getBytes();
           |byte[] $out = new byte[$bytes.length];
           |for (int $i = 0; $i < $bytes.length; $i++) {
           |  $out[$bytes.length - 1 - $i] = $fn.complement($bytes[$i]);
           |}
           |${ev.value} = UTF8String.fromBytes($out);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  // ----------------------------------------------------- md5 hot path
  // The per-gram / per-shingle kernels below call a digest once per
  // TEXT POSITION of every document.  The JDK's MD5 block compression
  // is a HotSpot intrinsic (measured here: a hand-rolled RFC 1321
  // scalar loop ran the gram kernels ~1.3× SLOWER than MessageDigest,
  // so the compression itself is not the win) — what costs is the
  // per-gram substring + getBytes + fresh 16-byte digest array.  The
  // hot path therefore keeps MessageDigest but feeds it byte RANGES of
  // the row's lowered buffer (`update(b, off, len)`) and collects into
  // a row-reused 16-byte output (`digest(out, 0, 16)` resets the
  // engine, so no reset() call either) — zero allocation per gram,
  // intrinsic compression.  First-8-bytes big-endian read shared by
  // the 32/64-bit consumers; bit-parity with the original spelling is
  // pinned in Md5KernelSpec.

  /** First 8 digest bytes of md5(b[off..off+len)) read big-endian —
    * exactly `hash64`'s value; `>>> 32` of it is `hash32`'s.  `md`
    * and `out16` (length 16) are caller-owned so a kernel hashing many
    * grams of one row allocates nothing per gram. */
  def md5First8(b: Array[Byte], off: Int, len: Int,
      md: java.security.MessageDigest, out16: Array[Byte]): Long = {
    md.update(b, off, len)
    md.digest(out16, 0, 16)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (out16(i) & 0xffL); i += 1 }
    v
  }

  /** hash32(s): value of the first 8 hex digits of md5(s) — i.e. the
    * first 4 md5 bytes as an unsigned big-endian int, widened to long.
    * Equals the SQL `aggregate(sequence(1,8), …substring(md5(s))…)`
    * formulation and the DuckDB oracle's strpos-walk, at 1 digest call
    * instead of 8. */
  case class Hash32Md5(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(child.dataType == StringType, s"$prettyName expects STRING")
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_hash32"

    override def nullSafeEval(v: Any): Any =
      GraftFunctions.hash32(v.asInstanceOf[UTF8String].getBytes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = GraftFunctions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $fn.hash32($v.getBytes());")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def hash32(bytes: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** minhash128(hashes): 128 minhash signature values over an
    * array<bigint> of element hashes: sig_k = min_h ((2k+1)·h + k²+7)
    * mod 2147483647 — the tight-loop kernel the interpreted
    * higher-order-function formulation spends its time in. */
  case class Minhash128(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(child.dataType == ArrayType(LongType, containsNull = false) ||
        child.dataType == ArrayType(LongType, containsNull = true),
        s"$prettyName expects ARRAY<BIGINT>")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_minhash128"

    override def nullSafeEval(v: Any): Any =
      GraftFunctions.minhash128(v.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = GraftFunctions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $fn.minhash128($v);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def minhash128(hashes: ArrayData): ArrayData = {
    val n = hashes.numElements()
    val sig = new Array[Long](128)
    var k = 0
    while (k < 128) {
      val a = 2L * k + 1
      val b = k.toLong * k + 7
      var best = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = (a * hashes.getLong(i) + b) % 2147483647L
        if (v < best) best = v
        i += 1
      }
      sig(k) = best
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }

  /** media_dims(payload): [fmt_code, width, height] parsed from the
    * REAL container headers of the common image formats — PNG IHDR
    * (big-endian dims after the 8-byte signature), JPEG SOFn marker
    * scan, GIF logical screen descriptor, WEBP VP8X/VP8L/VP8 chunk
    * variants, BMP DIB header, RIFF-AVI avih main header (video
    * containers sit in the same media column).  fmt codes: 0 unknown,
    * 1 jpeg, 2 png, 3 gif, 4 webp, 5 bmp, 6 avi.  Runs as a codegen'd
    * scalar in the scan
    * stage, so a 100 TB payload column never leaves the executor nor
    * drops out of whole-stage codegen for its metadata pass. */
  case class MediaDims(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(child.dataType == BinaryType, s"$prettyName expects BINARY")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_media_dims"

    override def nullSafeEval(v: Any): Any =
      GraftFunctions.mediaDims(v.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = GraftFunctions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $fn.mediaDims($v);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def mediaDims(b: Array[Byte]): ArrayData = {
    def u8(i: Int): Int = b(i) & 0xff
    def be16(i: Int): Long = ((u8(i) << 8) | u8(i + 1)).toLong
    def be32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int): Long = (u8(i) | (u8(i + 1) << 8)).toLong
    def le24(i: Int): Long = (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong
    def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    var fmt = 0L
    var w = 0L
    var h = 0L
    if (b.length >= 24 && u8(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a &&
      b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      fmt = 2; w = be32(16); h = be32(20)
    } else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      fmt = 1
      // walk marker segments to the first frame header (SOF0-15 minus
      // the non-frame C4/C8/CC); stop at start-of-scan / end-of-image
      var i = 2
      var done = false
      while (!done && i + 1 < b.length) {
        if (u8(i) != 0xff) i += 1 // fill/garbage byte: resync
        else {
          val m = u8(i + 1)
          if (m == 0xff) i += 1
          else if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) i += 2 // bare markers
          else if (m == 0xda || m == 0xd9) done = true
          else if (i + 3 >= b.length) done = true
          else {
            val len = be16(i + 2).toInt
            if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
              if (i + 8 < b.length) { h = be16(i + 5); w = be16(i + 7) }
              done = true
            } else i += 2 + len
          }
        }
      }
    } else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      fmt = 3; w = le16(6); h = le16(8)
    } else if (b.length >= 30 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P') {
      fmt = 4
      if (b(12) == 'V' && b(13) == 'P' && b(14) == '8' && b(15) == 'X') {
        w = le24(24) + 1; h = le24(27) + 1 // VP8X canvas, minus-one coded
      } else if (b(12) == 'V' && b(13) == 'P' && b(14) == '8' && b(15) == ' ') {
        // lossy: 3-byte frame tag, 3-byte sync, then 14-bit dims
        w = le16(26) & 0x3fff; h = le16(28) & 0x3fff
      } else if (b(12) == 'V' && b(13) == 'P' && b(14) == '8' && b(15) == 'L' &&
        u8(20) == 0x2f) {
        val bits = le32(21)
        w = (bits & 0x3fff) + 1; h = ((bits >> 14) & 0x3fff) + 1
      }
    } else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
      fmt = 5; w = le32(18); h = le32(22)
    } else if (b.length >= 72 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' ') {
      // AVI: the required layout puts the 56-byte avih main header
      // first inside LIST hdrl; frame dims are its 9th/10th dwords
      fmt = 6
      if (b(12) == 'L' && b(13) == 'I' && b(14) == 'S' && b(15) == 'T' &&
        b(20) == 'h' && b(21) == 'd' && b(22) == 'r' && b(23) == 'l' &&
        b(24) == 'a' && b(25) == 'v' && b(26) == 'i' && b(27) == 'h') {
        w = le32(64); h = le32(68)
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(fmt, w, h))
  }

  /** hash64(s): first 8 md5 bytes as a signed big-endian long — a
    * collision-negligible (2⁻⁶⁴) set-element id for intersect math. */
  case class Hash64Md5(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(child.dataType == StringType, s"$prettyName expects STRING")
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_hash64"

    override def nullSafeEval(v: Any): Any =
      GraftFunctions.hash64(v.asInstanceOf[UTF8String].getBytes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = GraftFunctions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $fn.hash64($v.getBytes());")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def hash64(bytes: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }

  /** bloom_contains(h, bits): membership probe of a 64-bit key against
    * an m-bit Bloom filter (m = bits.length·8, a power of two), k = 3
    * probes by double hashing (Kirsch–Mitzenmacher: pᵢ = h + i·h′ with
    * h′ an odd multiplicative mix of h, so the probe sequence derives
    * from the key alone).  The probe derivation lives ONLY in
    * [[GraftFunctions.bloomContains]] / [[GraftFunctions.bloomBuild]] —
    * the build side and the scan side cannot disagree.  Runs as a
    * codegen'd scalar against a broadcast literal, so a 100-TB scan
    * prefilters in the map stage without shuffling anything. */
  case class BloomContains(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(left.dataType == LongType && right.dataType == BinaryType,
        s"$prettyName expects (BIGINT, BINARY)")
    override def dataType: DataType = BooleanType
    override def prettyName: String = "graft_bloom_contains"

    override def nullSafeEval(h: Any, bits: Any): Any =
      GraftFunctions.bloomContains(h.asInstanceOf[Long], bits.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = GraftFunctions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, (h, b) => s"${ev.value} = $fn.bloomContains($h, $b);")
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  private final val BloomK = 3
  private final val BloomMix = 0x9E3779B97F4A7C15L // golden-ratio odd mix

  /** murmur3 fmix64: every output bit depends on every input bit.
    * Without this, p = (h + i·h′) & mask with h′ = h·c would depend
    * only on h's low log2m bits (multiplication and masking mod 2^m
    * never see the high bits), collapsing the filter to log2m-bit keys
    * — measured 600× the theoretical FP rate before the fix. */
  private def bloomFmix(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  def bloomContains(h: Long, bits: Array[Byte]): Boolean = {
    val mask = (bits.length.toLong << 3) - 1
    var h1 = bloomFmix(h)
    val h2 = bloomFmix(h1 + BloomMix) | 1L
    var i = 0
    while (i < BloomK) {
      val p = h1 & mask
      if ((bits((p >>> 3).toInt) & (1 << (p & 7L).toInt)) == 0) return false
      h1 += h2
      i += 1
    }
    true
  }

  /** Build the bit array [[bloomContains]] probes: 2^log2m bits over
    * the given 64-bit keys.  Driver-side by design — the build side of
    * a decontamination filter is the small, fixed-size eval set. */
  def bloomBuild(hashes: Array[Long], log2m: Int): Array[Byte] = {
    require(log2m >= 3 && log2m <= 33, s"log2m out of range: $log2m")
    val bits = new Array[Byte](1 << (log2m - 3))
    val mask = (1L << log2m) - 1
    var j = 0
    while (j < hashes.length) {
      var h1 = bloomFmix(hashes(j))
      val h2 = bloomFmix(h1 + BloomMix) | 1L
      var i = 0
      while (i < BloomK) {
        val p = h1 & mask
        bits((p >>> 3).toInt) = (bits((p >>> 3).toInt) | (1 << (p & 7L).toInt)).toByte
        h1 += h2
        i += 1
      }
      j += 1
    }
    bits
  }

  /** entropy_mb(s): Shannon entropy of the CODEPOINT distribution of a
    * string, in integer millibits (⌊1000·H + 0.5⌋) — the quality-
    * filter signal for low-entropy boilerplate / high-entropy noise.
    * Engine parity contract: the fold runs over counts in ASCENDING
    * codepoint order with p = k/n doubles and log2 = ln(p)/ln(2), the
    * exact association order and formula the DuckDB oracle spells out
    * (list(... ORDER BY cp) + list_reduce); the only cross-engine
    * freedom left is the last ulp of libm-vs-JVM ln, which the
    * millibit rounding absorbs except within ~1e-13 of a boundary.
    * Codepoints (not UTF-16 units, not bytes) so multibyte text
    * agrees with DuckDB's character semantics. */
  case class EntropyMb(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(child.dataType == StringType, s"$prettyName expects STRING")
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_entropy_mb"

    override def nullSafeEval(v: Any): Any =
      GraftFunctions.entropyMb(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = GraftFunctions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $fn.entropyMb($v);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  // ------------------------------------------------------ exact micro-ln
  /** The shared exactly-determined ln tree (see queries/Corpus.scala
    * "shared exact ln tree"): e = floor(log2 n) from the leading-zero
    * count (≡ `length(bin(n)) − 1`), mantissa via the artanh series
    * over t = (n − 2^e)/(n + 2^e) ∈ [0, 1/3) — every operation an
    * exactly-rounded IEEE double add/sub/mul/div in the IDENTICAL
    * order the SQL spelling uses, so kernel and SQL tree produce
    * bit-identical doubles (Java floating-point is strict IEEE-754
    * since JEP 306) and therefore identical rounded micro-units.
    * The kernel exists because the SQL spelling inlines `bin(n)`
    * string construction ~12× per value on the model frames;
    * MicroLnSpec pins kernel ≡ SQL tree over an exhaustive +
    * randomized sweep.  Precondition n ≥ 1 (fails loudly). */
  private def lnTreeD(n: Long): Double = {
    require(n >= 1, s"graft_micro_ln expects a positive BIGINT, got $n")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(n)
    val a = n.toDouble
    val p = (1L << e).toDouble
    val t = (a - p) / (a + p)
    val t2 = t * t
    e.toDouble * 0.6931471805599453 + t * (2.0 + t2 * (0.6666666666666666 +
      t2 * (0.4 + t2 * (0.2857142857142857 + t2 * (0.2222222222222222 +
        t2 * 0.18181818181818182)))))
  }

  /** round(1e6·ln(n)) — identical to Corpus' per-term SQL spelling. */
  def microLn(n: Long): Long =
    math.floor(1000000.0 * lnTreeD(n) + 0.5).toLong

  /** round(1e6·ln(num/den)) — identical to the ratio SQL spelling
    * (ONE floor over the difference of the two ln doubles). */
  def microLnRatio(num: Long, den: Long): Long =
    math.floor(1000000.0 * (lnTreeD(num) - lnTreeD(den)) + 0.5).toLong

  case class MicroLn(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(child.dataType == LongType, s"$prettyName expects BIGINT")
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_micro_ln"

    override def nullSafeEval(v: Any): Any =
      GraftFunctions.microLn(v.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = GraftFunctions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $fn.microLn($v);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class MicroLnRatio(left: Expression, right: Expression) extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(left.dataType == LongType && right.dataType == LongType,
        s"$prettyName expects (BIGINT, BIGINT)")
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_micro_ln_ratio"

    override def nullSafeEval(a: Any, b: Any): Any =
      GraftFunctions.microLnRatio(a.asInstanceOf[Long], b.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = GraftFunctions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $fn.microLnRatio($a, $b);")
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  // ----------------------------------------------------------- z-order
  /** Morton (Z-order) interleave of two NON-NEGATIVE dimension values
    * (low 31 bits each → a 62-bit non-negative code): bit i of `a`
    * lands at 2i, bit i of `b` at 2i+1, via the classic magic-number
    * spreads.  Sorting a table by this code makes parquet row-group
    * min/max statistics selective on BOTH dimensions at once — the
    * layout-optimization pass (Delta/Iceberg Z-ORDER) that turns a
    * 2-D range predicate into file-level pruning at 100 TB, where a
    * lexicographic sort only prunes on its lead column.  Pure integer
    * ops — the DuckDB oracle spells the identical spreads, so the
    * gate is exact with no float anywhere.  Fails loudly on negative
    * inputs (a silent mask would silently interleave garbage). */
  def zorder64(a: Long, b: Long): Long = {
    require(a >= 0 && b >= 0, s"graft_zorder64 expects non-negative dims, got ($a, $b)")
    spread31(a) | (spread31(b) << 1)
  }

  private def spread31(v: Long): Long = {
    var x = v & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** d-dimensional Morton interleave (the Delta/Iceberg Z-ORDER
    * form): each of the d ∈ [2, 8] dims contributes its low ⌊62/d⌋
    * bits; bit j of dim i lands at position j·d + i, so the code
    * stays a non-negative BIGINT and a range predicate on ANY dim
    * maps to runs of the sorted code.  d = 2 is bit-identical to
    * [[zorder64]] for dims < 2³¹ (spec-pinned).  Same contract as
    * the 2-D kernel: negative dims fail loudly, bits above the
    * per-dim width truncate silently (documented). */
  def zorderN(dims: Array[Long]): Long = {
    val d = dims.length
    require(d >= 2 && d <= 8, s"graft_zorder expects 2-8 dims, got $d")
    val w = 62 / d
    var z = 0L
    var i = 0
    while (i < d) {
      val v = dims(i)
      require(v >= 0, s"graft_zorder expects non-negative dims, got ${dims.mkString(", ")}")
      val x = v & ((1L << w) - 1L)
      var j = 0
      while (j < w) {
        z |= ((x >>> j) & 1L) << (j * d + i)
        j += 1
      }
      i += 1
    }
    z
  }

  case class ZorderN(children: Seq[Expression]) extends Expression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(children.length >= 2 && children.length <= 8 &&
        children.forall(_.dataType == LongType),
        s"$prettyName expects 2-8 BIGINT dims")
    override def dataType: DataType = LongType
    override def nullable: Boolean = children.exists(_.nullable)
    override def prettyName: String = "graft_zorder"

    override def eval(input: InternalRow): Any = {
      val vs = new Array[Long](children.length)
      var i = 0
      while (i < children.length) {
        val v = children(i).eval(input)
        if (v == null) return null
        vs(i) = v.asInstanceOf[Long]
        i += 1
      }
      GraftFunctions.zorderN(vs)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = GraftFunctions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val evals = children.map(_.genCode(ctx))
      val arr = ctx.freshName("dims")
      val nullCheck =
        if (nullable) evals.map(e => s"${e.isNull}").mkString(" || ") else "false"
      val fill = evals.zipWithIndex
        .map { case (e, i) => s"$arr[$i] = ${e.value};" }.mkString("\n")
      ev.copy(code = code"""
        ${evals.map(_.code).mkString("\n")}
        boolean ${ev.isNull} = $nullCheck;
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          long[] $arr = new long[${children.length}];
          $fill
          ${ev.value} = $fn.zorderN($arr);
        }""")
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
  }

  case class Zorder64(left: Expression, right: Expression) extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(left.dataType == LongType && right.dataType == LongType,
        s"$prettyName expects (BIGINT, BIGINT)")
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_zorder64"

    override def nullSafeEval(a: Any, b: Any): Any =
      GraftFunctions.zorder64(a.asInstanceOf[Long], b.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = GraftFunctions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $fn.zorder64($a, $b);")
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def entropyMb(s: UTF8String): Long = {
    val str = s.toString
    val counts = new java.util.TreeMap[Integer, Long]()
    var n = 0L
    val it = str.codePoints().iterator()
    while (it.hasNext) {
      val cp = it.next()
      counts.merge(cp, 1L, (a, b) => a + b)
      n += 1
    }
    if (n == 0L) return 0L
    var acc = 0.0
    val vit = counts.values().iterator() // ascending codepoint order
    while (vit.hasNext) {
      val p = vit.next().toDouble / n.toDouble
      acc += -p * (math.log(p) / math.log(2.0))
    }
    math.floor(1000.0 * acc + 0.5).toLong
  }

  /** charclass(s): one-pass ASCII character-class counts
    * [letters, digits, whitespace] over the UTF-8 bytes.  ASCII classes
    * occupy single bytes that never collide with UTF-8 continuation
    * bytes (all ≥ 0x80), so the byte scan is exact on any text.
    * Replaces a lower() + three full regexp_replace passes per row in
    * the char-profile hot path. */
  case class CharClass(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(child.dataType == StringType, s"$prettyName expects STRING")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_charclass"

    override def nullSafeEval(v: Any): Any =
      GraftFunctions.charClass(v.asInstanceOf[UTF8String].getBytes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = GraftFunctions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $fn.charClass($v.getBytes());")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  // ------------------------------------------------- text-gate kernel
  /** Stopword lists shared by the lang-id / quality / release gates
    * and their DuckDB oracle spellings — single source so the one-pass
    * kernel below and the SQL literals can never drift. */
  val stopWords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "den"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "est", "dans"))

  /** THE language order (ADVICE r19): mask bit i, struct field
    * `s_<stopLangs(i)>` and the [[textGates]] counters all follow this
    * list.  The counters are hard-coded four-wide, so adding a
    * language to [[stopWords]] without extending the kernel must fail
    * LOUDLY here rather than be silently ignored by the mask. */
  val stopLangs: Seq[String] = Seq("en", "de", "es", "fr")

  private val stopMask: java.util.HashMap[UTF8String, Integer] = {
    require(stopWords.keySet == stopLangs.toSet && stopLangs.size == 4,
      s"stopWords languages ${stopWords.keySet.toSeq.sorted.mkString(",")} " +
        s"must be exactly stopLangs ${stopLangs.mkString(",")} — the " +
        "graft_text_gates kernel counts four fixed languages")
    val m = new java.util.HashMap[UTF8String, Integer]()
    stopLangs.zipWithIndex.foreach { case (lang, li) =>
      stopWords(lang).foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, Integer.valueOf(
          (if (prev == null) 0 else prev.intValue) | (1 << li)))
      }
    }
    m
  }

  private val spaceUtf = UTF8String.fromString(" ")

  // s_* fields derive from stopLangs, so field order and mask bit
  // order cannot drift apart
  private[functions] val textGatesType = StructType(
    StructField("n_tok", IntegerType, nullable = false) +:
    StructField("n_distinct", IntegerType, nullable = false) +:
    stopLangs.map(l => StructField(s"s_$l", IntegerType, nullable = false)))

  /** graft_text_gates(text): ONE tokenizing pass over the lowered
    * text returning every token statistic the P7/P8/P51 gates read —
    * struct(n_tok, n_distinct, s_en, s_de, s_es, s_fr).  Replaces
    * `size(split(lower(text),' '))` + `size(array_distinct(…))` + four
    * `size(filter(…, t -> array_contains(…)))` higher-order calls:
    * those are CodegenFallback territory (lambda eval per element) and
    * each re-runs lower+split, so the gate queries paid ~6 tokenize
    * passes per row in interpreted code.  Bit-parity by construction:
    * the kernel calls the SAME UTF8String.toLowerCase and
    * UTF8String.split(" ", -1) that Lower/StringSplit evaluate,
    * distinct is byte-equality (UTF8String hash/equals), membership is
    * byte-equality against [[stopWords]] — pinned vs the spelled-out
    * expressions in TextGatesSpec. */
  case class TextGates(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(child.dataType == StringType, s"$prettyName expects STRING")
    override def dataType: DataType = textGatesType
    override def prettyName: String = "graft_text_gates"

    override def nullSafeEval(v: Any): Any =
      GraftFunctions.textGates(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = GraftFunctions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $fn.textGates($v);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def textGates(text: UTF8String): InternalRow = {
    val toks = text.toLowerCase.split(spaceUtf, -1)
    val seen = new java.util.HashSet[UTF8String](
      Integer.highestOneBit(math.max(16, toks.length)) * 2)
    var sEn = 0; var sDe = 0; var sEs = 0; var sFr = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      seen.add(t)
      val m = stopMask.get(t)
      if (m != null) {
        val v = m.intValue
        if ((v & 1) != 0) sEn += 1
        if ((v & 2) != 0) sDe += 1
        if ((v & 4) != 0) sEs += 1
        if ((v & 8) != 0) sFr += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](toks.length, seen.size, sEn, sDe, sEs, sFr))
  }

  def charClass(b: Array[Byte]): ArrayData = {
    var alpha = 0L
    var digit = 0L
    var ws = 0L
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) alpha += 1
      else if (c >= '0' && c <= '9') digit += 1
      else if (c == ' ' || c == '\t' || c == '\n') ws += 1
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(alpha, digit, ws))
  }

  /** intersect_size(a, b): |A∩B| of two SORTED long arrays via a
    * linear merge — the pair-verify kernel for set-similarity joins. */
  case class IntersectSize(left: Expression, right: Expression) extends BinaryExpression {
    private def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    override def checkInputDataTypes(): TypeCheckResult =
      check(ok(left.dataType) && ok(right.dataType),
        s"$prettyName expects two sorted ARRAY<BIGINT> args")
    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_intersect_size"

    override def nullSafeEval(a: Any, b: Any): Any =
      GraftFunctions.intersectSize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = GraftFunctions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $fn.intersectSize($a, $b);")
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def intersectSize(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** winnow(hashes, w): distinct per-window minima of a sliding
    * window of width w — the fingerprint-sampling step of winnowing.
    * Equals array_distinct(transform(seq, j -> array_min(slice(…))))
    * as a single O(n·w) loop. */
  case class Winnow(left: Expression, right: Expression) extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check((left.dataType == ArrayType(LongType, containsNull = false) ||
        left.dataType == ArrayType(LongType, containsNull = true)) &&
        right.dataType == IntegerType,
        s"$prettyName expects (ARRAY<BIGINT>, INT)")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_winnow"

    override def nullSafeEval(a: Any, b: Any): Any =
      GraftFunctions.winnow(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = GraftFunctions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $fn.winnow($a, $b);")
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def winnow(hashes: ArrayData, w: Int): ArrayData = {
    val n = hashes.numElements()
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j <= n - w) {
      var m = Long.MaxValue
      var i = j
      while (i < j + w) {
        val v = hashes.getLong(i)
        if (v < m) m = v
        i += 1
      }
      out.add(m)
      j += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  /** shingles32/64(text, n): fused tokenize → word n-gram → md5 hash
    * kernel.  Semantics exactly replicate the SQL chain
    * `array_distinct(transform(…, i -> concat_ws(' ', slice(split(
    * lower(text), ' '), i+1, n))))` + graft_hash32/64 per shingle —
    * but in one pass, instead of the higher-order-function tree that
    * re-evaluates the inlined split() per element.  32-bit variant
    * keeps first-occurrence order (minhash input); 64-bit variant is
    * SORTED (intersect-kernel input). */
  case class ShingleHashes(left: Expression, right: Expression, wide: Boolean)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(left.dataType == StringType && right.dataType == IntegerType,
        s"$prettyName expects (STRING, INT)")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = if (wide) "graft_shingles64" else "graft_shingles32"

    override def nullSafeEval(t: Any, n: Any): Any =
      GraftFunctions.shingleHashes(t.asInstanceOf[UTF8String], n.asInstanceOf[Int], wide)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = GraftFunctions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, (t, n) =>
        s"${ev.value} = $fn.shingleHashes($t, $n, $wide);")
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def shingleHashes(text: UTF8String, n: Int, wide: Boolean): ArrayData = {
    // ASCII fast path: tokens come from splitting on EVERY space with
    // empties kept, and shingles rejoin n consecutive tokens with
    // single spaces — so a shingle is exactly the CONTIGUOUS byte
    // range of the lowered buffer from its first token's start to its
    // last token's end.  No per-shingle string build, no per-shingle
    // digest allocation: record token starts once, md5First8 each
    // range with row-reused scratch.
    val lowered = text.toLowerCase.getBytes
    var asciiOk = true
    var q = 0
    while (asciiOk && q < lowered.length) { if (lowered(q) < 0) asciiOk = false; q += 1 }
    if (asciiOk) {
      var spaces = 0
      q = 0
      while (q < lowered.length) { if (lowered(q) == ' ') spaces += 1; q += 1 }
      val nTok = spaces + 1
      val starts = new Array[Int](nTok)
      var t = 1
      q = 0
      while (q < lowered.length) {
        if (lowered(q) == ' ') { starts(t) = q + 1; t += 1 }
        q += 1
      }
      val md = java.security.MessageDigest.getInstance("MD5")
      val out16 = new Array[Byte](16)
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      @inline def add(off: Int, len: Int): Unit = {
        val sig = md5First8(lowered, off, len, md, out16)
        seen.add(if (wide) sig else sig >>> 32)
      }
      if (nTok < n) add(0, 0)
      else {
        var i = 0
        while (i <= nTok - n) {
          val from = starts(i)
          val until = if (i + n < nTok) starts(i + n) - 1 else lowered.length
          add(from, until - from)
          i += 1
        }
      }
      val arr = new Array[Long](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { arr(k) = it.next(); k += 1 }
      if (wide) java.util.Arrays.sort(arr)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
    }
    // identical to SQL lower(): UTF8String.toLowerCase
    val s = text.toLowerCase.toString
    // identical to SQL split(s, ' ') with default limit: empties kept
    val tokens = {
      val out = new scala.collection.mutable.ArrayBuffer[String]()
      var start = 0
      var i = 0
      while (i < s.length) {
        if (s.charAt(i) == ' ') { out += s.substring(start, i); start = i + 1 }
        i += 1
      }
      out += s.substring(start)
      out
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    def hashOf(str: String): Long = {
      md.reset()
      val d = md.digest(str.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if (wide) {
        var v = 0L; var i = 0
        while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
        v
      } else
        ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    if (tokens.length < n) seen.add(hashOf(""))
    else {
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= tokens.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(tokens(i + j))
          j += 1
        }
        seen.add(hashOf(sb.toString))
        i += 1
      }
    }
    val arr = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    if (wide) java.util.Arrays.sort(arr)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  /** word_ngrams(text, n): positional word n-gram STRINGS of
    * lower(text) — `transform(sequence(0, size(t)-n), i ->
    * concat_ws(' ', slice(t, i+1, n)))` fused into one pass (the HOF
    * tree re-evaluates the inlined split() per element and pays a
    * multi-second codegen/JIT warm-up on first use).  Fewer than n
    * tokens → empty array. */
  case class WordNgrams(left: Expression, right: Expression) extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(left.dataType == StringType && right.dataType == IntegerType,
        s"$prettyName expects (STRING, INT)")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_word_ngrams"

    override def nullSafeEval(t: Any, n: Any): Any =
      GraftFunctions.wordNgrams(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = GraftFunctions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, (t, n) => s"${ev.value} = $fn.wordNgrams($t, $n);")
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** word_shingles(text, n): positional word n-gram STRINGS of the
    * RAW text — `transform(sequence(0, size(t)-n), i -> concat_ws(' ',
    * slice(t, i+1, n)))` with t = split(text, ' '), fused and
    * zero-copy: splitting on single spaces and rejoining with single
    * spaces reproduces the original bytes, so every shingle is a
    * BYTE-RANGE SLICE of the input buffer (UTF8String.fromBytes — no
    * StringBuilder, no per-shingle copy).  Byte-level 0x20 scanning
    * is exact for any UTF-8 input (a space byte never occurs inside
    * a multibyte sequence); empty tokens from doubled/leading/
    * trailing spaces are preserved exactly as split() keeps them.
    * Case-PRESERVING — unlike [[WordNgrams]], which lowercases (the
    * P69/P70 dup spans must quote and cut the original text
    * verbatim).  Fewer than n tokens → empty array. */
  case class WordShingles(left: Expression, right: Expression) extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = {
      val typesOk = check(left.dataType == StringType && right.dataType == IntegerType,
        s"$prettyName expects (STRING, INT)")
      if (typesOk != TypeCheckResult.TypeCheckSuccess) typesOk
      else if (right.foldable && {
        val v = right.eval(null); v != null && v.asInstanceOf[Int] < 1
      }) TypeCheckResult.TypeCheckFailure(s"$prettyName: n must be >= 1")
      else TypeCheckResult.TypeCheckSuccess
    }
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_word_shingles"

    override def nullSafeEval(t: Any, n: Any): Any =
      GraftFunctions.wordShingles(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = GraftFunctions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, (t, n) => s"${ev.value} = $fn.wordShingles($t, $n);")
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    // n < 1 is rejected at analysis for foldable n (checkInputDataTypes);
    // a non-foldable n that evaluates < 1 degrades to empty, matching
    // wordNgrams, instead of reading past the starts table.
    if (n < 1)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[UTF8String])
    val bytes = text.getBytes
    var spaces = 0
    var q = 0
    while (q < bytes.length) { if (bytes(q) == ' ') spaces += 1; q += 1 }
    val nTok = spaces + 1
    val m = nTok - n + 1
    if (m <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[UTF8String])
    val starts = new Array[Int](nTok)
    var t = 1
    q = 0
    while (q < bytes.length) {
      if (bytes(q) == ' ') { starts(t) = q + 1; t += 1 }
      q += 1
    }
    val arr = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      val from = starts(i)
      val until = if (i + n < nTok) starts(i + n) - 1 else bytes.length
      arr(i) = UTF8String.fromBytes(bytes, from, until - from)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  def wordNgrams(text: UTF8String, n: Int): ArrayData = {
    val s = text.toLowerCase.toString
    val tokens = {
      val out = new scala.collection.mutable.ArrayBuffer[String]()
      var start = 0
      var i = 0
      while (i < s.length) {
        if (s.charAt(i) == ' ') { out += s.substring(start, i); start = i + 1 }
        i += 1
      }
      out += s.substring(start)
      out
    }
    val m = tokens.length - n + 1
    if (m <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[UTF8String])
    val arr = new Array[UTF8String](m)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      arr(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  /** grams32(text, k): 32-bit md5 hash of every k-char gram of
    * lower(text), in position order (NOT distinct — winnowing needs
    * the positional sequence).  Equals
    * `transform(sequence(0, length-k), i -> graft_hash32(substring(
    * lower(text), i+1, k)))` fused into one pass. */
  case class Grams32(left: Expression, right: Expression) extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(left.dataType == StringType && right.dataType == IntegerType,
        s"$prettyName expects (STRING, INT)")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_grams32"

    override def nullSafeEval(t: Any, k: Any): Any =
      GraftFunctions.grams32(t.asInstanceOf[UTF8String], k.asInstanceOf[Int])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = GraftFunctions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, (t, k) => s"${ev.value} = $fn.grams32($t, $k);")
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** packgrams(text, k): every k-byte gram of lower(text) packed
    * big-endian into one Long (k ≤ 8), in position order.  The pack is
    * REVERSIBLE (unlike grams32's hash), so aggregations can run on
    * fixed-width longs and decode to the gram string only after the
    * cardinality collapse — for ASCII text the packed order equals the
    * string's lexicographic order.  Byte-oriented: on multi-byte UTF-8
    * a "gram" is k bytes, not k characters. */
  case class PackGrams(left: Expression, right: Expression) extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(left.dataType == StringType && right.dataType == IntegerType,
        s"$prettyName expects (STRING, INT)")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_packgrams"

    override def nullSafeEval(t: Any, k: Any): Any =
      GraftFunctions.packGrams(t.asInstanceOf[UTF8String], k.asInstanceOf[Int])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = GraftFunctions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, (t, k) => s"${ev.value} = $fn.packGrams($t, $k);")
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def packGrams(text: UTF8String, k: Int): ArrayData = {
    require(k >= 1 && k <= 8, s"graft_packgrams k must be in [1, 8], got $k")
    val b = text.toLowerCase.getBytes
    val n = b.length - k + 1
    if (n <= 0) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.emptyLongArray)
    val mask = if (k == 8) -1L else (1L << (8 * k)) - 1
    val out = new Array[Long](n)
    var acc = 0L
    var i = 0
    while (i < b.length) {
      acc = ((acc << 8) | (b(i) & 0xffL)) & mask
      if (i >= k - 1) out(i - k + 1) = acc
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def grams32(text: UTF8String, k: Int): ArrayData = {
    // ASCII fast path: after lowercasing, chars == bytes, so every
    // k-char gram is a k-byte SLICE of the lowered buffer — hash the
    // range in place (md5First8, scratch reused across all grams of
    // the row; the per-gram substring/getBytes/digest allocations of
    // the generic path were the fingerprint family's dominant cost).
    val lowered = text.toLowerCase.getBytes
    var ascii = true
    var j = 0
    while (ascii && j < lowered.length) { if (lowered(j) < 0) ascii = false; j += 1 }
    if (ascii) {
      val n = lowered.length - k + 1
      if (n <= 0) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.emptyLongArray)
      val md = java.security.MessageDigest.getInstance("MD5")
      val out16 = new Array[Byte](16)
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        out(i) = md5First8(lowered, i, k, md, out16) >>> 32
        i += 1
      }
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
    val s = text.toLowerCase.toString
    val n = s.length - k + 1
    if (n <= 0) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.emptyLongArray)
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(s.substring(i, i + k).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** bpe_apply(toks, a, b): ONE greedy left-to-right merge pass — every
    * non-overlapping adjacent (a, b) token pair becomes the single
    * token a||b, scanning left to right (the standard merge-application
    * order of Sennrich et al. ACL'16 §3; on a run like [a,a,a] with
    * merge (a,a) the leftmost pair wins → [aa, a]).  O(n) per row,
    * codegen'd — the apply step of each distributed BPE round runs
    * inside the scan stage. */
  case class BpeApply(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression {
    private def isStrArray(t: DataType) = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    override def checkInputDataTypes(): TypeCheckResult =
      check(isStrArray(first.dataType) && second.dataType == StringType &&
        third.dataType == StringType,
        s"$prettyName expects (ARRAY<STRING>, STRING, STRING)")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_bpe_apply"

    override def nullSafeEval(t: Any, a: Any, b: Any): Any =
      GraftFunctions.bpeApply(t.asInstanceOf[ArrayData],
        a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = GraftFunctions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, (t, a, b) => s"${ev.value} = $fn.bpeApply($t, $a, $b);")
    }

    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): Expression =
      copy(first = f, second = s, third = t)
  }

  def bpeApply(toks: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = toks.numElements()
    val out = new java.util.ArrayList[AnyRef](n)
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (i + 1 < n && t == a && toks.getUTF8String(i + 1) == b) {
        out.add(UTF8String.concat(a, b)); i += 2
      } else { out.add(t); i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[AnyRef](out.size)))
  }

  /** bpe_encode(toks, merges): the full merge TABLE applied in learned
    * order — semantically identical to chaining bpe_apply once per
    * merge, but in ONE expression call over ONE working array, so the
    * k-pass encode materializes one output array instead of k
    * (measured 2-4x on the corpus encode).  `merges` is the flattened
    * (l1, r1, l2, r2, …) literal. */
  case class BpeEncode(left: Expression, right: Expression)
      extends BinaryExpression {
    private def isStrArray(t: DataType) = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    override def checkInputDataTypes(): TypeCheckResult =
      check(isStrArray(left.dataType) && isStrArray(right.dataType),
        s"$prettyName expects (ARRAY<STRING> tokens, ARRAY<STRING> flat merge pairs)")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_bpe_encode"

    override def nullSafeEval(t: Any, m: Any): Any =
      GraftFunctions.bpeEncode(t.asInstanceOf[ArrayData], m.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = GraftFunctions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, (t, m) => s"${ev.value} = $fn.bpeEncode($t, $m);")
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def bpeEncode(toks: ArrayData, merges: ArrayData): ArrayData = {
    var n = toks.numElements()
    val buf = new Array[UTF8String](n)
    var i = 0
    while (i < n) { buf(i) = toks.getUTF8String(i); i += 1 }
    val nm = merges.numElements() / 2
    var m = 0
    while (m < nm) {
      val a = merges.getUTF8String(2 * m)
      val b = merges.getUTF8String(2 * m + 1)
      val ab = UTF8String.concat(a, b)
      // one greedy left-to-right pass, compacting in place
      var r = 0; var w = 0
      while (r < n) {
        if (r + 1 < n && buf(r) == a && buf(r + 1) == b) {
          buf(w) = ab; r += 2
        } else { buf(w) = buf(r); r += 1 }
        w += 1
      }
      n = w
      m += 1
    }
    val out = new Array[AnyRef](n)
    System.arraycopy(buf, 0, out, 0, n)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** bpe_stats(text, merges): fused tokenize → char symbols + '</w>'
    * → full merge-table application → [pre, post] symbol counts, one
    * pass per word with reused buffers.  Semantically identical to
    * exploding the symbol array and chaining bpe_apply per merge, but
    * never materializes a symbol array row — the higher-order-function
    * form spends its time building ~n_chars UTF8Strings per document
    * (same lesson as graft_shingles32: the fused kernel replaces the
    * HOF chain, not the arithmetic). */
  case class BpeStats(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      check(left.dataType == StringType &&
        (right.dataType match {
          case ArrayType(StringType, _) => true
          case _ => false
        }),
        s"$prettyName expects (STRING text, ARRAY<STRING> flat merge pairs)")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_bpe_stats"

    override def nullSafeEval(t: Any, m: Any): Any =
      GraftFunctions.bpeStats(t.asInstanceOf[UTF8String], m.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = GraftFunctions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, (t, m) => s"${ev.value} = $fn.bpeStats($t, $m);")
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def bpeStats(text: UTF8String, merges: ArrayData): ArrayData = {
    // identical to SQL lower() regardless of JVM default locale:
    // UTF8String.toLowerCase (ADVICE r10 — toString.toLowerCase would
    // take the Turkish dotless-ı path under tr_TR)
    val s = text.toLowerCase.toString
    val nm = merges.numElements() / 2
    val ls = new Array[String](nm)
    val rs = new Array[String](nm)
    val ab = new Array[String](nm)
    var m = 0
    while (m < nm) {
      ls(m) = merges.getUTF8String(2 * m).toString
      rs(m) = merges.getUTF8String(2 * m + 1).toString
      ab(m) = ls(m) + rs(m)
      m += 1
    }
    var pre = 0L
    var post = 0L
    val n = s.length
    var buf = new Array[String](64)
    var i = 0
    while (i < n) {
      while (i < n && s.charAt(i) == ' ') i += 1
      var j = i
      while (j < n && s.charAt(j) != ' ') j += 1
      if (j > i) {
        // split by CODE POINT, not UTF-16 unit: Spark's length()/
        // substring() count code points, so the HOF form this kernel
        // replaces yields one symbol per code point (an astral char is
        // ONE symbol, not a surrogate pair)
        if (j - i + 1 > buf.length) buf = new Array[String](j - i + 1)
        var k = i
        var cnt = 0
        while (k < j) {
          val cp = s.codePointAt(k)
          buf(cnt) = new String(Character.toChars(cp))
          cnt += 1
          k += Character.charCount(cp)
        }
        buf(cnt) = "</w>"
        cnt += 1
        pre += cnt
        m = 0
        while (m < nm) {
          val a = ls(m); val b = rs(m); val merged = ab(m)
          var r = 0; var w = 0
          while (r < cnt) {
            if (r + 1 < cnt && buf(r) == a && buf(r + 1) == b) {
              buf(w) = merged; r += 2
            } else { buf(w) = buf(r); r += 1 }
            w += 1
          }
          cnt = w
          m += 1
        }
        post += cnt
      }
      i = j
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(pre, post))
  }

  /** Base complement incl. IUPAC ambiguity codes (public SAM spec). */
  def complement(b: Byte): Byte = (b match {
    case 'A' => 'T'; case 'T' => 'A'; case 'C' => 'G'; case 'G' => 'C'
    case 'a' => 't'; case 't' => 'a'; case 'c' => 'g'; case 'g' => 'c'
    case 'U' => 'A'; case 'u' => 'a'
    case 'R' => 'Y'; case 'Y' => 'R'; case 'S' => 'S'; case 'W' => 'W'
    case 'K' => 'M'; case 'M' => 'K'; case 'B' => 'V'; case 'V' => 'B'
    case 'D' => 'H'; case 'H' => 'D'
    case other => other
  }).toByte

  // ------------------------------------------------------------ helpers
  // Column-side API goes through the function registry (the names are
  // injected by GraftExtensions / registerAll), keeping us on public
  // Spark API only.

  import org.apache.spark.sql.functions.{call_function, lit}

  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
  def cosineSim(a: Column, b: Column): Column = call_function("graft_cosine", a, b)
  def hamming64(a: Column, b: Column): Column = call_function("graft_hamming64", a, b)
  def phredShift(q: Column, d: Int): Column = call_function("graft_phred_shift", q, lit(d))
  def reverseComplement(s: Column): Column = call_function("graft_revcomp", s)

  private def info(name: String, usage: String) =
    new ExpressionInfo(GraftFunctions.getClass.getName, null, name, usage, "")

  private val fns: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_dot", "dot product of two float vectors",
      es => DotProduct(es(0), es(1))),
    ("graft_doti", "exact dot product of two BIGINT vectors",
      es => DotProductLong(es(0), es(1))),
    ("graft_simhash32", "32-bit simhash vote over token hashes",
      es => Simhash32(es(0))),
    ("graft_grampack", "packed upper-triangle Gram products of a BIGINT vector",
      es => GramPack(es(0))),
    ("graft_cosine", "cosine similarity of two float vectors",
      es => CosineSim(es(0), es(1))),
    ("graft_hamming64", "hamming distance of two 64-bit signatures",
      es => Hamming64(es(0), es(1))),
    ("graft_phred_shift", "shift quality string encoding by delta",
      es => PhredShift(es(0), es(1))),
    ("graft_revcomp", "reverse complement of a base sequence",
      es => ReverseComplement(es(0))),
    ("graft_hash32", "32-bit md5-derived string hash",
      es => Hash32Md5(es(0))),
    ("graft_minhash128", "128-element minhash signature of hash array",
      es => Minhash128(es(0))),
    ("graft_winnow", "distinct sliding-window minima (winnowing)",
      es => Winnow(es(0), es(1))),
    ("graft_hash64", "64-bit md5-derived string hash",
      es => Hash64Md5(es(0))),
    ("graft_bloom_contains", "k=3 double-hash Bloom probe of a 64-bit key",
      es => BloomContains(es(0), es(1))),
    ("graft_entropy_mb", "codepoint Shannon entropy in integer millibits",
      es => EntropyMb(es(0))),
    ("graft_micro_ln", "round(1e6*ln(n)) by the shared exact IEEE tree",
      es => MicroLn(es(0))),
    ("graft_micro_ln_ratio", "round(1e6*ln(a/b)) by the shared exact IEEE tree",
      es => MicroLnRatio(es(0), es(1))),
    ("graft_zorder64", "Morton interleave of two 31-bit dims (Z-order layout key)",
      es => Zorder64(es(0), es(1))),
    ("graft_zorder", "d-dim Morton interleave, 62/d bits per dim (Z-order layout key)",
      es => ZorderN(es)),
    ("graft_charclass", "one-pass ASCII [letters, digits, whitespace] counts",
      es => CharClass(es(0))),
    ("graft_text_gates", "one-pass (n_tok, n_distinct, s_en, s_de, s_es, s_fr) token stats",
      es => TextGates(es(0))),
    ("graft_media_dims", "[fmt, width, height] from image container headers",
      es => MediaDims(es(0))),
    ("graft_intersect_size", "intersection size of two sorted long arrays",
      es => IntersectSize(es(0), es(1))),
    ("graft_shingles32", "distinct word n-gram 32-bit hashes",
      es => ShingleHashes(es(0), es(1), wide = false)),
    ("graft_shingles64", "distinct word n-gram 64-bit hashes, sorted",
      es => ShingleHashes(es(0), es(1), wide = true)),
    ("graft_grams32", "positional k-char-gram 32-bit hashes",
      es => Grams32(es(0), es(1))),
    ("graft_packgrams", "positional k-byte grams packed into longs",
      es => PackGrams(es(0), es(1))),
    ("graft_word_ngrams", "positional word n-gram strings",
      es => WordNgrams(es(0), es(1))),
    ("graft_word_shingles", "positional case-preserving word n-gram slices",
      es => WordShingles(es(0), es(1))),
    ("graft_bpe_apply", "one greedy left-to-right BPE merge over a token array",
      es => BpeApply(es(0), es(1), es(2))),
    ("graft_bpe_encode", "a full BPE merge table applied in order, one call",
      es => BpeEncode(es(0), es(1))),
    ("graft_bpe_stats", "fused text -> BPE [pre, post] symbol counts",
      es => BpeStats(es(0), es(1))),
    ("graft_misra_gries", "capacity-k Misra-Gries heavy-hitter summary (mergeable)",
      es => Sketches.MisraGries(es(0), es(1))),
    ("graft_topk_by", "k largest (key, payload) rows per group via bounded map-side heaps",
      es => Sketches.TopKBy(es(0), es(1), es(2))))

  def inject(e: SparkSessionExtensions): Unit =
    fns.foreach { case (name, usage, builder) =>
      e.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }

  def registerAll(spark: SparkSession): Unit =
    fns.foreach { case (name, usage, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info(name, usage), builder)
    }
}
