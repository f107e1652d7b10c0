package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** The range-feeding MD5 hot path (GraftFunctions.md5First8 over a
  * caller-reused MessageDigest) must be BIT-EQUAL to the original
  * fresh-digest-per-call spelling — the DuckDB oracles spell md5()
  * and every fingerprint/shingle/hash kernel feeds the oracle gate
  * through it.  Pins: the range/reuse form across message lengths
  * (incl. repeated calls on ONE digest instance, which is how the
  * kernels drive it), and the grams32 / shingleHashes ASCII fast
  * paths against a MessageDigest reference implementation of their
  * original per-substring spelling, on adversarial ASCII (space runs,
  * leading/trailing spaces, empties) and non-ASCII (accents + astral
  * pairs, which must route to the unchanged slow path). */
class Md5KernelSpec extends AnyFunSuite {

  private def refFirst8(b: Array[Byte]): Long = {
    val d = MessageDigest.getInstance("MD5").digest(b)
    var v = 0L; var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }

  test("md5First8 range/reuse form equals a fresh digest per message") {
    val rnd = new scala.util.Random(71)
    val md = MessageDigest.getInstance("MD5")
    val out16 = new Array[Byte](16)
    val lengths = (0 to 200) ++ Seq(255, 256, 257, 511, 512, 1000)
    lengths.foreach { n =>
      val b = new Array[Byte](n)
      rnd.nextBytes(b)
      assert(GraftFunctions.md5First8(b, 0, n, md, out16) === refFirst8(b),
        s"mismatch at len $n")
    }
    // ranged reads must hash exactly [off, off+len), and state must
    // fully reset between messages on the SAME reused instance
    (0 to 80).foreach { _ =>
      val b = new Array[Byte](300)
      rnd.nextBytes(b)
      val off = rnd.nextInt(100)
      val len = rnd.nextInt(200)
      val slice = java.util.Arrays.copyOfRange(b, off, off + len)
      assert(GraftFunctions.md5First8(b, off, len, md, out16) === refFirst8(slice))
    }
  }

  test("hash32/hash64 equal the MessageDigest spelling") {
    val rnd = new scala.util.Random(73)
    (0 to 100).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(120))
      rnd.nextBytes(b)
      val ref = refFirst8(b)
      assert(GraftFunctions.hash32(b) === (ref >>> 32))
      assert(GraftFunctions.hash64(b) === ref)
    }
  }

  // reference = the original per-substring MessageDigest spelling
  private def refGrams32(text: String, k: Int): Seq[Long] = {
    val s = UTF8String.fromString(text).toLowerCase.toString
    val n = s.length - k + 1
    if (n <= 0) Seq.empty
    else (0 until n).map { i =>
      refFirst8(s.substring(i, i + k).getBytes(StandardCharsets.UTF_8)) >>> 32
    }
  }

  private def refShingles(text: String, n: Int, wide: Boolean): Seq[Long] = {
    val s = UTF8String.fromString(text).toLowerCase.toString
    val tokens = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var start = 0
      var i = 0
      while (i < s.length) {
        if (s.charAt(i) == ' ') { out += s.substring(start, i); start = i + 1 }
        i += 1
      }
      out += s.substring(start)
      out.toSeq
    }
    def h(str: String): Long = {
      val v = refFirst8(str.getBytes(StandardCharsets.UTF_8))
      if (wide) v else v >>> 32
    }
    val raw =
      if (tokens.length < n) Seq(h(""))
      else (0 to tokens.length - n).map(i => h(tokens.slice(i, i + n).mkString(" ")))
    val distinct = raw.distinct
    if (wide) distinct.sorted else distinct
  }

  private def longs(a: org.apache.spark.sql.catalyst.util.ArrayData): Seq[Long] =
    (0 until a.numElements()).map(a.getLong)

  private val asciiCases = Seq(
    "", " ", "  ", "a", "ab", "the quick brown fox jumps over the lazy dog",
    " leading and  double  spaces ", "UPPER Case MiXeD", "tab\tand\nnewline keep",
    "exactly55bytes-" + ("x" * 40), "x" * 56, "y" * 64, "z" * 129,
    "a b c d e f g h i j k l m n o p")

  private val nonAsciiCases = Seq(
    "café au lait", "naïve résumé", "日本語 テキスト", "mixed ascii és ékezet",
    "astral 😀 pair", "😀", "é")

  test("grams32 fast path equals the reference on ASCII, slow path on non-ASCII") {
    val rnd = new scala.util.Random(79)
    val randomAscii = Seq.fill(40) {
      val n = rnd.nextInt(120)
      new String(Array.fill(n)((rnd.nextInt(95) + 32).toChar))
    }
    (asciiCases ++ nonAsciiCases ++ randomAscii).foreach { t =>
      Seq(3, 8).foreach { k =>
        val got = longs(GraftFunctions.grams32(UTF8String.fromString(t), k))
        assert(got === refGrams32(t, k), s"grams32 mismatch on ${t.take(30)} k=$k")
      }
    }
  }

  test("shingleHashes fast path equals the reference on ASCII, slow path on non-ASCII") {
    val rnd = new scala.util.Random(83)
    val randomAscii = Seq.fill(40) {
      val words = rnd.nextInt(12)
      (0 until words).map(_ => ("a" + rnd.nextInt(7)) * (rnd.nextInt(3) + 1))
        .mkString(Seq(" ", "  ", " ").apply(rnd.nextInt(3)))
    }
    (asciiCases ++ nonAsciiCases ++ randomAscii).foreach { t =>
      Seq(1, 3).foreach { n =>
        Seq(false, true).foreach { wide =>
          val got = longs(GraftFunctions.shingleHashes(UTF8String.fromString(t), n, wide))
          assert(got === refShingles(t, n, wide),
            s"shingles mismatch on '${t.take(30)}' n=$n wide=$wide")
        }
      }
    }
  }
}
