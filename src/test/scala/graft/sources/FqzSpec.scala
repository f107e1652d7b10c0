package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CramForeign.ByteStream

/** CRAM 3.1 fqzcomp quality codec (method 7): round-trips over
  * realistic quality shapes, the spec run-length array framing, and
  * the failure modes that must be loud. */
class FqzSpec extends AnyFunSuite {

  private def qualData(nRecs: Int, seed: Long,
                       lenOf: Int => Int): (Array[Byte], Array[Int]) = {
    val rnd = new scala.util.Random(seed)
    val lens = Array.tabulate(nRecs)(lenOf)
    val out = new java.io.ByteArrayOutputStream()
    lens.foreach { len =>
      // random-walk qualities, like real reads: near-previous values
      var q = 25 + rnd.nextInt(10)
      (0 until len).foreach { _ =>
        q = math.max(0, math.min(45, q + rnd.nextInt(7) - 3))
        out.write(q)
      }
    }
    (out.toByteArray, lens)
  }

  test("round-trips fixed-length and variable-length quality blocks") {
    for ((n, lenOf) <- Seq(
      (200, (_: Int) => 100),                    // fixed length
      (137, (i: Int) => 30 + (i * 37) % 120),    // varying lengths
      (1, (_: Int) => 5),                        // single record
      (500, (i: Int) => 1 + i % 3))) {           // tiny records
      val (raw, lens) = qualData(n, seed = n, lenOf)
      val enc = Fqz.encode(raw, lens)
      val dec = Fqz.decode(enc, raw.length)
      assert(java.util.Arrays.equals(dec, raw),
        s"fqz round-trip mismatch at n=$n")
    }
  }

  test("writer-produced multi-parameter selector streams round-trip") {
    // GMultiParam + GHaveStab + coded per-record selector, parameter
    // sets with distinct context layouts (alternating qshift), PDoSel
    // context contribution — the decoder's rarer header/model branches
    // against encoder-produced bytes, not hand-built streams
    for (nParam <- Seq(2, 3, 4)) {
      val (raw, lens) = qualData(160, seed = 7 * nParam, i => 40 + (i * 13) % 60)
      val enc = Fqz.encodeOpt(raw, lens, nParam = nParam)
      assert(java.util.Arrays.equals(Fqz.decode(enc, raw.length), raw),
        s"multi-param round-trip mismatch at nParam=$nParam")
    }
    // an explicit selector array denser than round-robin (bursts), and
    // selectors above nParam-1 exercising the stab clamp
    val (raw, lens) = qualData(120, seed = 99, i => 50 + i % 20)
    val sel = Array.tabulate(120)(i => if (i < 60) 0 else (i % 3) + 1)
    val enc = Fqz.encodeOpt(raw, lens, nParam = 3, selector = sel)
    assert(java.util.Arrays.equals(Fqz.decode(enc, raw.length), raw))
  }

  test("writer-produced dedup streams round-trip and actually shrink") {
    val rnd = new scala.util.Random(41)
    val lens = Array.fill(300)(80)
    val base = Array.tabulate(80)(i => (20 + (i * 7) % 25).toByte)
    val out = new java.io.ByteArrayOutputStream()
    lens.indices.foreach { r =>
      // runs of byte-identical records, as optical duplicates produce
      if (r % 5 == 0 || r % 5 == 4)
        out.write(Array.tabulate(80)(_ => (15 + rnd.nextInt(30)).toByte))
      else out.write(base)
    }
    val raw = out.toByteArray
    val dedup = Fqz.encodeOpt(raw, lens, dedup = true)
    val plain = Fqz.encodeOpt(raw, lens)
    assert(java.util.Arrays.equals(Fqz.decode(dedup, raw.length), raw))
    assert(dedup.length < plain.length,
      s"dup elimination did not shrink: ${dedup.length} vs ${plain.length}")
  }

  test("writer-produced reverse-flag streams round-trip to original orientation") {
    val (raw, lens) = qualData(150, seed = 43, i => 30 + (i * 11) % 70)
    val revs = Array.tabulate(150)(i => i % 3 == 1)
    val enc = Fqz.encodeOpt(raw, lens, revFlags = revs)
    // the decoder's final pass must restore ORIGINAL orientation
    assert(java.util.Arrays.equals(Fqz.decode(enc, raw.length), raw))
    // sanity: an all-false flag vector also round-trips (rev models
    // coded but never firing)
    val enc0 = Fqz.encodeOpt(raw, lens, revFlags = Array.fill(150)(false))
    assert(java.util.Arrays.equals(Fqz.decode(enc0, raw.length), raw))
  }

  test("sel + dedup + rev combined round-trips (every rare branch at once)") {
    val rnd = new scala.util.Random(47)
    val nRec = 200
    val lens = Array.fill(nRec)(64)
    val patterns = Array.tabulate(4)(p =>
      Array.tabulate(64)(i => (10 + ((i * (p + 3)) % 30)).toByte))
    val out = new java.io.ByteArrayOutputStream()
    (0 until nRec).foreach { r =>
      if (r % 4 == 3) out.write(patterns(rnd.nextInt(4)))
      else out.write(patterns(r % 4))
    }
    val raw = out.toByteArray
    val sel = Array.tabulate(nRec)(_ % 3)
    val revs = Array.tabulate(nRec)(r => r % 7 == 2)
    val enc = Fqz.encodeOpt(raw, lens, nParam = 3, selector = sel,
      dedup = true, revFlags = revs)
    assert(java.util.Arrays.equals(Fqz.decode(enc, raw.length), raw))
  }

  test("encodeOpt defaults are byte-identical to the plain encode profile") {
    val (raw, lens) = qualData(100, seed = 53, i => 20 + i % 40)
    assert(java.util.Arrays.equals(Fqz.encode(raw, lens),
      Fqz.encodeOpt(raw, lens)))
  }

  test("round-trips degenerate alphabets (constant and binary quality)") {
    val lens = Array.fill(50)(80)
    val const = Array.fill(50 * 80)(30.toByte)
    assert(java.util.Arrays.equals(Fqz.decode(Fqz.encode(const, lens),
      const.length), const))
    val rnd = new scala.util.Random(7)
    val binary = Array.fill(50 * 80)(if (rnd.nextBoolean()) 10.toByte else 35.toByte)
    assert(java.util.Arrays.equals(Fqz.decode(Fqz.encode(binary, lens),
      binary.length), binary))
  }

  test("compresses a realistic quality stream") {
    val (raw, lens) = qualData(400, seed = 42, _ => 150)
    val enc = Fqz.encode(raw, lens)
    assert(enc.length < raw.length / 2,
      s"fqz ${enc.length} bytes for ${raw.length} raw — model not adapting")
  }

  test("spec array framing round-trips (runs, skips, >255 runs, replication)") {
    val cases = Seq(
      Array.tabulate(256)(i => i / 25),               // small even runs
      Array.fill(1024)(0),                            // one >255-run value
      Array.tabulate(1024)(i => if (i < 1000) 0 else 7), // skipped values
      Array.tabulate(256)(identity),                  // all runs of 1 (replication)
      Array.tabulate(1024)(i => math.min(7, 32 - Integer.numberOfLeadingZeros(i))),
      Array.tabulate(256)(i => if (i == 0) 0 else 1)) // 1 then 255-run
    cases.zipWithIndex.foreach { case (arr, k) =>
      val out = new java.io.ByteArrayOutputStream()
      Fqz.writeArray(out, arr, arr.length)
      val bytes = out.toByteArray
      val back = Fqz.readArray(new ByteStream(bytes), arr.length)
      assert(back.toSeq === arr.toSeq, s"array case $k mismatch")
    }
  }

  test("embedded length must agree with the block raw size") {
    val (raw, lens) = qualData(10, seed = 1, _ => 20)
    val enc = Fqz.encode(raw, lens)
    val e = intercept[IllegalArgumentException](Fqz.decode(enc, raw.length + 1))
    assert(e.getMessage.contains("embedded length"))
  }

  test("unsupported version fails loudly") {
    val (raw, lens) = qualData(5, seed = 2, _ => 10)
    val enc = Fqz.encode(raw, lens)
    // uint7 length survives; bump the version byte that follows it
    var p = 0
    while ((enc(p) & 0x80) != 0) p += 1
    enc(p + 1) = 4
    val e = intercept[IllegalArgumentException](Fqz.decode(enc, raw.length))
    assert(e.getMessage.contains("version"))
  }

  test("lengths must be positive and sum to the data size") {
    intercept[IllegalArgumentException](
      Fqz.encode(Array[Byte](1, 2, 3), Array(2, 0, 1)))
    intercept[IllegalArgumentException](
      Fqz.encode(Array[Byte](1, 2, 3), Array(2, 2)))
  }
}
