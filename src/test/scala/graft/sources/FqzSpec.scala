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
