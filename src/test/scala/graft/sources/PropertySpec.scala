package graft.sources

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{SamHeader, SamRecord, SamRef}

/** Property-based robustness: arbitrary payloads through BGZF,
  * generated records through the BAM codec, arbitrary split points
  * through the boundary guesser. */
class PropertySpec extends AnyFunSuite {

  /** Deterministic sampling loop standing in for forAll (the
    * scalatest/scalacheck bridge artifact isn't in the offline cache). */
  private def forSamples[A](gen: Gen[A], n: Int = 150)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  private val header = SamHeader(
    "@HD\tVN:1.6\n@SQ\tSN:c1\tLN:100000\n@SQ\tSN:c2\tLN:100000",
    Array(SamRef("c1", 100000), SamRef("c2", 100000)))
  private val refIdx = header.refs.map(_.name).zipWithIndex.toMap

  test("BGZF round-trips arbitrary byte payloads at arbitrary block sizes") {
    val gen = for {
      data <- Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))
      blockSize <- Gen.choose(64, 60000)
    } yield (data, blockSize)
    forSamples(gen, 100) { case (data, blockSize) =>
      val bos = new java.io.ByteArrayOutputStream()
      val out = new Bgzf.BgzfOutputStream(bos, blockSize = math.min(blockSize, 0xff00))
      out.write(data)
      out.close()
      val in = new Bgzf.BgzfInputStream(new java.io.ByteArrayInputStream(bos.toByteArray))
      val back = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1024)
      var r = in.read(buf)
      while (r > 0) { back.write(buf, 0, r); r = in.read(buf) }
      assert(back.toByteArray === data)
    }
  }

  private val genBase = Gen.oneOf('A', 'C', 'G', 'T', 'N')
  private val genQual = Gen.choose(33, 93).map(_.toChar)
  private val genRecord: Gen[SamRecord] = for {
    qlen <- Gen.choose(1, 20)
    qname <- Gen.listOfN(qlen, Gen.alphaNumChar).map(_.mkString)
    flag <- Gen.choose(0, 4095)
    rname <- Gen.oneOf("c1", "c2", "*")
    pos <- if (true) Gen.choose(1, 99000) else Gen.const(0)
    mapq <- Gen.choose(0, 254)
    seqLen <- Gen.choose(1, 60)
    seq <- Gen.listOfN(seqLen, genBase).map(_.mkString)
    qual <- Gen.listOfN(seqLen, genQual).map(_.mkString)
    nm <- Gen.choose(0, 100)
    tagStr <- Gen.listOfN(Gen.choose(0, 12).sample.getOrElse(4),
      Gen.alphaNumChar).map(_.mkString)
  } yield SamRecord(
    qname = if (qname.isEmpty) "q" else qname,
    flag = flag,
    rname = rname,
    pos = if (rname == "*") 0 else pos,
    mapq = mapq,
    cigar = if (rname == "*") "*" else s"${seqLen}M",
    rnext = "*", pnext = 0, tlen = 0,
    seq = seq, qual = qual,
    tags = Array(s"NM:i:$nm", s"XX:Z:$tagStr"))

  test("BAM codec round-trips generated records") {
    forSamples(genRecord, 300) { r =>
      val dec = BamCodec.decode(BamCodec.encode(r, refIdx), header.refs)
      assert(dec.qname === r.qname)
      assert(dec.flag === r.flag)
      assert(dec.rname === r.rname)
      assert(dec.pos === r.pos)
      assert(dec.seq === r.seq)
      assert(dec.qual === r.qual)
      assert(dec.tags.toSeq === r.tags.toSeq)
    }
  }

  test("record-boundary guesser finds a true boundary from any offset") {
    val records = (0 until 50).map(i => genRecord.sample.get)
    val bos = new java.io.ByteArrayOutputStream()
    val starts = scala.collection.mutable.ArrayBuffer[Int]()
    records.foreach { r =>
      starts += bos.size()
      val data = BamCodec.encode(r, refIdx)
      val len = data.length
      bos.write(len & 0xff); bos.write((len >> 8) & 0xff)
      bos.write((len >> 16) & 0xff); bos.write((len >> 24) & 0xff)
      bos.write(data)
    }
    val stream = bos.toByteArray
    forSamples(Gen.choose(0, stream.length - 200), 200) { off =>
      val guess = BamCodec.guessRecordStart(
        java.util.Arrays.copyOfRange(stream, off, stream.length), header.refs.length)
      if (guess >= 0) {
        assert(starts.contains(off + guess),
          s"offset $off guessed non-boundary ${off + guess}")
      }
    }
  }
}
