package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class BgzfSpec extends AnyFunSuite {

  private def compress(data: Array[Byte], blockSize: Int = 1000): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new Bgzf.BgzfOutputStream(bos, blockSize = blockSize)
    out.write(data)
    out.close()
    bos.toByteArray
  }

  private def decompress(bytes: Array[Byte]): Array[Byte] = {
    val in = new Bgzf.BgzfInputStream(new ByteArrayInputStream(bytes))
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    var r = in.read(buf)
    while (r > 0) { out.write(buf, 0, r); r = in.read(buf) }
    out.toByteArray
  }

  test("round-trip arbitrary bytes through multiple blocks") {
    val rnd = new Random(42)
    val data = Array.fill(10000)(rnd.nextInt(256).toByte)
    val comp = compress(data)
    assert(decompress(comp) === data)
    // multiple blocks were produced (10000 bytes / 1000-byte blocks)
    assert(comp.length > 28)
    assert(Bgzf.parseBsize(comp, 0) > 0)
  }

  test("stream ends with the spec EOF terminator") {
    val comp = compress("hello".getBytes)
    val tail = comp.takeRight(Bgzf.EofMarker.length)
    assert(tail === Bgzf.EofMarker)
  }

  test("empty stream is just the terminator") {
    val comp = compress(Array.emptyByteArray)
    assert(comp === Bgzf.EofMarker)
  }

  test("findBlockStart locates boundaries from arbitrary offsets") {
    val rnd = new Random(7)
    val data = Array.fill(8000)(rnd.nextInt(256).toByte)
    val comp = compress(data, blockSize = 500)
    // collect true block starts
    val starts = scala.collection.mutable.ArrayBuffer[Int]()
    var p = 0
    while (p < comp.length) {
      starts += p
      p += Bgzf.parseBsize(comp, p)
    }
    // from any offset, the guesser must find the next true start
    (0 until comp.length - 28 by 37).foreach { off =>
      val found = Bgzf.findBlockStart(comp, off)
      assert(starts.contains(found), s"offset $off found non-boundary $found")
      assert(found >= off)
      assert(found === starts.find(_ >= off).get)
    }
  }

  test("virtual offsets round-trip") {
    val vo = Bgzf.virtualOffset(123456789L, 4321)
    assert(Bgzf.voCompressed(vo) === 123456789L)
    assert(Bgzf.voUncompressed(vo) === 4321)
  }

  test("BgzfInputStream tracks virtual positions across blocks") {
    val data = (0 until 3000).map(i => (i % 251).toByte).toArray
    val comp = compress(data, blockSize = 1000)
    val in = new Bgzf.BgzfInputStream(new ByteArrayInputStream(comp))
    assert(in.virtualPos === 0L)
    val buf = new Array[Byte](1000)
    var got = 0
    while (got < 1000) got += in.read(buf, got, 1000 - got)
    // after exactly one block, position reports next block start
    val vp = in.virtualPos
    assert(Bgzf.voUncompressed(vp) === 0)
    assert(Bgzf.voCompressed(vp) === Bgzf.parseBsize(comp, 0))
  }
}
