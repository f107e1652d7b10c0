package graft.examples

import java.io.ByteArrayOutputStream

import graft.sources.Bgzf

/** A/B probe for VERDICT r7 item 8: does per-STREAM pipelined BGZF
  * deflate (a queue of pre-sized blocks fanned to worker threads) beat
  * the single-threaded deflate loop inside one writer task?
  *
  * Context that frames the answer: graft's write path already deflates
  * one shard PER SPARK TASK, so at local[32] (or on any executor with
  * as many write tasks as cores) the deflate work is embarrassingly
  * parallel ACROSS streams and the CPUs are saturated without any
  * in-stream pipeline.  In-stream workers can only win when a stage
  * writes fewer streams than it has idle cores.
  *
  *   sbt "runMain graft.examples.DeflateProbe [MiB] [workers]"
  */
object DeflateProbe {
  def main(args: Array[String]): Unit = {
    val mib = if (args.nonEmpty) args(0).toInt else 64
    val workers = if (args.length > 1) args(1).toInt else 4
    val rnd = new scala.util.Random(11)
    // BAM-like payload: compressible structure + noisy quals
    val data = new Array[Byte](mib << 20)
    var i = 0
    while (i < data.length) {
      data(i) = (if (i % 97 < 70) "ACGT".charAt(i % 4) else rnd.nextInt(64) + 33).toByte
      i += 1
    }
    val block = 0xff00

    def timed(label: String)(body: => Long): Double = {
      val t0 = System.nanoTime()
      val bytes = body
      val t = (System.nanoTime() - t0) / 1e9
      println(f"DEFLATEPROBE $label%-16s $t%6.2fs  ${mib / t}%6.1f MiB/s  ($bytes comp bytes)")
      t
    }

    // warm-up JIT + per-thread Deflaters
    (0 until 2).foreach { _ =>
      val o = new ByteArrayOutputStream(); Bgzf.writeBlocksTo(o, data, 0, 8 << 20)
    }

    val tSingle = timed("single_thread") {
      val out = new ByteArrayOutputStream(data.length / 2)
      var o = 0
      var written = 0L
      while (o < data.length) {
        val n = math.min(block, data.length - o)
        written += Bgzf.writeBlockTo(out, data, o, n)
        o += n
      }
      written
    }

    val tPipe = timed(s"pipelined_x$workers") {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(workers)
      try {
        val futures = new java.util.ArrayList[java.util.concurrent.Future[Array[Byte]]]()
        var o = 0
        while (o < data.length) {
          val start = o
          val n = math.min(block, data.length - o)
          futures.add(pool.submit(new java.util.concurrent.Callable[Array[Byte]] {
            def call(): Array[Byte] = {
              val b = new ByteArrayOutputStream(n / 2)
              Bgzf.writeBlockTo(b, data, start, n)
              b.toByteArray
            }
          }))
          o += n
        }
        var written = 0L
        val it = futures.iterator()
        while (it.hasNext) written += it.next().get().length
        written
      } finally pool.shutdown()
    }
    println(f"DEFLATEPROBE speedup ${tSingle / tPipe}%.2fx with $workers workers " +
      "(meaningful only when a stage has fewer write tasks than idle cores)")

    // the REAL stream, including the index-granularity drain barrier
    // every ~1000 records (≈2 blocks): the pipeline depth is capped by
    // the barrier, so this is the honest expectation for BAM writes
    def streamTimed(label: String, w: Int, boundaryEvery: Int): Unit = {
      val t0 = System.nanoTime()
      val sink = new ByteArrayOutputStream(data.length / 2)
      val s = new Bgzf.BgzfOutputStream(sink, workers = w)
      var o = 0
      var sinceBoundary = 0
      while (o < data.length) {
        val n = math.min(4096, data.length - o)
        s.write(data, o, n)
        o += n; sinceBoundary += n
        if (boundaryEvery > 0 && sinceBoundary >= boundaryEvery) {
          val _ = s.markBoundary() // deferred marker: no pipeline drain
          sinceBoundary = 0
        }
      }
      s.closeWithoutTerminator()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"DEFLATEPROBE $label%-16s $t%6.2fs  ${mib / t}%6.1f MiB/s")
    }
    streamTimed("stream_sync", 0, 100000)
    streamTimed(s"stream_x$workers", workers, 100000)
    streamTimed(s"stream_x${workers}_nb", workers, 0) // no barriers
  }
}
