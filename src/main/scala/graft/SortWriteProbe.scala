package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.model.{SamHeader, SamRecord, SamRef}
import graft.sources.BamIO

/** Measured evidence for the packed sorted-write key (VERDICT r12
  * item 4): `BamIO.writeSorted` orders by (refIdx, pos) — two ints —
  * so SortExec's prefix is refIdx alone and a single-contig shard
  * (the common real layout: one chromosome per range partition) TIES
  * on every comparison and falls back to the row comparator, the
  * SKEWPROBE r12 class.  The r13 packed key `refIdx·2^32 + (pos+2^31)`
  * is an injective image of the pair: the whole sort stays in the
  * radix/prefix path and the range exchange samples one long per row.
  *
  * Interleaved OFF/ON/OFF/ON/OFF/ON in ONE session (the SkewProbe
  * methodology — cross-window comparisons drift 1.1-1.2×), two
  * regimes:
  *
  *   - `single_contig`: every record on chr1, positions uniform —
  *     the tied-prefix worst case the class note names;
  *   - `multi_contig`: 24 contigs — the prefix discriminates OFF's
  *     leading column sometimes, so the expected win shrinks.
  *
  * Per run: wall seconds + slowest shuffle-read task (the
  * 1000-executor signal).  Output parity is asserted in-run: both
  * paths' files must decode to the same record count and the same
  * order-sensitive coordinate checksum.
  *
  * Usage: SPARK_GRAFT_CPUS=32 [SPARK_GRAFT_BENCH_OUT=...] \
  *          runMain graft.SortWriteProbe [rows] [outDir]
  */
object SortWriteProbe {

  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 4000000L
    val dir = if (args.length > 1) args(1) else "/tmp/graft_sortwrite_probe"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val probe = Bench.calibrate(25000000)
    import spark.implicits._

    val maxTaskMs = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val read = Option(t.taskMetrics)
          .map(_.shuffleReadMetrics.totalBytesRead).getOrElse(0L)
        if (read > 0)
          maxTaskMs.getAndUpdate(x => math.max(x, t.taskInfo.duration))
      }
    })

    val seq60 = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"
    val qual60 = "I" * 60

    def mkHeader(nContigs: Int): SamHeader = {
      val refs = (1 to nContigs).map(i => SamRef(s"chr$i", 200000000)).toArray
      SamHeader("@HD\tVN:1.6\n" +
        refs.map(r => s"@SQ\tSN:${r.name}\tLN:${r.length}").mkString("\n"), refs)
    }

    // deterministic UNSORTED input: splitmix-style position scatter so
    // the sort does real work (FormatBench's generator is pre-sorted)
    def input(nContigs: Int) = spark.range(0, rows, 1, cpus * 4).map { i =>
      var x = i * 0x9e3779b97f4a7c15L
      x ^= x >>> 30; x *= 0xbf58476d1ce4e5b9L; x ^= x >>> 27
      val contig = s"chr${1 + (if (nContigs == 1) 0 else ((x >>> 48) % nContigs).toInt)}"
      val pos = 1 + ((x & 0x7fffffffL) % 199999000L).toInt
      SamRecord(s"r$i", if (i % 2 == 0) 99 else 147, contig, pos, 60, "60M",
        "*", 0, 0, seq60, qual60, Array(s"NM:i:${i % 4}"))
    }

    val metrics = scala.collection.mutable.LinkedHashMap[String, Any]()
    metrics("metric") = "sortwrite_packed_ab"
    metrics("rows") = rows
    metrics("cpus") = cpus
    metrics("probe_sec") = probe

    def coordChecksum(file: String): (Long, Long) = {
      // order-sensitive within each split via a positional fold; the
      // count pins the multiset size
      val recs = BamIO.read(spark, file, splitSize = 1L << 30,
        columns = Seq("rname", "pos"))
      val agg = recs.mapPartitions { it =>
        var h = 0L; var n = 0L
        it.foreach { r =>
          h = h * 1000003L + (r.rname.hashCode.toLong << 32 | (r.pos & 0xffffffffL))
          n += 1
        }
        Iterator.single((h, n))
      }.collect()
      (agg.map(_._1).sum, agg.map(_._2).sum)
    }

    for ((regime, nContigs) <- Seq(("single_contig", 1), ("multi_contig", 24))) {
      val header = mkHeader(nContigs)
      val ds = input(nContigs)
      ds.count() // materialize codegen before timing
      val walls = scala.collection.mutable.Map[Boolean, List[Double]]()
        .withDefaultValue(Nil)
      val slowest = scala.collection.mutable.Map[Boolean, List[Long]]()
        .withDefaultValue(Nil)
      var sums: Map[Boolean, (Long, Long)] = Map.empty
      // the write wall is deflate-dominated; also time the SORT STAGE
      // alone (range exchange + sort into a noop sink — the exact
      // plan prefix writeSorted executes) to isolate the packed win
      val sortWalls = scala.collection.mutable.Map[Boolean, List[Double]]()
        .withDefaultValue(Nil)
      import org.apache.spark.sql.functions._
      val refOrder = header.refs.map(_.name).zipWithIndex.toMap
      val orderMap = typedLit(refOrder)
      val refIdxCol = coalesce(orderMap(col("rname")), lit(Int.MaxValue))
      def sortOnly(packed: Boolean): Unit = {
        val df = ds.toDF()
        val sorted =
          if (packed)
            df.withColumn("_pk", refIdxCol.cast("long") * lit(4294967296L) +
                (col("pos").cast("long") + lit(2147483648L)))
              .repartitionByRange(col("_pk"))
              .sortWithinPartitions(col("_pk")).drop("_pk")
          else
            df.withColumn("_refIdx", refIdxCol)
              .repartitionByRange(col("_refIdx"), col("pos"))
              .sortWithinPartitions(col("_refIdx"), col("pos")).drop("_refIdx")
        sorted.write.format("noop").mode("overwrite").save()
      }
      for (rep <- 0 until 3; packed <- Seq(false, true)) {
        val file = s"$dir/${regime}_${if (packed) "on" else "off"}.bam"
        spark.conf.set("spark.graft.ranked.packedSortPrefix", packed.toString)
        maxTaskMs.set(0)
        val t0 = System.nanoTime()
        BamIO.writeSorted(ds, header, file)
        val wall = (System.nanoTime() - t0) / 1e9
        walls(packed) ::= wall
        slowest(packed) ::= maxTaskMs.get()
        val t1 = System.nanoTime()
        sortOnly(packed)
        val sWall = (System.nanoTime() - t1) / 1e9
        spark.conf.unset("spark.graft.ranked.packedSortPrefix")
        sortWalls(packed) ::= sWall
        if (rep == 0) sums += packed -> coordChecksum(file)
        println(f"SORTWRITEPROBE $regime packed=$packed%-5s rep=$rep " +
          f"wall=$wall%6.2fs sort_only=$sWall%6.2fs slowest_task=${maxTaskMs.get()}ms")
      }
      val (hOn, nOn) = sums(true)
      val (hOff, nOff) = sums(false)
      require(nOn == rows && nOff == rows, s"record loss: $nOn/$nOff of $rows")
      require(hOn == hOff,
        s"$regime: packed and unpacked coordinate sequences DIVERGED")
      def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
      metrics(s"${regime}_off_med_sec") = med(walls(false))
      metrics(s"${regime}_on_med_sec") = med(walls(true))
      metrics(s"${regime}_off_walls") = walls(false).reverse
      metrics(s"${regime}_on_walls") = walls(true).reverse
      metrics(s"${regime}_off_slowest_task_ms") = slowest(false).min
      metrics(s"${regime}_on_slowest_task_ms") = slowest(true).min
      metrics(s"${regime}_speedup") = med(walls(false)) / med(walls(true))
      metrics(s"${regime}_sort_off_med_sec") = med(sortWalls(false))
      metrics(s"${regime}_sort_on_med_sec") = med(sortWalls(true))
      metrics(s"${regime}_sort_speedup") = med(sortWalls(false)) / med(sortWalls(true))
      metrics(s"${regime}_checksum_match") = true
      println(f"SORTWRITEPROBE $regime speedup=${med(walls(false)) / med(walls(true))}%.2fx " +
        f"sort_speedup=${med(sortWalls(false)) / med(sortWalls(true))}%.2fx")
    }
    metrics("probe_end_sec") = Bench.calibrate(25000000)

    def js(v: Any): String = v match {
      case s: String => "\"" + s + "\""
      case b: Boolean => b.toString
      case d: Double => f"$d%.4f"
      case l: List[_] => l.map(js).mkString("[", ",", "]")
      case x => x.toString
    }
    val json = metrics.map { case (k, v) => s""""$k":${js(v)}""" }
      .mkString("{", ",", "}")
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { f =>
      java.nio.file.Files.write(java.nio.file.Paths.get(f),
        (json + "\n").getBytes("UTF-8"))
      println(s"SORTWRITEPROBE artifact $f")
    }
    println(json)
    spark.stop()
  }
}
