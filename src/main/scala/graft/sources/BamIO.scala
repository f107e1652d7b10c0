package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException}

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.{SamHeader, SamRecord}

/** Filesystem access via the Hadoop FS API so the same code serves
  * file://, hdfs:// and s3a:// — executors rebuild the default
  * Configuration locally (cluster nodes carry site configs). */
object Fs {
  def get(p: String): (FileSystem, Path) = {
    val path = new Path(p)
    (path.getFileSystem(new Configuration()), path)
  }

  /** Byte-concatenate a shard directory's part-* files into `out` in
    * name order — the single merge primitive every sharded writer
    * (SAM/BAM/FASTQ/VCF/BCF) funnels through. */
  def concatParts(fs: FileSystem, shardDir: Path, out: java.io.OutputStream): Unit = {
    val parts = fs.listStatus(shardDir).map(_.getPath)
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    val buf = new Array[Byte](1 << 20)
    parts.foreach { p =>
      val in = fs.open(p)
      var r = in.read(buf)
      while (r > 0) { out.write(buf, 0, r); r = in.read(buf) }
      in.close()
    }
  }
}

/** Sidecar splitting index: record-start virtual offsets (+ the
  * record's refId/pos for bounded-traversal pruning) every
  * `granularity` records, plus the end-of-records virtual offset.
  *
  * Analog of SplittingBAMIndexer.java / SplittingBAMIndex.java — the
  * reference's constant-time split placement — extended with position
  * keys so a coordinate-sorted BAM can prune whole chunks against
  * query intervals (the linear-index role of LinearBAMIndex.java).
  */
object SplittingIndex {
  final case class Entry(vo: Long, refId: Int, pos: Int)

  /** `maxSpan` = file-wide maximum reference span of any mapped record
    * (end - pos + 1), recorded at write time; -1 = unknown (v1 index).
    * It is the exact pad needed for start-key chunk pruning — spliced
    * RNA-seq reads (CIGAR N over megabase introns) and ultralong reads
    * make any fixed guess unsafe. */
  final case class Index(granularity: Int, entries: Array[Entry],
                         endVo: Long, maxSpan: Int)
  private val Magic = 0x47534958 // "GSIX"

  def write(fs: FileSystem, path: Path, granularity: Int,
            entries: Seq[Entry], endVo: Long, maxSpan: Int = -1): Unit = {
    val out = new DataOutputStream(new BufferedOutputStream(fs.create(path, true)))
    out.writeInt(Magic); out.writeInt(2); out.writeInt(granularity)
    out.writeInt(maxSpan)
    out.writeInt(entries.length)
    entries.foreach { e => out.writeLong(e.vo); out.writeInt(e.refId); out.writeInt(e.pos) }
    out.writeLong(endVo)
    out.close()
  }

  def read(fs: FileSystem, path: Path): Option[Index] = {
    if (!fs.exists(path)) return None
    val in = new DataInputStream(new BufferedInputStream(fs.open(path)))
    try {
      if (in.readInt() != Magic) return None
      val version = in.readInt()
      val gran = in.readInt()
      val maxSpan = if (version >= 2) in.readInt() else -1
      val n = in.readInt()
      val es = Array.fill(n)(Entry(in.readLong(), in.readInt(), in.readInt()))
      Some(Index(gran, es, in.readLong(), maxSpan))
    } finally in.close()
  }

  def indexPath(bam: Path): Path = new Path(bam.getParent, bam.getName + ".sidx")
}

/** Distributed BAM read/write (S3-S5).
  *
  * Read path: the DRIVER places all split boundaries up front —
  * constant-time from the sidecar index when present, otherwise by
  * block-guessing + record-guessing at each target byte offset
  * (BAMInputFormat.getSplits + BAMSplitGuesser semantics) — then each
  * task reads exactly the records whose start virtual offset falls in
  * its [startVo, endVo) range.  Boundaries are computed once centrally,
  * so neighbors can never disagree about record ownership.
  *
  * Write path: each partition writes a header-less BGZF shard +
  * returns its local splitting-index entries; the driver concatenates
  * header + shards + EOF terminator (BGZF concatenation is valid) and
  * shifts the index entries — the reference's SAMFileMerger.java:32
  * shape without a second pass over the data.
  */
object BamIO {

  // ---------------------------------------------------------------- read

  def readHeader(file: String): SamHeader = {
    val (fs, path) = Fs.get(file)
    val in = new Bgzf.BgzfInputStream(new BufferedInputStream(fs.open(path)))
    try BamCodec.readHeader(in) finally in.close()
  }

  /** Records overlapping any interval (contig, start, end) 1-based
    * inclusive; empty = full scan.  `includeUnmapped` additionally
    * returns unplaced-unmapped records during bounded traversal (the
    * reference's setTraversalParameters second argument,
    * ref: BAMInputFormat.java:150).  `splitSize` in compressed bytes. */
  def read(spark: SparkSession, file: String,
           intervals: Seq[(String, Int, Int)] = Nil,
           splitSize: Long = 64L * 1024 * 1024,
           includeUnmapped: Boolean = false,
           columns: Seq[String] = Nil): Dataset[SamRecord] = {
    val (header, ranges) = planSplits(file, intervals, splitSize, includeUnmapped)
    val refs = header.refs
    val iv = intervals.toArray
    import spark.implicits._
    val withUnmapped = includeUnmapped
    val fields = BamCodec.maskFor(columns)
    spark.sparkContext.parallelize(ranges, math.max(1, ranges.length))
      .flatMap { case (startVo, endVo) =>
        readRange(file, startVo, endVo, refs, iv, withUnmapped, fields)
      }.toDS()
  }

  /** Driver-side split planning shared by the Dataset reader and the
    * DataSource V2 scan: header + the virtual-offset ranges to read,
    * from the sidecar index, a foreign .bai/.csi, or split guessing —
    * pruned against `intervals` when the index allows (bounded
    * traversal, ref: BAMInputFormat.java:150-190). */
  private[sources] def planSplits(file: String,
           intervals: Seq[(String, Int, Int)] = Nil,
           splitSize: Long = 64L * 1024 * 1024,
           includeUnmapped: Boolean = false): (SamHeader, Seq[(Long, Long)]) = {
    val (fs, path) = Fs.get(file)
    val fileLen = fs.getFileStatus(path).getLen
    val in = new Bgzf.BgzfInputStream(new BufferedInputStream(fs.open(path)))
    val header = BamCodec.readHeader(in)
    val headerEndVo = in.virtualPos
    in.close()

    val ranges: Seq[(Long, Long)] =
      SplittingIndex.read(fs, SplittingIndex.indexPath(path)) match {
        case Some(idx) =>
          splitsFromIndex(header, idx, headerEndVo, intervals, splitSize, includeUnmapped)
        case None =>
          // foreign BAM: a spec .bai or .csi + intervals gives exact
          // bounded traversal (chunk ranges from the binning index,
          // linear/loffset lower bound); otherwise split guessing
          val refIdx = header.refs.map(_.name).zipWithIndex.toMap
          val baiChunks: Option[(Seq[Bai.Chunk], Long)] =
            if (intervals.isEmpty) None
            else Bai.read(fs, Bai.indexPath(path)).map { idx =>
              // pseudo-bin 37450 carries counts, not VOs — exclude it
              // from the mapped-end fold as well as chunk resolution
              (intervals.flatMap { case (c, s0, e0) =>
                refIdx.get(c).map(ri => Bai.chunksFor(idx, ri, s0, e0)).getOrElse(Nil)
              }, idx.refs.iterator
                .flatMap(_.bins.iterator.collect {
                  case (bin, cs) if bin != Bai.PseudoBin => cs
                }.flatten)
                .map(_.end).foldLeft(headerEndVo)(math.max))
            }.orElse(Csi.read(fs, Csi.indexPath(path)).map { idx =>
              // as with BAI's 37450, exclude the CSI metadata
              // pseudo-bin (maxBin+1 at this depth): an htslib-written
              // .csi stores file-span VOs there, which would drag
              // mappedEndVo to EOF and zero out the unmapped tail
              val pseudo = Csi.pseudoBin(idx.depth)
              (intervals.flatMap { case (c, s0, e0) =>
                refIdx.get(c).map(ri => Csi.chunksFor(idx, ri, s0, e0)).getOrElse(Nil)
              }, idx.refs.iterator
                .flatMap(_.bins.iterator.collect {
                  case (bin, e) if bin != pseudo => e.chunks
                }.flatten)
                .map(_.end).foldLeft(headerEndVo)(math.max))
            })
          baiChunks match {
            case Some((chunks, mappedEndVo)) =>
              // unplaced-unmapped records sort after every mapped
              // chunk in a coordinate-sorted BAM; the binning index
              // has no entries for them, so bounded traversal with
              // includeUnmapped appends the tail range
              val tail =
                if (includeUnmapped) Seq((mappedEndVo, Bgzf.virtualOffset(fileLen, 0)))
                else Nil
              Bai.merge(chunks).map(c => (c.beg, c.end)) ++ tail
            case None =>
              val bounds = splitsByGuessing(fs, path, fileLen, headerEndVo, splitSize,
                data => BamCodec.guessRecordStart(data, header.refs.length))
              bounds.sliding(2).collect { case Array(a, b) if a < b => (a, b) }.toSeq
          }
      }
    (header, ranges)
  }

  /** Chunk boundaries from the sidecar index, pruned against intervals
    * when the BAM is coordinate-sorted (bounded traversal,
    * ref: BAMInputFormat.java:150-190).  Pruning requires a known
    * file-wide max read span (v2 index) to pad chunk starts — with an
    * unknown bound a spliced/ultralong read could span from a pruned
    * chunk into an interval, so pruning is disabled entirely. */
  private def splitsFromIndex(header: SamHeader, index: SplittingIndex.Index,
                              headerEndVo: Long,
                              intervals: Seq[(String, Int, Int)],
                              splitSize: Long,
                              includeUnmapped: Boolean = false): Seq[(Long, Long)] = {
    val entries = index.entries
    val endVo = index.endVo
    val all = SplittingIndex.Entry(headerEndVo,
      entries.headOption.map(_.refId).getOrElse(-1),
      entries.headOption.map(_.pos).getOrElse(-1)) +: entries.toSeq
    val chunks: Seq[(SplittingIndex.Entry, Long)] =
      all.zip(all.drop(1).map(_.vo) :+ endVo).filter { case (e, end) => e.vo < end }
    val pruned =
      if (intervals.isEmpty || header.sortOrder != "coordinate" || index.maxSpan < 0) chunks
      else {
        val refIdx = header.refs.map(_.name).zipWithIndex.toMap
        val ivs = intervals.flatMap { case (c, s, e) => refIdx.get(c).map(ri => (ri, s, e)) }
        chunks.zipWithIndex.filter { case ((e, _), i) =>
          val nextKey = if (i + 1 < chunks.length) Some((chunks(i + 1)._1.refId, chunks(i + 1)._1.pos)) else None
          chunkOverlaps(e.refId, e.pos, nextKey, ivs, index.maxSpan) ||
            // the unmapped tail sorts last: a chunk reaches into it iff
            // its next chunk starts unmapped (or it is the last chunk)
            (includeUnmapped && nextKey.forall(_._1 < 0))
        }.map(_._1)
      }
    // coalesce contiguous chunks up to splitSize compressed bytes
    val out = new ArrayBuffer[(Long, Long)]()
    var curStart = -1L
    var curEnd = -1L
    pruned.foreach { case (e, end) =>
      val contiguous = curStart >= 0 && e.vo == curEnd
      val full = curStart >= 0 &&
        Bgzf.voCompressed(curEnd) - Bgzf.voCompressed(curStart) >= splitSize
      if (curStart < 0) { curStart = e.vo; curEnd = end }
      else if (contiguous && !full) curEnd = end
      else { out += ((curStart, curEnd)); curStart = e.vo; curEnd = end }
    }
    if (curStart >= 0) out += ((curStart, curEnd))
    out.toSeq
  }

  /** A chunk [first record key, next chunk's first key) can contain a
    * record overlapping the intervals?  Index keys are 0-based
    * (stored as rec.pos - 1); intervals are 1-based inclusive.
    * `maxSpan` is the file-wide bound on record reference span from
    * the v2 sidecar index: a record starting up to maxSpan-1 bases
    * before an interval can still reach into it, so the chunk's last
    * possible start (next chunk's first key) is padded by it.
    * Unknown next keys keep the chunk. */
  private def chunkOverlaps(refId: Int, pos0: Int, nextKey: Option[(Int, Int)],
                            ivs: Seq[(Int, Int, Int)], maxSpan: Int): Boolean = {
    if (refId < 0) return true // unmapped tail — kept (optional in ref)
    val pos1 = pos0 + 1 // 1-based start of chunk's first record
    ivs.exists { case (ri, s, e) =>
      val startsBeforeEnd = refId < ri || (refId == ri && pos1 <= e)
      val endsAfterStart = nextKey match {
        case Some((nr, np0)) =>
          nr > ri || nr < 0 || (nr == ri && np0.toLong + maxSpan >= s)
        case None => true
      }
      startsBeforeEnd && endsAfterStart
    }
  }

  /** No index: fixed byte-range split targets; at each target the
    * driver finds the next BGZF block, inflates a window, and asks
    * `guessRecord` for the first record-start offset within it
    * (BAMSplitGuesser.java re-expression; the BCF reader reuses this
    * scaffold with its own record guesser, like BCFSplitGuesser). */
  private[sources] def splitsByGuessing(fs: FileSystem, path: Path, fileLen: Long,
                               headerEndVo: Long, splitSize: Long,
                               guessRecord: Array[Byte] => Int): Array[Long] = {
    val targets = (Bgzf.voCompressed(headerEndVo) + splitSize) until fileLen by splitSize
    val bounds = new ArrayBuffer[Long]()
    bounds += headerEndVo
    val raw = fs.open(path)
    try {
      targets.foreach { t =>
        val window = new Array[Byte](512 * 1024)
        raw.seek(t)
        var n = 0
        var r = 0
        while (n < window.length && r >= 0) {
          r = raw.read(window, n, window.length - n)
          if (r > 0) n += r
        }
        val blockOff = Bgzf.findBlockStart(java.util.Arrays.copyOf(window, n), 0)
        if (blockOff >= 0) {
          // inflate a couple blocks and guess the record boundary
          val bis = new Bgzf.BgzfInputStream(
            new java.io.ByteArrayInputStream(window, blockOff, n - blockOff), t + blockOff)
          val buf = new ByteArrayOutputStream()
          try {
            val tmp = new Array[Byte](8192)
            var got = 0
            while (buf.size < 2 * Bgzf.MaxBlockSize && got >= 0) {
              got = bis.read(tmp)
              if (got > 0) buf.write(tmp, 0, got)
            }
          } catch { case _: EOFException => () } // window may cut a block
          val rec = guessRecord(buf.toByteArray)
          if (rec >= 0) {
            // rec is an uncompressed offset from blockOff's block start;
            // walk blocks to express it as a virtual offset
            var co = t + blockOff
            var remaining = rec
            var done = false
            while (!done) {
              val bsize = blockSizeAt(window, (co - t).toInt, n)
              val inflated = inflatedSizeOfBlock(window, (co - t).toInt, n)
              if (bsize > 0 && remaining >= inflated && inflated > 0) {
                remaining -= inflated; co += bsize
              } else done = true
            }
            bounds += Bgzf.virtualOffset(co, remaining)
          }
        }
      }
    } finally raw.close()
    bounds += Bgzf.virtualOffset(fileLen, 0)
    bounds.distinct.sorted.toArray
  }

  private def blockSizeAt(window: Array[Byte], off: Int, len: Int): Int =
    if (off < 0 || off > len - 18) -1 else Bgzf.parseBsize(window, off)

  private def inflatedSizeOfBlock(window: Array[Byte], off: Int, len: Int): Int = {
    val bsize = blockSizeAt(window, off, len)
    if (bsize < 0 || off + bsize > len) return -1
    // ISIZE = last 4 bytes of the member
    val o = off + bsize - 4
    (window(o) & 0xff) | ((window(o + 1) & 0xff) << 8) |
      ((window(o + 2) & 0xff) << 16) | ((window(o + 3) & 0xff) << 24)
  }

  /** Task-side: iterate records with start VO in [startVo, endVo). */
  private[sources] def readRange(file: String, startVo: Long, endVo: Long,
                        refs: Array[graft.model.SamRef],
                        intervals: Array[(String, Int, Int)],
                        includeUnmapped: Boolean = false,
                        fields: Int = BamCodec.AllFields): Iterator[SamRecord] =
    openRange(file, startVo, endVo, refs, intervals, includeUnmapped, fields)._1

  /** [[readRange]] plus an explicit closer for consumers that may
    * abandon the iterator early (DataSource V2 readers under LIMIT). */
  private[sources] def openRange(file: String, startVo: Long, endVo: Long,
                        refs: Array[graft.model.SamRef],
                        intervals: Array[(String, Int, Int)],
                        includeUnmapped: Boolean = false,
                        fields: Int = BamCodec.AllFields)
      : (Iterator[SamRecord], () => Unit) = {
    val (fs, path) = Fs.get(file)
    val raw = fs.open(path)
    raw.seek(Bgzf.voCompressed(startVo))
    val in = new Bgzf.BgzfInputStream(new BufferedInputStream(raw), Bgzf.voCompressed(startVo))
    in.seekInBlock(Bgzf.voUncompressed(startVo))
    val it = new Iterator[SamRecord] {
      private var nextRec: SamRecord = _
      private var finished = false
      private def fetch(): Unit = {
        if (finished) return
        while (nextRec == null && !finished) {
          if (in.virtualPos >= endVo) { finished = true; in.close(); return }
          val sz = readIntLe(in)
          if (sz < 0) { finished = true; in.close(); return }
          val data = new Array[Byte](sz)
          var o = 0
          while (o < sz) {
            val r = in.read(data, o, sz - o)
            if (r < 0) throw new EOFException("truncated BAM record")
            o += r
          }
          // interval overlap needs `end`, i.e. the CIGAR ref length —
          // force it into the mask whenever records are being filtered
          val rec = BamCodec.decode(data, refs,
            if (intervals.isEmpty) fields else fields | BamCodec.FCigar)
          if (intervals.isEmpty || overlaps(rec, intervals) ||
            (includeUnmapped && rec.isUnmapped && (rec.rname == "*" || rec.pos == 0)))
            nextRec = rec
        }
      }
      override def hasNext: Boolean = { if (nextRec == null) fetch(); nextRec != null }
      override def next(): SamRecord = {
        if (!hasNext) throw new NoSuchElementException
        val r = nextRec; nextRec = null; r
      }
    }
    (it, () => try in.close() catch { case _: java.io.IOException => () })
  }

  private def overlaps(r: SamRecord, ivs: Array[(String, Int, Int)]): Boolean =
    ivs.exists { case (c, s, e) => r.rname == c && r.pos <= e && r.end >= s }

  private def readIntLe(in: java.io.InputStream): Int = {
    val a = in.read()
    if (a < 0) return -1
    val b = in.read(); val c = in.read(); val d = in.read()
    if ((b | c | d) < 0) throw new EOFException("truncated record length")
    a | (b << 8) | (c << 16) | (d << 24)
  }

  /** Parse "chr1:100-200" interval strings (1-based inclusive;
    * "chr1" alone = whole contig; ref: util/IntervalUtil.java +
    * the hadoopbam.bam.intervals property format). */
  def parseIntervals(spec: String, header: SamHeader): Seq[(String, Int, Int)] = {
    val refLen = header.refs.map(r => r.name -> r.length).toMap
    parseIntervalSpec(spec, c => refLen.getOrElse(c, Int.MaxValue))
  }

  /** Header-free variant (VCF has no contig-length table to consult;
    * bare contig names span to `maxEnd`). */
  def parseIntervalSpec(spec: String,
                        maxEnd: String => Int = _ => Int.MaxValue): Seq[(String, Int, Int)] =
    spec.split(",").toSeq.filter(_.nonEmpty).map { iv =>
      iv.split(":") match {
        case Array(contig) =>
          (contig, 1, maxEnd(contig))
        case Array(contig, range) =>
          val Array(s, e) = range.split("-").map(_.replace(",", "").trim)
          (contig, s.toInt, e.toInt)
        case _ => throw new IllegalArgumentException(s"bad interval: $iv")
      }
    }

  /** Coordinate-sort (range partition on (refIdx, pos) — balanced
    * writers, no single-task sort) and write with an SO:coordinate
    * header (ref: util/GetSortedBAMHeader.java + sorted write path).
    *
    * The sort key is ONE packed long, `refIdx·2^32 + (pos + 2^31)` —
    * unlike the ranked packed PREFIX this is an injective,
    * order-EXACT image of (refIdx ASC, pos ASC): both components are
    * 32-bit, so nothing coarsens and no fallback comparison ever
    * runs.  The two-column spelling instead gives SortExec only the
    * leading refIdx as its sort prefix, which TIES on ~every
    * comparison of a single-contig shard (the SKEWPROBE r12 class:
    * each tie falls back to the row comparator) — the packed single
    * long keeps the whole sort in the radix/prefix path and the
    * range exchange samples one word per row.  Kill switch shared
    * with the ranked packing: `spark.graft.ranked.packedSortPrefix`. */
  def writeSorted(ds: Dataset[SamRecord], header: SamHeader, file: String,
                  granularity: Int = 1000): Unit = {
    import org.apache.spark.sql.functions._
    val spark = ds.sparkSession
    import spark.implicits._
    val refOrder = header.refs.map(_.name).zipWithIndex.toMap
    val orderMap = typedLit(refOrder)
    val refIdx = coalesce(orderMap(col("rname")), lit(Int.MaxValue))
    val packed = spark.conf
      .getOption("spark.graft.ranked.packedSortPrefix").forall(_.equalsIgnoreCase("true"))
    val sorted = (if (packed) {
      ds.toDF()
        .withColumn("_pk",
          refIdx.cast("long") * lit(4294967296L) +
            (col("pos").cast("long") + lit(2147483648L)))
        .repartitionByRange(col("_pk"))
        .sortWithinPartitions(col("_pk"))
        .drop("_pk")
    } else {
      ds.toDF()
        .withColumn("_refIdx", refIdx)
        .repartitionByRange(col("_refIdx"), col("pos"))
        .sortWithinPartitions(col("_refIdx"), col("pos"))
        .drop("_refIdx")
    }).as[SamRecord]
    write(sorted, header.asCoordinateSorted, file, granularity)
  }

  // --------------------------------------------------------------- write

  /** Write `ds` as a single BAM file + sidecar splitting index.
    * Partition tasks write header-less shards in parallel; the driver
    * merges (stream concat) and emits the index. */
  def write(ds: Dataset[SamRecord], header: SamHeader, file: String,
            granularity: Int = 1000): Unit = {
    val spark = ds.sparkSession
    val (fs, path) = Fs.get(file)
    val tmpDir = new Path(path.getParent, "." + path.getName + ".shards")
    fs.mkdirs(tmpDir)
    val refIdx = header.refs.map(_.name).zipWithIndex.toMap
    val tmpDirStr = tmpDir.toString
    // in-stream pipelined deflate (opt-in): pays off when this stage
    // runs FEWER write tasks than the executor has idle cores — the
    // classic coalesce(1) final export; default 0 = synchronous, since
    // a full-width write stage already saturates deflate across tasks
    val deflateWorkers = spark.conf.getOption("spark.graft.bgzf.write.workers")
      .map(_.toInt).getOrElse(0)

    // each task: shard BGZF + local index entries (vo relative to shard)
    val shardInfo = ds.rdd.mapPartitionsWithIndex { (pid, it) =>
      Iterator.single(writeShard(it, new Path(tmpDirStr, f"part-$pid%05d.bam"),
        refIdx, granularity, pid, deflateWorkers))
    }.collect().sortBy(_.pid)
    mergeShardInfo(file, header, tmpDirStr, shardInfo, granularity)
    val _ = spark
  }

  /** One task's shard + its local (shard-relative) index entries —
    * shared by the typed writer and the DataSource V2 sink. */
  final case class ShardInfo(pid: Int, shardLen: Long, count: Long,
                             entries: Array[(Long, Int, Int)], maxSpan: Int)
    extends Serializable

  private[sources] def writeShard(it: Iterator[SamRecord], shardPath: Path,
                                  refIdx: Map[String, Int], granularity: Int,
                                  pid: Int, deflateWorkers: Int = 0): ShardInfo = {
    val w = new ShardWriter(shardPath, refIdx, granularity, pid, deflateWorkers)
    try { it.foreach(w.write); w.finish() }
    catch { case e: Throwable => w.abort(); throw e }
  }

  /** Incremental shard writer (one record at a time — nothing buffers
    * the partition in memory), shared by [[writeShard]] and the
    * DataSource V2 sink's per-row writes. */
  private[sources] final class ShardWriter(shardPath: Path, refIdx: Map[String, Int],
                                           granularity: Int, pid: Int,
                                           deflateWorkers: Int = 0) {
    private val out = {
      val (tfs, _) = Fs.get(shardPath.toString)
      new Bgzf.BgzfOutputStream(tfs.create(shardPath, true),
        workers = deflateWorkers)
    }
    // (blockIndex, refId, pos0): resolved to virtual offsets at finish
    // so index markers never drain the (possibly pipelined) deflate
    private val pending = new ArrayBuffer[(Int, Int, Int)]()
    private var n = 0L
    private var count = 0L
    private var maxSpan = 0

    def write(rec: SamRecord): Unit = {
      if (n % granularity == 0) {
        // align indexed records to block starts, offset resolved later
        pending += ((out.markBoundary(),
          refIdx.get(rec.rname).getOrElse(-1), rec.pos - 1))
      }
      if (rec.pos > 0) {
        val span = rec.end - rec.pos + 1
        if (span > maxSpan) maxSpan = span
      }
      val data = BamCodec.encode(rec, refIdx)
      val len = data.length
      out.write(Array[Byte](len.toByte, (len >> 8).toByte, (len >> 16).toByte, (len >> 24).toByte))
      out.write(data)
      n += 1; count += 1
    }

    def finish(): ShardInfo = {
      out.blockBoundary()
      val shardLen = out.compressedOffset
      val entries = pending.map { case (bi, refId, pos0) =>
        (Bgzf.virtualOffset(out.offsetOfBlock(bi), 0), refId, pos0)
      }
      out.closeWithoutTerminator()
      ShardInfo(pid, shardLen, count, entries.toArray, maxSpan)
    }

    def abort(): Unit =
      try out.closeWithoutTerminator()
      catch { case _: java.io.IOException => () }
  }

  /** Driver-side merge: header block + shards in pid order + EOF
    * terminator, shifting each shard's index entries by the bytes
    * before it; writes the v2 sidecar index. */
  private[sources] def mergeShardInfo(file: String, header: SamHeader,
                                      tmpDirStr: String, shardInfo: Seq[ShardInfo],
                                      granularity: Int): Unit = {
    val (fs, path) = Fs.get(file)
    val tmpDir = new Path(tmpDirStr)
    val out = new BufferedOutputStream(fs.create(path, true))
    val headerBuf = new ByteArrayOutputStream()
    BamCodec.writeHeader(headerBuf, header)
    val headerBytes = headerBuf.toByteArray
    var coffset = 0L
    coffset += Bgzf.writeBlocksTo(out, headerBytes, 0, headerBytes.length)
    val allEntries = new ArrayBuffer[SplittingIndex.Entry]()
    shardInfo.foreach { si =>
      si.entries.foreach { case (vo, refId, pos) =>
        allEntries += SplittingIndex.Entry(Bgzf.virtualOffset(Bgzf.voCompressed(vo) + coffset,
          Bgzf.voUncompressed(vo)), refId, pos)
      }
      val shardPath = new Path(tmpDirStr, f"part-${si.pid}%05d.bam")
      val sin = fs.open(shardPath)
      val buf = new Array[Byte](1 << 20)
      var r = sin.read(buf)
      while (r > 0) { out.write(buf, 0, r); r = sin.read(buf) }
      sin.close()
      coffset += si.shardLen
    }
    val endVo = Bgzf.virtualOffset(coffset, 0)
    out.write(Bgzf.EofMarker)
    out.close()
    fs.delete(tmpDir, true)
    val fileMaxSpan = if (shardInfo.isEmpty) 0 else shardInfo.map(_.maxSpan).max
    SplittingIndex.write(fs, SplittingIndex.indexPath(path), granularity,
      allEntries.toSeq, endVo, fileMaxSpan)
  }
}
