package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order THROUGH the engine (VERDICT r11 item 2): q_zorder_layout
  * assigns file slices; this probe actually WRITES both layouts as
  * parquet and measures what a real Spark scan does with them.
  *
  * Two physical layouts of the same derived table (doc_id, n_chars,
  * n_tok, z, text — text kept so row groups have realistic weight):
  *   - `byid`: range-partitioned + sorted by doc_id (the naive
  *     ingestion order) — row-group min/max on (n_chars, n_tok) are
  *     effectively random;
  *   - `byz`:  range-partitioned + sorted by the Morton code — every
  *     row group covers a small z-interval, so its min/max box is
  *     tight on BOTH dims at once.
  * Each layout is written as `files` parquet files with a small
  * parquet.block.size, so files contain several row groups and the
  * parquet reader's stats-based row-group skipping is the unit under
  * test.
  *
  * Per probe rectangle (n_chars × n_tok range, pushed filters):
  *   - rows: scan result count — must be IDENTICAL across layouts;
  *   - rg_cand/files_cand: row groups / files whose footer min/max
  *     box intersects the rectangle (audited directly from the
  *     parquet footers — the exact statistics the reader prunes on);
  *   - bytes_read: Hadoop FileSystem bytes actually read by the scan
  *     (deterministic in local mode — skipped row groups are never
  *     fetched, so this is the engine-level pruning witness);
  *   - sec: wall time of the filtered count.
  *
  * Usage: SPARK_GRAFT_CPUS=32 [SPARK_GRAFT_BENCH_OUT=...] \
  *          runMain graft.ZorderProbe <sfDir> [files] [blockKiB]
  * Prints one JSON line per (probe, layout) plus a summary line.
  */
object ZorderProbe {

  /** (rowGroups, candidates, fileCandidates, filesTotal) of `dir`'s
    * parquet files against a [cLo..cHi]×[tLo..tHi] rectangle on
    * (n_chars, n_tok), read straight from the footers' statistics. */
  def footerAudit(dir: String, cLo: Long, cHi: Long, tLo: Long, tHi: Long):
      (Int, Int, Int, Int) =
    footerAuditDims(dir, Seq(("n_chars", cLo, cHi), ("n_tok", tLo, tHi)))

  /** General d-dim footer audit: a row group is a candidate when its
    * min/max box intersects EVERY (col, lo, hi) range — exactly the
    * statistics test the parquet reader prunes on. */
  def footerAuditDims(dir: String, ranges: Seq[(String, Long, Long)]):
      (Int, Int, Int, Int) = {
    import scala.jdk.CollectionConverters._
    val conf = new org.apache.hadoop.conf.Configuration()
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.length() > 0)
      .sortBy(_.getName)
    var rgTotal = 0; var rgCand = 0; var fCand = 0
    files.foreach { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val blocks = reader.getFooter.getBlocks.asScala
        var fileHit = false
        blocks.foreach { b =>
          rgTotal += 1
          def range(col: String): Option[(Long, Long)] =
            b.getColumns.asScala
              .find(_.getPath.toDotString == col)
              .flatMap { c =>
                val st = c.getStatistics
                if (st == null || !st.hasNonNullValue) None
                else Some((st.genericGetMin, st.genericGetMax) match {
                  case (mn: java.lang.Integer, mx: java.lang.Integer) =>
                    (mn.longValue, mx.longValue)
                  case (mn: java.lang.Long, mx: java.lang.Long) =>
                    (mn.longValue, mx.longValue)
                  case other =>
                    throw new IllegalStateException(s"unexpected stats $other")
                })
              }
          // no stats on some dim → cannot prune, stays a candidate
          val hit = ranges.forall { case (colName, lo, hi) =>
            range(colName) match {
              case Some((mn, mx)) => mx >= lo && mn <= hi
              case None => true
            }
          }
          if (hit) { rgCand += 1; fileHit = true }
        }
        if (fileHit) fCand += 1
      } finally reader.close()
    }
    (rgTotal, rgCand, fCand, files.length)
  }

  private def fsBytesRead(): Long =
    org.apache.hadoop.fs.FileSystem.getGlobalStorageStatistics
      .get("file") match {
      case null => 0L
      case s => Option(s.getLong("bytesRead")).map(_.longValue).getOrElse(0L)
    }

  /** The derived frame both layouts share (matches q_zorder_layout's
    * dims; text carried for realistic row-group weight). */
  private def frame(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars").cast("bigint").as("n_chars"),
        expr(graft.queries.Corpus.tokCount).as("n_tok"), col("text"))
      .withColumn("z", expr("graft_zorder64(n_chars, n_tok)"))

  /** Write `byid` and `byz` physical layouts of the derived frame
    * under `base` — `nFiles` range-partitioned sorted parquet files,
    * small block size so files carry several row groups. */
  def writeLayouts(spark: SparkSession, sfDir: String, base: String,
                   nFiles: Int, blockKiB: Int): Unit =
    Seq("byid" -> Seq(col("doc_id")),
        "byz" -> Seq(col("z"), col("doc_id"))).foreach { case (name, sortCols) =>
      frame(spark, sfDir)
        .repartitionByRange(nFiles, sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
        .write.option("parquet.block.size", (blockKiB * 1024).toString)
        .option("parquet.page.size", (16 * 1024).toString)
        .mode("overwrite").parquet(s"$base/$name")
    }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ZorderProbe <sfDir> [files] [blockKiB]")
    val sfDir = args(0)
    val nFiles = if (args.length > 1) args(1).toInt else 32
    val blockKiB = if (args.length > 2) args(2).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Files.createTempDirectory("zorder_probe").toString
    writeLayouts(spark, sfDir, base, nFiles, blockKiB)

    // quartile-ish rectangles over (n_chars, n_tok) — same spirit as
    // ZorderSpec's geometry probes, now against the real engine
    val probes = Seq(
      (0L, 200L, 0L, 40L), (200L, 400L, 30L, 70L),
      (400L, 700L, 60L, 120L), (100L, 300L, 10L, 50L))

    val out = new StringBuilder
    val lines = probes.zipWithIndex.flatMap { case ((cLo, cHi, tLo, tHi), pi) =>
      val anchor = Bench.calibrate(25000000)
      val res = Seq("byid", "byz").map { name =>
        val path = s"$base/$name"
        val (rgTotal, rgCand, fCand, fTotal) =
          footerAudit(path, cLo, cHi, tLo, tHi)
        // fresh reader state per measurement (no FileScanRDD caches
        // worth worrying about, but footer caches are per-plan)
        spark.catalog.clearCache()
        val df = spark.read.parquet(path)
          .filter(col("n_chars").between(cLo, cHi) &&
            col("n_tok").between(tLo, tHi))
        val b0 = fsBytesRead()
        val t0 = System.nanoTime()
        val rows = df.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val bytes = fsBytesRead() - b0
        val line = s"""{"probe":$pi,"rect":[$cLo,$cHi,$tLo,$tHi],""" +
          s""""layout":"$name","rows":$rows,"rg_total":$rgTotal,""" +
          s""""rg_cand":$rgCand,"files_cand":$fCand,"files_total":$fTotal,""" +
          s""""bytes_read":$bytes,"sec":$sec,"anchor":$anchor}"""
        println(line)
        out.append(line).append('\n')
        (name, rows, rgCand, bytes)
      }
      val Seq((_, idRows, idRg, idBytes), (_, zRows, zRg, zBytes)) = res
      require(idRows == zRows,
        s"probe $pi: layouts disagree on rows ($idRows vs $zRows)")
      Seq((pi, idRg, zRg, idBytes, zBytes))
    }
    val sum = s"""{"summary":true,"sf_dir":"$sfDir","files":$nFiles,""" +
      s""""block_kib":$blockKiB,""" +
      s""""rg_cand_byid":${lines.map(_._2).sum},"rg_cand_byz":${lines.map(_._3).sum},""" +
      s""""bytes_byid":${lines.map(_._4).sum},"bytes_byz":${lines.map(_._5).sum}}"""
    println(sum)
    out.append(sum).append('\n')
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        out.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
