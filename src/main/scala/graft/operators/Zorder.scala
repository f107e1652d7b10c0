package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout writer — the user-facing form of the
  * capability q_zorder_layout models and graft.ZorderProbe measures
  * (12.4× less I/O on 2-D probes at sf1): rewrite a table so parquet
  * row-group min/max statistics become selective on EVERY clustering
  * dimension at once, turning multi-dim range predicates into
  * row-group/file skipping with no index structure to maintain
  * (the Delta/Iceberg Z-ORDER write, re-expressed Spark-first).
  *
  * Scale shape: one range exchange on the Morton code (parallel in
  * cores — the code is a plain BIGINT column), an in-partition sort,
  * and a plain parquet write; nothing collects, nothing is keyed by
  * a low-cardinality column.  `files` is the layout granularity knob
  * — at 100 TB pick it so files land near the FS block size, and
  * `parquet.block.size` sizes the skipping unit within files.
  */
object Zorder {

  /** The clustered frame both writers share: range-partition on the
    * Morton code of `dims`, sort within partitions, drop the internal
    * column so the written schema is exactly `df`'s. */
  private def zClustered(df: DataFrame, dims: Seq[String], files: Int): DataFrame = {
    require(dims.length >= 2 && dims.length <= 8,
      s"z-order needs 2-8 dims, got ${dims.length}")
    require(files >= 1, s"files must be >= 1, got $files")
    val zCol = "__graft_z"
    require(!df.columns.contains(zCol), s"$zCol collides with an input column")
    val castDims = dims.map(d => s"CAST($d AS BIGINT)").mkString(", ")
    df.withColumn(zCol, expr(s"graft_zorder($castDims)"))
      .repartitionByRange(files, col(zCol))
      .sortWithinPartitions(zCol)
      .drop(zCol)
  }

  /** Write `df` to `path` as `files` parquet files clustered by the
    * d-dim Morton interleave of `dims` (2-8 non-negative integral
    * columns; values are CAST to BIGINT, `graft_zorder` fails loudly
    * on negatives).  The interleave column is internal — the written
    * schema is exactly `df`'s. */
  def writeZOrdered(df: DataFrame, dims: Seq[String], path: String,
                    files: Int, blockKiB: Int = 1024): Unit =
    zClustered(df, dims, files)
      .write.option("parquet.block.size", (blockKiB * 1024).toString)
      .mode("overwrite").parquet(path)

  /** Append-mode z-write — the per-micro-batch form `zOrderedSink`
    * drives.  Each call adds `files` files, each internally
    * z-clustered over ITS rows only; z-locality across appends
    * degrades as batches accumulate (every batch's z-range overlaps
    * every other's), which is what [[compact]] repairs. */
  def appendZOrdered(df: DataFrame, dims: Seq[String], path: String,
                     files: Int, blockKiB: Int = 1024): Unit =
    zClustered(df, dims, files)
      .write.option("parquet.block.size", (blockKiB * 1024).toString)
      .mode("append").parquet(path)

  /** Continuous ingest with layout maintenance: a foreachBatch sink
    * that z-clusters every micro-batch before appending it — each
    * batch's files carry tight min/max boxes immediately, so probes
    * prune WITHIN batches from the first commit, and a periodic
    * [[compact]] restores the global layout.  The OPTIMIZE ZORDER
    * split of the table formats, re-expressed as plain Spark
    * streaming + parquet.
    *
    * Delivery: foreachBatch is at-least-once on retries (a replayed
    * batch re-appends; the exactly-once answer is a table-format
    * commit protocol, out of scope here) — downstream exact dedup
    * (P1) or the doc_id-keyed streaming dedup (I4) absorbs replays.
    * Start with `.start()` / await as usual. */
  def zOrderedSink(stream: DataFrame, dims: Seq[String], path: String,
                   filesPerBatch: Int, blockKiB: Int = 1024):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        appendZOrdered(batch, dims, path, filesPerBatch, blockKiB)
      }

  /** Rewrite the accumulated table at `path` into `targetFiles`
    * globally z-clustered files: read, re-cluster, write beside,
    * swap.  At 100 TB this runs per z-range slice (compact the slices
    * whose file count drifted, not the table) — the whole-table form
    * here is the local/testing shape; the swap is two renames, NOT
    * atomic (a table format's snapshot commit is the production
    * answer, same caveat as the sink's delivery) — but at no point is
    * the ONLY copy deleted: the old table moves aside first and is
    * removed only after the new one is in place, so a failure between
    * renames leaves the data at `path + "__compact_old"`. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              dims: Seq[String], targetFiles: Int, blockKiB: Int = 1024): Unit = {
    val base = path.stripSuffix("/")
    val tmp = base + "__compact_tmp"
    writeZOrdered(spark.read.parquet(path), dims, tmp, targetFiles, blockKiB)
    val conf = spark.sparkContext.hadoopConfiguration
    val dst = new org.apache.hadoop.fs.Path(path)
    val src = new org.apache.hadoop.fs.Path(tmp)
    val old = new org.apache.hadoop.fs.Path(base + "__compact_old")
    val fs = dst.getFileSystem(conf)
    fs.delete(old, true) // leftover from an interrupted earlier run
    require(fs.rename(dst, old), s"compact: move-aside $path -> $old failed")
    require(fs.rename(src, dst),
      s"compact: rename $tmp -> $path failed; original preserved at $old")
    fs.delete(old, true)
  }
}
