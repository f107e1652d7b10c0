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

  /** Write `df` to `path` as `files` parquet files clustered by the
    * d-dim Morton interleave of `dims` (2-8 non-negative integral
    * columns; values are CAST to BIGINT, `graft_zorder` fails loudly
    * on negatives).  The interleave column is internal — the written
    * schema is exactly `df`'s. */
  def writeZOrdered(df: DataFrame, dims: Seq[String], path: String,
                    files: Int, blockKiB: Int = 1024): Unit = {
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
      .write.option("parquet.block.size", (blockKiB * 1024).toString)
      .mode("overwrite").parquet(path)
  }
}
