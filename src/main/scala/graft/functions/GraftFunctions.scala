package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions

/** Registry of graft's native Catalyst expressions (filled in as
  * expressions land; each is exposed both as a Column helper and as a
  * SQL function name).
  */
object GraftFunctions {
  def inject(e: SparkSessionExtensions): Unit = {
    // populated by M7 (custom expressions); injection kept separate so
    // GraftExtensions stays stable.
    val _ = e
  }

  def registerAll(spark: SparkSession): Unit = {
    val _ = spark
  }
}
