package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Analytics, Audio, AudioDedup, Corpus, CorpusStats, Events, Genomic, ImageDedup, Multimodal, Packing, Pipeline, Quality, Relational, VideoDedup}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 has a `queries` entry and
  * (where DuckDB can express it) an `oracleSql` entry; the driver's
  * correctness gate runs both at sf0.01 and hash-compares.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q5Join(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Genomic.queries ++ Pipeline.queries ++
      Multimodal.queries ++ Audio.queries ++ AudioDedup.queries ++ ImageDedup.queries ++
      VideoDedup.queries ++
      Analytics.queries ++ Corpus.queries ++
      CorpusStats.queries ++ Events.queries ++ Quality.queries ++ Packing.queries

  /** Declared quadratic reference baselines (SURVEY P5/P5b): the
    * exact-semantics embedding ops kept as correctness yardsticks for
    * the LSH/IVF scale paths.  They are benched and oracle-gated like
    * every key, but excluded from the bench HEADLINE total — at sf1
    * q_dedup_embedding alone is ~28% of the all-keys total by design,
    * which made cross-round total comparisons hinge on one declared
    * quadratic (VERDICT r13 item 6). */
  val baselineQueries: Set[String] = Set("q_ann_bruteforce", "q_dedup_embedding")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Genomic.oracle ++ Pipeline.oracle ++
      Multimodal.oracle ++ Audio.oracle ++ AudioDedup.oracle ++ ImageDedup.oracle ++
      VideoDedup.oracle ++
      Analytics.oracle ++ Corpus.oracle ++
      CorpusStats.oracle ++ Events.oracle ++ Quality.oracle ++ Packing.oracle
}
