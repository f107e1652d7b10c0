package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage-wall attribution for the declared media pair queries
  * (VERDICT r19 item 5): q_image_dedup / q_audio_dedup =
  * HammingDedup.pairs over the decode-time sig frame.  Stages:
  *
  *   sigframe    — decode + fingerprint, localCheckpoint (the feed)
  *   sigpairs    — banded candidate join + hamming verify over
  *                 DISTINCT sigs (the cross-sig core)
  *   pairs_noord — dist-0 self-join ∪ cross-sig member joins (the
  *                 full pair stream, no ORDER BY)
  *   full        — the gated query (pair stream + ORDER BY)
  *
  * pairs_noord replicates HammingDedup.pairs minus the sort; a
  * count() require guards the replica against production drift.
  * Per-stage MIN over reps; one JSON line.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.HammingPairsProbe <sfDir> [reps] [audio]
  */
object HammingPairsProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val audio = args.contains("audio")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.HammingDedup
    import graft.queries.{AudioDedup, ImageDedup, Pipeline}

    val maxDist = if (audio) AudioDedup.MaxDist else ImageDedup.MaxDist
    val stages = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.ArrayBuffer[Double]]()
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      val sec = (System.nanoTime() - t0) / 1e9
      stages.getOrElseUpdate(name, scala.collection.mutable.ArrayBuffer()) += sec
      System.err.println(f"[hammingprof] stage=$name wall_ms=${sec * 1000}%.0f")
      a
    }

    var fullN = -1L
    for (rep <- 1 to reps) {
      val sigs = t("sigframe") {
        val f =
          if (audio) AudioDedup.sigFrame(spark, d).select("doc_id", "sig")
          else ImageDedup.dhashFrame(spark, d).select("doc_id", "sig")
        val c = Pipeline.stableCheckpoint(f)
        c.count(); c
      }
      t("sigpairs")(noop(HammingDedup.sigPairs(
        sigs.select("sig").distinct(), "sig", maxDist, bandBits = 16)))
      val noord = t("pairs_noord") {
        val crossSig = HammingDedup.sigPairs(
            sigs.select("sig").distinct(), "sig", maxDist, bandBits = 16)
          .join(sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), "sig_a")
          .join(sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), "sig_b")
          .select(least(col("id_a"), col("id_b")).as("doc_a"),
            greatest(col("id_a"), col("id_b")).as("doc_b"), col("dist"))
        val sameSig = sigs.as("a").join(sigs.as("b"),
            col("a.sig") === col("b.sig") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            lit(0).cast("int").as("dist"))
        val u = sameSig.unionAll(crossSig)
        noop(u); u.count()
      }
      val full = t("full")(
        if (audio) { val q = AudioDedup.qAudioDedup(spark, d); noop(q); q.count() }
        else { val q = ImageDedup.qImageDedup(spark, d); noop(q); q.count() })
      if (rep == 1) {
        require(noord == full,
          s"probe drift: unordered pair count $noord != gated query $full")
        fullN = full
      }
      spark.catalog.clearCache()
    }

    val mins = stages.map { case (k, v) => k -> v.min }
    println(mins.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", ",") +
      s""""pairs":$fullN,"sf":"$d","reps":$reps,"audio":$audio,"cpus":$cpus}""")
    spark.stop()
  }
}
