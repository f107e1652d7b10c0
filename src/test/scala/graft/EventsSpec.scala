package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.queries.{Events, Pipeline}

/** Semantics of the event-analytics queries (P44-P46) and the PCA
  * projection (P47) on synthetic inputs where the right answer is
  * obvious by construction.
  */
class EventsSpec extends SparkSpec {

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos, as the nanosAsLong read surfaces
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def writeEvents(rows: Seq[Row]): String = {
    val d = tmpDir("events_q")
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), eventsSchema)
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private def us(n: Long): Long = n * 1000L // µs → ns column value

  test("funnel counts a later click even when an earlier click precedes the view") {
    val d = writeEvents(Seq(
      // user 1: click BEFORE first view must not advance the funnel;
      // the later click and the purchase after it must.
      Row(1L, us(1), 1L, "click", 0.0, "{}"),
      Row(2L, us(2), 1L, "view", 0.0, "{}"),
      Row(3L, us(5), 1L, "click", 0.0, "{}"),
      Row(4L, us(6), 1L, "purchase", 0.0, "{}"),
      // user 2: purchase before the click → stops at depth 2
      Row(5L, us(1), 2L, "view", 0.0, "{}"),
      Row(6L, us(3), 2L, "purchase", 0.0, "{}"),
      Row(7L, us(4), 2L, "click", 0.0, "{}"),
      // user 3: never views → not in the funnel at all
      Row(8L, us(1), 3L, "click", 0.0, "{}")))
    val out = Events.qFunnel(spark, d).collect()
      .map(r => r.getLong(0) -> (r.get(1), r.get(2), r.get(3), r.getLong(4))).toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L) === ((2L, 5L, 6L, 3L)))
    assert(out(2L) === ((1L, 4L, null, 2L)))
  }

  test("retention assigns users to first-day cohorts with day offsets") {
    val day = 86400L * 1000000L // µs
    val d = writeEvents(Seq(
      // user 1: days 0 and 2 (cohort 0); user 2: days 1, 1, 2 (cohort 1)
      Row(1L, us(1), 1L, "view", 0.0, "{}"),
      Row(2L, us(2 * day + 5), 1L, "view", 0.0, "{}"),
      Row(3L, us(day + 1), 2L, "view", 0.0, "{}"),
      Row(4L, us(day + 2), 2L, "click", 0.0, "{}"),
      Row(5L, us(2 * day + 1), 2L, "view", 0.0, "{}")))
    val out = Events.qRetention(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      (0L, 0L) -> 1L, (0L, 2L) -> 1L, // user 1
      (1L, 0L) -> 1L, (1L, 1L) -> 1L)) // user 2 (two day-1 events dedup)
  }

  test("props extraction aggregates the typed JSON field exactly") {
    val d = writeEvents(Seq(
      Row(1L, us(1), 1L, "view", 0.0, "{\"k\": 10}"),
      Row(2L, us(2), 1L, "view", 0.0, "{\"k\": 15}"),
      Row(3L, us(3), 2L, "click", 0.0, "{\"k\": 7}")))
    val out = Events.qPropsExtract(spark, d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out("view") === ((2L, 25L, 10L, 15L, 12500L)))
    assert(out("click") === ((1L, 7L, 7L, 7L, 7000L)))
  }

  test("active-users window counts a user for exactly the 7 trailing days") {
    val day = 86400L * 1000000L // µs
    val d = writeEvents(Seq(
      // users 1+2 active day 0, user 2 again on days 3 and 8.  Day 3
      // must show WAU > DAU (both day-0 users still in the 7-day
      // window, only user 2 active ON it) — the case that pins the
      // window arithmetic; day 8 is outside user 1's window (0..6)
      // so WAU(8) counts only user 2
      Row(1L, us(1), 1L, "view", 0.0, "{}"),
      Row(2L, us(2), 2L, "view", 0.0, "{}"),
      Row(3L, us(3 * day + 1), 2L, "click", 0.0, "{}"),
      Row(4L, us(8 * day + 1), 2L, "view", 0.0, "{}")))
    val out = Events.qActiveUsers(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === Map(
      0L -> ((2L, 2L)),
      3L -> ((1L, 2L)), // dau: user 2; wau: users 1+2 from day 0
      8L -> ((1L, 1L)))) // day 3 within window, day 0 outside
  }

  test("session stats count bounces and exact dwell per user") {
    val d = writeEvents(Seq(
      // user 1: session A = 2 events 10 min apart (dwell 600s), then a
      // 31-min gap -> session B = 1 event (a bounce, dwell 0)
      Row(1L, us(0), 1L, "view", 0.0, "{}"),
      Row(2L, us(600L * 1000000L), 1L, "click", 0.0, "{}"),
      Row(3L, us(600L * 1000000L + 1860L * 1000000L), 1L, "view", 0.0, "{}")))
    val r = Events.qSessionStats(spark, d).collect().head
    // (user, n_sessions, n_events, events/session pm, total dur, max dur, bounces)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6)) ===
      ((1L, 2L, 3L, 1500L, 600000000L, 600000000L, 1L)))
  }

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  test("pca projection matches a BigInt reference on saturating correlated data") {
    // all dims ≈ 0.9 and positively correlated: Gram entries saturate
    // and the second matvec reaches ~6e13 — the regime where the old
    // multiply-then-divide renorm wrapped Long (6e13 · 10⁶ > 2⁶³).
    // The reference replays the exact integer pipeline in BigInt,
    // where overflow is impossible, so any wrap diverges.
    val dim = 64
    val vecs: Seq[(Long, Array[Float])] = (0L until 100L).map { i =>
      i -> Array.tabulate(dim)(d0 =>
        (0.9 + ((i * 31 + d0 * 17) % 13).toDouble / 1000.0).toFloat)
    }
    val d = tmpDir("emb_pca_sat")
    spark.createDataFrame(
        spark.sparkContext.parallelize(
          vecs.map { case (id, v) => Row(id, v.toSeq, 0) }, 2), embSchema)
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val got = Pipeline.qPcaProject(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // BigInt replay of the documented pipeline
    val qv = vecs.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 1000000.0 + 0.5).toLong) }
    val g = Array.ofDim[BigInt](dim, dim)
    for (i <- 0 until dim; j <- 0 until dim) {
      g(i)(j) = qv.iterator
        .map { case (_, q) => BigInt(q(i)) * q(j) / 1000000 }.sum
    }
    val gScale = g.iterator.flatten.map(_.abs).max / 1000000 + 1
    for (i <- 0 until dim; j <- 0 until dim) g(i)(j) /= gScale
    def renorm(v: Array[BigInt]): Array[BigInt] = {
      val scale = v.iterator.map(_.abs).max / 1000000 + 1
      v.map(_ / scale)
    }
    def matvec(v: Array[BigInt]): Array[BigInt] =
      Array.tabulate(dim)(i => (0 until dim).map(j => g(i)(j) * v(j)).sum)
    val dir = renorm(matvec(renorm(matvec(Array.fill(dim)(BigInt(1))))))
    val ref = qv.map { case (id, q) =>
      id -> (0 until dim).map(i => BigInt(q(i)) * dir(i)).sum.toLong }.toMap
    assert(got === ref)
  }

  test("pca projection is deterministic and exactly sign-flips under global negation") {
    val vecs: Seq[(Long, Array[Float])] = (0L until 40L).map { i =>
      // two elongated blobs along (1,1,0,0)-ish so the principal
      // direction is unambiguous
      val t = (i % 20 - 10).toFloat / 10f
      val noise = ((i * 37 % 11) - 5).toFloat / 100f
      i -> Array(t, t + noise, noise / 2, -noise)
    }
    def write(flip: Boolean): String = {
      val d = tmpDir("emb_pca")
      val rows = vecs.map { case (id, v) =>
        Row(id, (if (flip) v.map(-_) else v).toSeq, 0) }
      spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 2), embSchema)
        .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
      d
    }
    val d1 = write(flip = false)
    val p1 = Pipeline.qPcaProject(spark, d1).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val p1again = Pipeline.qPcaProject(spark, d1).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p1 === p1again, "projection must be deterministic")
    assert(p1.values.toSet.size > 1, "projection must separate the blobs")
    // Gram is invariant under global negation, so the direction is
    // unchanged while every quantized vector flips → proj negates
    // exactly (integer arithmetic end-to-end; FLOOR(-x·10⁶+0.5) =
    // -FLOOR(x·10⁶+0.5) only when x·10⁶ isn't half-integral, which
    // the /10f, /100f construction above guarantees)
    val p2 = Pipeline.qPcaProject(spark, write(flip = true)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p2 === p1.map { case (k, v) => k -> -v })
  }
}
