package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable frequency-sketch aggregates (I2).
  *
  * [[MisraGries]] is the candidate-generation half of the two-pass
  * exact heavy-hitters pattern a 100 TB corpus needs: the full
  * vocabulary of a token stream is far too wide to shuffle (`GROUP BY
  * token` moves |V| keys), but any token with frequency above 1/(k+1)
  * of the stream provably SURVIVES a capacity-k Misra-Gries summary
  * (Misra & Gries 1982), and the summary is mergeable with the same
  * guarantee (Agarwal et al., "Mergeable Summaries", PODS 2012: add
  * counters, then subtract the (k+1)-largest count and drop non-
  * positives).  So pass 1 is a standard partial-then-final Spark
  * aggregate whose per-task state is ≤ k entries — no vocabulary
  * shuffle, map-side combine does all the work — and pass 2 recounts
  * ONLY the ≤ k surviving candidates exactly (broadcast semi-join),
  * turning an approximate sketch into an exact answer.  The counts
  * the sketch itself reports are lower bounds (true − N/(k+1) ≤
  * reported ≤ true) and are exposed for diagnostics, not truth —
  * final counts must come from the recount.
  */
object Sketches {

  /** Extract a foldable integer literal's value without throwing:
    * `None` for non-foldable, null-evaluating (e.g. `CAST(NULL AS
    * INT)`), or non-integer k expressions — so `checkInputDataTypes`
    * can return a clean `TypeCheckFailure` instead of leaking an
    * exception from analysis. */
  private def foldableInt(e: Expression): Option[Int] =
    if (!e.foldable) None
    else e.eval(InternalRow.empty) match {
      case i: java.lang.Integer => Some(i.intValue())
      case l: java.lang.Long => Some(l.intValue())
      case _ => None
    }

  /** `graft_misra_gries(token, k)`: capacity-k Misra-Gries summary of
    * a string column.  Returns `array<struct<tok: string, lb: bigint>>`
    * sorted by token — `lb` is the surviving counter (a lower bound on
    * the true count).  Guarantee: every token with true count
    * > N/(k+1) (N = non-null input rows) appears in the result; at
    * most k tokens are returned.  k must be a foldable positive
    * integer literal ≤ 65536 (the summary is driver/exchange state).
    */
  case class MisraGries(child: Expression, kExpr: Expression,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[java.util.HashMap[UTF8String, Array[Long]]] {

    private lazy val k: Int = Sketches.foldableInt(kExpr).getOrElse(
      throw new IllegalArgumentException(
        "graft_misra_gries: k must be a non-null foldable integer literal"))

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType != StringType)
        TypeCheckResult.TypeCheckFailure("graft_misra_gries expects a STRING column")
      else Sketches.foldableInt(kExpr) match {
        case None => TypeCheckResult.TypeCheckFailure(
          "graft_misra_gries: k must be a non-null foldable integer literal")
        case Some(kv) if kv < 1 || kv > 65536 => TypeCheckResult.TypeCheckFailure(
          s"graft_misra_gries: k must be in [1, 65536], got $kv")
        case _ => TypeCheckResult.TypeCheckSuccess
      }

    override def children: Seq[Expression] = Seq(child, kExpr)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("tok", StringType, nullable = false),
      StructField("lb", LongType, nullable = false))), containsNull = false)
    override def prettyName: String = "graft_misra_gries"

    type Buf = java.util.HashMap[UTF8String, Array[Long]]

    override def createAggregationBuffer(): Buf = new Buf()

    override def update(buf: Buf, input: InternalRow): Buf = {
      val v = child.eval(input)
      if (v == null) return buf
      val tok = v.asInstanceOf[UTF8String]
      val cur = buf.get(tok)
      if (cur != null) { cur(0) += 1; return buf }
      if (buf.size < k) {
        // the input UTF8String may point into a reused row buffer
        buf.put(tok.clone(), Array(1L))
        return buf
      }
      // full and unseen: the classic decrement — every live counter
      // (and, implicitly, the new token's 1) drops by one.  Each
      // decrement retires an increment, so total work is amortized
      // O(1) per input row.
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        e.getValue()(0) -= 1
        if (e.getValue()(0) == 0L) it.remove()
      }
      buf
    }

    override def merge(buf: Buf, other: Buf): Buf = {
      val it = other.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cur = buf.get(e.getKey)
        if (cur != null) cur(0) += e.getValue()(0)
        else buf.put(e.getKey, e.getValue)
      }
      if (buf.size > k) {
        // Mergeable-summaries combine: subtract the (k+1)-th largest
        // counter from every counter, drop non-positives — at most k
        // survive and the N/(k+1) retention guarantee is preserved.
        val counts = new Array[Long](buf.size)
        var i = 0
        val vs = buf.values().iterator()
        while (vs.hasNext) { counts(i) = vs.next()(0); i += 1 }
        java.util.Arrays.sort(counts)
        val m = counts(counts.length - (k + 1)) // (k+1)-th largest
        val es = buf.entrySet().iterator()
        while (es.hasNext) {
          val e = es.next()
          e.getValue()(0) -= m
          if (e.getValue()(0) <= 0L) es.remove()
        }
      }
      buf
    }

    override def eval(buf: Buf): Any = {
      val entries = new Array[(UTF8String, Long)](buf.size)
      var i = 0
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        entries(i) = (e.getKey, e.getValue()(0))
        i += 1
      }
      // binary token order — deterministic output independent of hash
      // iteration order
      scala.util.Sorting.stableSort(entries,
        (a: (UTF8String, Long), b: (UTF8String, Long)) => a._1.compareTo(b._1) < 0)
      new GenericArrayData(entries.map { case (t, c) =>
        new GenericInternalRow(Array[Any](t, c))
      })
    }

    override def serialize(buf: Buf): Array[Byte] = {
      var size = 4
      val it0 = buf.keySet().iterator()
      while (it0.hasNext) size += 4 + it0.next().numBytes() + 8
      val bb = java.nio.ByteBuffer.allocate(size)
      bb.putInt(buf.size)
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val bytes = e.getKey.getBytes
        bb.putInt(bytes.length)
        bb.put(bytes)
        bb.putLong(e.getValue()(0))
      }
      bb.array()
    }

    override def deserialize(storage: Array[Byte]): Buf = {
      val bb = java.nio.ByteBuffer.wrap(storage)
      val n = bb.getInt
      val buf = new Buf()
      var i = 0
      while (i < n) {
        val len = bb.getInt
        val bytes = new Array[Byte](len)
        bb.get(bytes)
        val cnt = bb.getLong
        buf.put(UTF8String.fromBytes(bytes), Array(cnt))
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGries =
      copy(child = newChildren(0), kExpr = newChildren(1))
  }

  /** `graft_topk_by(key, payload, k)`: the k LARGEST rows per group
    * under the deterministic total order (key DESC, payload ASC),
    * returned as `array<struct<key, payload>>` in that order.
    *
    * This is the AGGREGATE-shaped top-k — the third shape next to the
    * window (`row_number` + filter: full shuffle + per-group sort) and
    * the ranked operator (range exchange + two passes): a bounded
    * heap per group that combines MAP-SIDE, so the exchange carries at
    * most k rows per (task, group) and nothing is ever sorted beyond
    * the k-element state.  For per-group sampling/leaderboard shapes
    * with small k it is the cheapest distributed form, and in
    * Structured Streaming it is a legal stateful aggregate whose
    * per-window state is the k-entry heap (arrival-rate-independent).
    *
    * key: BIGINT or DOUBLE (doubles ordered like Spark: NaN greatest,
    * ties exact); payload: BIGINT; k: foldable int in [1, 65536].
    * Null keys/payloads are skipped (SQL aggregate convention). */
  case class TopKBy(keyExpr: Expression, payloadExpr: Expression, kExpr: Expression,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[java.util.PriorityQueue[(Double, Long)]] {

    private lazy val k: Int = Sketches.foldableInt(kExpr).getOrElse(
      throw new IllegalArgumentException(
        "graft_topk_by: k must be a non-null foldable integer literal"))

    private def isKeyDouble = keyExpr.dataType == DoubleType

    override def checkInputDataTypes(): TypeCheckResult =
      if (keyExpr.dataType != DoubleType && keyExpr.dataType != LongType)
        TypeCheckResult.TypeCheckFailure("graft_topk_by: key must be DOUBLE or BIGINT")
      else if (payloadExpr.dataType != LongType)
        TypeCheckResult.TypeCheckFailure("graft_topk_by: payload must be BIGINT")
      else Sketches.foldableInt(kExpr) match {
        case None => TypeCheckResult.TypeCheckFailure(
          "graft_topk_by: k must be a non-null foldable integer literal")
        case Some(kv) if kv < 1 || kv > 65536 => TypeCheckResult.TypeCheckFailure(
          s"graft_topk_by: k must be in [1, 65536], got $kv")
        case _ => TypeCheckResult.TypeCheckSuccess
      }

    override def children: Seq[Expression] = Seq(keyExpr, payloadExpr, kExpr)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("key", keyExpr.dataType, nullable = false),
      StructField("payload", LongType, nullable = false))), containsNull = false)
    override def prettyName: String = "graft_topk_by"

    type Buf = java.util.PriorityQueue[(Double, Long)]

    /** keep order: the heap ROOT is the WORST kept element under
      * (key DESC, payload ASC) — i.e. smallest key, then largest
      * payload.  Double.compare gives the Spark double order (NaN
      * greatest, -0.0 < 0.0); longs ride exactly in doubles only to
      * 2^53, so long keys are compared from their own bits, carried
      * losslessly via doubleToRawLongBits. */
    private val worstFirst = new java.util.Comparator[(Double, Long)] with Serializable {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c =
          if (isKeyDouble) java.lang.Double.compare(a._1, b._1)
          else java.lang.Long.compare(
            java.lang.Double.doubleToRawLongBits(a._1),
            java.lang.Double.doubleToRawLongBits(b._1))
        if (c != 0) c else java.lang.Long.compare(b._2, a._2)
      }
    }

    private def longKey(v: Long): Double = java.lang.Double.longBitsToDouble(v)
    private def rawLong(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)

    override def createAggregationBuffer(): Buf =
      new java.util.PriorityQueue[(Double, Long)](math.min(k, 16), worstFirst)

    private def offer(buf: Buf, e: (Double, Long)): Unit = {
      if (buf.size < k) buf.add(e)
      else if (worstFirst.compare(e, buf.peek()) > 0) { buf.poll(); buf.add(e) }
    }

    override def update(buf: Buf, input: InternalRow): Buf = {
      val kv = keyExpr.eval(input)
      val pv = payloadExpr.eval(input)
      if (kv == null || pv == null) return buf
      val key = if (isKeyDouble) kv.asInstanceOf[Double]
                else longKey(kv.asInstanceOf[Long])
      offer(buf, (key, pv.asInstanceOf[Long]))
      buf
    }

    override def merge(buf: Buf, other: Buf): Buf = {
      val it = other.iterator()
      while (it.hasNext) offer(buf, it.next())
      buf
    }

    override def eval(buf: Buf): Any = {
      val arr = new Array[(Double, Long)](buf.size)
      var i = 0
      val it = buf.iterator()
      while (it.hasNext) { arr(i) = it.next(); i += 1 }
      // output best-first: reverse of the heap's worst-first order
      java.util.Arrays.sort(arr, worstFirst.reversed())
      new GenericArrayData(arr.map { case (key, p) =>
        new GenericInternalRow(Array[Any](
          if (isKeyDouble) key else rawLong(key), p))
      })
    }

    override def serialize(buf: Buf): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
      bb.putInt(buf.size)
      val it = buf.iterator()
      while (it.hasNext) {
        val (key, p) = it.next()
        bb.putLong(rawLong(key))
        bb.putLong(p)
      }
      bb.array()
    }

    override def deserialize(storage: Array[Byte]): Buf = {
      val bb = java.nio.ByteBuffer.wrap(storage)
      val n = bb.getInt
      val buf = createAggregationBuffer()
      var i = 0
      while (i < n) {
        buf.add((longKey(bb.getLong), bb.getLong))
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKBy =
      copy(keyExpr = newChildren(0), payloadExpr = newChildren(1), kExpr = newChildren(2))
  }
}
