package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-state quantile sketch (`TypedImperativeAggregate`) — the rank
  * companion to [[HeavyHitters]] (counts) and the KMV sketch (distincts).
  *
  * State: weighted samples `(value, weight)`, at most `2·capacity` entries
  * regardless of input size. While every weight is 1 (stream ≤ capacity
  * values, the oracle-tested regime) the sketch is EXACT: `eval` computes
  * the same linearly-interpolated percentile as Spark's `percentile` and
  * DuckDB's `quantile_cont`, bit for bit. Past capacity it compacts like a
  * one-level KLL compactor (Karnin, Lang & Liberty, "Optimal quantile
  * approximation in streams", FOCS 2016): sort, keep alternate elements at
  * doubled weight — each compaction perturbs any rank by at most the
  * discarded weight, giving the usual additive rank error bounded by
  * W/capacity per level.
  *
  * Scale shape: per-partition state is capacity-bounded, the shuffle moves
  * one serialized sample set per partition, merge is concat+compact —
  * exactly the pattern a 100 TB percentile report needs where an exact
  * per-group sort would spill.
  *
  * Output: array<double> — one interpolated quantile per requested
  * percentage.
  */
case class QuantileSketch(
    child: Expression,
    percentages: Seq[Double],
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Double, Long)]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType)

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Double, Long)] =
    mutable.ArrayBuffer.empty

  override def update(buf: mutable.ArrayBuffer[(Double, Long)],
      input: InternalRow): mutable.ArrayBuffer[(Double, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      buf += ((v.asInstanceOf[Number].doubleValue(), 1L))
      if (buf.length > 2 * capacity) compact(buf)
    }
    buf
  }

  override def merge(a: mutable.ArrayBuffer[(Double, Long)],
      b: mutable.ArrayBuffer[(Double, Long)]): mutable.ArrayBuffer[(Double, Long)] = {
    a ++= b
    if (a.length > 2 * capacity) compact(a)
    a
  }

  /** Sort by value and keep alternating elements with summed weight —
    * deterministic (ties keep insertion-independent order via a (value,
    * weight) sort) and rank-error-bounded.
    */
  private def compact(buf: mutable.ArrayBuffer[(Double, Long)]): Unit = {
    val sorted = buf.sortBy(x => (x._1, x._2))
    buf.clear()
    var i = 0
    while (i < sorted.length) {
      if (i + 1 < sorted.length)
        buf += ((sorted(i)._1, sorted(i)._2 + sorted(i + 1)._2))
      else buf += sorted(i)
      i += 2
    }
  }

  override def eval(buf: mutable.ArrayBuffer[(Double, Long)]): Any = {
    if (buf.isEmpty)
      return new GenericArrayData(percentages.map(_ => null).toArray[Any])
    val sorted = buf.sortBy(_._1)
    val exact = sorted.forall(_._2 == 1L)
    // hoisted: one O(n) pass, not one per requested percentage
    val totalWeight = sorted.iterator.map(_._2).sum
    val out = percentages.map { p =>
      if (exact) {
        // DuckDB quantile_cont's exact expression, lo*(1-f) + hi*f — NOT
        // the algebraically-equal lo + f*(hi-lo), which rounds differently
        // (observed one-ulp divergence at a frac≈0.1 interpolation). The
        // suite emits these doubles raw, so the bits must match.
        val n = sorted.length
        val pos = p * (n - 1)
        val lo = pos.toInt
        val hi = math.min(lo + 1, n - 1)
        val frac = pos - lo
        sorted(lo)._1 * (1 - frac) + sorted(hi)._1 * frac
      } else {
        // weighted nearest-rank over the compacted samples
        val target = p * (totalWeight - 1)
        var acc = 0L
        var i = 0
        while (i < sorted.length - 1 && acc + sorted(i)._2 <= target) {
          acc += sorted(i)._2
          i += 1
        }
        sorted(i)._1
      }
    }
    new GenericArrayData(out.map(Double.box).toArray[Any])
  }

  override def serialize(buf: mutable.ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    o.writeInt(buf.length)
    buf.foreach { case (v, w) => o.writeDouble(v); o.writeLong(w) }
    o.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[(Double, Long)]
    (0 until n).foreach(_ => buf += ((in.readDouble(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): QuantileSketch = copy(child = c.head)
  override def prettyName: String = "graft_quantile_sketch"
}
