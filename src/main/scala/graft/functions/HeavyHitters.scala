package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch (Misra & Gries, "Finding repeated
  * elements", 1982) as a `TypedImperativeAggregate` — the
  * mutable-buffer custom-aggregate tier of the Catalyst extension surface
  * (alongside the scalar expressions in [[VectorExprs]]).
  *
  * Tracks at most `capacity` candidate tokens; estimated counts are exact
  * when the stream has ≤ `capacity` distinct tokens and otherwise
  * undercount by at most N/(capacity+1) — the standard MG guarantee.
  * Partial buffers merge by count addition followed by a deterministic trim
  * (count desc, token asc), so the final top output is stable for exact
  * cases; like any MG sketch, estimates for borderline tokens can vary with
  * partition order.
  *
  * At 100 TB: per-partition sketches are `capacity`-bounded regardless of
  * input size, the shuffle moves one serialized map per partition, and the
  * final merge is driver-light — this is the pattern all heavy-hitter /
  * frequent-ngram telemetry in a training pipeline should use instead of a
  * full groupBy-count-sort.
  *
  * Output: array<struct<token string, est_count long>> sorted by
  * (est_count desc, token asc), truncated to `k`.
  */
case class HeavyHitters(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType), StructField("est_count", LongType))))

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.toString, 1L)
    buf
  }

  private def add(buf: mutable.HashMap[String, Long], token: String,
      n: Long): Unit = {
    if (buf.contains(token) || buf.size < capacity) {
      buf.update(token, buf.getOrElse(token, 0L) + n)
    } else {
      // decrement-all step, applied lazily as a bulk subtraction
      val dec = math.min(n, buf.valuesIterator.min)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.mapValuesInPlace((_, c) => c - dec)
      buf.foreach { case (t, c) => if (c <= 0) dead += t }
      dead.foreach(buf.remove)
      if (n - dec > 0 && buf.size < capacity) buf.update(token, n - dec)
    }
  }

  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (t, c) => a.update(t, a.getOrElse(t, 0L) + c) }
    if (a.size > capacity) {
      // standard mergeable-summaries trim (Agarwal et al., "Mergeable
      // Summaries", PODS 2012): subtract the (capacity+1)-th largest count
      // from every survivor so the merged sketch keeps the MG undercount
      // bound N/(capacity+1); a plain drop-smallest would lose the dropped
      // mass and break the guarantee.
      val sorted = a.toSeq.sortBy { case (t, c) => (-c, t) }
      val dec = sorted(capacity)._2
      a.clear()
      sorted.take(capacity).foreach { case (t, c) =>
        if (c - dec > 0) a.update(t, c - dec)
      }
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = buf.toSeq.sortBy { case (t, c) => (-c, t) }.take(k)
    new GenericArrayData(top.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    }.toArray[Any])
  }

  // length-prefixed UTF-8 bytes, NOT writeUTF: writeUTF throws
  // UTFDataFormatException past 64 KB, and a token column accidentally
  // holding full document text would kill the shuffle serialization
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): HeavyHitters =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHitters =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): HeavyHitters = copy(child = c.head)
  override def prettyName: String = "graft_heavy_hitters"
}
