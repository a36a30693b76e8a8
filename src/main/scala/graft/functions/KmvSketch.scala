package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV (k-minimum values) distinct sketch (Bar-Yossef et al., RANDOM 2002;
  * Beyer et al., SIGMOD 2007) as a `TypedImperativeAggregate`: per
  * partition, a bounded ordered set of the `k` SMALLEST DISTINCT input
  * hash values.
  *
  * This replaces the relational distinct-shuffle + per-group rank window
  * with ONE aggregation: partial buffers are k-bounded regardless of input
  * size, dedup happens inside the buffer (an already-present hash is a
  * no-op, a hash above the current k-th smallest is rejected in O(log k)),
  * and the exchange moves one ≤ k·8-byte sketch per partition per group —
  * the mergeable-summaries shape (Agarwal et al., PODS 2012). Merge is
  * min-k of the set union: associative, commutative, partition-order
  * independent, so the result is exactly the k smallest distinct hashes —
  * bit-identical to the sorted-distinct-limit-k relational form and to the
  * DuckDB oracle.
  *
  * Input: the shared md5-derived 32-bit hash ([[graft.operators.TextOps]]
  * `tokenHash`) as a long; NULL inputs are not counted (COUNT DISTINCT
  * semantics — `tokenHash` of a NULL value is NULL). Output: the kept
  * hashes as a SORTED ascending `array<bigint>` — empty when the group had
  * no non-null input — from which callers read `size` (exact-below-k
  * count) and the k-th value (the estimator's h_(k)).
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_kmv expects a BIGINT hash input, got ${other.sql}")
    }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () } // add() dedups
    else if (h < buf.last() && buf.add(h)) { buf.pollLast(); () }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next().longValue())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.TreeSet[java.lang.Long]()
    (0 until n).foreach(_ => buf.add(in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KmvSketch = copy(child = c.head)
  override def prettyName: String = "graft_kmv"
}
