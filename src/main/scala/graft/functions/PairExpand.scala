package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.Generator
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Lazy unordered-pair generator: for an input array `[x1..xn]` emits the
  * n·(n-1)/2 rows `(a, b) = (x_i, x_j), i < j` — the candidate-pair
  * expansion at the heart of every blocked dedup operator (MinHash bands,
  * Jaccard blocks, SimHash chunks).
  *
  * The composed form `explode(flatten(transform(arr, (x,i) =>
  * transform(slice(arr, i+2, n), …))))` is semantically identical but
  * MATERIALIZES the full quadratic pair array per row before the explode
  * (plus one slice copy per element). A `Generator` yields rows lazily:
  * peak memory per bucket is O(n), not O(n²) — the difference between a
  * hot bucket spilling a task and not, at corpus scale.
  *
  * Interpreted-eval generator (codegen'd `GenerateExec` is reserved for the
  * explode family); the per-pair work downstream still codegens.
  */
case class PairExpand(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  private lazy val elementType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: ArrayType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_pair_expand needs an array input, got ${other.sql}")
    }

  override def elementSchema: StructType = StructType(Seq(
    StructField("a", elementType, nullable = true),
    StructField("b", elementType, nullable = true)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val data = child.eval(input)
    if (data == null) Iterator.empty
    else {
      val arr = data.asInstanceOf[ArrayData]
      val n = arr.numElements()
      // copy() once: ArrayData.get may return VIEWS into a shared buffer —
      // rows, arrays, maps AND strings (UTF8String wraps the backing
      // bytes); buffered views would be corrupted by the time later pairs
      // are yielded
      val items = (0 until n).map(i => arr.get(i, elementType) match {
        case r: InternalRow => r.copy()
        case a: ArrayData   => a.copy()
        case m: org.apache.spark.sql.catalyst.util.MapData => m.copy()
        case s: org.apache.spark.unsafe.types.UTF8String   => s.clone()
        case other          => other
      })
      for {
        i <- (0 until n).iterator
        j <- ((i + 1) until n).iterator
      } yield InternalRow(items(i), items(j))
    }
  }

  override protected def withNewChildInternal(c: Expression): PairExpand =
    copy(child = c)
  override def prettyName: String = "graft_pair_expand"
}
