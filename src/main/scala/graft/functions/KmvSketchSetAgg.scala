package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** [[KmvSketchAgg]]'s sketch-SET sibling: the same bounded buffer (the K
  * smallest DISTINCT 60-bit hashes, a pure set function of the input), but
  * `eval` returns the sketch itself — sorted ascending `array<bigint>` —
  * instead of collapsing it to the distinct-count estimate.
  *
  * This is the aggregate that makes KMV SET ALGEBRA a plain partial+final
  * aggregation: per-group sketches feed union (K smallest of two merged
  * sketches), intersection (inclusion–exclusion), and Jaccard estimates
  * downstream (`corpus_source_overlap_kmv`) — with O(K) state per group and
  * map-side combine, where the window-rank formulation shuffles and sorts
  * the group's entire distinct-hash universe to keep 64 rows of it.
  *
  * Determinism: identical to [[KmvSketchAgg]] — the state is order-blind,
  * the output is its ascending enumeration, so the DuckDB oracle's rank-K
  * prefix (`row_number ≤ K` over distinct hashes) reproduces the array
  * element-for-element. The estimator contract downstream: a sketch shorter
  * than K IS the group's full distinct set (exact); at length K the K-th
  * minimum drives `(K−1)·2^60/h_K`.
  *
  * SQL surface: `kmv_sketch(hash BIGINT) -> ARRAY<BIGINT>`, installed by
  * [[graft.GraftExtensions]].
  */
case class KmvSketchSetAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  private val K = KmvSketch.K

  override def prettyName: String = "kmv_sketch"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"kmv_sketch requires BIGINT hashes, got $t")
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit =
    if (buf.size < K) { buf.add(h); () }
    else if (h < buf.last && buf.add(h)) { buf.pollLast(); () }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
                     b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    b.forEach(h => insert(a, h))
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = Array.ofDim[Long](buf.size)
    var i = 0
    buf.forEach(h => { out(i) = h; i += 1 }) // TreeSet iterates ascending
    ArrayData.toArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.forEach(h => { bb.putLong(h); () })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.add(bb.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchSetAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchSetAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchSetAgg =
    copy(child = newChild)
}

object KmvSketchSetAgg {
  /** FunctionRegistry description for `SparkSessionExtensions.injectFunction`. */
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("kmv_sketch"),
    new ExpressionInfo(classOf[KmvSketchSetAgg].getName, "kmv_sketch"),
    (children: Seq[Expression]) => {
      require(children.length == 1,
        s"kmv_sketch expects exactly 1 argument (BIGINT hash), got ${children.length}")
      KmvSketchSetAgg(children.head)
    }
  )
}
