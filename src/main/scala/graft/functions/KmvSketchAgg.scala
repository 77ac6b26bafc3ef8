package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** K-Minimum-Values distinct-count sketch as a `TypedImperativeAggregate` —
  * the production form of [[KmvSketch]] (same estimator, same state as a set
  * function, bit-identical result): a mutable bounded ordered set replaces
  * the immutable sorted `Seq`, so the per-row cost is O(log K) instead of the
  * Aggregator's O(K) copy-and-sort, and the buffer serializes to `8·|state|`
  * bytes for the map-side-combine shuffle.
  *
  * Determinism: the state (the K smallest DISTINCT hashes) is a pure set
  * function of the input — insertion and merge order cannot change it — so
  * the estimate is exactly reproducible in the DuckDB oracle and agrees
  * bit-for-bit with the [[KmvSketch]] Aggregator (asserted in KmvSketchSpec).
  *
  * SQL surface: `kmv_distinct(hash BIGINT) -> DOUBLE`, installed by
  * [[graft.GraftExtensions]].
  */
case class KmvSketchAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  private val K = KmvSketch.K

  override def prettyName: String = "kmv_distinct"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"kmv_distinct requires BIGINT hashes, got $t")
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  /** Keep the K smallest distinct values: TreeSet dedups (`add` is a no-op
    * on duplicates) and `pollLast` evicts the largest once over capacity.
    */
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

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < K) buf.size.toDouble
    else (K - 1).toDouble * KmvSketch.HashSpace / buf.last

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

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

object KmvSketchAgg {
  /** FunctionRegistry description for `SparkSessionExtensions.injectFunction`. */
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("kmv_distinct"),
    new ExpressionInfo(classOf[KmvSketchAgg].getName, "kmv_distinct"),
    (children: Seq[Expression]) => {
      require(children.length == 1,
        s"kmv_distinct expects exactly 1 argument (BIGINT hash), got ${children.length}")
      KmvSketchAgg(children.head)
    }
  )
}
