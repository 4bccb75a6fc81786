package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** One-pass covariance accumulation over a vector column, lifted to the
  * `TypedImperativeAggregate` tier (the KLL/CMS/t-digest discipline): the
  * d-vector of sums and the packed d(d+1)/2 upper-triangle of cross-product
  * sums live IN the aggregation buffer, updated row-locally with a tight
  * double loop — no Generate node, no n·d(d+1)/2 exploded rows through a
  * hash aggregate. Measurement motivated the tier descent (the ladder's
  * rule): the declarative explode+groupBy form of `q_embed_cov` was the
  * only round-11 addition with a visible data term (decade exponent 0.45);
  * this buffer makes the per-row cost a d²/2 fused multiply-add and the
  * shuffle ONE buffer per partition (~17 KB at d=64) instead of d² rows.
  * Merge is element-wise vector addition — fully associative/commutative,
  * so the result is partitioning-independent up to double rounding.
  *
  * Contract: non-null fixed-width vectors (float or double elements, no
  * null elements); mixed dimensions throw. Evaluates to
  * `array<struct<i,j,sxy,sx,sy,n>>` of RAW sums over the symmetric half
  * (i ≤ j) — the caller derives cov = sxy/n − (sx/n)(sy/n) in SQL, so the
  * final arithmetic stays visible to (and identical with) the DuckDB twin.
  */
object CovFunctions {
  def cov_accum_agg(c: Column): Column =
    Bridge.column(CovAccumAgg(Bridge.expression(c)).toAggregateExpression())
}

/** Mutable buffer: dimension (-1 until first row), row count, Σx (d), and
  * packed upper-triangle Σ xᵢxⱼ (i ≤ j, row-major from the diagonal). */
final class CovBuffer(var d: Int, var n: Long,
                      var sx: Array[Double], var sxy: Array[Double])

case class CovAccumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CovBuffer] with UnaryLike[Expression] {

  override def prettyName: String = "cov_accum_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("j", LongType, nullable = false),
    StructField("sxy", DoubleType, nullable = false),
    StructField("sx", DoubleType, nullable = false),
    StructField("sy", DoubleType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)

  private lazy val elemIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cov_accum_agg needs array<float|double>, got ${other.sql}")
  }

  override def createAggregationBuffer(): CovBuffer = new CovBuffer(-1, 0L, null, null)

  override def update(buffer: CovBuffer, input: InternalRow): CovBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val d = arr.numElements()
      if (buffer.d < 0) {
        buffer.d = d
        buffer.sx = new Array[Double](d)
        buffer.sxy = new Array[Double](d * (d + 1) / 2)
      }
      require(d == buffer.d, s"cov_accum_agg: mixed dimensions $d vs ${buffer.d}")
      val x = new Array[Double](d)
      var i = 0
      while (i < d) {
        x(i) = if (elemIsDouble) arr.getDouble(i) else arr.getFloat(i).toDouble
        buffer.sx(i) += x(i)
        i += 1
      }
      var p = 0
      i = 0
      while (i < d) {
        val xi = x(i)
        var j = i
        while (j < d) { buffer.sxy(p) += xi * x(j); p += 1; j += 1 }
        i += 1
      }
      buffer.n += 1L
    }
    buffer
  }

  override def merge(buffer: CovBuffer, other: CovBuffer): CovBuffer = {
    if (other.d >= 0) {
      if (buffer.d < 0) {
        buffer.d = other.d; buffer.sx = other.sx.clone(); buffer.sxy = other.sxy.clone()
        buffer.n = other.n
      } else {
        require(buffer.d == other.d, "cov_accum_agg: mixed dimensions across partitions")
        var i = 0
        while (i < buffer.sx.length) { buffer.sx(i) += other.sx(i); i += 1 }
        i = 0
        while (i < buffer.sxy.length) { buffer.sxy(i) += other.sxy(i); i += 1 }
        buffer.n += other.n
      }
    }
    buffer
  }

  override def eval(buffer: CovBuffer): Any = {
    if (buffer.d < 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](buffer.sxy.length)
    var p = 0
    var i = 0
    while (i < buffer.d) {
      var j = i
      while (j < buffer.d) {
        out(p) = new GenericInternalRow(Array[Any](
          i.toLong, j.toLong, buffer.sxy(p), buffer.sx(i), buffer.sx(j), buffer.n))
        p += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: CovBuffer): Array[Byte] = {
    if (buffer.d < 0) return Array.emptyByteArray
    val bb = ByteBuffer.allocate(4 + 8 + 8 * buffer.sx.length + 8 * buffer.sxy.length)
    bb.putInt(buffer.d).putLong(buffer.n)
    buffer.sx.foreach(bb.putDouble)
    buffer.sxy.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CovBuffer = {
    if (bytes.isEmpty) return createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt
    val n = bb.getLong
    val sx = Array.fill(d)(bb.getDouble)
    val sxy = Array.fill(d * (d + 1) / 2)(bb.getDouble)
    new CovBuffer(d, n, sx, sxy)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CovAccumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CovAccumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CovAccumAgg =
    copy(child = newChild)
}
