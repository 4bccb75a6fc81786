package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, Decimal, DoubleType, NumericType}

/** Mergeable KLL quantile sketches — the QUANTILE half of the persistent-
  * sketch storage discipline (`EventOps.hllMerge` is the distinct-count
  * half): per-day blobs are built once ([[KllSketchAgg]]), stored, and every
  * coarser rollup merges the stored blobs ([[KllUnionAgg]]) without
  * rescanning the fact table. Built on the DataSketches KLL implementation
  * that ships inside Spark's own jars (`datasketches-java`, the library
  * behind Spark's `hll_sketch_agg`), exposed as proper
  * `TypedImperativeAggregate`s — the same imperative-buffer aggregation tier
  * Spark's native sketch aggregates use, so the sketch object lives in the
  * aggregation buffer and each input row costs one `update`, not a
  * serialize/deserialize round trip.
  *
  * Determinism: KLL compaction is randomized (level-offset coin flips), so
  * blob bytes and low-order estimate digits legitimately vary across runs
  * and merge orders. The contract is therefore the SKETCH contract —
  * `getNormalizedRankError` bounds the rank error (k=200 ⇒ ±1.65% two-sided
  * 99%) — and the spec asserts rank-error bounds against the exact twin
  * (`q_monthly_median`, oracled) instead of value hashes, which is exactly
  * how a production sketch pipeline is validated.
  */
object KllFunctions {
  /** Sketch size parameter: 200 ⇒ normalized rank error ≈1.65% at 99%
    * confidence, ~5 KB serialized at stream lengths in the billions. */
  val DefaultK = 200

  def kll_sketch_agg(c: Column, k: Int = DefaultK): Column =
    Bridge.column(KllSketchAgg(Bridge.expression(c), k).toAggregateExpression())

  def kll_union_agg(c: Column, k: Int = DefaultK): Column =
    Bridge.column(KllUnionAgg(Bridge.expression(c), k).toAggregateExpression())

  def kll_quantile(c: Column, rank: Double): Column =
    Bridge.column(KllQuantile(Bridge.expression(c),
      Literal(rank, DoubleType)))

  def kll_quantile(c: Column, rank: Column): Column =
    Bridge.column(KllQuantile(Bridge.expression(c), Bridge.expression(rank)))

  def kll_rank(c: Column, value: Column): Column =
    Bridge.column(KllRank(Bridge.expression(c), Bridge.expression(value)))
}

/** Any-numeric → Double widening shared by the agg's update and the
  * quantile's rank argument: a strict DoubleType check rejected plain SQL
  * literals (`0.5` parses as DECIMAL(1,1)) and integer value columns
  * (review r9), which Spark's own sketch functions accept. */
private[functions] object KllNum {
  def toDouble(v: Any): Double = v match {
    case d: java.lang.Double => d
    case f: java.lang.Float => f.toDouble
    case dec: Decimal => dec.toDouble
    case n: java.lang.Number => n.doubleValue()
  }
}

/** Shared buffer/serde plumbing of the two KLL aggregates: sketch-object
  * buffer, register-merge, blob eval and blob (de)serialization are
  * identical whether rows or stored blobs feed the update side. */
private[functions] trait KllAggLike extends TypedImperativeAggregate[KllDoublesSketch] {
  def k: Int
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)
  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other); buffer
  }
  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray
  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** Builds a KLL(k) doubles sketch over any numeric column (widened to
  * double); evaluates to the serialized blob (BinaryType). Null inputs are
  * skipped (aggregate convention); an all-null group yields a valid empty
  * sketch blob. */
case class KllSketchAgg(
    child: Expression,
    k: Int = KllFunctions.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KllAggLike with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[NumericType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_agg needs a numeric input, got ${child.dataType.sql}")
  override def prettyName: String = "kll_sketch_agg"

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(KllNum.toDouble(v))
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** Merges stored KLL blobs (BinaryType column of [[KllSketchAgg]] outputs)
  * into one sketch; evaluates to the merged blob. Mergeability is the whole
  * point: a monthly rollup unions ~30 stored daily blobs instead of
  * rescanning the month's raw rows, and late-arriving days just re-union. */
case class KllUnionAgg(
    child: Expression,
    k: Int = KllFunctions.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KllAggLike with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_union_agg needs a BINARY blob input, got ${child.dataType.sql}")
  override def prettyName: String = "kll_union_agg"

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) {
      buffer.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllUnionAgg =
    copy(child = newChild)
}

/** Scalar quantile query over a stored KLL blob: `kll_quantile(blob, rank)`
  * with INCLUSIVE search criteria (the DataSketches default). Null on an
  * empty sketch. Runs on post-aggregation rows (one per group), so
  * CodegenFallback costs nothing measurable. */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_quantile needs (BINARY, numeric), got (${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantile"

  override protected def nullSafeEval(blob: Any, rank: Any): Any = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(blob.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else sk.getQuantile(KllNum.toDouble(rank), QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}

/** Inverse of [[KllQuantile]]: the NORMALIZED RANK of a value in a stored
  * KLL blob — `kll_rank(blob, v)` ∈ [0, 1], INCLUSIVE criteria. The pair
  * (quantile, rank) is what sketch-side distribution COMPARISON runs on:
  * two periods' blobs give an approximate KS statistic as
  * max over a probe grid of |rank_a(v) − rank_b(v)| (`q_ks_drift_sketch`)
  * with error bounded by the two sketches' rank errors. Null on an empty
  * sketch. */
case class KllRank(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_rank needs (BINARY, numeric), got (${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_rank"

  override protected def nullSafeEval(blob: Any, value: Any): Any = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(blob.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else sk.getRank(KllNum.toDouble(value), QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllRank =
    copy(left = newLeft, right = newRight)
}
