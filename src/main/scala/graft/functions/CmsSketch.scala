package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable Count-Min sketches — the POINT-FREQUENCY member of the
  * persistent-sketch family ([[KllFunctions]] = quantiles, `hll_sketch_agg`
  * = distinct counts, theta = set algebra, bloom = membership): per-day
  * blobs answer "how many events did key X produce this month" by merging
  * ~30 stored blobs instead of rescanning the fact table. Built on Spark's
  * own `org.apache.spark.util.sketch.CountMinSketch` (the engine's bundled
  * CMS, also behind `DataFrameStatFunctions.countMinSketch`), lifted to the
  * `TypedImperativeAggregate` tier so the sketch lives in the aggregation
  * buffer with one `add` per row and map-side partial aggregation.
  *
  * Contract, distinct from KLL's: CMS cell counts are SUMS under a
  * seed-determined hash, so — unlike KLL's randomized compaction — the
  * merged sketch is BIT-DETERMINISTIC for a fixed seed regardless of row
  * order, partitioning, or merge shape (sum is fully associative +
  * commutative). The spec therefore pins merge == direct EXACTLY, plus the
  * classic CMS guarantees vs the oracled exact twin (`q_user_freq`):
  * estimate ≥ true count always (counters only ever over-count), and
  * estimate ≤ true + ε·N with probability 1−δ (ε = 2/width, δ = 2^-depth).
  * Width 2048 × depth 5 ⇒ ε ≈ 0.1 %, δ ≈ 3 %, ~80 KB per blob.
  */
object CmsFunctions {
  val DefaultDepth = 5
  val DefaultWidth = 2048
  /** Fixed hash seed: the determinism contract above holds only per-seed —
    * every blob that will ever be merged must share it (enforced at merge
    * by CountMinSketch.mergeInPlace's IncompatibleMergeException). */
  val DefaultSeed = 42

  def cms_sketch_agg(c: Column): Column =
    Bridge.column(CmsSketchAgg(Bridge.expression(c)).toAggregateExpression())

  def cms_union_agg(c: Column): Column =
    Bridge.column(CmsUnionAgg(Bridge.expression(c)).toAggregateExpression())

  def cms_estimate(blob: Column, item: Column): Column =
    Bridge.column(CmsEstimate(Bridge.expression(blob), Bridge.expression(item)))

  /** Keys hash by VALUE across both integer widths and strings: ints widen
    * to long before hashing so a stored blob keyed by an INT column answers
    * probes typed LONG (and vice versa); UTF8String must become a JVM
    * String because the sketch hashes String and byte[] differently. */
  private[functions] def addTo(sk: CountMinSketch, v: Any): Unit = v match {
    case l: java.lang.Long => sk.addLong(l)
    case i: java.lang.Integer => sk.addLong(i.toLong)
    case s: UTF8String => sk.addString(s.toString)
    case other => sk.add(other)
  }

  private[functions] def estimateFrom(sk: CountMinSketch, v: Any): Long = v match {
    case l: java.lang.Long => sk.estimateCount(l)
    case i: java.lang.Integer => sk.estimateCount(java.lang.Long.valueOf(i.toLong))
    case s: UTF8String => sk.estimateCount(s.toString)
    case other => sk.estimateCount(other)
  }

  private[functions] def keyTypeOk(dt: DataType): Boolean =
    dt == LongType || dt == IntegerType || dt == StringType
}

/** Shared buffer/serde plumbing of the two CMS aggregates (the
  * [[KllAggLike]] pattern): sketch-object buffer, additive merge, blob eval
  * and blob (de)serialization. */
private[functions] trait CmsAggLike extends TypedImperativeAggregate[CountMinSketch] {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.create(CmsFunctions.DefaultDepth, CmsFunctions.DefaultWidth,
      CmsFunctions.DefaultSeed)
  override def merge(buffer: CountMinSketch, other: CountMinSketch): CountMinSketch = {
    buffer.mergeInPlace(other); buffer
  }
  override def eval(buffer: CountMinSketch): Any = buffer.toByteArray
  override def serialize(buffer: CountMinSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(bytes)
}

/** Builds a CMS over a long/int/string key column; evaluates to the
  * serialized blob (BinaryType). Nulls are skipped (aggregate convention);
  * an all-null group yields a valid empty sketch blob. */
case class CmsSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends CmsAggLike with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (CmsFunctions.keyTypeOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_sketch_agg needs a BIGINT/INT/STRING key, got ${child.dataType.sql}")
  override def prettyName: String = "cms_sketch_agg"

  override def update(buffer: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v != null) CmsFunctions.addTo(buffer, v)
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketchAgg =
    copy(child = newChild)
}

/** Merges stored CMS blobs (BinaryType column of [[CmsSketchAgg]] outputs)
  * into one sketch; evaluates to the merged blob. Counter addition makes
  * this exact over the blobs: merging day sketches IS the month sketch. */
case class CmsUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends CmsAggLike with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_union_agg needs a BINARY blob input, got ${child.dataType.sql}")
  override def prettyName: String = "cms_union_agg"

  override def update(buffer: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v != null) buffer.mergeInPlace(
      CountMinSketch.readFrom(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsUnionAgg =
    copy(child = newChild)
}

/** Scalar point-frequency query over a stored CMS blob:
  * `cms_estimate(blob, key)` → estimated count (LongType, ≥ the true
  * count). Runs on post-aggregation rows (one per group × probe), so
  * CodegenFallback costs nothing measurable. */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && CmsFunctions.keyTypeOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_estimate needs (BINARY, BIGINT/INT/STRING), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "cms_estimate"

  override protected def nullSafeEval(blob: Any, key: Any): Any = {
    val sk = CountMinSketch.readFrom(blob.asInstanceOf[Array[Byte]])
    CmsFunctions.estimateFrom(sk, key)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
