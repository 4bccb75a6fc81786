package graft.sources

import java.util

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic customer-record generator as a full DataSource V2 — the
  * custom rung of the SOURCE tier, completing the ladder the operator side
  * finished with `TopKPerKey` (expression → aggregator → plan → strategy →
  * rule → extension; now also: table provider → scan builder → pushdown →
  * partition planning → reader).
  *
  * This is the Spark-native shape of the reference's MongoDB source:
  * `load_data_from_mongo()` issues `collection.find({}, projection)` — a
  * server-side SELECTION and PROJECTION (`app_test.py:36-57`). In DSv2
  * those become [[SupportsPushDownFilters]] (the `find` filter document)
  * and [[SupportsPushDownRequiredColumns]] (the projection): Catalyst
  * pushes both into the scan, and the source honours them BEFORE data is
  * materialized — id-range predicates prune whole input partitions at
  * planning time (the analog of Mongo hitting the `_id` index) and the
  * reader computes only the requested columns. At 100 TB the same contract
  * is what keeps an external-system scan from shipping the whole
  * collection: selection and projection travel to the data, not the other
  * way round.
  *
  * Rows derive from `id` by pure integer arithmetic (no RNG state), so any
  * engine can reproduce the table exactly — the DuckDB oracle rebuilds it
  * from `range(n)` and must hash-match, making this the rare custom-source
  * query with a full value-level oracle rather than a rows-only check.
  */
object GenSource {
  val ShortName = "graft-gen"

  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("age", LongType, nullable = false),
    StructField("gender", StringType, nullable = false),
    StructField("tenure", LongType, nullable = false),
    StructField("spend", DoubleType, nullable = false),
    StructField("plan", StringType, nullable = false),
    // the storage-partition key, materialized as a real column so the
    // reported KeyGroupedPartitioning can use an IDENTITY transform — a
    // standalone TableProvider has no FunctionCatalog, so a bucket()
    // transform cannot be resolved by V2ExpressionUtils (catalog sources
    // like Iceberg provide it; here the precomputed column is the
    // equivalent layout contract)
    StructField("bucket", LongType, nullable = false)))

  private val genders = Array("Female", "Male").map(UTF8String.fromString)
  private val plans = Array("Basic", "Standard", "Premium").map(UTF8String.fromString)

  /** Column generators, indexed by field name. Mirrored EXACTLY by the
    * `q_gen_source` oracle SQL — change one, change both. */
  private[graft] def gen(field: String, slices: Int = 8): Long => Any = field match {
    case "id" => id => id
    case "age" => id => 18L + (id * 37L) % 83L
    case "gender" => id => genders((id % 2L).toInt)
    case "tenure" => id => (id * 13L) % 73L
    case "spend" => id => ((id * 97L) % 100000L).toDouble / 100.0
    case "plan" => id => plans((id % 3L).toInt)
    case "bucket" => id => id % slices
  }

  /** Intersect the pushed id predicates with [0, rows) → the surviving
    * id half-open range. Distinct from row-level evaluation: this is what
    * PRUNES partitions at planning time. */
  private[sources] def idRange(rows: Long, pushed: Seq[Filter]): (Long, Long) = {
    var lo = 0L
    var hi = rows
    pushed.foreach {
      case GreaterThan("id", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, v + 1)
      case EqualTo("id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case IsNotNull("id") => // id is never null
      case f => throw new IllegalStateException(s"unpushable filter retained: $f")
    }
    (lo, math.max(lo, hi))
  }

  /** Which filters the source accepts. Only id predicates (the indexed
    * key); everything else stays Spark-side — the same division a Mongo
    * scan makes between an indexed `_id` range and a collection scan. */
  private[sources] def pushable(f: Filter): Boolean = f match {
    case GreaterThan("id", _: Long) | GreaterThanOrEqual("id", _: Long) |
         LessThan("id", _: Long) | LessThanOrEqual("id", _: Long) |
         EqualTo("id", _: Long) | IsNotNull("id") => true
    case _ => false
  }
}

class GenDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = GenSource.ShortName
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = GenSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GenTable(
      Option(properties.get("rows")).map(_.toLong).getOrElse(100000L),
      Option(properties.get("slices")).map(_.toInt).getOrElse(8),
      Option(properties.get("layout")).getOrElse("range"))
}

class GenTable(rows: Long, slices: Int, layout: String = "range")
    extends Table with SupportsRead {
  override def name(): String = s"${GenSource.ShortName}($rows)"
  override def schema(): StructType = GenSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(rows, slices, layout)
}

class GenScanBuilder(rows: Long, slices: Int, layout: String = "range")
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit
    with org.apache.spark.sql.connector.read.SupportsPushDownTopN {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = GenSource.schema
  private var aggFuncs: Array[AggregateFunc] = Array.empty
  private var limit: Option[Int] = None
  private var limitDesc = false

  /** LIMIT / TopN-on-id pushdown — the row-reduction tier: a LIMIT n (or
    * ORDER BY id [DESC] LIMIT n) narrows the surviving id range to its
    * first (last) n ids BEFORE partition planning, so the scan reads n
    * rows, not the table. Declared PARTIAL (the default) on purpose:
    * Spark keeps its own sort/limit on top — the source only reduces
    * rows, it never takes over result ordering, which keeps the contract
    * airtight for the DESC case (readers emit ascending ids). Range
    * layout only: bucket partitions interleave the id space, so a range
    * cut would be wrong there. */
  override def pushLimit(n: Int): Boolean =
    layout == "range" && { limit = Some(n); true }

  // both parent traits carry this Java default; Scala requires one
  // explicit resolution — always PARTIAL, see the tier scaladoc above
  override def isPartiallyPushed(): Boolean = true

  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      n: Int): Boolean =
    layout == "range" && orders.length == 1 && (orders(0).expression() match {
      case r: NamedReference if r.fieldNames.sameElements(Array("id")) =>
        limit = Some(n)
        limitDesc = orders(0).direction() ==
          org.apache.spark.sql.connector.expressions.SortDirection.DESCENDING
        true
      case _ => false
    })

  /** Split: accepted id predicates are handled FULLY inside the source
    * (range intersection — no post-scan re-check needed), the rest are
    * returned so Spark evaluates them after the scan. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, residual) = filters.partition(GenSource.pushable)
    pushed = ours
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private def isId(f: AggregateFunc): Boolean = f match {
    case _: CountStar => true
    case m: Min => m.column() match {
      case r: NamedReference => r.fieldNames.sameElements(Array("id"))
      case _ => false
    }
    case m: Max => m.column() match {
      case r: NamedReference => r.fieldNames.sameElements(Array("id"))
      case _ => false
    }
    case _ => false
  }

  /** COMPLETE aggregate pushdown for the O(1)-answerable shapes —
    * ungrouped COUNT(*) / MIN(id) / MAX(id): the surviving id range [lo,
    * hi) answers all three at PLANNING time with zero rows generated (the
    * server-side `countDocuments`/aggregation-pipeline analog of the
    * reference's Mongo source). Anything else — grouping, or aggregates
    * over derived columns — returns false and Spark plans its own
    * aggregate over the ordinary scan; complete-only (no partial tier)
    * keeps the contract crisp: either the source owns the whole answer or
    * it stays out of the way. */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    agg.groupByExpressions().isEmpty && agg.aggregateExpressions().nonEmpty &&
      agg.aggregateExpressions().forall(isId)

  override def pushAggregation(agg: Aggregation): Boolean =
    supportCompletePushDown(agg) && {
      aggFuncs = agg.aggregateExpressions()
      required = StructType(aggFuncs.zipWithIndex.map {
        case (_: CountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
        case (_, i) => StructField(s"agg_$i", LongType, nullable = true)
      })
      true
    }

  override def build(): Scan =
    if (aggFuncs.nonEmpty) new GenAggScan(rows, required, pushed, aggFuncs)
    else new GenScan(rows, slices, required, pushed, layout, limit, limitDesc)
}

/** One-partition, one-row scan answering a completely-pushed aggregation
  * from the id-range arithmetic alone. */
class GenAggScan(rows: Long, out: StructType, pushed: Array[Filter],
    funcs: Array[AggregateFunc]) extends Scan with Batch {
  override def readSchema(): StructType = out
  override def toBatch: Batch = this
  override def description(): String = {
    val (lo, hi) = GenSource.idRange(rows, pushed)
    s"GenAggScan ids=[$lo,$hi) PushedAggregation: [${funcs.mkString(", ")}] " +
      s"PushedFilters: [${pushed.mkString(", ")}]"
  }
  override def planInputPartitions(): Array[InputPartition] =
    Array(GenInputPartition(0, 1)) // one synthetic row
  override def createReaderFactory(): PartitionReaderFactory = {
    val (lo, hi) = GenSource.idRange(rows, pushed)
    val values: Array[Any] = funcs.map {
      case _: CountStar => (hi - lo): java.lang.Long
      case _: Min => if (hi > lo) (lo: java.lang.Long) else null
      case _: Max => if (hi > lo) ((hi - 1): java.lang.Long) else null
      case f => throw new IllegalStateException(s"unsupported pushed agg: $f")
    }
    new GenAggReaderFactory(values)
  }
}

class GenAggReaderFactory(values: Array[Any]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = InternalRow.fromSeq(values.toSeq)
      override def close(): Unit = ()
    }
}

class GenScan(rows: Long, slices: Int, required: StructType, pushed: Array[Filter],
    layout: String = "range", limit: Option[Int] = None, limitDesc: Boolean = false)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  /** Post-pushdown statistics — rows surviving the pushed id range × the
    * pruned row width. Without this a DSv2 relation defaults to
    * `spark.sql.defaultSizeInBytes` (effectively "huge"), so a
    * genuinely-small scan side never auto-broadcasts and every join
    * against it pays a shuffle; with it, Catalyst's broadcast decision
    * and AQE's re-planning see the real size (spec: a small gen table
    * joins as BroadcastHashJoin with NO hint). Reported AFTER pushdown,
    * as the contract requires — a filtered scan reports the filtered
    * size. */
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics = {
    val (lo, hi) = effectiveRange
    val n = math.max(0L, hi - lo)
    // fixed-width longs/doubles + short dictionary strings: ~16 B/col is
    // the honest order of magnitude for this schema
    val width = 16L * math.max(1, required.fields.length)
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(n * width)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(n)
    }
  }

  /** STORAGE-PARTITIONED layout tier: with `layout=bucket` the id space is
    * partitioned by `id % slices` (a hash-bucket class per input
    * partition), each partition carries its bucket as a `HasPartitionKey`
    * row, and the scan reports `KeyGroupedPartitioning(bucket(slices,
    * id))`. Two bucket-layout tables joined on `id` then satisfy each
    * other's distribution WITHOUT a shuffle (Spark's storage-partitioned
    * join, `spark.sql.sources.v2.bucketing.enabled`) — the DSv2 form of
    * what Iceberg/Hive bucketing buys at 100 TB: co-located fact-fact
    * joins where neither side moves. `layout=range` keeps the contiguous
    * slices the static range-pruning tier exploits; the generators are
    * identical either way, only placement changes. */
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    if (layout == "bucket")
      new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
        Array(org.apache.spark.sql.connector.expressions.Expressions.identity(
          "bucket")), slices)
    else
      new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(slices)
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = {
    val (lo, hi) = effectiveRange
    s"GenScan rows=$rows ids=[$lo,$hi) cols=${required.fieldNames.mkString(",")} " +
      s"PushedFilters: [${pushed.mkString(", ")}] " +
      s"PushedLimit: ${limit.map(n => s"$n${if (limitDesc) " DESC" else ""}").getOrElse("none")}"
  }

  /** RUNTIME (dynamic) filtering — the third pushdown dimension after the
    * static filter/column tier and the aggregate tier: when this scan sits
    * under an equi-join on `id` whose other side is selective, Spark's
    * dynamic-partition-pruning machinery executes that side FIRST, hands
    * the observed join keys here as an `In` filter, and re-plans the input
    * partitions — so the fact scan reads only the slices the join can hit,
    * decided at RUN time from data no static optimizer could see. Contract
    * is best-effort (the join still verifies every row), so pruning only
    * needs slice granularity, never row granularity. */
  @volatile private var runtimeIds: Option[Set[Long]] = None

  /** Planned-partition count of the LAST planInputPartitions call —
    * spec-observable evidence that runtime pruning actually dropped
    * slices (GenSourceSpec asserts 16 → 1 under a slice-local dim). */
  @volatile private[graft] var lastPlanned: Int = -1

  override def filterAttributes(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("id"))

  override def filter(filters: Array[Filter]): Unit = {
    val sets = filters.collect {
      case org.apache.spark.sql.sources.In("id", vs) =>
        vs.collect { case l: Long => l }.toSet
      case EqualTo("id", v: Long) => Set(v)
    }
    if (sets.nonEmpty) runtimeIds = Some(sets.reduce(_ intersect _))
  }

  /** Partition pruning: slice the FULL id space evenly, then drop every
    * slice outside the pushed id range — the planning-time skip that makes
    * a selective key predicate cost O(selected), not O(table) — and, when
    * a runtime `In` set has arrived, every slice containing none of the
    * runtime join keys. */
  /** The pushed id range, additionally cut to the first (last) `limit`
    * ids when a LIMIT / TopN-on-id was pushed. */
  private def effectiveRange: (Long, Long) = {
    val (lo, hi) = GenSource.idRange(rows, pushed)
    limit match {
      case Some(n) if limitDesc => (math.max(lo, hi - n), hi)
      case Some(n) => (lo, math.min(hi, lo + n))
      case None => (lo, hi)
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val (lo, hi) = effectiveRange
    val parts = ArrayBuffer.empty[InputPartition]
    if (layout == "bucket") {
      // one partition per bucket CLASS (id % slices == b over the surviving
      // range); buckets are never dropped even when empty — the reported
      // KeyGroupedPartitioning must list every partition value
      var b = 0
      while (b < slices) {
        parts += GenBucketPartition(b, lo, hi, slices)
        b += 1
      }
    } else {
      val per = math.max(1L, (rows + slices - 1) / slices)
      var start = 0L
      while (start < rows) {
        val end = math.min(rows, start + per)
        val s = math.max(start, lo)
        val e = math.min(end, hi)
        val hit = s < e && runtimeIds.forall(_.exists(id => id >= s && id < e))
        if (hit) parts += GenInputPartition(s, e)
        start = end
      }
    }
    lastPlanned = parts.length
    parts.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GenReaderFactory(required.fieldNames, slices)
}

case class GenInputPartition(start: Long, end: Long) extends InputPartition

/** One hash-bucket class of the id space: ids in [start, end) with
  * id % step == bucket. Carries its bucket as the partition key so Spark
  * can align the two sides of a storage-partitioned join. */
case class GenBucketPartition(bucket: Int, start: Long, end: Long, step: Int)
    extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket.toLong)
}

class GenReaderFactory(fields: Array[String], slices: Int = 8)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case p: GenInputPartition =>
        new PartitionReader[InternalRow] {
          // Projection pushdown is real work-avoidance here: only the
          // requested columns' generators run, the rest are never computed.
          private val gens = fields.map(GenSource.gen(_, slices))
          private var id = p.start - 1
          override def next(): Boolean = { id += 1; id < p.end }
          override def get(): InternalRow = InternalRow.fromSeq(gens.map(g => g(id)).toSeq)
          override def close(): Unit = ()
        }
      case p: GenBucketPartition =>
        new PartitionReader[InternalRow] {
          private val gens = fields.map(GenSource.gen(_, slices))
          // first id >= start with id % step == bucket, then stride by step
          private var id = {
            val base = p.start + ((p.bucket - p.start % p.step) + p.step) % p.step
            base - p.step
          }
          override def next(): Boolean = { id += p.step; id < p.end }
          override def get(): InternalRow = InternalRow.fromSeq(gens.map(g => g(id)).toSeq)
          override def close(): Unit = ()
        }
    }
}
