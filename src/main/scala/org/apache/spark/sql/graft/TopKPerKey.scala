package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Custom whole-operator extension (the (c) tier of the custom-op ladder:
  * LogicalPlan + Strategy + SparkPlan): top-k rows per key with dense ranks,
  * executed as BOUNDED PER-KEY HEAPS instead of Window's sort-the-whole-
  * partition. The window form (`row_number ... filter rk <= k`) sorts every
  * group's full row set; this operator keeps at most k rows per key in
  * memory per partition — at 100 TB with millions of rows per key, that is
  * the difference between a full sort-spill and a fixed-size heap.
  *
  * Declared as `q_topk_custom`; semantics (and the DuckDB oracle) are
  * identical to the window form, which is what makes it checkable. Heap
  * memory is bounded per key but not in keys — past
  * `spark.graft.topk.maxHeapKeys` distinct keys per partition the operator
  * falls back to a spill-capable external sort (see [[TopKPerKeyExec]]'s
  * memory envelope), so extreme key cardinality degrades gracefully
  * instead of OOMing.
  */
case class TopKPerKey(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
                      rkAttr: Attribute, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rkAttr
  override def producedAttributes: AttributeSet = AttributeSet(rkAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

case class TopKPerKeyExec(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
                          rkAttr: Attribute, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rkAttr
  override def producedAttributes: AttributeSet = AttributeSet(rkAttr)

  /** Ask the planner to hash-partition input by the key — every group lands
    * whole on one partition, so per-partition heaps are globally correct. */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(keys))

  /** Memory envelope: the fast path holds ≤ k rows per DISTINCT KEY in the
    * partition — bounded per key, unbounded in keys. Past
    * `spark.graft.topk.maxHeapKeys` distinct keys (default 1M, the
    * narrow-row proxy) OR `spark.graft.topk.maxHeapBytes` retained bytes
    * (default 256 MB, exact — key copies + heap rows, maintained
    * incrementally, the guard that fires first on WIDE rows) the partition
    * FALLS BACK to a spill-capable external sort by (key, order) and
    * streams ranks off the sorted run — the heaps' surviving candidates
    * (discarded rows can never re-enter a top-k) plus all unread rows are
    * fed to the sorter, so the switch is mid-stream and loses nothing. A
    * billion-user top-3 therefore degrades to Window-like sort-spill
    * behavior instead of OOM — this matters doubly because
    * [[TopKRewriteRule]] routes users' plain window idiom here without
    * them choosing the operator. */
  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val maxHeapKeys =
      conf.getConfString("spark.graft.topk.maxHeapKeys", "1000000").toInt
    // exact byte envelope alongside the key-count proxy: wide rows hit
    // memory long before a count threshold sized for narrow ones
    val maxHeapBytes =
      conf.getConfString("spark.graft.topk.maxHeapBytes", (256L << 20).toString).toLong
    child.execute().mapPartitionsInternal { rows =>
      val keyProj = UnsafeProjection.create(keys, childOutput)
      val ordering = new LazilyGeneratedOrdering(order, childOutput)
      // heap keeps the k SMALLEST under `ordering` (= the top-k of the
      // requested sort, since SortOrder already encodes asc/desc)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      val reverse = ordering.reverse // max-heap on "worst kept row" at head
      var overflowRow: UnsafeRow = null // first row past the key threshold
      var retained = 0L // bytes held across key copies + heap rows
      var bytesExceeded = false
      while (rows.hasNext && overflowRow == null && !bytesExceeded) {
        val row = rows.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          if (heaps.size() >= maxHeapKeys) {
            overflowRow = row.copy().asInstanceOf[UnsafeRow]
          } else {
            val keyCopy = key.copy()
            retained += keyCopy.getSizeInBytes
            heap = new java.util.PriorityQueue[UnsafeRow](k + 1, reverse)
            heaps.put(keyCopy, heap)
          }
        }
        if (heap != null) {
          if (heap.size < k) {
            val c = row.copy().asInstanceOf[UnsafeRow]
            retained += c.getSizeInBytes
            heap.add(c)
          } else if (ordering.compare(row, heap.peek()) < 0) {
            retained -= heap.poll().getSizeInBytes
            val c = row.copy().asInstanceOf[UnsafeRow]
            retained += c.getSizeInBytes
            heap.add(c)
          }
          if (retained >= maxHeapBytes) bytesExceeded = true
        }
      }
      val outProj = UnsafeProjection.create(output, output)
      val joined = new JoinedRow
      val rkRow = new GenericInternalRow(1)
      import scala.jdk.CollectionConverters._
      if (overflowRow == null && !bytesExceeded) {
        heaps.values().iterator().asScala.flatMap { heap =>
          val sorted = heap.asScala.toArray.sorted(ordering)
          sorted.iterator.zipWithIndex.map { case (row, i) =>
            rkRow.setLong(0, i + 1L)
            outProj(joined(row, rkRow))
          }
        }
      } else {
        // Sort-based fallback: external sort by (key asc, order), then a
        // single streaming pass counting ranks per key group. Group change
        // is detected with a key-only comparator (consistent with the sort
        // order by construction, unlike raw key-byte equality).
        import org.apache.spark.sql.catalyst.expressions.Ascending
        import org.apache.spark.util.collection.ExternalSorter
        val keySort = keys.map(SortOrder(_, Ascending))
        val fullCmp = new LazilyGeneratedOrdering(keySort ++ order, childOutput)
        val keyCmp = new LazilyGeneratedOrdering(keySort, childOutput)
        val taskCtx = org.apache.spark.TaskContext.get()
        val sorter = new ExternalSorter[UnsafeRow, Boolean, Boolean](
          taskCtx, None, None,
          Some(new Ordering[UnsafeRow] {
            override def compare(a: UnsafeRow, b: UnsafeRow): Int =
              fullCmp.compare(a, b)
          }))
        // Metrics + cleanup are bound to TASK completion, not iterator
        // exhaustion (the BlockStoreShuffleReader discipline): a limit/
        // take/cancel that abandons the iterator mid-stream would
        // otherwise leak the sorter's spill files until executor
        // shutdown. stop() is idempotent and the spill counters stay
        // readable after it, so the eager stop below double-calls safely.
        if (taskCtx != null) taskCtx.addTaskCompletionListener[Unit] { _ =>
          taskCtx.taskMetrics().incMemoryBytesSpilled(sorter.memoryBytesSpilled)
          taskCtx.taskMetrics().incDiskBytesSpilled(sorter.diskBytesSpilled)
          taskCtx.taskMetrics().incPeakExecutionMemory(sorter.peakMemoryUsedBytes)
          sorter.stop()
        }
        val kept = heaps.values().iterator().asScala
          .flatMap(_.asScala.iterator) // already owned copies
        // key-count overflow carries one unconsumed pending row; the byte
        // overflow consumed its last row into a heap, so there is none
        val rest = Option(overflowRow).iterator ++
          rows.map(_.copy().asInstanceOf[UnsafeRow])
        sorter.insertAll((kept ++ rest).map((_, true)))
        heaps.clear()
        var prevKey: UnsafeRow = null
        var rank = 0L
        val ranked = sorter.iterator.flatMap { case (row, _) =>
          if (prevKey == null || keyCmp.compare(row, prevKey) != 0) {
            rank = 1L
            prevKey = row.copy() // sorter may reuse deserialized buffers
          } else rank += 1L
          if (rank <= k) {
            rkRow.setLong(0, rank)
            Iterator.single(outProj(joined(row, rkRow)))
          } else Iterator.empty
        }
        org.apache.spark.util.CompletionIterator[InternalRow, Iterator[InternalRow]](
          ranked, sorter.stop()) // eager release on full consumption;
                                 // metrics land via the task listener
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, keys, order, rk, child) =>
      TopKPerKeyExec(k, keys, order, rk, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule completing the custom-operator ladder: users write the
  * UNIVERSAL form — `row_number() OVER (PARTITION BY … ORDER BY …)` then
  * `filter(rk <= k)` — and this rule rewrites the analyzed
  * Filter-over-Window pattern into [[TopKPerKey]], swapping Window's
  * full-partition sort for bounded per-key heaps without the user naming
  * the custom operator at all. Deliberately conservative: it fires ONLY
  * when the Window carries exactly one expression, that expression is
  * `row_number()` with the canonical running frame, the ORDER BY is
  * non-empty, and the filter is a bare `rk <= lit` / `rk < lit` /
  * `rk = 1` on the rank output — anything else (rank/dense_rank, compound
  * predicates, frame variants) is left for Spark's own
  * InferWindowGroupLimit. If that rule got there first, its
  * WindowGroupLimit wrapper is unwrapped (it only pre-prunes rows this
  * operator drops anyway, but would plan a redundant sort). The rank
  * column keeps its original exprId and IntegerType via a casting
  * projection, so downstream references never notice the swap. Tie
  * caveat: like `row_number` itself, result sets are only deterministic
  * when the ordering is total — the rewrite preserves the ordering
  * verbatim, so it never changes which caveat applies. */
object TopKRewriteRule
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Alias, Cast, EqualTo,
    ExprId, LessThan, LessThanOrEqual, Literal, NamedExpression, RowNumber,
    RowFrame, SpecifiedWindowFrame, UnboundedPreceding, CurrentRow,
    WindowExpression, WindowSpecDefinition}
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project,
    Window, WindowGroupLimit}
  import org.apache.spark.sql.types.IntegerType

  /** The filter's rank bound, ONLY when it is a genuine k >= 1 — every
    * branch carries an explicit positivity guard BEFORE any arithmetic:
    * `rk < Int.MinValue` would otherwise wrap v−1 to Int.MaxValue and a
    * provably-empty filter would rewrite into a crashing k (review r8). */
  private def bound(cond: Expression, rk: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType))
      if a.exprId == rk && v >= 1 => Some(v)
    case LessThan(a: Attribute, Literal(v: Int, IntegerType))
      if a.exprId == rk && v >= 2 => Some(v - 1)
    case EqualTo(a: Attribute, Literal(v: Int, IntegerType))
      if a.exprId == rk && v == 1 => Some(1)
    // the long-rank idiom: `row_number().over(w).cast("long")` then
    // `filter(rk <= 3)` — the int literal arrives promoted to long
    case LessThanOrEqual(a: Attribute, Literal(v: Long, LongType))
      if a.exprId == rk && v >= 1L && v <= Int.MaxValue => Some(v.toInt)
    case LessThan(a: Attribute, Literal(v: Long, LongType))
      if a.exprId == rk && v >= 2L && v <= Int.MaxValue => Some(v.toInt - 1)
    case EqualTo(a: Attribute, Literal(v: Long, LongType))
      if a.exprId == rk && v == 1L => Some(1)
    case _ => None
  }

  /** The single canonical row_number window expression, or None. The
    * partitionSpec must be NON-EMPTY: TopKPerKeyExec asks the planner for
    * ClusteredDistribution(keys), which rejects Nil — a global top-k
    * (no PARTITION BY) belongs to TakeOrderedAndProject, not this
    * operator (review r8: the unguarded form crashed planning). */
  private def rankAlias(w: Window): Option[Alias] = w.windowExpressions match {
    case Seq(alias @ Alias(WindowExpression(_: RowNumber,
        WindowSpecDefinition(part, order,
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _))
        if order.nonEmpty && part.nonEmpty => Some(alias)
    case _ => None
  }

  private def realChild(w: Window): LogicalPlan = w.child match {
    case wgl: WindowGroupLimit => wgl.child // its pre-sort is redundant here
    case c => c
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // bare form: Filter directly over the Window
    case f @ Filter(cond, w: Window) =>
      rankAlias(w) match {
        case Some(alias) =>
          bound(cond, alias.exprId) match {
            case Some(k) if k >= 1 =>
              val child = realChild(w)
              val rkLong =
                AttributeReference("rk", LongType, nullable = false)()
              Project(
                child.output :+
                  Alias(Cast(rkLong, IntegerType), alias.name)(alias.exprId),
                TopKPerKey(k, w.partitionSpec, w.orderSpec, rkLong, child))
            case _ => f
          }
        case _ => f
      }
    // cast form: Filter over Project(..., cast(rank as long), ...) over
    // Window — the library's own idiom (BIGINT ranks for oracle parity).
    // Every non-rank projection must be a bare pass-through attribute, so
    // substituting the rank column is the only rewrite the Project needs.
    case f @ Filter(cond, p @ Project(projList, w: Window)) =>
      rankAlias(w) match {
        case Some(alias) =>
          val castAlias = projList.collectFirst {
            case ca @ Alias(c: Cast, _)
              if c.dataType == LongType &&
                (c.child match {
                  case a: Attribute => a.exprId == alias.exprId
                  case _ => false
                }) => ca
          }
          val othersPassThrough = projList.forall {
            case _: Attribute => true
            case ca: Alias => castAlias.exists(_.exprId == ca.exprId)
            case _ => false
          }
          castAlias match {
            case Some(ca) if othersPassThrough =>
              bound(cond, ca.exprId) match {
                case Some(k) if k >= 1 =>
                  val child = realChild(w)
                  val rkLong =
                    AttributeReference("rk", LongType, nullable = false)()
                  // A bare Attribute can be the Window's OWN rank output
                  // (idiom: withColumn("rk", row_number...) then
                  // withColumn("rkl", $"rk".cast("long")).filter($"rkl"<=k)).
                  // The Window is dropped, so that attribute must be
                  // re-derived from rkLong — passing it through untouched
                  // left a dangling reference that failed binding (ADVICE r8).
                  val newProj: Seq[NamedExpression] = projList.map {
                    case a: Attribute if a.exprId == alias.exprId =>
                      Alias(Cast(rkLong, IntegerType), a.name)(a.exprId)
                    case a: Attribute => a
                    case _ => Alias(rkLong, ca.name)(ca.exprId)
                  }
                  Project(newProj,
                    TopKPerKey(k, w.partitionSpec, w.orderSpec, rkLong, child))
                case _ => f
              }
            case _ => f
          }
        case _ => f
      }
  }
}

object TopKPerKey {
  /** Top-k rows per key with a `rk` rank column appended. Key/order columns
    * are named and resolved directly against the child's analyzed output
    * (a Column's lazy node would reach execution unresolved inside a custom
    * plan). `orderBy` pairs are (column, ascending?). Installs
    * [[TopKStrategy]] into the session (idempotent). */
  def topKPerKey(df: DataFrame, k: Int, keys: Seq[String],
                 orderBy: Seq[(String, Boolean)]): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    frameOnly(df, k, keys, orderBy)
  }

  /** [[topKPerKey]] WITHOUT the strategy side-registration — for sessions
    * wired through `GraftExtensions` (injectPlannerStrategy), where
    * registering again would mask whether the extension path works. */
  def frameOnly(df: DataFrame, k: Int, keys: Seq[String],
                orderBy: Seq[(String, Boolean)]): DataFrame = {
    val spark = df.sparkSession
    val child = df.queryExecution.analyzed
    def attr(name: String): Attribute = child.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column $name not in [${child.output.map(_.name).mkString(", ")}]"))
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}
    val node = TopKPerKey(
      k,
      keys.map(attr),
      orderBy.map { case (name, asc) =>
        SortOrder(attr(name), if (asc) Ascending else Descending)
      },
      AttributeReference("rk", LongType, nullable = false)(),
      child)
    Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], node)
  }
}
