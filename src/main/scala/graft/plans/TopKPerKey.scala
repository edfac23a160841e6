package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, AttributeSet, Descending, Expression,
  GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.IntegerType

/** Whole-operator extension, part 2 of the catalog (after the
  * [[BinRangeJoin]] logical rewrite): a custom LogicalPlan +
  * SparkStrategy + physical SparkPlan, planned through
  * `SparkSessionExtensions` / `experimental.extraStrategies`.
  *
  * Bounded top-k per key. The DataFrame idiom —
  * `row_number().over(Window.partitionBy(key).orderBy(o)) <= k` —
  * SORTS every partition's full row set to keep k of them: at 100 TB
  * that is a full shuffle + per-key sort of everything, k/n of which
  * survives. This operator keeps a size-k bounded heap per key inside
  * each post-shuffle partition instead: one pass, O(rows · log k)
  * comparisons, memory k·|keys-per-partition| rows, spill-free for
  * the k's this is meant for (top-3 products per segment, not
  * top-1M). Same clustered distribution requirement as the window —
  * EnsureRequirements inserts the one shuffle — but no sort ever
  * materializes.
  *
  * Semantics contract: `order` must be a total order (add a unique
  * tiebreaker, exactly as the window twin needs for determinism);
  * ranks are then 1..k dense per key, identical to the
  * `row_number() <= k` filter — q_topk_grouped_native shares its
  * oracle with that formulation, and PlanSpec pins plan + parity. */
case class TopKPerKey(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rank is GENERATED here, not consumed — without this the analyzer
  // counts it among references and fails MISSING_ATTRIBUTES
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKPerKey {
  /** Session conf key bounding distinct keys held per partition (the
    * heap map has no spill path — see [[TopKPerKeyExec.doExecute]]).
    * Default 4M keys: at k=3 small rows that is ~hundreds of MB, the
    * edge of sane for an executor; past it the window idiom wins. */
  val MaxKeysPerPartitionKey = "spark.graft.topk.maxKeysPerPartition"

  /** Column-API entry point; registers the strategy in the session
    * (the runtime path — cluster deployments get it from
    * `spark.sql.extensions=graft.plans.GraftExtensions`). */
  def topKPerKey(df: DataFrame, keys: Seq[String],
                 order: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(k > 0, s"topKPerKey needs k > 0, got $k")
    require(keys.nonEmpty && order.nonEmpty, "topKPerKey needs keys and an order")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    // catalyst UnresolvedAttributes, NOT Columns: a Spark-4 Column
    // wraps an api-agnostic ColumnNode the generic analyzer rules
    // won't unwrap inside a custom operator
    val sortOrders = order.map { case (name, desc) =>
      SortOrder(UnresolvedAttribute.quoted(name), if (desc) Descending else Ascending)
    }
    val rankAttr = AttributeReference("rank", IntegerType, nullable = false)()
    Bridge.ofRows(spark, TopKPerKey(
      keys.map(UnresolvedAttribute.quoted), sortOrders, k, rankAttr, Bridge.plan(df)))
  }
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(g, o, k, rank, child) =>
      TopKPerKeyExec(g, o, k, rank, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  // rows of one key must meet in one partition; EnsureRequirements
  // plans the single shuffle (or reuses an existing partitioning)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    // locals only: capturing `this` would drag the SparkPlan tree
    // into the task closure
    val (g, ord, kk, schema, out) = (groupExprs, order, k, child.output, output)
    // the heap map pins k rows per DISTINCT key with no spill path —
    // that is the whole point (no sort, no spill machinery), so
    // high-cardinality misuse must fail predictably, not OOM an
    // executor. Cap resolved at plan time from the session conf.
    val maxKeys = conf.getConfString(
      TopKPerKey.MaxKeysPerPartitionKey, "4000000").toLong
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(g, schema)
      val rowOrd = RowOrdering.create(ord, schema)
      // max-heap under the sort order: head is the WORST row kept for
      // its key, so admission is a single head comparison
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        // probe with the projection's reused buffer; copy the key only
        // on first sight — copying per row is pure GC churn when keys
        // repeat millions of times
        val probe = keyProj(row)
        val heap = heaps.get(probe) match {
          case Some(h) => h
          case None =>
            if (heaps.size >= maxKeys)
              throw new IllegalStateException(
                s"topKPerKey: more than $maxKeys distinct keys in one " +
                  "partition — the bounded-heap operator holds k rows per " +
                  "key in memory with no spill path. For high-cardinality " +
                  "keys use the row_number() window idiom (which spills its " +
                  "sort), repartition to more partitions, or raise " +
                  s"${TopKPerKey.MaxKeysPerPartitionKey}.")
            val h = mutable.PriorityQueue.empty(rowOrd)
            heaps.put(probe.copy(), h); h
        }
        if (heap.size < kk) heap.enqueue(row.copy())
        else if (rowOrd.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      // downstream exchanges serialize UnsafeRows — flatten the
      // (row, rank) JoinedRow through an unsafe projection
      val outProj = UnsafeProjection.create(out.map(_.dataType).toArray)
      heaps.valuesIterator.flatMap { heap =>
        // dequeueAll drains worst-first; reversed = rank order
        val ranked: Seq[InternalRow] = heap.dequeueAll.reverse
        ranked.iterator.zipWithIndex.map { case (r: InternalRow, i: Int) =>
          outProj(new JoinedRow(r, new GenericInternalRow(Array[Any](i + 1)))): InternalRow
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
