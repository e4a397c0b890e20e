package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeReference, Descending, EqualTo, Expression, GenericInternalRow, JoinedRow, LessThan, LessThanOrEqual, Literal, RowNumber, SortOrder, UnsafeProjection, WindowExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.expressions.AttributeSet
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, UnaryNode, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Per-key top-k as a first-class operator — the extension ladder's
  * rung (c): custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`
  * (+ an opt-in `Rule[LogicalPlan]`), registered through
  * `spark.experimental` / [[graft.functions.GraftExtensions]].
  *
  * Spark executes `row_number() OVER (PARTITION BY k ORDER BY o) <= n`
  * as a full sort of every key group (Exchange → Sort → Window →
  * Filter). This operator keeps a bounded k-heap per key instead:
  *
  *  - a PARTIAL pass on each input partition keeps at most k rows per
  *    (partition-local) key — O(n log k) work, and the shuffle that
  *    follows carries at most `keys × k` rows per input partition
  *    instead of the whole table (the 100 TB win: shuffle volume is
  *    bounded by the answer size, like map-side combine for top-k);
  *  - a FINAL pass after the hash exchange merges the survivors and
  *    emits each key's rows in order with their rank.
  *
  * Rank semantics are `row_number` (ties broken by heap comparison
  * order) — deterministic exactly when the sort order is total, the
  * same contract every oracled rank query in this repo already
  * follows.
  *
  * Relationship to Spark's own machinery: since 3.5 the optimizer
  * inserts `WindowGroupLimit` for this shape, which bounds how many
  * rows per group REACH the window but still sorts every group
  * (Sort → limit → Exchange → Sort → Window → Filter). The heap
  * operator subsumes it — no Sort appears anywhere in the plan, and
  * per-partition work drops from O(n log n) to O(n log k). The
  * opt-in rewrite unwraps an already-inserted WindowGroupLimit.
  */
case class TopKPerKeyNode(
    k: Int,
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"top-k needs k >= 1, got $k")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    k: Int,
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    rankAttr: Attribute,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

  override def producedAttributes: AttributeSet =
    if (partial) AttributeSet.empty else AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else if (partitionExprs.isEmpty) Seq(AllTuples)
    else Seq(ClusteredDistribution(partitionExprs))

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(partitionExprs, child.output)
      val ord = GenerateOrdering.generate(order, child.output)
      // Worst row on top so a better candidate evicts it in O(log k).
      val cmp = ord.reverse.asInstanceOf[java.util.Comparator[InternalRow]]
      val heaps =
        new java.util.HashMap[InternalRow, java.util.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        var h = heaps.get(key)
        if (h == null) {
          h = new java.util.PriorityQueue[InternalRow](k, cmp)
          heaps.put(key.copy(), h)
        }
        if (h.size < k) h.add(row.copy())
        else if (ord.compare(row, h.peek) < 0) { h.poll(); h.add(row.copy()) }
      }
      import scala.jdk.CollectionConverters._
      if (partial) {
        heaps.values.asScala.iterator.flatMap(_.iterator.asScala)
      } else {
        val toUnsafe = UnsafeProjection.create(output, output)
        val joined = new JoinedRow
        val rankRow = new GenericInternalRow(1)
        heaps.values.asScala.iterator.flatMap { h =>
          h.asScala.toArray.sorted(ord).iterator.zipWithIndex.map {
            case (row, i) =>
              rankRow.setInt(0, i + 1)
              toUnsafe(joined(row, rankRow))
          }
        }
      }
    }, preservesPartitioning = true)

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Plans [[TopKPerKeyNode]] as partial → (exchange via
  * EnsureRequirements) → final.
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(k, part, order, rank, child) =>
      val partial =
        TopKPerKeyExec(k, part, order, rank, partial = true, planLater(child))
      TopKPerKeyExec(k, part, order, rank, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** Opt-in optimizer rule (`spark.graft.topk.rewrite=true`): rewrites
  * the `Filter(rn <= k)` over a lone `row_number()` window — the
  * shape every "top-k per group" query takes — into
  * [[TopKPerKeyNode]], preserving the rank attribute's identity so
  * downstream references stay valid. Conservative by construction:
  * only a single-window-expression `RowNumber` with a rank-only
  * predicate matches; everything else is left untouched.
  */
object TopKRewrite extends Rule[LogicalPlan] {
  private def limitOf(cond: Expression, rank: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(n: Int, IntegerType)) if a.semanticEquals(rank) => Some(n)
    case LessThan(a: Attribute, Literal(n: Int, IntegerType)) if a.semanticEquals(rank) => Some(n - 1)
    case EqualTo(a: Attribute, Literal(1, IntegerType)) if a.semanticEquals(rank) => Some(1)
    case _ => None
  }

  private object RankWindow {
    def unapply(w: Window): Option[(Attribute, Seq[Expression], Seq[SortOrder], LogicalPlan)] =
      w match {
        case Window(Seq(a @ Alias(WindowExpression(_: RowNumber, spec), _)), part, order, child, _) =>
          // Spark 3.5+'s InferWindowGroupLimit may already have
          // inserted a (sort-based) WindowGroupLimit below the
          // window; the heap operator subsumes it, so unwrap.
          val base = child match {
            case WindowGroupLimit(p, o, _, _, grandchild)
                if p == part && o == order => grandchild
            case other => other
          }
          Some((a.toAttribute, part, order, base))
        case _ => None
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.topk.rewrite", "false").toBoolean) plan
    else plan.transformUp {
      case Filter(cond, w @ RankWindow(rank, part, order, child))
          if limitOf(cond, rank).exists(_ >= 1) =>
        TopKPerKeyNode(limitOf(cond, rank).get, part, order, rank, child)
      case Filter(cond, Project(projList, w @ RankWindow(rank, part, order, child)))
          if limitOf(cond, rank).exists(_ >= 1) &&
            projList.forall(_.isInstanceOf[Attribute]) =>
        Project(projList,
          TopKPerKeyNode(limitOf(cond, rank).get, part, order, rank, child))
    }
}

/** DataFrame-level entry point (the library surface). */
object TopK {
  /** Top-k rows per key with an appended integer rank column.
    * `orderCols` are (name, ascending) pairs and should form a total
    * order for deterministic results (same contract as row_number).
    */
  def perKey(
      df: DataFrame,
      partCols: Seq[String],
      orderCols: Seq[(String, Boolean)],
      k: Int,
      rankName: String = "rnk"): DataFrame = {
    val spark = df.sparkSession
    register(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output
      .find(a => spark.sessionState.conf.resolver(a.name, n))
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val order = orderCols.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    val rank = AttributeReference(rankName, IntegerType, nullable = false)()
    GraftPlanBridge.ofRows(spark,
      TopKPerKeyNode(k, partCols.map(attr), order, rank, analyzed))
  }

  /** Idempotently add the strategy (and the opt-in rule) to a
    * session's experimental methods.
    */
  def register(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    if (!spark.experimental.extraOptimizations.contains(TopKRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKRewrite
  }
}
