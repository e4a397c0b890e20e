package graft.plans

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}

/** Physical-plan shape probes shared by the oracled registry entries
  * and the test suite — one definition so "no shuffle" means the same
  * thing in both (ADVICE r10: the walker was duplicated between
  * `Maintenance.exchangeCount` and `SpjSpec.shuffles`, and a fix to
  * the AQE unwrapping in one would silently diverge from the other).
  */
object PlanShape {

  /** Shuffle-exchange count in the FINAL physical plan, descending
    * into the AQE wrapper and query stages — a plain collect on
    * `executedPlan` sees only the `AdaptiveSparkPlanExec` leaf and
    * reads 0 for ANY plan, making a "no shuffle" claim vacuous
    * (code-review r10 finding). Call AFTER the query materialized,
    * or the AQE wrapper reports its initial (un-executed) plan.
    */
  def exchangeCount(p: SparkPlan): Int = {
    val here = p match {
      case _: ShuffleExchangeExec => 1
      // A reused exchange is a LEAF wrapping a shuffle planned
      // elsewhere — data still crosses a shuffle boundary at this
      // point, so a "no shuffle here" claim must count it (a reused
      // shuffle below a join would otherwise pass the SPJ gates
      // vacuously; code-review r11 finding).
      case r: ReusedExchangeExec => r.child match {
        case _: ShuffleExchangeExec => 1
        case _ => 0
      }
      case _ => 0
    }
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    here + kids.map(exchangeCount).sum
  }

  private def kidsOf(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case q: QueryStageExec => Seq(q.plan)
    case other => other.children
  }

  /** Shuffle exchanges UNDER the topmost join node — the "scan sides
    * never shuffled" claim for plans that legitimately shuffle ABOVE
    * the join (a re-keyed aggregate, a final ORDER BY). None when the
    * plan has no join.
    */
  def exchangesBelowJoin(p: SparkPlan): Option[Int] = {
    val isJoin = p.nodeName.contains("Join")
    if (isJoin) Some(kidsOf(p).map(exchangeCount).sum)
    else kidsOf(p).flatMap(exchangesBelowJoin).reduceOption(_ + _)
  }
}
