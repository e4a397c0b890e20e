package graft.sources

import scala.util.Try

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.AliasIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewCatalog}

/** Analyzer-side resolution of GRAFT VIEWS (Iceberg's view face):
  * stock Spark 4.1 ships the DSv2 `ViewCatalog` INTERFACE but wires
  * neither DDL execution nor relation resolution to it — exactly the
  * gap Iceberg fills with its own session extensions. This rule is
  * that fill: an unresolved relation naming a stored view of a
  * [[GraftCatalog]] substitutes the view's definition SQL, parsed
  * and re-analyzed in place, so the view always reads the CURRENT
  * snapshot of its base tables. View-on-view nests naturally (the
  * substituted plan's inner view resolves on the next fixed-point
  * pass); cycles cannot be CREATED (a definition must plan — against
  * already-existing views only — at creation time), so resolution
  * terminates.
  *
  * Installed via `spark.sql.extensions=graft.sources.GraftSparkExtensions`.
  */
class ResolveGraftViews(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation =>
        viewPlanFor(u.multipartIdentifier).getOrElse(u)
    }

  private def viewPlanFor(parts: Seq[String]): Option[LogicalPlan] = {
    val cm = spark.sessionState.catalogManager
    val (catName, db, name) = parts match {
      case Seq(c, d, n) => (c, d, n)
      case Seq(d, n) => (cm.currentCatalog.name(), d, n)
      case _ => return None
    }
    val vc = Try(cm.catalog(catName)).toOption
      .collect { case g: GraftCatalog => g: ViewCatalog }
      .getOrElse(return None)
    val ident = Identifier.of(Array(db), name)
    if (!vc.viewExists(ident)) return None
    val v = vc.loadView(ident)
    // The stored SQL was validated (planned) at creation under
    // fully-qualified names, so it re-parses context-free here.
    Some(SubqueryAlias(
      AliasIdentifier(name, Seq(catName, db)),
      spark.sessionState.sqlParser.parsePlan(v.query())))
  }
}

/** The graft session extensions: installs [[ResolveGraftViews]].
  * `spark.sql.extensions=graft.sources.GraftSparkExtensions`.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectResolutionRule(s => new ResolveGraftViews(s))
}
