package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewCatalog}

/** Session extensions for the graft engine, registered via
  *
  *   spark.sql.extensions = graft.plans.GraftExtensions
  *
  * Currently one rule: V2 view resolution. Spark 4.1 ships the
  * connector-side [[ViewCatalog]] API but does NOT consult it anywhere
  * in the analyzer (RelationResolution only calls `loadTable`; CREATE
  * VIEW on a non-session catalog fails with MISSING_CATALOG_ABILITY) —
  * engines that serve V2 views (Iceberg's Nessie/REST catalogs are the
  * public precedent) wire resolution in exactly this way, through an
  * injected resolution rule. The rule is a no-op for every relation
  * that is not a view of a [[ViewCatalog]]-implementing plugin, so it
  * adds nothing to non-catalog query plans. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(ResolveV2Views.apply)
  }
}

/** Resolves a 3-part relation `cat.ns.v` whose catalog plugin serves
  * `v` as a V2 view: parses the stored body and re-qualifies its
  * unqualified/2-part table references against the view's OWN context
  * (`View.currentCatalog`/`currentNamespace` — for the snapshot
  * catalog that context is mount-relative, see `SnapshotView`), so the
  * view reads the serving catalog's tables on every attach. 3-part
  * references inside the body pin an explicit catalog and pass through
  * untouched. Nested views resolve by fixed-point: the rewritten
  * references are themselves 3-part relations this rule (or core table
  * resolution) picks up on the next analyzer iteration.
  *
  * Scale note: resolution is driver-side metadata work (one KiB-scale
  * snapshot read, already cached by the catalog instance); the
  * resulting plan is the view body's plan — filters and projections
  * push through it into the underlying scans exactly as if the user
  * had inlined the query. */
case class ResolveV2Views(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation if u.multipartIdentifier.length == 3 =>
        resolveView(u).getOrElse(u)
    }

  private def resolveView(u: UnresolvedRelation): Option[LogicalPlan] = {
    val parts = u.multipartIdentifier
    val plugin =
      try spark.sessionState.catalogManager.catalog(parts.head)
      catch { case _: Exception => return None } // not a catalog → core rules
    plugin match {
      case vc: ViewCatalog =>
        val ident = Identifier.of(Array(parts(1)), parts(2))
        if (!vc.viewExists(ident)) None
        else {
          val v = vc.loadView(ident)
          val ctx = Seq(v.currentCatalog) ++ v.currentNamespace.toSeq
          val parsed = CatalystSqlParser.parsePlan(v.query)
          // The body splices into the plan MID-analysis — after the
          // analyzer's substitution batch already ran — so a WITH
          // clause inside the view would never meet CTESubstitution
          // and its aliases would dangle (or worse, read like
          // catalog tables). Substitute CTEs ourselves first (the
          // same move public V2-view implementations make); after
          // substitution every remaining UnresolvedRelation is a real
          // table/view reference and re-qualifies safely.
          val substituted = org.apache.spark.sql.catalyst.analysis
            .CTESubstitution.apply(parsed)
          // transformUpWithSubqueries: view references inside scalar /
          // EXISTS / IN subquery expressions must re-qualify too
          val body = substituted.transformUpWithSubqueries {
            case r: UnresolvedRelation if r.multipartIdentifier.length == 1 =>
              r.copy(multipartIdentifier = ctx ++ r.multipartIdentifier)
            case r: UnresolvedRelation if r.multipartIdentifier.length == 2 =>
              r.copy(multipartIdentifier =
                v.currentCatalog +: r.multipartIdentifier)
          }
          Some(SubqueryAlias(parts(2), body))
        }
      case _ => None
    }
  }
}
