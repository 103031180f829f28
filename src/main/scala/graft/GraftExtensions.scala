package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension entry point — the deployment path for the custom
  * operators: add
  * `spark.sql.extensions=graft.GraftExtensions`
  * to any cluster's config and every session gets the as-of join
  * strategy, its filter-pushdown optimizer rule, and the graft SQL
  * functions, with no per-session install calls.
  *
  * (The programmatic `AsOf.install` / `GraftFunctions.registerAll`
  * paths remain for notebook use; this class is the config-driven
  * equivalent, covering the fourth extension tier —
  * `SparkSessionExtensions` — alongside the custom Expressions,
  * TypedImperativeAggregate, and LogicalPlan/Strategy/Exec tiers.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.AsOfStrategy)
    ext.injectOptimizerRule(_ => graft.plans.AsOfFilterPushdown)
    graft.functions.GraftFunctions.injectInto(ext)
  }
}
