package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scoped temp views for the same-SQL-text operators ([[Lateral]],
  * [[ScalarSubquery]], [[ExistsSubquery]]): register per-call-suffixed
  * view names (fixed session-global names would mutate shared catalog
  * state and race under concurrent queries in one session), hand the
  * resolved names to `body`, and drop EVERY view that actually
  * registered in a finally — including after a partial registration
  * failure, the leak the three hand-rolled copies shared. The returned
  * DataFrame keeps working after the drop: `spark.sql` analyzes
  * eagerly, so the plan holds resolved relations, not view names.
  */
object SqlViews {

  def withTempViews[A](spark: SparkSession, views: Seq[(String, DataFrame)])
                      (body: Map[String, String] => A): A = {
    val sfx = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val named = views.map { case (base, df) => (base, s"graft_${base}_$sfx", df) }
    val registered = scala.collection.mutable.ArrayBuffer[String]()
    try {
      named.foreach { case (_, name, df) =>
        df.createOrReplaceTempView(name)
        registered += name
      }
      body(named.map { case (base, name, _) => base -> name }.toMap)
    } finally {
      // best-effort per view: one failed drop must not leak the rest
      // for the session lifetime (the partial-failure case this helper
      // exists to close)
      registered.foreach(v => scala.util.Try(spark.catalog.dropTempView(v)))
    }
  }
}
