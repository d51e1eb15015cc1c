package graft

import org.apache.spark.sql.SparkSession

/** One-call SQL surface install: `graft.functions.registerAll(spark)` puts
  * EVERY graft expression — the st_* geometry family plus the text/vector
  * sketch kernels — into the session FunctionRegistry, so a pure-SQL client
  * (`spark.sql`, thrift, notebooks) resolves them by name. The registered
  * builders construct the exact same Catalyst expressions as the Column
  * API, so plans (and WholeStageCodegen spans) are identical either way.
  * Cluster-wide installs use [[graft.GraftExtensions]] via
  * `spark.sql.extensions` instead — same builder lists, session-free.
  */
package object functions {
  def registerAll(spark: SparkSession): Unit = {
    GeoFunctions.registerAll(spark)
    TextFunctions.registerAll(spark)
  }
}
