package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.DataSourceStrategy

/** Test-only shim: `DataSourceStrategy.translateFilter` is
  * `protected[sql]`, and PlanAuditSpec's pushdown guard wants Spark's
  * OWN translatability judgment (reimplementing it would drift). Lives
  * in the `org.apache.spark.sql` package for access; test scope only.
  */
object GraftPlanProbe {
  def translateFilter(e: Expression): Option[sources.Filter] =
    DataSourceStrategy.translateFilter(e, supportNestedPredicatePushdown = true)
}
