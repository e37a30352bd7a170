package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions

/** The config-based extension entry point must inject the as-of
  * merge-join strategy — verified against a real SparkSessionExtensions
  * instance (a fresh session with `spark.sql.extensions` applied would
  * collide with the suite's shared context; the injection surface is the
  * contract either way). Lives in the sql package tree because
  * `buildPlannerStrategies` is private[sql]. */
class GraftExtensionsSpec extends graft.SparkTestBase {

  it should "inject the as-of merge-join planner strategy" in {
    val ext = new SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    val strategies = ext.buildPlannerStrategies(spark)
    strategies should contain(AsOfMergeStrategy)
  }
}
