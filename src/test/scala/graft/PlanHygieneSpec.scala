package graft

/** Whole-surface plan hygiene: no registered query may plan a
  * CartesianProduct — every pair-producing path must go through a bounded
  * bucket/block/broadcast join (the 100-TB discipline the operator docs
  * claim, asserted here for all of them at once). Building the physical
  * plan executes any plan-time constant folding (k-means fits, bucketed
  * writes, streaming drains), so this runs at sf0.001.
  */
class PlanHygieneSpec extends SparkSpec {

  test("no registered query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }
}
