package org.apache.spark

/** Test-only escape hatch into `private[spark]` surface: deterministic
  * listener-bus drain for specs that read plans captured by an async
  * QueryExecutionListener (PlanSpec.plansDuring) — the mechanism Spark's
  * own listener tests use instead of fixed sleeps. */
object GraftTestHooks {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
