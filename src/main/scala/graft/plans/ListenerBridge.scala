package org.apache.spark

/** `private[spark]` access shim: deterministic per-query metric
  * attribution needs `SparkContext.listenerBus.waitUntilEmpty()` —
  * listener delivery is async, so snapshotting counters without a drain
  * would bleed task-end events across query boundaries (the alternative,
  * polling until the counter stabilizes, costs up to seconds per query).
  * Same pattern as `GraftBridge`: an accessor object inside the package
  * that owns the scope; no Spark internals are modified. */
object GraftListenerBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
