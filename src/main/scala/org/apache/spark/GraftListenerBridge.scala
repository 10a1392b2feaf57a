package org.apache.spark

/** Listener-bus drain bridge: `SparkContext.listenerBus` is
  * `private[spark]`, but a benchmark that reads listener-collected
  * task metrics right after a job returns needs the bus EMPTY first —
  * SparkListener events are dispatched asynchronously, and the last
  * (straggler) task's TaskEnd can still be queued when the job's
  * action returns, silently under-reporting max-task metrics. */
object GraftListenerBridge {
  /** Block until all queued listener events are delivered (or the
    * timeout passes). Returns true when the bus drained. */
  def waitUntilEmpty(sc: SparkContext, timeoutMillis: Long = 10000L): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMillis); true }
    catch { case _: Exception => false }
}
