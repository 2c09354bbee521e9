package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `listenerBus.waitUntilEmpty` is private[spark]; the bench needs it to
  * read per-query shuffle totals from an async listener deterministically
  * (same extension-point pattern as org.apache.spark.sql.graft.Bridge).
  */
object ListenerBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
