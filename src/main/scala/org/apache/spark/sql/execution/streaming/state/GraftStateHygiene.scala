package org.apache.spark.sql.execution.streaming.state

/** Package-placed accessor for [[StateStore]]'s `private[sql]` unload
  * surface (the class is Spark's, this file is ours — same-package
  * access is the documented pattern for reaching `private[sql]` test
  * hooks from an application).
  *
  * Why: every STATEFUL streaming query leaves its
  * [[HDFSBackedStateStoreProvider]] instances registered in the
  * executor-side `StateStore.loadedProviders` map after the query
  * terminates — they are only evicted when the maintenance thread
  * (default interval 60 s) notices the instance went inactive. A batch
  * session that launches many short-lived streams back-to-back (the
  * serial bench: q37/q41/q63/q67 … in one JVM) accumulates dead
  * providers — each holding its in-memory version maps — faster than
  * maintenance reclaims them. [[unloadAll]] releases them
  * deterministically between queries; providers re-load lazily on the
  * next stateful stream, so calling it between queries is always safe
  * (worst case: the next stream re-opens its stores, which a fresh
  * query does anyway).
  */
object GraftStateHygiene {
  /** Unload every loaded state-store provider in this JVM. */
  def unloadAll(): Unit = StateStore.unloadAll()
}
