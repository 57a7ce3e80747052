package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry for session-lifetime caches that cannot pair their persist
  * with an in-function unpersist because the returned frame is lazy (the
  * MinHash signature table in Dedup.minhashLshSh, the SimHash fingerprint
  * table, SparkEntry's memoized kg/shingle/media tables): the producing
  * function registers the cached frame here, and a long-lived multi-job
  * session releases everything for a session in one call between jobs
  * instead of relying on clearCache() nuking unrelated state.
  *
  * Registration is append-only and thread-safe; release is idempotent
  * (unpersist on an unpersisted frame is a no-op). Nothing in the engine
  * calls release() implicitly — a query path never loses a cache it is
  * still lazily depending on.
  */
object SessionCaches {

  private val entries =
    new java.util.concurrent.ConcurrentLinkedQueue[(Int, () => Unit)]()

  /** Register a persisted frame (or any release thunk) for `session`. */
  def register(df: DataFrame): DataFrame = {
    entries.add((df.sparkSession.hashCode(), () => { df.unpersist(); () }))
    df
  }

  def registerThunk(session: SparkSession)(release: () => Unit): Unit =
    entries.add((session.hashCode(), release))

  /** Release every cache registered for `session`; returns the number of
    * release thunks run.
    */
  def release(session: SparkSession): Int = {
    val key = session.hashCode()
    var n = 0
    val it = entries.iterator()
    while (it.hasNext) {
      val (k, f) = it.next()
      if (k == key) { f(); it.remove(); n += 1 }
    }
    n
  }
}
