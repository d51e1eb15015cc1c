package graft.operators

import org.apache.spark.sql.DataFrame

/** Deterministic persist-and-release for operator-internal frames that the
  * plan references several times (candidate generation + verify join-back,
  * marginals + pair joins). The policy is [[SJoin]]'s stableTagged release:
  * persist MEMORY_AND_DISK (spills, never evicts silently at scale) and
  * unpersist via a QueryExecutionListener on the FIRST completed action
  * whose analyzed plan contains the frame — so a long-lived session never
  * accumulates operator caches, and `NoLeakedPersistenceSpec` stays green
  * over the whole registry.
  */
private[graft] object Caches {

  /** Registers the release listener. Call AFTER any operator-internal
    * action over `df` (a bounded count/collect), or that internal action
    * itself triggers the release before the caller's query ever runs.
    */
  def releaseAfterAction(df: DataFrame): Unit = {
    val session = df.sparkSession
    val target = df.queryExecution.analyzed
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    lazy val listener: org.apache.spark.sql.util.QueryExecutionListener =
      new org.apache.spark.sql.util.QueryExecutionListener {
        private def maybeRelease(qe: org.apache.spark.sql.execution.QueryExecution): Unit =
          if (qe.analyzed.find(_.sameResult(target)).isDefined &&
              done.compareAndSet(false, true)) {
            df.unpersist(blocking = false)
            session.listenerManager.unregister(listener)
          }
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
          maybeRelease(qe)
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit =
          maybeRelease(qe)
      }
    session.listenerManager.register(listener)
  }

  /** Persist + release on the first consuming action. */
  def cachedUntilAction(df: DataFrame): DataFrame = {
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    releaseAfterAction(df)
    df
  }
}
