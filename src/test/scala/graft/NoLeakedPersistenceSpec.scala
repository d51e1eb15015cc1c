package graft

import org.scalatest.funsuite.AnyFunSuite

/** Release-valve sweep over the WHOLE registry: no `SparkEntry.queries`
  * entry may leave persistent RDD blocks behind once its action finishes —
  * session-lifetime caches accumulate across a long-lived 100 TB pipeline
  * until executors die of storage pressure. Extends the CC-rounds pattern
  * from GraphSpec to every operator surface at once.
  *
  * Two legitimate, bounded exceptions (both release deterministically, just
  * not synchronously with the action): SJoin's monotonic-tag fallback
  * persist frees via a QueryExecutionListener on the listener bus, and
  * Graph/OsmFilter lazy localCheckpoints keep the FINAL round's blocks
  * alive backing the returned frame's lineage. The sweep therefore waits
  * for the listener bus to drain and then allows at most a bounded handful
  * of residual RDDs per query — never growth proportional to rounds or
  * partitions — and frees residuals between queries so leaks can't mask
  * each other.
  */
class NoLeakedPersistenceSpec extends AnyFunSuite with SparkSpec {

  test("every registry query releases its persistence once the action completes") {
    val sc = spark.sparkContext
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val before = sc.getPersistentRDDs.keySet
      try {
        fn(spark, sfDir).count()
        def leaked = sc.getPersistentRDDs.view.filterKeys(k => !before(k)).toMap
        // listener-released persists (SJoin fallback) fire asynchronously
        val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
        while (leaked.nonEmpty && System.nanoTime() < deadline) Thread.sleep(50)
        val residual = leaked
        if (residual.size > 3)
          failures += s"$name left ${residual.size} persistent RDDs"
        residual.values.foreach(_.unpersist(blocking = false))
      } catch {
        case e: Throwable => failures += s"$name failed to run: ${e.getMessage}"
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("Caches.releaseAll frees a cache whose consuming action never ran") {
    import testImplicits._
    import org.apache.spark.storage.StorageLevel
    val df = graft.operators.Caches.cachedUntilAction(
      Seq(1L, 2L, 3L).toDF("v").groupBy("v").count())
    // explain-only consumer: the plan is inspected but no Dataset action
    // ever runs, so the QueryExecutionListener never fires — exactly the
    // leak scenario the safety valve exists for
    df.queryExecution.executedPlan.toString
    assert(df.storageLevel != StorageLevel.NONE,
      "expected the cachedUntilAction persist to be registered")
    graft.operators.Caches.releaseAll()
    assert(df.storageLevel == StorageLevel.NONE,
      "releaseAll left the explain-only frame persisted")
  }

  test("releaseAll after a mixed session (one consumed, one abandoned) leaves zero persisted RDDs") {
    import testImplicits._
    import org.apache.spark.storage.StorageLevel
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val consumed = graft.operators.Caches.cachedUntilAction(
      Seq(10L, 20L).toDF("v").groupBy("v").count())
    val abandoned = graft.operators.Caches.cachedUntilAction(
      Seq(30L, 40L).toDF("v").groupBy("v").count())
    // the consumed frame's action fires its listener release...
    assert(consumed.count() == 2)
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (consumed.storageLevel != StorageLevel.NONE && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(consumed.storageLevel == StorageLevel.NONE,
      "listener release never fired for the consumed frame")
    // ...the abandoned one is only ever explained; the teardown valve
    // must sweep it so the session ends with zero persisted blocks
    abandoned.queryExecution.executedPlan.toString
    graft.operators.Caches.releaseAll()
    assert(abandoned.storageLevel == StorageLevel.NONE)
    def residual = sc.getPersistentRDDs.keySet.diff(before)
    while (residual.nonEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    assert(residual.isEmpty,
      s"session teardown left persisted RDDs: ${residual.mkString(",")}")
  }
}
