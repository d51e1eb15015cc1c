package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Runs a query and prints scheduler-level totals — #jobs, #stages, #tasks,
  * summed task time vs wall time — the overhead-vs-compute split the local
  * bench can't show without a UI: `runMain graft.tools.JobStats <q> [sfDir] [runs]`.
  */
object JobStats {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 2
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    graft.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    graft.localScratchConfigs.foreach { case (k, v) => builder.config(k, v) } // local-master harness: tmpfs scratch
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskNs = 0L
    val verbose = sys.env.get("JOBSTATS_STAGES").contains("1")
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1
        if (verbose) {
          val si = sc.stageInfo
          val ms = si.taskMetrics
          println(f"  stage ${si.stageId}%4d tasks=${si.numTasks}%4d " +
            f"run=${ms.executorRunTime / 1e3}%7.2f cpu=${ms.executorCpuTime / 1e9}%7.2f " +
            f"srFetch=${ms.shuffleReadMetrics.fetchWaitTime / 1e3}%6.2f " +
            f"swWrite=${ms.shuffleWriteMetrics.writeTime / 1e9}%6.2f gc=${ms.jvmGCTime / 1e3}%5.2f " +
            s"name=${si.name.take(60)}")
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks += 1
        if (t.taskInfo != null) taskNs += (t.taskInfo.finishTime - t.taskInfo.launchTime) * 1000000L
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val q = graft.SparkEntry.queries(name)
    for (i <- 0 until runs) {
      jobs = 0; stages = 0; tasks = 0; taskNs = 0L
      val t0 = System.nanoTime()
      val n = q(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400) // drain listener bus
      println(f"run $i: wall=$wall%.2f s rows=$n jobs=$jobs stages=$stages tasks=$tasks taskTime=${taskNs / 1e9}%.2f s")
    }
    spark.stop()
  }
}
