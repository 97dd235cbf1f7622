package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev utility: run one `SparkEntry` query (warm, then once timed) with a
  * listener that attributes wall time to STAGES — the local stand-in for
  * the Spark UI's stage table (guide §1.1: find where the time actually
  * goes before touching anything). Prints per-stage duration, task-time
  * sum, shuffle read/write bytes and rows, sorted by duration.
  *
  * Usage: `runMain graft.StageProfile q_dedup_jaccard` (env as in Bench).
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val name = args.headOption.getOrElse("q_dedup_jaccard")
    val fn = SparkEntry.queries(name)
    // warm once: AQE final plans + codegen, same as the bench protocol
    fn(spark, sfDir).count(); spark.catalog.clearCache()

    case class St(id: Int, name: String, wallMs: Long, taskMs: Long,
        cpuMs: Long, srBytes: Long, srRows: Long, swBytes: Long,
        spillMem: Long, spillDisk: Long, tasks: Int)
    val stages = scala.collection.mutable.ArrayBuffer[St]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(-1L)
        // the RDD scope chain names the operators the stage pipelines —
        // far more telling than the AQE-era uniform callsite name
        val ops = si.rddInfos.sortBy(_.id).map(r =>
          r.scope.map(_.name).getOrElse(r.name))
          .distinct.mkString(">").take(140)
        stages.synchronized {
          stages += St(si.stageId, ops,
            wall, m.executorRunTime, m.executorCpuTime / 1000000,
            m.shuffleReadMetrics.totalBytesRead, m.shuffleReadMetrics.recordsRead,
            m.shuffleWriteMetrics.bytesWritten,
            m.memoryBytesSpilled, m.diskBytesSpilled, si.numTasks)
        }
      }
      override def onJobStart(js: SparkListenerJobStart): Unit = ()
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    val total = (System.nanoTime() - t0) / 1e9
    spark.catalog.clearCache()
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500) // let the listener bus drain
    println(f"[stageprofile] $name total=$total%.3f s, ${stages.size} stages")
    println(f"${"stage"}%6s ${"wall_ms"}%8s ${"task_ms"}%8s ${"cpu_ms"}%8s " +
      f"${"sh_read"}%10s ${"sr_rows"}%9s ${"sh_write"}%10s " +
      f"${"spill_mem"}%10s ${"spill_dsk"}%10s ${"tasks"}%5s  name")
    stages.sortBy(-_.wallMs).foreach { s =>
      println(f"${s.id}%6d ${s.wallMs}%8d ${s.taskMs}%8d ${s.cpuMs}%8d " +
        f"${s.srBytes}%10d ${s.srRows}%9d ${s.swBytes}%10d " +
        f"${s.spillMem}%10d ${s.spillDisk}%10d ${s.tasks}%5d  ${s.name}")
    }
    val totSpill = stages.map(_.spillDisk).sum
    if (totSpill > 0)
      println(f"[stageprofile] total disk spill: ${totSpill / 1048576.0}%.1f MiB")
    val sumWall = stages.map(_.wallMs).sum
    println(f"[stageprofile] stage wall sum=${sumWall / 1000.0}%.3f s " +
      f"(gaps = driver/plan/commit time: ${total - sumWall / 1000.0}%.3f s)")
    spark.stop()
  }
}
