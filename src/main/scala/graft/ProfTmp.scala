package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch: per-stage submission/completion timestamps to check whether
  * independent stages overlap (removed after measurement). */
object ProfTmp {
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
    val name = args.headOption.getOrElse("q_pmi")
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).count(); spark.catalog.clearCache() // warm
    case class St(id: Int, sub: Long, done: Long, tasks: Int, name: String)
    val stages = scala.collection.mutable.ArrayBuffer[St]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages.synchronized {
          stages += St(si.stageId, si.submissionTime.getOrElse(-1L),
            si.completionTime.getOrElse(-1L), si.numTasks,
            si.rddInfos.sortBy(_.id).map(r => r.scope.map(_.name).getOrElse(r.name))
              .distinct.mkString(">").take(60))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.currentTimeMillis()
    fn(spark, sfDir).count()
    spark.catalog.clearCache()
    Thread.sleep(500)
    spark.sparkContext.removeSparkListener(listener)
    stages.sortBy(_.sub).foreach { s =>
      println(f"stage ${s.id}%3d  sub=+${s.sub - t0}%5d  done=+${s.done - t0}%5d  tasks=${s.tasks}%2d  ${s.name}")
    }
    spark.stop()
  }
}
