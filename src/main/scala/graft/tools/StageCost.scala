package graft.tools
import graft.{Caches, Sessions, SparkEntry}
import org.apache.spark.scheduler._
import scala.collection.mutable
object StageCost {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val d = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build("32")
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
    SparkEntry.queries(name)(spark, d).count()
    spark.catalog.clearCache(); Caches.release(); System.gc()
    val stages = mutable.ArrayBuffer[(Int, String, Long, Int)]()
    val jobs = mutable.ArrayBuffer[(Int, Long)]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        stages += ((si.stageId, si.name.split(" ").head, dur, si.numTasks))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = jobs += ((je.jobId, 0L))
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, d).count()
    val dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000)
    println(f"[stagecost] $name total=$dt%.2f jobs=${jobs.size} stages=${stages.size} stageSum=${stages.map(_._3).sum / 1e3}%.2f")
    stages.sortBy(-_._3).take(25).foreach { case (id, nm, dur, nt) =>
      println(f"[stagecost]   stage=$id%-4d ${dur}%6d ms tasks=$nt%-3d $nm")
    }
    spark.stop()
  }
}
