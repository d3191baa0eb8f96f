package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Scratch diagnostic: run one query and print every scheduler job's
  * callsite, so job-floor-bound loops can be attributed. Not part of
  * the bench/verify surface. */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var on = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = if (on) {
        val site = Option(j.properties)
          .map(_.getProperty("callSite.short", "?")).getOrElse("?")
        val nTasks = j.stageInfos.map(_.numTasks).sum
        println(f"[job] ${j.jobId}%4d stages=${j.stageIds.length}%2d " +
          f"tasks=$nTasks%4d  $site")
      }
    })
    // warm pass first (codegen/JIT), then the traced pass
    graft.SparkEntry.queries(name)(spark, dir).count()
    on = true
    graft.SparkEntry.queries(name)(spark, dir).count()
    Thread.sleep(500)
    spark.stop()
  }
}
