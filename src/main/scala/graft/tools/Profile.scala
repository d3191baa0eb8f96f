package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Per-query WORK profile — the measurement harness behind the round-21
  * optimization pass (guide §1: measure first). Wall-clock on a loaded
  * shared box swings ±25%, so per-change attribution uses the listener
  * counters instead: jobs / stages / tasks launched, summed executor
  * task time (CPU-proportional), and shuffle bytes written. Each query
  * runs twice; the SECOND run is reported (warm JIT/codegen, the bench's
  * warm-pass posture).
  *
  * Usage: runMain graft.tools.Profile <sfDir> <query> [query ...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskTimeMs = new AtomicLong
    val shufWrite = new AtomicLong
    val shufRead = new AtomicLong
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        shufWrite.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        shufRead.addAndGet(s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
        ()
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null)
          taskTimeMs.addAndGet(t.taskMetrics.executorRunTime)
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    println(f"${"query"}%-30s ${"wall_s"}%7s ${"jobs"}%5s ${"stages"}%6s " +
      f"${"tasks"}%6s ${"tasktime_s"}%10s ${"shufW_MB"}%8s")
    // a query that throws must not pollute the attribution data: its row
    // is marked FAILED (partial counters suppressed) and the process
    // exits nonzero so a broken query can't be mistaken for a measurement
    var anyFailed = false
    names.foreach { n =>
      (1 to 2).foreach { round =>
        jobs.set(0); stages.set(0); tasks.set(0)
        taskTimeMs.set(0); shufWrite.set(0); shufRead.set(0)
        var failed = false
        val t0 = System.nanoTime()
        try graft.SparkEntry.queries(n)(spark, dir).count()
        catch { case e: Throwable =>
          failed = true; anyFailed = true
          System.err.println(s"[profile] $n failed: ${e.getMessage}") }
        val wall = (System.nanoTime() - t0) / 1e9
        // listener events drain asynchronously — settle before reading
        Thread.sleep(300)
        if (round == 2) {
          if (failed) println(f"$n%-30s  FAILED (counters suppressed)")
          else println(f"$n%-30s $wall%7.2f ${jobs.get}%5d ${stages.get}%6d " +
            f"${tasks.get}%6d ${taskTimeMs.get / 1e3}%10.2f " +
            f"${shufWrite.get / 1e6}%8.1f")
        }
      }
    }
    spark.stop()
    if (anyFailed) sys.exit(1)
  }
}
