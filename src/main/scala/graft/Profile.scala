package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev aid: per-query job/stage/task/shuffle counters
  * (`runMain graft.Profile <sfDir> <query...>`). The judged bench
  * channel runs under heavy driver contention, and queries that submit
  * MANY Spark jobs (iterative BFS levels, per-round retrieval loops)
  * inflate far beyond their isolated time — job submission itself
  * contends. This surfaces the job count so "reduce the number of
  * jobs" is a measurable optimization target (SURVEY.md §5).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local("graft-profile")
    spark.sparkContext.setLogLevel("ERROR")
    // A/B knob: SPARK_GRAFT_NOAQE=1 turns adaptive execution off for the
    // profiled run, isolating AQE's per-shuffle scheduling overhead.
    if (sys.env.get("SPARK_GRAFT_NOAQE").contains("1"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val shuffleRead = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      }
    })
    println(f"${"query"}%-32s ${"warm_s"}%8s ${"jobs"}%6s ${"stages"}%7s ${"tasks"}%7s ${"shufMB"}%8s")
    names.foreach { n =>
      try {
        SparkEntry.queries(n)(spark, sfDir).count() // warm-up pass
        Thread.sleep(200) // let listener events drain
        jobs.set(0); stages.set(0); tasks.set(0); shuffleRead.set(0L)
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"$n%-32s $sec%8.2f ${jobs.get}%6d ${stages.get}%7d ${tasks.get}%7d ${shuffleRead.get / 1e6}%8.1f")
      } catch { case e: Throwable => println(s"$n ERROR: ${e.getMessage.take(120)}") }
    }
    spark.stop()
  }
}
