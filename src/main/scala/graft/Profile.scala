package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiler: time one registered query, print its formatted plan,
  * per-run wall time, and per-run total shuffle write bytes (a stage-metrics
  * listener sum — the instrument for shuffle-key-width changes).
  * Usage: runMain graft.Profile <sfDir> <query> [runs]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .appName("graft-profile")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    val fn = SparkEntry.queries(name)
    // materialize FULL rows via the physical RDD: a .count() action puts an
    // Aggregate on top and lets Catalyst eliminate unique-key outer joins
    // and prune their whole upstream DAGs (q127's span chain measured 59 B
    // of "shuffle" that way) — toRdd executes the plan exactly as written
    def materialize(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    // warmup
    materialize(fn(spark, sfDir))
    println(s"=== formatted plan for $name ===")
    println(fn(spark, sfDir).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    (1 to runs).foreach { i =>
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val n = materialize(fn(spark, sfDir))
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events are async; let the stage-completed queue drain
      Thread.sleep(500)
      println(f"run $i: $sec%.3f s  ($n rows, shuffleWrite=${shuffleBytes.get()} B)")
    }
    spark.stop()
  }
}
