package graft.tools

import org.apache.spark.sql.SparkSession

/** Time one SparkEntry query at a given SF and dump its final adaptive
  * plan's operator histogram:
  *
  *   sbt "runMain graft.tools.ProfileQ q36_invoice_pipeline /root/testdata/sf0.1 [runs]"
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    try fn(spark, warmDir).count() catch { case _: Throwable => () }
    spark.catalog.clearCache()
    // per-stage wall-clock accounting: surface WHERE a slow run spends time
    val stageTimes = new scala.collection.concurrent.TrieMap[Int, (String, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dt = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(0L)
        stageTimes(si.stageId) = (si.name.takeWhile(_ != '\n').take(60), dt)
      }
    })
    var df: org.apache.spark.sql.DataFrame = null
    for (i <- 1 to runs) {
      stageTimes.clear()
      val t0 = System.nanoTime()
      df = fn(spark, dir)
      val n = df.count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
      val top = stageTimes.toSeq.sortBy(-_._2._2).take(6)
      top.foreach { case (id, (nm, dt)) => println(f"    stage $id%4d ${dt / 1e3}%7.2fs  $nm") }
      spark.catalog.clearCache()
      System.gc() // let the ContextCleaner release broadcasts/checkpoints (untimed)
    }
    val plan = df.queryExecution.executedPlan.toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/profq_plan.txt"), plan)
    println("-- scans per table --")
    Seq("lineitem", "orders", "customer", "embeddings", "documents").foreach { t =>
      val n = s"$t.parquet".r.findAllIn(plan).size
      if (n > 0) println(f"$n%4d $t")
    }
    println("ReusedExchange: " + "ReusedExchange".r.findAllIn(plan).size)
    println("full plan: /tmp/profq_plan.txt")
    spark.stop()
  }
}
