package graft.tools

/** Dev-loop profiler for the st5 micro-batch floor (VERDICT r18 task
  * 4): runs the unified two-modality ingest twice in one JVM (cold,
  * then warm) under a job listener that attributes every Spark job to
  * its `setJobDescription` phase label, then prints per-phase job
  * counts + in-job wall and the residual driver gap. Not part of the
  * bench or the correctness gate — a scalpel for deciding WHICH of the
  * ~80 jobs per micro-batch to coalesce.
  */
object St5Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val sc = spark.sparkContext
    graft.Tables(spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1"), "nation")
      .write.format("noop").mode("overwrite").save()

    final case class J(desc: String, start: Long, var end: Long = -1L)
    val jobs = scala.collection.mutable.LinkedHashMap.empty[Int, J]
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.synchronized {
          jobs(e.jobId) = J(Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("<none>"), e.time)
        }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
    }

    def run(tag: String): Unit = {
      jobs.synchronized(jobs.clear())
      sc.addSparkListener(listener)
      val t0 = System.nanoTime()
      graft.queries.PipelineQueries.defs("st5_unified_ingest")(spark, "")
        .collect()
      val wallMs = (System.nanoTime() - t0) / 1e6
      Thread.sleep(1500)
      sc.removeSparkListener(listener)
      val done = jobs.synchronized(jobs.values.filter(_.end > 0).toVector)
      val byPhase = done.groupBy(j =>
          j.desc.replaceAll("b\\d+ ", "")) // merge batch 0/1 labels
        .map { case (d, js) => (d, js.size, js.map(j => j.end - j.start).sum) }
        .toSeq.sortBy(-_._3)
      println(f"[$tag] wall ${wallMs / 1000}%.2fs, jobs ${done.size}, " +
        f"in-job ${done.map(j => j.end - j.start).sum / 1000.0}%.2fs, " +
        f"gap ${(wallMs - done.map(j => j.end - j.start).sum) / 1000.0}%.2fs")
      byPhase.foreach { case (d, n, ms) =>
        println(f"[$tag]   $d%-40s jobs=$n%3d  in-job=${ms / 1000.0}%6.2fs")
      }
    }
    run("cold")
    run("warm")
    spark.stop()
  }
}
