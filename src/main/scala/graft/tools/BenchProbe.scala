package graft.tools

/** Dev-loop profiler for the st1-st3 / s7/s8 bench-regression hunt
  * (VERDICT r6 "What's wrong" #1/#2): times a handful of queries
  * repeatedly inside ONE JVM, with and without the Bench prebuild
  * steps, so warm-vs-cold and cross-query contamination separate.
  * Not part of the bench or the correctness gate.
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    val names = sys.env.getOrElse("PROBE_QUERIES", "st1,st2,st3").split(",").toSeq
    val reps = sys.env.getOrElse("PROBE_REPS", "4").toInt
    val prebuild = sys.env.get("PROBE_PREBUILD").contains("1")

    // warmup, matching Bench
    graft.Tables(spark, sfDir, "nation").write.format("noop").mode("overwrite").save()
    if (prebuild) {
      graft.queries.ScaleWorkloads.trainedCents(spark, sfDir)
      graft.queries.ScaleWorkloads.indexPath(spark, sfDir)
      graft.queries.ScaleWorkloads.minhashIndexPath(spark, sfDir)
      graft.queries.ScaleWorkloads.embeddingIndexPath(spark, sfDir)
    }
    val all = graft.SparkEntry.queries ++ graft.queries.ScaleWorkloads.defs
    for (rep <- 1 to reps; n <- names) {
      val fn = all(all.keys.find(_.startsWith(n)).get)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] rep$rep $n%-28s $dt%.2fs")
    }
    spark.stop()
  }
}
