package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.operators.Dedup

/** Dev-only profiler for the connectedComponents loop (not part of the
  * library surface): times the sx12-shaped workload round-free vs the
  * operator, to attribute per-round cost. Run:
  * `sbt "runMain graft.tools.CcProfile"`. */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val ids = Tables(spark, dir, "documents").select(col("doc_id"))
    val pairs = ids.filter(col("doc_id") % 8 =!= 0)
      .select((col("doc_id") - 1).as("id1"), col("doc_id").as("id2"))
      .localCheckpoint(true)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ccprof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    // warmup
    time("warmup cc") { Dedup.connectedComponents(pairs, maxIter = 12).count() }
    time("cc full") { Dedup.connectedComponents(pairs, maxIter = 12).count() }
    spark.stop()
  }
}
