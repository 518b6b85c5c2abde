package graft

import org.apache.spark.sql.functions._
import graft.operators.Compaction

/** Compaction: content is untouched (row multiset + schema), file
  * counts collapse to the target bound, partitioned and unpartitioned
  * layouts both work, and the self-overwrite footgun is rejected. */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def plantFragmented(base: String, nPasses: Int = 6): Unit = {
    val df = (0 until 240)
      .map(i => (i.toLong, s"v$i-" + ("y" * 10), ('a' + i % 3).toChar.toString))
      .toDF("id", "payload", "part")
    // slice by (id div 3) so every pass spans all 3 partition values —
    // id % nPasses would correlate with part = id % 3 and leave each
    // pass writing into a single dir
    for (i <- 0 until nPasses)
      df.filter(expr(s"(id div 3) % $nPasses") === i).repartition(1)
        .write.mode("append").partitionBy("part").parquet(s"$base/in")
  }

  test("fragmented partitions collapse to one file each; content multiset identical", Slow) {
    val base = TempDirs.path("compaction-spec/basic")
    plantFragmented(base)
    Compaction.dirStats(spark, s"$base/in")
      .map(d => d.partition -> d.nFiles).toMap shouldBe
      Map("part=a" -> 6L, "part=b" -> 6L, "part=c" -> 6L)
    val stats = Compaction.compact(spark, s"$base/in", s"$base/out",
      targetBytes = 1L << 30, partitionCols = Seq("part")).collect()
    stats.map(r => r.getString(0) -> r.getLong(4)).toMap shouldBe
      Map("part=a" -> 1L, "part=b" -> 1L, "part=c" -> 1L)
    def slurp(p: String) = spark.read.parquet(p)
      .select("id", "payload", "part").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    slurp(s"$base/out") shouldBe slurp(s"$base/in")
  }

  test("a small target splits a big partition into at most target files, never losing rows") {
    val base = TempDirs.path("compaction-spec/split")
    // one partition value, many rows, fragmented across 8 passes
    val df = (0 until 4000)
      .map(i => (i.toLong, ("z" * 64) + i, "only")).toDF("id", "payload", "part")
    for (i <- 0 until 8)
      df.filter(col("id") % 8 === i).repartition(1)
        .write.mode("append").partitionBy("part").parquet(s"$base/in")
    val bytes = Compaction.dirStats(spark, s"$base/in").head.bytes
    val target = bytes / 3 // → ceil ratio of 3..4 output files max
    val stats = Compaction.compact(spark, s"$base/in", s"$base/out",
      targetBytes = target, partitionCols = Seq("part")).collect()
    val row = stats.head
    val targetFiles = row.getLong(3)
    targetFiles should be >= 3L
    row.getLong(4) should be <= targetFiles // upper bound contract
    row.getLong(4) should be >= 2L          // and it did split
    spark.read.parquet(s"$base/out").count() shouldBe 4000L
  }

  test("unpartitioned root compacts the same way") {
    val base = TempDirs.path("compaction-spec/flat")
    val df = (0 until 300).map(i => (i.toLong, s"r$i")).toDF("id", "v")
    for (i <- 0 until 5)
      df.filter(col("id") % 5 === i).repartition(1)
        .write.mode("append").parquet(s"$base/in")
    Compaction.dirStats(spark, s"$base/in").head.nFiles shouldBe 5L
    val stats = Compaction.compact(spark, s"$base/in", s"$base/out",
      targetBytes = 1L << 30).collect()
    stats.head.getLong(4) shouldBe 1L
    spark.read.parquet(s"$base/out").count() shouldBe 300L
  }

  test("partition pruning still engages on the compacted layout") {
    val base = TempDirs.path("compaction-spec/prune")
    plantFragmented(base)
    Compaction.compact(spark, s"$base/in", s"$base/out",
      targetBytes = 1L << 30, partitionCols = Seq("part"))
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val pruned = spark.read.parquet(s"$base/out").filter(col("part") === "b")
    // execute THIS plan (a separate .count() builds its own execution
    // whose metrics this assertion would never see)
    pruned.collect().length shouldBe 80
    // the executed scan reads exactly the one surviving file of the
    // one matching partition dir (inputFiles would lie here — it
    // reports the relation pre-pruning)
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val scan = scans(pruned.queryExecution.executedPlan).head
    scan.metadata("PartitionFilters") should include("part")
    scan.metrics("numFiles").value shouldBe 1L
  }

  test("same input compacts to the same layout twice (content-derived shards)") {
    val base = TempDirs.path("compaction-spec/deterministic")
    plantFragmented(base)
    def counts(out: String) =
      Compaction.compact(spark, s"$base/in", out, targetBytes = 4096,
        partitionCols = Seq("part")).collect()
        .map(r => r.getString(0) -> r.getLong(4)).toMap
    counts(s"$base/out1") shouldBe counts(s"$base/out2")
  }

  test("zero-padded partition values keep their dir names and their targets") {
    // hour=00..hour=03: partition type inference would read these as
    // int 0..3 and re-write hour=0 — a silent layout rename that also
    // desyncs every stats key. The scoped inference-off clone plus
    // file-derived dir keys must keep names AND targeting intact.
    val base = TempDirs.path("compaction-spec/padded")
    val df = (0 until 200)
      .map(i => (i.toLong, s"v$i", f"${i % 4}%02d")).toDF("id", "v", "hour")
    for (i <- 0 until 4)
      df.filter(expr("(id div 4) % 4") === i).repartition(1)
        .write.mode("append").partitionBy("hour").parquet(s"$base/in")
    val stats = Compaction.compact(spark, s"$base/in", s"$base/out",
      targetBytes = 1L << 30, partitionCols = Seq("hour")).collect()
    stats.map(_.getString(0)).sorted shouldBe
      Array("hour=00", "hour=01", "hour=02", "hour=03")
    stats.map(r => r.getString(0) -> r.getLong(4)).toMap.values.toSet shouldBe Set(1L)
    Compaction.dirStats(spark, s"$base/out").map(_.partition).sorted shouldBe
      Seq("hour=00", "hour=01", "hour=02", "hour=03")
  }

  test("map-typed columns compact via the json hash fallback") {
    val base = TempDirs.path("compaction-spec/map")
    val df = (0 until 120)
      .map(i => (i.toLong, Map("k" -> s"v$i"), ('a' + i % 2).toChar.toString))
      .toDF("id", "props", "part")
    for (i <- 0 until 3)
      df.filter(expr("(id div 2) % 3") === i).repartition(1)
        .write.mode("append").partitionBy("part").parquet(s"$base/in")
    val stats = Compaction.compact(spark, s"$base/in", s"$base/out",
      targetBytes = 1L << 30, partitionCols = Seq("part")).collect()
    stats.map(r => r.getString(0) -> r.getLong(4)).toMap shouldBe
      Map("part=a" -> 1L, "part=b" -> 1L)
    spark.read.parquet(s"$base/out").count() shouldBe 120L
  }

  test("a partitioned layout without partitionCols is rejected, not flattened") {
    val base = TempDirs.path("compaction-spec/missing-cols")
    plantFragmented(base, 2)
    val e = intercept[IllegalArgumentException] {
      Compaction.compact(spark, s"$base/in", s"$base/out", 1L << 30)
    }
    e.getMessage should include("partition subdirectories")
  }

  test("in-place compaction is rejected loudly") {
    val base = TempDirs.path("compaction-spec/inplace")
    plantFragmented(base)
    val e = intercept[IllegalArgumentException] {
      Compaction.compact(spark, s"$base/in", s"$base/in", 1L << 30, Seq("part"))
    }
    e.getMessage should include("out-of-place")
  }
}
