package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/** Z-order layout: bit-interleave correctness against a plain Scala
  * reference, layout-never-changes-results parity, and the actual
  * pruning claim — file-stat scan fractions measured from the written
  * files' own min/max envelopes (the same information any
  * stats-pruning reader uses), Z vs a linear single-dimension sort. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def refInterleave(a: Long, b: Long, bits: Int): Long =
    (0 until bits).map(i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum

  test("interleave matches the reference bit-weave; quadrant ordering holds") {
    val cases = for (a <- Seq(0L, 1L, 5L, 170L, 255L); b <- Seq(0L, 3L, 128L, 255L))
      yield (a, b)
    val got = cases.toDF("a", "b")
      .select(ZOrder.interleave(col("a"), col("b"), 8).as("z"))
      .collect().map(_.getLong(0))
    got.toSeq shouldBe cases.map { case (a, b) => refInterleave(a, b, 8) }
    // top-level quadrants sort lo-lo < (hi-lo | lo-hi) < hi-hi: the
    // recursive locality that makes box ranges compact
    val z = (a: Long, b: Long) => refInterleave(a, b, 8)
    assert(z(0, 0) < z(255, 0) && z(0, 0) < z(0, 255))
    assert(z(255, 0) < z(128, 128) || z(0, 255) < z(128, 128))
    assert(z(127, 127) < z(128, 128)) // hi-hi quadrant starts above all lo-lo
  }

  test("quantize clamps out-of-range values to edge cells") {
    val got = Seq(-5.0, 0.0, 0.5, 1.0, 7.3).toDF("v")
      .select(ZOrder.quantize(col("v"), 0.0, 1.0, 4).as("q"))
      .collect().map(_.getLong(0))
    got.toSeq shouldBe Seq(0L, 0L, 8L, 15L, 15L)
  }

  // synthetic grid shared by the layout tests: the f14 lat/lon
  // derivation over 20k ids — uniform-ish over [46,49)×[-120,-116)
  private def grid = (0L until 20000L).toDF("event_id")
    .withColumn("lat", lit(46.0) + pmod(col("event_id"), lit(300)) / 100.0)
    .withColumn("lon", lit(-120.0) + pmod(col("event_id") * 7, lit(400)) / 100.0)

  private lazy val zPath = {
    val p = TempDirs.path("zorder-spec/z")
    ZOrder.writeZOrdered(grid, "lat", "lon", 46.0, 49.0, -120.0, -116.0,
      bits = 8, nFiles = 32, path = p)
    p
  }
  private lazy val linPath = {
    val p = TempDirs.path("zorder-spec/linear")
    grid.repartitionByRange(32, col("lat")).sortWithinPartitions("lat")
      .write.mode("overwrite").parquet(p)
    p
  }

  test("layout changes which files hold what, never the query result") {
    def box(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("lat") >= 46.5 && col("lat") <= 46.8 &&
        col("lon") >= -119.0 && col("lon") <= -118.6)
        .agg(count(lit(1)), sum("event_id")).head()
    box(spark.read.parquet(zPath)) shouldBe box(grid)
  }

  test("a second-dimension band scans EVERY file of a linear layout but a fraction of the Z layout") {
    // lon-only band (10% of the lon range): each lat-sorted file spans
    // all lon values, so linear pruning is impossible — frac must be
    // exactly 1.0; the Z layout keeps lon locality too
    val zf = ZOrder.boxScanFraction(spark.read.parquet(zPath), "lat", "lon",
      46.0, 49.0, -119.0, -118.6)
    val lf = ZOrder.boxScanFraction(spark.read.parquet(linPath), "lat", "lon",
      46.0, 49.0, -119.0, -118.6)
    lf shouldBe 1.0
    zf should be < 0.7
  }

  test("an empty layout scans nothing (0.0, not NaN/NPE)") {
    val empty = grid.filter(col("event_id") < 0)
    ZOrder.boxScanFraction(empty, "lat", "lon", 46.0, 49.0, -119.0, -118.6) shouldBe 0.0
  }

  test("the READ PATH prunes: scan-node rows track the file-stats envelope (footer pruning engages)") {
    // the envelope gauges prove the LAYOUT is skippable; this pins the
    // actual reader: with parquet filter pushdown, row-group stats
    // pruning must keep the scan node's emitted rows within the rows
    // living in envelope-intersecting files (each written file is one
    // row group at this size). If footer pruning stops engaging —
    // pushdown disabled, stats lost by a writer change, filter no
    // longer reaching the scan — the scan emits ~all 20k rows and this
    // fails loudly.
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val (aLo, aHi, bLo, bHi) = (46.5, 46.8, -119.0, -118.6)
    val q = spark.read.parquet(zPath)
      .filter(col("lat") >= aLo && col("lat") <= aHi &&
        col("lon") >= bLo && col("lon") <= bHi)
    q.collect()
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val scan = scans(q.queryExecution.executedPlan).head
    // the box predicates must actually reach the parquet reader
    scan.metadata("PushedFilters") should include("GreaterThanOrEqual(lat")
    val scannedRows = scan.metrics("numOutputRows").value
    // envelope-side expectation: rows residing in files whose min/max
    // stats intersect the box — the most a stats-pruning reader reads
    val full = spark.read.parquet(zPath)
    val envRows = full.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n"),
        min("lat").as("a0"), max("lat").as("a1"),
        min("lon").as("b0"), max("lon").as("b1"))
      .filter(col("a1") >= aLo && col("a0") <= aHi &&
        col("b1") >= bLo && col("b0") <= bHi)
      .agg(sum("n")).head().getLong(0)
    val totalRows = full.count()
    scannedRows should be <= envRows
    scannedRows.toDouble should be < totalRows.toDouble / 2
  }

  test("a 2-D box scans within one file of the linear layout (and beats it on bands)") {
    val zf = ZOrder.boxScanFraction(spark.read.parquet(zPath), "lat", "lon",
      46.5, 46.8, -119.0, -118.6)
    val lf = ZOrder.boxScanFraction(spark.read.parquet(linPath), "lat", "lon",
      46.5, 46.8, -119.0, -118.6)
    // One file of slack, not zf <= lf exactly: the linear baseline's
    // repartitionByRange boundaries come from sampling seeded off the
    // global RDD-id counter, so its file count for this box flips
    // between 4 and 5 depending on what ran earlier in the JVM — a
    // strict comparison is a coin toss on boundary luck (it failed
    // exactly that way in a full-suite run). The Z claim worth pinning
    // is: a 2-D box costs AT MOST one extra file vs a lat-optimal
    // layout, while the band test above shows the dimension the linear
    // layout can never prune. Both layouts must still prune hard.
    zf should be <= lf + 1.0 / 32 + 1e-9
    zf should be < 0.5
  }

  test("governed Z layout: every live batch carries MANIFEST zone stats " +
    "tight on both dims; composed bloom×zone reads are never wrong (rt9)") {
    import graft.operators.{BloomIndex, Snapshot}
    val path = graft.TempDirs.path(
      s"zorder/gov-${java.util.UUID.randomUUID()}")
    val pts = (0L until 16L).map(i =>
      (i, 5.0 + 10.0 * (i % 4), 5.0 + 10.0 * (i / 4))).toDF("id", "x", "y")
    val ids = ZOrder.writeZOrderedGoverned(pts, "x", "y", 0.0, 40.0, 0.0, 40.0,
      bits = 2, nBatches = 4, path = path,
      splitPoints = Some(Seq(4L, 8L, 12L)))
    ids shouldBe Seq(0L, 1L, 2L, 3L)
    val m = Snapshot.latest(spark, path).get
    // the schema-seed batch is retired; every LIVE batch is stat-ful
    m.batches.toSet shouldBe Set(0L, 1L, 2L, 3L)
    for (b <- m.batches) {
      val st = m.stats.getOrElse(b, Map.empty)
      withClue(s"batch $b stats: ") {
        st.contains("x") shouldBe true
        st.contains("y") shouldBe true
      }
    }
    // zone screen prunes on the SECOND dimension (y): the thing a
    // linear x-sorted layout can never do — a y-band survives only in
    // the two top quadrants
    Snapshot.readRange(spark, path, "y", BigDecimal(20), BigDecimal(40))
      .inputFiles.map(_.split("batch_id=")(1).split("/")(0))
      .distinct.sorted.toSeq shouldBe Seq("2", "3")
    // composed read parity with the full scan, for present and absent
    // ids, inside and outside their boxes — over-read allowed, wrong
    // rows never
    BloomIndex.refresh(spark, path, "id")
    val full = Snapshot.read(spark, path)
    for ((id, xLo, xHi, yLo, yHi) <- Seq(
        (5L, 0.0, 20.0, 0.0, 20.0), (5L, 20.0, 40.0, 0.0, 20.0),
        (10L, 0.0, 40.0, 20.0, 40.0), (999L, 0.0, 40.0, 0.0, 40.0),
        (0L, 0.0, 40.0, 0.0, 40.0), (15L, 30.0, 40.0, 30.0, 40.0))) {
      val got = BloomIndex.readPointRanges(spark, path, "id", id,
          Seq(("x", BigDecimal(xLo), BigDecimal(xHi)),
            ("y", BigDecimal(yLo), BigDecimal(yHi))))
        .select("id").collect().map(_.getLong(0)).toSet
      val want = full.filter(col("id") === id && col("x").between(xLo, xHi)
          && col("y").between(yLo, yHi))
        .select("id").collect().map(_.getLong(0)).toSet
      withClue(s"probe id=$id box=[$xLo,$xHi]x[$yLo,$yHi]: ") {
        got shouldBe want
      }
    }
    // re-run on the SAME path is a table reset (review r17): the new
    // dataset replaces the old one — stagedAppend must not silently
    // no-op on the previously-committed ids
    val pts2 = (100L until 104L).map(i =>
      (i, 5.0 + 10.0 * (i % 2), 5.0 + 10.0 * ((i / 2) % 2))).toDF("id", "x", "y")
    ZOrder.writeZOrderedGoverned(pts2, "x", "y", 0.0, 40.0, 0.0, 40.0,
      bits = 2, nBatches = 2, path = path)
    Snapshot.read(spark, path).select("id").collect().map(_.getLong(0)).toSet shouldBe
      (100L until 104L).toSet
    // IN-PLACE re-layout: the source IS the table being rewritten —
    // buckets must stage fully before the reset deletes anything
    // (review r17: the pre-fix order destroyed the source mid-write)
    ZOrder.writeZOrderedGoverned(Snapshot.read(spark, path), "x", "y",
      0.0, 40.0, 0.0, 40.0, bits = 2, nBatches = 2, path = path,
      splitPoints = Some(Seq(2L)))
    Snapshot.read(spark, path).select("id").collect().map(_.getLong(0)).toSet shouldBe
      (100L until 104L).toSet
    // and no staging debris survives
    val fs2 = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val parent = new org.apache.hadoop.fs.Path(path).getParent
    fs2.listStatus(parent).map(_.getPath.getName)
      .count(_.contains("__zstage")) shouldBe 0
  }
}
