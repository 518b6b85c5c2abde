package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing: schema/partitioning/batch-shape are real, the
  * codec is a clearly-marked deterministic stub (container has no
  * image/audio libs — builder-prompt contract).
  */
class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.syntheticMedia(Tables(spark, sf, "documents"), "doc_id", "text")

  test("decode is deterministic and metadata-complete") {
    val a = Multimodal.decode(media).collect().sortBy(_.media_id)
    val b = Multimodal.decode(media).collect().sortBy(_.media_id)
    a.map(_.checksum).toSeq shouldBe b.map(_.checksum).toSeq
    a.foreach { d =>
      d.width should (be >= 32 and be < 640)
      d.height should (be >= 32 and be < 480)
      d.n_bytes should be > 0L
    }
    // kinds partition the corpus deterministically by id
    a.map(_.kind).toSet shouldBe Set("image", "audio", "video")
  }

  test("resize clamps to the bounding box and preserves aspect-ish scaling") {
    val resized = Multimodal.resize(Multimodal.decode(media), 100, 100).collect()
    resized.foreach { d =>
      d.width should be <= 100
      d.height should be <= 100
      d.width should be >= 1
      d.height should be >= 1
    }
  }

  test("frame sampling is a flatMap: video rows only, stride everyN") {
    val frames = Multimodal.sampleFrames(media, everyN = 10).collect()
    frames should not be empty
    val videos = media.filter(_.kind == "video").collect().map(_.media_id).toSet
    frames.map(_.frame_idx).foreach(i => i % 10 shouldBe 0)
    frames.map(_.media_id).toSet.subsetOf(videos) shouldBe true
    // every video yields at least ceil(30/10) frames (min nFrames = 30)
    frames.groupBy(_.media_id).values.foreach(_.length should be >= 3)
  }

  test("real PNG decode: ImageIO returns the true planted dimensions") {
    import spark.implicits._
    val docs = Seq((0L, "alpha"), (3L, "beta"), (6L, "gamma"),
      (1L, "an audio payload"), (2L, "a video payload"))
      .toDF("doc_id", "text")
    val m = Multimodal.syntheticMediaWithImages(docs, "doc_id", "text")
    val d = Multimodal.decode(m).collect().map(x => x.media_id -> x).toMap
    // width = 16 + id mod 16, height = 20 + 2*(id mod 8) — decoded from
    // the actual PNG header, not derived from the payload hash
    d(0L).width shouldBe 16; d(0L).height shouldBe 20
    d(3L).width shouldBe 19; d(3L).height shouldBe 26
    d(6L).width shouldBe 22; d(6L).height shouldBe 32
    d(1L).kind shouldBe "audio" // non-image rows keep the stub path
    // round-trip: makePng is deterministic (same bytes, same checksum)
    Multimodal.makePng(16, 20, 0L).toSeq shouldBe Multimodal.makePng(16, 20, 0L).toSeq
  }

  test("real WAV decode: javax.sound.sampled returns the true planted audio params") {
    // kernel round-trip: header fields come off the REAL container, and
    // duration is exact integer math over them
    val wav = Multimodal.makeWav(8000, 1200, seed = 1L)
    Multimodal.looksLikeWav(wav) shouldBe true
    Multimodal.decodeWav(wav) shouldBe Some((8000, 1, 1200L))
    // determinism (same bytes for same seed — the makePng contract)
    Multimodal.makeWav(8000, 1200, 1L).toSeq shouldBe Multimodal.makeWav(8000, 1200, 1L).toSeq
    // full stage over the planted fixture: audio ids 1/4/7 at the
    // (rate, frames) ladder → exact durations 150/40/20 ms
    val metas = Multimodal.decodeAudio(Multimodal.syntheticMediaWithAv(
        graft.queries.PlantedFixtures.mediaDocs(spark), "doc_id", "text"))
      .collect().sortBy(_.media_id)
    metas.map(m => (m.media_id, m.sample_rate, m.channels, m.n_frames, m.duration_ms))
      .toSeq shouldBe Seq(
        (1L, 8000, 1, 1200L, 150L),
        (4L, 11025, 1, 441L, 40L),
        (7L, 16000, 1, 320L, 20L))
    // non-WAV audio payloads degrade to the documented stub
    val stub = Multimodal.decodeAudio(Multimodal.syntheticMedia(
        graft.queries.PlantedFixtures.mediaDocs(spark), "doc_id", "text"))
      .collect().sortBy(_.media_id)
    stub.foreach { m => m.sample_rate shouldBe 16000; m.channels shouldBe 1 }
  }

  test("real GIF frame sampling: ImageIO reads the true planted frame counts") {
    import spark.implicits._
    // roundtrip: the generator's frame count reads back exactly
    Multimodal.countGifFrames(Multimodal.makeGif(8, 8, 14, seed = 2L)) shouldBe Some(14)
    Multimodal.countGifFrames(Multimodal.makeGif(8, 8, 1, seed = 9L)) shouldBe Some(1)
    // non-GIF bytes degrade to None, not an exception
    Multimodal.countGifFrames("not a gif".getBytes) shouldBe None
    Multimodal.looksLikeGif(Multimodal.makeGif(8, 8, 2, 0L)) shouldBe true
    // sampleFrames on GIF media: video ids 2/5/8 → planted 14/35/56
    // frames → 2/4/6 rows at stride 10 from the REAL container (the
    // stub would have derived counts from payload LENGTH, which for a
    // GIF is unrelated to its frame count)
    val gifMedia = Multimodal.syntheticMediaWithGif(
      graft.queries.PlantedFixtures.mediaDocs(spark), "doc_id", "text")
    val perVideo = Multimodal.sampleFrames(gifMedia, everyN = 10)
      .groupByKey(_.media_id).count()
      .collect().toMap
    perVideo shouldBe Map(2L -> 2L, 5L -> 4L, 8L -> 6L)
  }

  test("real MP4 demux pass: stts sample counts and mvhd duration read back exactly") {
    import spark.implicits._
    // roundtrip: two stts runs must be SUMMED (23 = 18 + 5), duration
    // is the generator's exact 40 ms/frame
    Multimodal.mp4Metadata(Multimodal.makeMp4(23, seed = 2L)) shouldBe Some((23, 920L))
    Multimodal.mp4Metadata(Multimodal.makeMp4(1, seed = 9L)) shouldBe Some((1, 40L))
    // non-MP4 bytes and truncated containers degrade to None
    Multimodal.mp4Metadata("not an mp4 container".getBytes) shouldBe None
    Multimodal.mp4Metadata(Multimodal.makeMp4(23, 2L).take(40)) shouldBe None
    Multimodal.looksLikeMp4(Multimodal.makeMp4(2, 0L)) shouldBe true
    // sampleFrames plans from the REAL box tree: ids 2/5/8 → planted
    // 23/50/77 stts samples → 3/5/8 rows at stride 10 (payload LENGTH
    // is unrelated to the frame count, so the stub can't fake this)
    val mp4Media = Multimodal.syntheticMediaWithMp4(
      graft.queries.PlantedFixtures.mediaDocs(spark), "doc_id", "text")
    Multimodal.sampleFrames(mp4Media, everyN = 10)
      .groupByKey(_.media_id).count()
      .collect().toMap shouldBe Map(2L -> 3L, 5L -> 5L, 8L -> 8L)
    // decodeVideo: the typed metadata pass over the same container
    Multimodal.decodeVideo(mp4Media).collect()
      .map(v => (v.media_id, v.n_frames, v.duration_ms)).sorted.toSeq shouldBe
      Seq((2L, 23L, 920L), (5L, 50L, 2000L), (8L, 77L, 3080L))
  }

  test("real resize: nearest-neighbor features match the hand-derived pixel formula") {
    val spark0 = spark
    import spark0.implicits._
    val media = Multimodal.syntheticMediaWithImages(
      graft.queries.PlantedFixtures.mediaDocs(spark), "doc_id", "text")
    val got = Multimodal.imageFeatures(media, 8, 8).collect().sortBy(_.media_id)
    // only the three decodable image rows survive the flatMap
    got.map(_.media_id).toSeq shouldBe Seq(0L, 3L, 6L)
    got.map(f => (f.in_w, f.in_h)).toSeq shouldBe Seq((16, 20), (19, 26), (22, 32))
    got.foreach { f => f.out_w shouldBe 8; f.out_h shouldBe 8 }
    // checksums hand-derived from makePng's rgb(x,y) = (id·31+y·w+x)
    // & 0xffffff with src = (dst·in)/out — any resampling-kernel or
    // decode drift breaks these exactly
    got.map(_.pixel_checksum).toSeq shouldBe
      Seq(6384305340962773029L, -7705017337060404435L, 6934956395450432565L)
    got.map(f => math.rint(f.mean_luma * 1e6) / 1e6).toSeq shouldBe
      Seq(12.727375, 14.324828, 14.475)
    // determinism across runs
    Multimodal.imageFeatures(media, 8, 8).collect().sortBy(_.media_id)
      .map(_.pixel_checksum).toSeq shouldBe got.map(_.pixel_checksum).toSeq
    // corrupt payload degrades to a drop, not a partition failure
    val corrupt = spark.createDataset(Seq(
      Multimodal.MediaRow(99L, "image", Array[Byte](0x89.toByte, 'P', 'N', 'G', 0, 1))))
    Multimodal.imageFeatures(corrupt, 8, 8).count() shouldBe 0L
  }

  test("payload never shuffles: decode is a narrow map, downstream carries metadata only") {
    val decoded = Multimodal.decode(media).toDF()
    // decode's output schema is pure metadata — the binary payload is
    // consumed inside the per-partition map and never leaves it
    decoded.columns.toSet shouldBe
      Set("media_id", "kind", "width", "height", "n_bytes", "checksum")
    // the decode stage plan itself contains no shuffle
    decoded.queryExecution.optimizedPlan.toString should not include "Repartition"
    // the aggregation shuffles on the metadata key, above the map
    val df = decoded.groupBy("kind").count()
    df.collect()
    df.queryExecution.executedPlan.toString should include("Exchange hashpartitioning(kind")
  }
}
