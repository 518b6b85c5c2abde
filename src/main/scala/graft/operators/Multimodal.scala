package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * IMAGE decode is REAL: PNG/BMP/GIF payloads go through the
  * JDK-bundled `javax.imageio` ([[decodeImage]]) and yield true pixel
  * dimensions. AUDIO decode is REAL for WAV/PCM: `javax.sound.sampled`
  * ([[decodeWav]]) reads sample rate / channels / frame count off the
  * container header, no external codecs. VIDEO is the one remaining
  * STUB (no video codec ships with the JVM): [[decodeStub]] derives
  * deterministic fake dimensions from the payload bytes, as does the
  * audio fallback for compressed (non-WAV) payloads. Everything around
  * the kernels — the schema, the batched per-partition execution
  * shape, the partitioning behavior — is real and tested either way.
  *
  * Execution shape: `mapPartitions` over the typed Dataset, so the
  * decoder amortizes any per-batch init (model load, codec context)
  * across the partition — the same contract a vectorized/batched UDF
  * gives Python pipelines. Payload bytes never shuffle: decode is a
  * narrow map, and downstream aggregations move only the small metadata.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class DecodedMedia(media_id: Long, kind: String, width: Int,
                          height: Int, n_bytes: Long, checksum: Long)
  case class Frame(media_id: Long, frame_idx: Int, frame_checksum: Long)
  case class AudioMeta(media_id: Long, sample_rate: Int, channels: Int,
                       n_frames: Long, duration_ms: Long)
  case class ImageFeatures(media_id: Long, in_w: Int, in_h: Int,
                           out_w: Int, out_h: Int, pixel_checksum: Long,
                           mean_luma: Double)

  /** Payload checksum (order-sensitive polynomial over bytes; shared by
    * the real and stub kernels so downstream joins don't care which
    * decoded a row). */
  def payloadChecksum(payload: Array[Byte]): Long = {
    var cs = 1125899906842597L
    var i = 0
    while (i < payload.length) { cs = cs * 31 + payload(i); i += 1 }
    cs
  }

  /** Deterministic fake "decode" for kinds with no codec in this
    * container (audio/video): dimensions derived from payload bytes. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Long) = {
    val cs = payloadChecksum(payload)
    val w = 32 + math.floorMod(cs, 608).toInt        // fake 32..639
    val h = 32 + math.floorMod(cs >> 16, 448).toInt  // fake 32..479
    (w, h, cs)
  }

  private val PngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G')

  def looksLikePng(payload: Array[Byte]): Boolean =
    payload.length >= 4 && payload(0) == PngMagic(0) && payload(1) == PngMagic(1) &&
      payload(2) == PngMagic(2) && payload(3) == PngMagic(3)

  /** REAL image decode via the JDK's ImageIO (PNG/BMP/GIF — no
    * external codecs needed): true width/height, payload checksum.
    * Falls back to the stub when ImageIO can't read the bytes, so a
    * corrupt image degrades instead of failing the partition. */
  def decodeImage(payload: Array[Byte]): (Int, Int, Long) = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      // NonFatal, not just IOException: the JDK readers throw runtime
      // exceptions on some malformed headers, and a corrupt image must
      // degrade to the stub, not kill the partition
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) decodeStub(payload)
    else (img.getWidth, img.getHeight, payloadChecksum(payload))
  }

  /** Deterministic PNG generator (executor-safe, JDK-only): a w×h RGB
    * image whose pixels derive from `seed` — the synthetic-media
    * builder for image rows, decodable by [[decodeImage]] to its TRUE
    * dimensions. */
  def makePng(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((seed * 31 + y.toLong * w + x) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def looksLikeGif(payload: Array[Byte]): Boolean =
    payload.length >= 4 && payload(0) == 'G' && payload(1) == 'I' &&
      payload(2) == 'F' && payload(3) == '8'

  /** Deterministic ANIMATED GIF generator (executor-safe, JDK-only —
    * ImageIO's GIF writer supports multi-frame sequences without
    * external codecs): `nFrames` w×h frames whose pixels derive from
    * `seed` and the frame index. The video twin of [[makePng]]/
    * [[makeWav]]: a planted fixture whose TRUE frame count
    * [[countGifFrames]] reads back exactly. */
  def makeGif(w: Int, h: Int, nFrames: Int, seed: Long): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, ((seed * 31 + f.toLong * w * h + y.toLong * w + x) & 0xffffff).toInt)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** REAL frame count of an animated-image payload via the JDK's
    * ImageIO reader (`getNumImages(allowSearch = true)` walks the
    * container's frame blocks — no decode of pixel data). None when no
    * reader claims the bytes or the container is corrupt — the same
    * degrade-don't-die contract as [[decodeImage]]. */
  def countGifFrames(payload: Array[Byte]): Option[Int] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try { r.setInput(iis); Some(r.getNumImages(true)).filter(_ > 0) }
          finally r.dispose()
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  def looksLikeMp4(payload: Array[Byte]): Boolean =
    payload.length >= 12 && payload(4) == 'f' && payload(5) == 't' &&
      payload(6) == 'y' && payload(7) == 'p'

  private def be32(p: Array[Byte], off: Int): Int =
    ((p(off) & 0xff) << 24) | ((p(off + 1) & 0xff) << 16) |
      ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)

  /** Payload spans `(from, to)` of every direct child box of type
    * `tpe` inside `[from, to)` — one level of the ISO BMFF (MP4) box
    * tree, walked by the size/type headers alone (32-bit, 64-bit
    * `largesize`, and to-end `size=0` forms). Stops at the first
    * malformed header instead of throwing: a truncated container
    * yields what was walkable. */
  private def mp4ChildBoxes(p: Array[Byte], from: Int, to: Int,
                            tpe: String): Seq[(Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var off = from
    var ok = true
    while (ok && off + 8 <= to) {
      val size32 = be32(p, off)
      var hdr = 8L
      val boxSize: Long =
        if (size32 == 0) (to - off).toLong
        else if (size32 == 1 && off + 16 <= to) {
          hdr = 16L
          ((be32(p, off + 8).toLong & 0xffffffffL) << 32) |
            (be32(p, off + 12).toLong & 0xffffffffL)
        } else size32.toLong
      if (boxSize < hdr || off + boxSize > to) ok = false
      else {
        if (new String(p, off + 4, 4, "US-ASCII") == tpe)
          out += (((off + hdr).toInt, (off + boxSize).toInt))
        off += boxSize.toInt
      }
    }
    out.toSeq
  }

  /** REAL MP4 metadata off the container's index boxes — a demuxer's
    * header pass, no codec needed: walks `moov/trak/mdia`, keeps tracks
    * whose `hdlr` handler is `vide`, and sums the sample counts of
    * their `stbl/stts` (time-to-sample) entries for the TRUE frame
    * count; movie duration comes from `mvhd` timescale ticks. Returns
    * (n_frames, duration_ms); None when the bytes aren't a walkable
    * MP4 with a video track — the degrade-don't-die contract of
    * [[decodeImage]]/[[countGifFrames]]. */
  def mp4Metadata(p: Array[Byte]): Option[(Int, Long)] =
    try {
      if (!looksLikeMp4(p)) None
      else mp4ChildBoxes(p, 0, p.length, "moov").headOption.flatMap { case (ms, me) =>
        val durMs = mp4ChildBoxes(p, ms, me, "mvhd").headOption.flatMap {
          case (s, e) =>
            // version-0 mvhd: timescale at +12, duration at +16
            if (e - s >= 20 && p(s) == 0 && be32(p, s + 12) > 0)
              Some(be32(p, s + 16).toLong * 1000L / be32(p, s + 12))
            else None
        }
        var frames = 0L
        for ((ts, te) <- mp4ChildBoxes(p, ms, me, "trak");
             (ds, de) <- mp4ChildBoxes(p, ts, te, "mdia")) {
          val isVideo = mp4ChildBoxes(p, ds, de, "hdlr").headOption.exists {
            case (s, e) =>
              e - s >= 12 && new String(p, s + 8, 4, "US-ASCII") == "vide"
          }
          if (isVideo)
            for ((fs, fe) <- mp4ChildBoxes(p, ds, de, "minf");
                 (bs, be) <- mp4ChildBoxes(p, fs, fe, "stbl");
                 (xs, xe) <- mp4ChildBoxes(p, bs, be, "stts")) {
              val n = be32(p, xs + 4)
              var i = 0
              while (i < n && xs + 16 + 8 * i <= xe) {
                frames += be32(p, xs + 8 + 8 * i).toLong & 0xffffffffL
                i += 1
              }
            }
        }
        if (frames > 0 && frames <= Int.MaxValue)
          Some((frames.toInt, durMs.getOrElse(0L)))
        else None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** One ISO BMFF box: 32-bit size header + type + concatenated
    * payload. */
  private def mp4Box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + payload.map(_.length).sum)
    bb.putInt(bb.capacity).put(tpe.getBytes("US-ASCII"))
    payload.foreach(bb.put)
    bb.array()
  }

  private def beBytes(vals: Int*): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 * vals.length)
    vals.foreach(bb.putInt)
    bb.array()
  }

  /** Deterministic minimal MP4 generator (executor-safe, pure JVM byte
    * assembly): the metadata box tree a demuxer's index pass reads —
    * `ftyp` + `moov(mvhd, trak(tkhd, mdia(mdhd, hdlr=vide,
    * minf(stbl(stts)))))` + a seed-derived `mdat` — with `nFrames`
    * video samples split across TWO `stts` runs (so a reader must SUM
    * entries, not take the first) at 512 ticks each on a 12800
    * timescale: duration_ms = nFrames · 40 exactly. The video twin of
    * [[makePng]]/[[makeWav]]; [[mp4Metadata]] reads both numbers back
    * off the container. No sample data is encoded — this is the
    * metadata shape, which is exactly what a no-codec header pass can
    * honestly parse. */
  def makeMp4(nFrames: Int, seed: Long): Array[Byte] = {
    require(nFrames > 0, "nFrames must be > 0")
    val timescale = 12800
    val delta = 512
    val duration = nFrames * delta
    val c2 = nFrames / 4
    val c1 = nFrames - c2
    val sttsEntries =
      if (c2 == 0) beBytes(1, c1, delta)
      else beBytes(2, c1, delta, c2, delta)
    val stts = mp4Box("stts", beBytes(0), sttsEntries)
    val stbl = mp4Box("stbl", stts)
    val minf = mp4Box("minf", stbl)
    val hdlr = mp4Box("hdlr", beBytes(0, 0),
      "vide".getBytes("US-ASCII"), new Array[Byte](12 + 1))
    val mdhd = mp4Box("mdhd", beBytes(0, 0, 0, timescale, duration),
      Array[Byte](0x55, 0xc4.toByte, 0, 0)) // language "und" + predefined
    val mdia = mp4Box("mdia", mdhd, hdlr, minf)
    val tkhd = mp4Box("tkhd", beBytes(7, 0, 0, 1, 0, duration, 0, 0),
      new Array[Byte](8), // layer/alt-group/volume/reserved
      beBytes(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000), // matrix
      beBytes(8 << 16, 8 << 16)) // 8.0 × 8.0 fixed-point
    val mvhd = mp4Box("mvhd", beBytes(0, 0, 0, timescale, duration, 0x10000),
      Array[Byte](1, 0), new Array[Byte](10),
      beBytes(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000),
      new Array[Byte](24), beBytes(2))
    val moov = mp4Box("moov", mvhd, mp4Box("trak", tkhd, mdia))
    val ftyp = mp4Box("ftyp", "isom".getBytes("US-ASCII"), beBytes(0x200),
      "isommp41".getBytes("US-ASCII"))
    val mdat = {
      val data = new Array[Byte](32)
      var st = seed
      var i = 0
      while (i < data.length) {
        st = st * 6364136223846793005L + 1442695040888963407L
        data(i) = (st >>> 56).toByte
        i += 1
      }
      mp4Box("mdat", data)
    }
    ftyp ++ moov ++ mdat
  }

  def looksLikeWav(payload: Array[Byte]): Boolean =
    payload.length >= 12 &&
      payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F' &&
      payload(8) == 'W' && payload(9) == 'A' && payload(10) == 'V' && payload(11) == 'E'

  /** Deterministic 16-bit PCM mono WAV generator (executor-safe,
    * JDK-only — `javax.sound.sampled` writes WAVE containers without
    * external codecs): `nFrames` samples at `sampleRate`, sample values
    * from an LCG over `seed`. The audio twin of [[makePng]]: a planted
    * fixture whose duration_ms = nFrames·1000/sampleRate is exact by
    * construction. */
  def makeWav(sampleRate: Int, nFrames: Int, seed: Long): Array[Byte] = {
    val data = new Array[Byte](nFrames * 2)
    var i = 0
    var st = seed
    while (i < nFrames) {
      st = st * 6364136223846793005L + 1442695040888963407L
      val s = (st >>> 48).toInt
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio decode for WAV/PCM via the JDK's `javax.sound.sampled`
    * (pure JVM — no codecs needed): true sample rate, channel count and
    * frame length off the container header. Returns None for payloads
    * the JDK can't read (compressed formats — the remaining stub
    * territory along with video). */
  def decodeWav(payload: Array[Byte]): Option[(Int, Int, Long)] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val f = ais.getFormat
      Some((f.getSampleRate.toInt, f.getChannels, ais.getFrameLength))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Audio decode stage: per-partition map over audio rows → typed
    * audio metadata. WAV payloads decode for REAL ([[decodeWav]] —
    * duration_ms is exact integer math over the header's frame count
    * and rate); non-WAV payloads fall to a deterministic stub (16 kHz
    * mono, one fake frame per payload byte), the same degrade-don't-die
    * contract as [[decodeImage]]. */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[AudioMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "audio").mapPartitions { rows =>
      rows.map { r =>
        decodeWav(r.payload) match {
          case Some((rate, ch, frames)) =>
            AudioMeta(r.media_id, rate, ch, frames, frames * 1000L / rate)
          case None =>
            val fakeFrames = r.payload.length.toLong
            AudioMeta(r.media_id, 16000, 1, fakeFrames, fakeFrames * 1000L / 16000)
        }
      }
    }
  }

  /** Wrap any table into a media table: payload = utf8 bytes of a text
    * column (the deterministic stand-in for real image bytes). */
  def syntheticMedia(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        when(pmod(col(idCol), lit(3)) === 0, "image")
          .when(pmod(col(idCol), lit(3)) === 1, "audio").otherwise("video").as("kind"),
        col(textCol).cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** Decode stage: batched per-partition map; per-partition init cost
    * (real codec/model) amortizes across rows. Image rows decode for
    * real through ImageIO; audio/video fall to the stub. */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (codec context, model handle)
      rows.map { r =>
        val (w, h, cs) =
          if (r.kind == "image" && looksLikePng(r.payload)) decodeImage(r.payload)
          else decodeStub(r.payload)
        DecodedMedia(r.media_id, r.kind, w, h, r.payload.length.toLong, cs)
      }
    }
  }

  /** Synthetic media with REAL image payloads: image-kind rows carry a
    * deterministic PNG whose dimensions derive from the id (width =
    * 16 + id mod 16, height = 20 + 2·(id mod 8)); audio/video rows keep
    * utf8-text payloads for the stub path. */
  def syntheticMediaWithImages(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    syntheticMedia(df, idCol, textCol).map { r =>
      if (r.kind == "image")
        r.copy(payload = makePng(16 + (r.media_id % 16).toInt,
          20 + 2 * (r.media_id % 8).toInt, r.media_id))
      else r
    }
  }

  /** The audio sample-rate / frame-count ladder for [[syntheticMediaWithAv]],
    * derived from the media id: rates cycle (8000, 11025, 16000) and
    * frame counts (1200, 441, 320) are chosen so duration_ms is exact
    * integer milliseconds (150, 40, 20). */
  def wavParamsFor(mediaId: Long): (Int, Int) = {
    val i = ((mediaId / 3) % 3).toInt
    (Seq(8000, 11025, 16000)(i), Seq(1200, 441, 320)(i))
  }

  /** Synthetic media with REAL image AND audio payloads: images as in
    * [[syntheticMediaWithImages]]; audio-kind rows carry a deterministic
    * 16-bit PCM WAV ([[makeWav]], params from [[wavParamsFor]]). Video
    * remains the only stubbed kind (no video codec ships with the JVM). */
  def syntheticMediaWithAv(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    syntheticMediaWithImages(df, idCol, textCol).map { r =>
      if (r.kind == "audio") {
        val (rate, frames) = wavParamsFor(r.media_id)
        r.copy(payload = makeWav(rate, frames, r.media_id))
      } else r
    }
  }

  /** Resize stage (stub): metadata-only transform — a real resize maps
    * payload→payload with the same narrow-map shape. */
  def resize(decoded: Dataset[DecodedMedia], maxW: Int, maxH: Int): Dataset[DecodedMedia] = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.map { d =>
      val scale = math.min(1.0, math.min(maxW.toDouble / d.width, maxH.toDouble / d.height))
      d.copy(width = math.max(1, (d.width * scale).toInt),
        height = math.max(1, (d.height * scale).toInt))
    }
  }

  /** REAL resize + feature extraction for image rows: decode the
    * payload, resample to `outW`×`outH` with NEAREST-NEIGHBOR index
    * arithmetic over the decoded RGB grid (`src = (x·inW) / outW`,
    * integer division) — deliberately NOT Graphics2D/`getScaledInstance`
    * filtering, whose resampling kernels vary by JVM implementation;
    * determinism is the contract, so the planted-fixture oracle can
    * hand-derive every output pixel from [[makePng]]'s formula. Emits
    * the resized grid's polynomial checksum (same recurrence as
    * [[payloadChecksum]], over masked RGB ints) and its mean Rec.601
    * luma — the stand-ins for "embed this thumbnail" feature vectors.
    *
    * flatMap (0-or-1): non-image rows and undecodable payloads drop —
    * the degrade-don't-die accounting lives in [[decode]], which keeps
    * every row; this is the downstream stage that only consumes
    * decodable images. Scale posture: partition-local map, payload
    * bytes never shuffle (only the fixed-size feature row comes out). */
  def imageFeatures(media: Dataset[MediaRow], outW: Int, outH: Int): Dataset[ImageFeatures] = {
    require(outW > 0 && outH > 0, s"bad output size ${outW}x$outH")
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      val img =
        if (r.kind != "image") null
        else
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) None
      else {
        val inW = img.getWidth
        val inH = img.getHeight
        var cs = 1125899906842597L
        var lumaSum = 0.0
        var y = 0
        while (y < outH) {
          var x = 0
          while (x < outW) {
            val v = img.getRGB(x * inW / outW, y * inH / outH) & 0xffffff
            cs = cs * 31 + v
            lumaSum += 0.299 * ((v >> 16) & 0xff) +
              0.587 * ((v >> 8) & 0xff) + 0.114 * (v & 0xff)
            x += 1
          }
          y += 1
        }
        Some(ImageFeatures(r.media_id, inW, inH, outW, outH, cs,
          lumaSum / (outW * outH)))
      }
    }
  }

  /** Frame sampling for "video" rows: 1 row in, n rows out (flatMap —
    * the UDTF shape). Animated-GIF payloads sample their REAL frame
    * count ([[countGifFrames]] — the JDK reads GIF frame blocks without
    * external codecs); MP4 payloads their REAL `stts` sample count
    * ([[mp4Metadata]] — a byte-level header pass over the box tree);
    * anything else falls to the stub count = 30 + payload length mod
    * 270 (length-derived, so a planted fixture's frame counts stay
    * hand-computable). Decoding PIXELS from compressed video remains
    * out of scope — no codec ships with the JVM — but the container
    * metadata a frame sampler actually plans from is read for real. */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int = 10): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val cs = payloadChecksum(r.payload)
      val nFrames =
        (if (looksLikeGif(r.payload)) countGifFrames(r.payload)
         else if (looksLikeMp4(r.payload)) mp4Metadata(r.payload).map(_._1)
         else None)
          .getOrElse(30 + (r.payload.length % 270))
      (0 until nFrames by everyN).map(i => Frame(r.media_id, i, cs * 31 + i))
    }
  }

  case class VideoMeta(media_id: Long, n_frames: Long, duration_ms: Long)

  /** Video metadata decode: per-partition map over video rows → frame
    * count + duration off the REAL container (MP4 `stts`/`mvhd` via
    * [[mp4Metadata]], animated GIF via [[countGifFrames]] at a nominal
    * 25 fps); unreadable payloads fall to the length-derived stub at
    * the stub's 30 fps — the audio/image degrade contract. */
  def decodeVideo(media: Dataset[MediaRow]): Dataset[VideoMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").mapPartitions { rows =>
      rows.map { r =>
        mp4Metadata(r.payload) match {
          case Some((frames, durMs)) => VideoMeta(r.media_id, frames.toLong, durMs)
          case None =>
            countGifFrames(r.payload) match {
              case Some(frames) => VideoMeta(r.media_id, frames.toLong, frames * 40L)
              case None =>
                val fakeFrames = (30 + (r.payload.length % 270)).toLong
                VideoMeta(r.media_id, fakeFrames, fakeFrames * 1000L / 30)
            }
        }
      }
    }
  }

  /** Synthetic media with REAL image, audio AND video payloads: on top
    * of [[syntheticMediaWithAv]], video-kind rows carry a deterministic
    * ANIMATED GIF ([[makeGif]]) with 7·(id mod 9) frames (min 1) — ids
    * 2/5/8 → 14/35/56 frames, planted so sampled-frame counts are
    * hand-computable from the REAL container, not the stub. */
  def syntheticMediaWithGif(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    syntheticMediaWithAv(df, idCol, textCol).map { r =>
      if (r.kind == "video")
        r.copy(payload = makeGif(8, 8, math.max(1, 7 * (r.media_id % 9).toInt), r.media_id))
      else r
    }
  }

  /** Synthetic media with MP4 video payloads: video-kind rows carry a
    * deterministic minimal MP4 ([[makeMp4]]) with 5 + 9·(id mod 9)
    * frames — ids 2/5/8 → 23/50/77 frames, 920/2000/3080 ms at the
    * generator's exact 40 ms/frame — planted so sampled-frame counts
    * and durations are hand-computable from the REAL box tree. */
  def syntheticMediaWithMp4(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    syntheticMediaWithAv(df, idCol, textCol).map { r =>
      if (r.kind == "video")
        r.copy(payload = makeMp4(5 + 9 * (r.media_id % 9).toInt, r.media_id))
      else r
    }
  }
}
