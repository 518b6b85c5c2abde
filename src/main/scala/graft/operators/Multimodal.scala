package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * IMAGE decode is REAL: PNG/BMP/GIF payloads go through the
  * JDK-bundled `javax.imageio` ([[decodeImage]]) and yield true pixel
  * dimensions. Audio/video kernels remain STUBS (this container has no
  * media codecs): [[decodeStub]] derives deterministic fake dimensions
  * from the payload bytes. Everything around the kernels — the schema,
  * the batched per-partition execution shape, the partitioning
  * behavior — is real and tested either way.
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

  /** Frame sampling for "video" rows: 1 row in, n rows out (flatMap —
    * the UDTF shape). Stub frame count = 30 + payload length mod 270
    * (length-derived, so a planted fixture's frame counts are
    * hand-computable; a real demuxer would read the container header
    * here). */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int = 10): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val cs = payloadChecksum(r.payload)
      val nFrames = 30 + (r.payload.length % 270)
      (0 until nFrames by everyN).map(i => Frame(r.media_id, i, cs * 31 + i))
    }
  }
}
