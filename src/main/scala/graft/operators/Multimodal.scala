package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The decode kernels are STUBS (this container has no image/audio
  * codecs): [[decodeImageStub]] derives deterministic fake dimensions
  * from the payload bytes. Everything AROUND the stub — the schema, the
  * batched per-partition execution shape, the partitioning behavior —
  * is real and tested. Swapping in a real codec changes only the stub
  * body.
  *
  * Execution shape: `mapPartitions` over the typed Dataset, so a real
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

  /** Deterministic fake "decode": dimensions and checksum derived from
    * payload bytes. ??? -> real codec goes here. */
  def decodeImageStub(payload: Array[Byte]): (Int, Int, Long) = {
    var cs = 1125899906842597L
    var i = 0
    while (i < payload.length) { cs = cs * 31 + payload(i); i += 1 }
    val w = 32 + math.floorMod(cs, 608).toInt        // fake 32..639
    val h = 32 + math.floorMod(cs >> 16, 448).toInt  // fake 32..479
    (w, h, cs)
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
    * (real codec/model) amortizes across rows. */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (codec context, model handle)
      rows.map { r =>
        val (w, h, cs) = decodeImageStub(r.payload)
        DecodedMedia(r.media_id, r.kind, w, h, r.payload.length.toLong, cs)
      }
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
    * the UDTF shape). Frame count derived deterministically. */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int = 10): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val (_, _, cs) = decodeImageStub(r.payload)
      val nFrames = 30 + math.floorMod(cs, 270).toInt
      (0 until nFrames by everyN).map(i => Frame(r.media_id, i, cs * 31 + i))
    }
  }
}
