package pipeline.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video ride as opaque `binary`
 * columns with typed metadata. The Spark-side machinery (schema,
 * partition-friendly batch shape, per-partition decoder lifecycle) is
 * real and tested; the actual codec calls are STUBBED behind
 * [[StubCodecs]] with a deterministic fake (the image/audio libraries
 * are not in this container) — swap `StubCodecs` for a real binding
 * (e.g. TwelveMonkeys/JavaCV) on a cluster.
 */
object Multimodal {

  /** One media asset row. `bytes` is the opaque payload. */
  final case class MediaAsset(asset_id: Long, kind: String, bytes: Array[Byte])

  /** Typed decode result. */
  final case class MediaMeta(asset_id: Long, kind: String, n_bytes: Long,
                             width: Int, height: Int, duration_ms: Long, ok: Boolean)

  /** Deterministic fake codec: "decodes" metadata from payload length and
    * a stable byte checksum. Marked clearly as the stub seam. */
  object StubCodecs {
    /** STUB — replace with a real image/audio header parse on a cluster. */
    def decode(kind: String, bytes: Array[Byte]): (Int, Int, Long, Boolean) = {
      if (bytes == null || bytes.isEmpty) return (0, 0, 0L, false)
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum = (sum * 31 + (bytes(i) & 0xff)) & 0x7fffffff; i += 1 }
      kind match {
        case "image" => (((sum % 1920) + 1).toInt, ((sum % 1080) + 1).toInt, 0L, true)
        case "audio" | "video" => (0, 0, (sum % 600000) + 1, true)
        case _ => (0, 0, 0L, false)
      }
    }
  }

  /**
   * Decode/feature-extract over binary payloads. `mapPartitions` so a real
   * codec would be initialized once per partition (the per-partition
   * decoder-lifecycle pattern), with rows streamed through — the Scala
   * analog of `mapInPandas` batch decoding.
   */
  def decodeMeta(assets: Dataset[MediaAsset]): Dataset[MediaMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // real impl: val codec = Codec.open() here, close via CompletionIterator
      it.map { a =>
        val (w, h, d, ok) = StubCodecs.decode(a.kind, a.bytes)
        MediaMeta(a.asset_id, a.kind,
          if (a.bytes == null) 0L else a.bytes.length.toLong, w, h, d, ok)
      }
    }
  }

  /**
   * Frame sampling plumbing: 1 video row → N frame rows (the UDTF/explode
   * shape). Frame payloads are stubbed as byte slices; the row explosion,
   * schema and ordering are the real contract.
   */
  def sampleFrames(assets: Dataset[MediaAsset], everyMs: Long): DataFrame = {
    require(everyMs > 0, s"everyMs must be positive, got $everyMs")
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "video").flatMap { a =>
      val (_, _, dur, ok) = StubCodecs.decode(a.kind, a.bytes)
      if (!ok) Iterator.empty
      else (0L until dur by everyMs).iterator.map { t =>
        val off = (t % math.max(a.bytes.length, 1)).toInt
        (a.asset_id, t, a.bytes.slice(off, math.min(off + 16, a.bytes.length)))
      }
    }.toDF("asset_id", "frame_ts_ms", "frame_bytes")
  }

  /**
   * Resize plumbing: image rows → fixed-target payloads. Real contract:
   * per-partition codec lifecycle, output schema (asset_id, width, height,
   * bytes), deterministic output sizing; the pixel work is the stub. On a
   * cluster the inner function binds an actual scaler; everything around
   * it (distribution, batching, schema) is unchanged.
   */
  def resize(assets: Dataset[MediaAsset], maxW: Int, maxH: Int): DataFrame = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "image").mapPartitions { it =>
      // real impl: scaler initialized once per partition here
      it.flatMap { a =>
        val (w, h, _, ok) = StubCodecs.decode(a.kind, a.bytes)
        if (!ok) Iterator.empty
        else {
          val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
          val (nw, nh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
          // STUB pixels: deterministic truncation proportional to area ratio
          val outLen = math.max(1, (a.bytes.length * (nw.toLong * nh) / math.max(1L, w.toLong * h)).toInt)
          Iterator((a.asset_id, nw, nh, a.bytes.take(outLen)))
        }
      }
    }.toDF("asset_id", "width", "height", "bytes")
  }

  /** Column-only binary feature extraction (no stub needed): sizes and a
    * magic-byte sniff — fully portable to the SQL oracle. */
  def binaryFeatures(df: DataFrame, bytesCol: String): DataFrame =
    df.withColumn("n_bytes", octet_length(col(bytesCol)).cast("long"))
      .withColumn("magic_hex", hex(substring(col(bytesCol), 1, 4)))
      .withColumn("looks_html",
        substring(col(bytesCol), 1, 6).cast("string").startsWith("<html>"))
}
