package graft.operators

import graft.functions.{DetRand => R}
import graft.functions.Num._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star spec): media as opaque BINARY columns
  * with typed metadata; decode / feature-extract / frame-sample as distributed
  * per-partition transforms.
  *
  * The actual codec is STUBBED — image/audio libraries are not in this
  * environment — with a deterministic fake decoder ([[fakeDecode]]), clearly
  * marked. Everything Spark-side is real and tested: the schema, the binary
  * payload generation, partitioning, the mapPartitions batch shape, and the
  * feature aggregation that follows a decode.
  *
  * Scale: payloads never shuffle — decode/feature-extract are narrow
  * per-partition passes; only the small (media_id, feature) projections move.
  * That is the invariant that matters at 100 TB of media: metadata flows
  * through joins, bytes stay put.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, width: Int, height: Int, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           mean_byte: Double, max_byte: Int, checksum: Long)

  /** Synthetic media table: deterministic pseudo-random payload per id.
    * Payload bytes come from the same LCG family as everything else, so the
    * table is reproducible across runs/engines.
    */
  def mediaTable(spark: SparkSession, n: Long = 64, bytesPer: Int = 4096): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val kind = if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video"
        val payload = new Array[Byte](bytesPer)
        var x = (id * 40503 + 12345) % 2147483648L
        var i = 0
        while (i < bytesPer) {
          x = (x * 69069 + 12345) % 2147483648L
          payload(i) = (x >>> 8).toByte
          i += 1
        }
        MediaRow(id, kind, 64, 48, payload)
      }
    }.toDF()
  }

  /** STUB decoder: a real deployment would decode image/audio bytes here
    * (one codec call per row, batched per partition). The fake is
    * deterministic: byte-level statistics standing in for pixel statistics.
    */
  private def fakeDecode(row: MediaRow): MediaFeatures = {
    var sum = 0L
    var mx = 0
    var ck = 1125899906842597L
    var i = 0
    while (i < row.payload.length) {
      val b = row.payload(i) & 0xff
      sum += b
      if (b > mx) mx = b
      ck = ck * 31 + b
      i += 1
    }
    MediaFeatures(row.media_id, row.kind, row.payload.length,
      sum.toDouble / row.payload.length, mx, ck)
  }

  /** Decode + feature-extract: narrow mapPartitions, no payload shuffle. */
  def extractFeatures(spark: SparkSession, n: Long = 64): DataFrame = {
    import spark.implicits._
    mediaTable(spark, n).as[MediaRow].mapPartitions(_.map(fakeDecode)).toDF()
  }

  /** Frame sampling for video rows: every strideth 1 KiB block becomes a
    * "frame" row — the explode happens on offsets, payload slicing is narrow.
    */
  def frameSample(spark: SparkSession, n: Long = 64, stride: Int = 4): DataFrame = {
    import spark.implicits._
    mediaTable(spark, n).as[MediaRow]
      .filter(_.kind == "video")
      .flatMap { r =>
        val frameSize = 1024
        val nFrames = r.payload.length / frameSize
        (0 until nFrames by stride).map { f =>
          val slice = java.util.Arrays.copyOfRange(r.payload, f * frameSize, (f + 1) * frameSize)
          (r.media_id, f, slice.length, slice.map(_ & 0xff).sum.toDouble / slice.length)
        }
      }
      .toDF("media_id", "frame_id", "frame_bytes", "frame_mean")
  }

  /** Per-kind feature aggregates — the post-decode relational hop. */
  def kindStats(spark: SparkSession, n: Long = 64): DataFrame =
    extractFeatures(spark, n)
      .groupBy("kind")
      .agg(count(lit(1)).as("n_media"),
        r6(avg(col("mean_byte"))).as("avg_mean_byte"),
        max(col("max_byte")).as("max_byte"))

  /** Rows-only driver checks (binary + JVM-closure transforms aren't
    * SQL-expressible; correctness is covered by MultimodalSpec's determinism
    * and shape assertions).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_features" -> ((s, _) => extractFeatures(s).orderBy("media_id")),
    "media_frame_sample" -> ((s, _) => frameSample(s).orderBy("media_id", "frame_id")),
    "media_kind_stats" -> ((s, _) => kindStats(s).orderBy("kind"))
  )

  def oracles: Map[String, String] = Map.empty
}
