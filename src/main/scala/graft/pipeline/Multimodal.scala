package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns + typed metadata, processed in partition-sized batches.
  *
  * The Spark-side plumbing here is real — schema, batched mapPartitions
  * over a typed Dataset, deterministic output — but the DECODE step is a
  * STUB: this container has no image/audio codecs, so `decodeStub`
  * computes deterministic pseudo-features (length, header bytes, digest)
  * instead of pixels/samples. A real deployment swaps `decodeStub` for a
  * codec call (e.g. a JNI decoder or an Arrow-batched Python UDF) without
  * touching the surrounding plumbing.
  */
object Multimodal {

  case class MediaItem(id: Long, kind: String, media: Array[Byte])
  case class MediaFeatures(
      id: Long, kind: String, n_bytes: Long, header_hex: String, content_hash: String)

  /** STUB decode: deterministic pseudo-decode of an opaque blob. */
  def decodeStub(item: MediaItem): MediaFeatures = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(item.media).map("%02x".format(_)).mkString
    val header = item.media.take(8).map("%02x".format(_)).mkString
    MediaFeatures(item.id, item.kind, item.media.length.toLong, header, digest)
  }

  /** Batched feature extraction: one decoder instance per partition (the
    * shape a real codec needs), rows streamed — no per-row setup cost.
    */
  def extractFeatures(ds: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder setup would go here
      it.map(decodeStub)
    }
  }

  /** Wrap a DataFrame holding (id, kind, media binary) into the typed
    * pipeline and return the feature DataFrame.
    */
  def featurize(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    extractFeatures(df.select(
      col("id").cast("long").as("id"),
      col("kind").cast("string").as("kind"),
      col("media").cast("binary").as("media")).as[MediaItem]).toDF()
  }

  /** Resize stub: a real implementation decodes, resamples to w×h, and
    * re-encodes; the stub deterministically downsamples the BYTE stream to
    * w*h bytes (every k-th byte) so output sizes, schema, and partitioning
    * behave exactly like the real operator.
    */
  def resizeStub(ds: Dataset[MediaItem], w: Int, h: Int): Dataset[MediaItem] = {
    import ds.sparkSession.implicits._
    val target = w * h
    ds.mapPartitions(_.map { m =>
      val n = m.media.length
      val out =
        if (n <= target) m.media
        else Array.tabulate(target)(i => m.media((i.toLong * n / target).toInt))
      m.copy(media = out)
    })
  }

  /** Frame-sampling stub for video-shaped blobs: emits `frames` evenly
    * spaced fixed-size "frames" (byte windows) per input — the 1→N
    * flatMap shape (and output volume) of real frame extraction.
    */
  def sampleFramesStub(ds: Dataset[MediaItem], frames: Int, frameBytes: Int): DataFrame = {
    import ds.sparkSession.implicits._
    ds.flatMap { m =>
      val n = m.media.length
      (0 until frames).iterator.map { f =>
        val start = if (frames == 1) 0 else ((n.toLong - frameBytes).max(0) * f / (frames - 1)).toInt
        val end = math.min(start + frameBytes, n)
        (m.id, f, m.media.slice(start.max(0), end))
      }
    }.toDF("id", "frame", "frame_bytes")
  }
}
