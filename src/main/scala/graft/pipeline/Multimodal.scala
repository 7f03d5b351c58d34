package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns + typed metadata, processed in partition-sized batches.
  *
  * The IMAGE decode path is REAL since round 7: `decodeImage` decodes
  * PNG/JPEG/BMP/GIF through `javax.imageio` (the readers ship with the
  * JDK — pure JVM, no native codecs), reads pixels via the raster (NOT
  * `getRGB`, whose gray→sRGB color conversion is not the identity), and
  * falls back to the original `decodeStub` pseudo-features for media no
  * installed reader understands. The AUDIO path is equally real:
  * `decodeAudio`/`audioWindows` parse WAV/AU/AIFF and expand µ-law/a-law
  * through `javax.sound.sampled` (also JDK-shipped) into 16-bit PCM.
  * Only the compressed codec zoo (JPEG2000, MP3/AAC, H.26x) is out of
  * scope for this container. Correctness is oracle-gated: p12/p37/p41/p42
  * generate fixtures from closed-form pixel/sample formulas and DuckDB
  * recomputes the decoded sums from the formula alone — a decoder
  * misreading any pixel or sample fails the gate.
  */
object Multimodal {

  case class MediaItem(id: Long, kind: String, media: Array[Byte])
  case class MediaFeatures(
      id: Long, kind: String, n_bytes: Long, header_hex: String, content_hash: String)

  /** Decoded media features: `decoder` records which path produced them —
    * "imageio" (real pixels; width/height/gray_sum are exact) or "stub"
    * (no installed reader; dimensions are -1, hash/length still real).
    */
  case class DecodedMedia(id: Long, kind: String, n_bytes: Long, decoder: String,
      width: Long, height: Long, gray_sum: Long, content_hash: String)

  /** STUB decode: deterministic pseudo-decode of an opaque blob. Kept as
    * the fallback for media without a pure-JVM reader.
    */
  def decodeStub(item: MediaItem): MediaFeatures = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(item.media).map("%02x".format(_)).mkString
    val header = item.media.take(8).map("%02x".format(_)).mkString
    MediaFeatures(item.id, item.kind, item.media.length.toLong, header, digest)
  }

  // ---- real image path (javax.imageio) ----

  private def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage =
    try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    catch { case _: Exception => null } // corrupt/truncated media → fallback

  /** Mean of the color bands (alpha excluded) at one pixel: exact for
    * gray images (1 band, raster sample = stored byte) and deterministic
    * integer math for RGB. Palette-indexed images (GIF, indexed PNG)
    * store PALETTE INDICES in the raster — summing those would be
    * confidently wrong — so the index is resolved through the
    * IndexColorModel to its RGB entry first.
    */
  private def graySample(img: java.awt.image.BufferedImage, x: Int, y: Int): Int =
    img.getColorModel match {
      case icm: java.awt.image.IndexColorModel =>
        val idx = img.getRaster.getSample(x, y, 0)
        (icm.getRed(idx) + icm.getGreen(idx) + icm.getBlue(idx)) / 3
      case cm =>
        // color components only — numBands would average the ALPHA band
        // into the gray value on 2-band gray+alpha rasters (PNG color
        // type 4), where min(numBands, 3) = 2 includes it
        val raster = img.getRaster
        val bands = math.min(cm.getNumColorComponents, raster.getNumBands)
        var s = 0
        var b = 0
        while (b < bands) { s += raster.getSample(x, y, b); b += 1 }
        s / bands
    }

  /** REAL decode: pixels via javax.imageio, stub fallback otherwise. */
  def decodeImage(item: MediaItem): DecodedMedia = {
    val stub = decodeStub(item)
    val img = readImage(item.media)
    if (img == null)
      DecodedMedia(item.id, item.kind, stub.n_bytes, "stub", -1L, -1L, -1L,
        stub.content_hash)
    else {
      var sum = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) { sum += graySample(img, x, y); x += 1 }
        y += 1
      }
      DecodedMedia(item.id, item.kind, stub.n_bytes, "imageio",
        img.getWidth.toLong, img.getHeight.toLong, sum, stub.content_hash)
    }
  }

  /** Batched REAL decode — same per-partition shape as [[extractFeatures]]. */
  def extractDecoded(ds: Dataset[MediaItem]): Dataset[DecodedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
      it.map(decodeImage)
    }
  }

  /** Perceptual difference hash (dHash) of one image — the near-dup
    * IMAGE dedup primitive (robust to re-encoding, scaling, mild noise;
    * classic 64-bit form): gray decode, nearest-neighbor sample onto a
    * (hashW+1)×hashH grid using the SAME `(x·W) div (hashW+1)` rule as
    * [[resizeImage]], one bit per horizontal neighbor comparison
    * `g(x+1,y) > g(x,y)`, packed at bit index `y·hashW + x`. None when
    * no reader can decode the blob (callers route those to the stub
    * path like [[decodeImage]] does).
    */
  def dHashImage(item: MediaItem, hashW: Int = 8, hashH: Int = 8): Option[Long] = {
    val img = readImage(item.media)
    if (img == null) None
    else {
      val (iw, ih) = (img.getWidth, img.getHeight)
      def g(x: Int, y: Int): Int =
        graySample(img, x * iw / (hashW + 1), y * ih / hashH)
      var hash = 0L
      var y = 0
      while (y < hashH) {
        var x = 0
        while (x < hashW) {
          if (g(x + 1, y) > g(x, y)) hash |= 1L << (y * hashW + x)
          x += 1
        }
        y += 1
      }
      Some(hash)
    }
  }

  /** Batched [[dHashImage]] over a media frame → (id, dhash) rows;
    * undecodable blobs are dropped (they have no perceptual content to
    * compare — route them through [[decodeStub]]'s exact-hash dedup
    * instead).
    */
  def dHashes(ds: Dataset[MediaItem], hashW: Int = 8, hashH: Int = 8): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap(i => dHashImage(i, hashW, hashH).map(h => (i.id, h)))
    }.toDF("id", "dhash")
  }

  /** Near-duplicate IMAGES: dHash + banded hamming pairs (the SimHash
    * pair machinery — 16-bit bands recall, exact bit_count verify).
    * Scale shape is the text SimHash one: never all-pairs.
    */
  def imageNearDuplicates(ds: Dataset[MediaItem], maxHamming: Int): DataFrame =
    graft.pipeline.Dedup.hammingPairs(dHashes(ds), "id", "dhash", maxHamming)

  /** Near-duplicate image CLUSTERS — [[imageNearDuplicates]] taken to
    * its scale-safe conclusion: identical sketches (blank pages, black
    * frames — the real-corpus mass case) collapse to one representative
    * BEFORE any pairing, so candidate count is bounded by distinct
    * hashes; see [[graft.pipeline.Dedup.hammingClusters]].
    */
  def imageDupClusters(ds: Dataset[MediaItem], maxHamming: Int = 3): DataFrame =
    graft.pipeline.Dedup.hammingClusters(dHashes(ds), "id", "dhash", maxHamming)

  /** VIDEO near-dup by frame-fingerprint overlap — the per-frame
    * perceptual-hash pass video corpora dedup with (a re-encode shifts
    * no frame boundary, so re-uploads and container changes share most
    * frame hashes): input is the (video, frame-hash) relation (one
    * [[dHashes]] row per sampled frame), videos pair through
    * [[graft.pipeline.Dedup.setOverlapPairs]] — candidates come ONLY
    * from videos sharing an exact frame hash (a blank-frame flood is the
    * skew case: `maxFreq` drops hashes shared by more videos than that,
    * the shingle-stoplist move) — and survive at frame-set Jaccard ≥
    * tauPermille, exact integer arithmetic end to end.
    * Returns (ia, ib, inter, uni, jaccard_permille).
    */
  def videoDupPairs(frameHashes: DataFrame, videoCol: String,
      hashCol: String, tauPermille: Int,
      maxFreq: Option[Int] = None): DataFrame =
    graft.pipeline.Dedup.setOverlapPairs(
      frameHashes.select(col(videoCol).as("id"), col(hashCol).as("sh")),
      maxFreq)
      .withColumn("jaccard_permille", expr("inter * 1000 DIV uni"))
      .filter(col("jaccard_permille") >= tauPermille)

  /** Scene-cut detection over a video's frame fingerprints — the shot
    * segmentation video curation samples frames by (one keyframe per
    * scene beats every-Nth-frame for training coverage): a cut is a
    * frame whose perceptual hash differs from its predecessor by ≥
    * `minHamming` bits; `scene` is the running cut count, so frames
    * between cuts share a scene id. The window is per VIDEO over the
    * frame index — videos have bounded frame counts (the sampled-frame
    * relation, not raw footage), so the per-key window is skew-safe,
    * unlike corpus-wide windows. First frame: hamming 0, cut 0, scene
    * 0. Returns (video, frame, hamming, cut, scene).
    */
  def sceneCuts(frameHashes: DataFrame, videoCol: String, frameCol: String,
      hashCol: String, minHamming: Int = 1): DataFrame = {
    require(minHamming >= 1, "minHamming >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("video")).orderBy(col("frame"))
    val wRun = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    frameHashes
      .select(col(videoCol).as("video"), col(frameCol).cast("long").as("frame"),
        col(hashCol).cast("long").as("h"))
      .withColumn("hamming",
        coalesce(bit_count(col("h").bitwiseXOR(lag(col("h"), 1).over(w)))
          .cast("long"), lit(0L)))
      .withColumn("cut", (col("hamming") >= minHamming).cast("long"))
      .withColumn("scene", sum(col("cut")).over(wRun).cast("long"))
      .select(col("video"), col("frame"), col("hamming"), col("cut"), col("scene"))
  }

  /** One keyframe per scene — [[sceneCuts]] rolled to its consumer
    * shape: the FIRST frame of each scene (vision-language pipelines
    * caption/embed one representative frame per shot, not every Nth
    * frame). Returns (video, scene, frame).
    */
  def keyframes(frameHashes: DataFrame, videoCol: String, frameCol: String,
      hashCol: String, minHamming: Int = 1): DataFrame =
    sceneCuts(frameHashes, videoCol, frameCol, hashCol, minHamming)
      .groupBy(col("video"), col("scene"))
      .agg(min(col("frame")).as("frame"))

  /** [[featurize]]'s real-decode twin over (id, kind, media) frames. */
  def decodeFrame(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    extractDecoded(df.select(
      col("id").cast("long").as("id"),
      col("kind").cast("string").as("kind"),
      col("media").cast("binary").as("media")).as[MediaItem]).toDF()
  }

  /** Deterministic gray PNG encoder (8-bit, one band): pixel values are
    * written straight into the raster, so encode→decode round-trips
    * bit-exactly — the fixture generator for the decode oracles/specs.
    */
  def encodeGrayPng(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pixel(x, y) & 0xFF); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Length-prefixed frame container (4-byte big-endian length + payload
    * per frame) — the synthetic "video" format: container parsing is real,
    * per-frame decode is real; only the codec zoo is out of scope.
    */
  def packFrames(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    frames.foreach { f => dos.writeInt(f.length); dos.write(f) }
    dos.flush()
    bos.toByteArray
  }

  def unpackFrames(blob: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var off = 0
    while (off + 4 <= blob.length) {
      val len = java.nio.ByteBuffer.wrap(blob, off, 4).getInt
      require(len >= 0 && off + 4 + len <= blob.length,
        s"corrupt frame container at offset $off")
      out += java.util.Arrays.copyOfRange(blob, off + 4, off + 4 + len)
      off += 4 + len
    }
    out.result()
  }

  /** REAL frame sampling: parse the frame container, pick `frames` evenly
    * spaced frames (floor((n-1)·j/(k-1)) — first and last always chosen),
    * decode each through javax.imageio. The 1→N flatMap shape of
    * [[sampleFramesStub]] with actual decoded pixels.
    */
  def sampleDecodedFrames(ds: Dataset[MediaItem], frames: Int): DataFrame = {
    import ds.sparkSession.implicits._
    ds.flatMap { m =>
      javax.imageio.ImageIO.setUseCache(false)
      // a corrupt, truncated, or empty container yields zero frames —
      // the flatMap analog of the stub fallback. unpackFrames itself
      // still refuses loudly for direct callers; here one bad blob must
      // not kill the whole job (decodeImage/pcmSamples set the pattern)
      val fs = try unpackFrames(m.media)
        catch { case _: IllegalArgumentException => Seq.empty }
      if (fs.isEmpty) Iterator.empty
      else (0 until frames).iterator.map { j =>
        val idx =
          if (frames == 1 || fs.size == 1) 0
          else ((fs.size - 1).toLong * j / (frames - 1)).toInt
        val d = decodeImage(MediaItem(m.id, m.kind, fs(idx)))
        (m.id, j.toLong, idx.toLong, d.width, d.height, d.gray_sum)
      }
    }.toDF("id", "frame", "frame_index", "width", "height", "gray_sum")
  }

  /** REAL resize: decode, nearest-neighbor resample on the raster
    * (src = (dst·srcDim) / dstDim, integer floor — deterministic and
    * SQL-reproducible, unlike AffineTransformOp's rounding), re-encode as
    * gray PNG. Undecodable media passes through unchanged.
    */
  def resizeImage(ds: Dataset[MediaItem], w: Int, h: Int): Dataset[MediaItem] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        val img = readImage(m.media)
        if (img == null) m
        else {
          val (sw, sh) = (img.getWidth, img.getHeight)
          m.copy(media = encodeGrayPng(w, h, (x, y) =>
            graySample(img, x * sw / w, y * sh / h)))
        }
      }
    }
  }

  // ---- real audio path (javax.sound.sampled) ----

  /** Decoded audio features: `decoder` is "javasound" (real PCM samples;
    * rate/channels/sums exact) or "stub" (no installed reader; -1 metrics,
    * hash/length still real). `sample_sum`/`abs_max` are over all channels
    * of the 16-bit signed PCM the stream normalizes to.
    */
  case class DecodedAudio(id: Long, kind: String, n_bytes: Long, decoder: String,
      sample_rate: Long, n_channels: Long, n_samples: Long, sample_sum: Long,
      abs_max: Long, content_hash: String)

  /** Deterministic 16-bit PCM mono WAV encoder (canonical RIFF container
    * via the JDK's WAVE writer) — the fixture generator for the audio
    * oracles/specs: encode→decode round-trips samples bit-exactly.
    */
  def encodePcmWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xFF).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Parse an audio container through javax.sound.sampled and normalize to
    * 16-bit signed little-endian PCM — a REAL decode: WAV/AU/AIFF parsing
    * and µ-law/a-law expansion ship with the JDK. Returns
    * (sampleRate, channels, interleaved samples), or None for media no
    * installed reader understands.
    */
  private def pcmSamples(bytes: Array[Byte]): Option[(Int, Int, Array[Short])] =
    try {
      val src = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val f0 = src.getFormat
      val target = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        f0.getSampleRate, 16, f0.getChannels, f0.getChannels * 2,
        f0.getSampleRate, false)
      val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, src)
      val data = pcm.readAllBytes()
      val out = new Array[Short](data.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = ((data(2 * i) & 0xFF) | (data(2 * i + 1) << 8)).toShort
        i += 1
      }
      Some((f0.getSampleRate.toInt, f0.getChannels, out))
    } catch { case _: Exception => None } // unknown container → fallback

  /** REAL audio decode: samples via javax.sound, stub fallback otherwise. */
  def decodeAudio(item: MediaItem): DecodedAudio = {
    val stub = decodeStub(item)
    pcmSamples(item.media) match {
      case None =>
        DecodedAudio(item.id, item.kind, stub.n_bytes, "stub",
          -1L, -1L, -1L, -1L, -1L, stub.content_hash)
      case Some((rate, ch, samples)) =>
        var sum = 0L
        var absMax = 0L
        var i = 0
        while (i < samples.length) {
          val v = samples(i).toLong
          sum += v
          if (math.abs(v) > absMax) absMax = math.abs(v)
          i += 1
        }
        DecodedAudio(item.id, item.kind, stub.n_bytes, "javasound",
          rate.toLong, ch.toLong, samples.length.toLong / ch, sum, absMax,
          stub.content_hash)
    }
  }

  /** Batched REAL audio decode — per-partition shape like [[extractDecoded]]. */
  def extractAudio(ds: Dataset[MediaItem]): Dataset[DecodedAudio] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(decodeAudio))
  }

  /** Fixed-size window framing over the decoded mono samples (the
    * spectrogram/feature-frame shape): windows of `window` samples every
    * `hop`, each with exact integer stats. Windows never straddle the end
    * (last partial window dropped, like STFT framing without padding);
    * undecodable or multi-channel media yields no windows. 1→N flatMap —
    * distributed over media rows, no shuffle.
    */
  def audioWindows(ds: Dataset[MediaItem], window: Int, hop: Int): DataFrame = {
    import ds.sparkSession.implicits._
    require(window > 0 && hop > 0, "window and hop must be positive")
    ds.flatMap { m =>
      pcmSamples(m.media) match {
        case Some((_, 1, samples)) =>
          Iterator.range(0, samples.length - window + 1, hop).zipWithIndex
            .map { case (start, w) =>
              var sum = 0L
              var absMax = 0L
              var i = start
              while (i < start + window) {
                val v = samples(i).toLong
                sum += v
                if (math.abs(v) > absMax) absMax = math.abs(v)
                i += 1
              }
              (m.id, w.toLong, start.toLong, sum, absMax)
            }
        case _ => Iterator.empty
      }
    }.toDF("id", "win", "start_sample", "sample_sum", "abs_max")
  }

  /** Perceptual AUDIO hash — the dHash idea on the L1-energy envelope:
    * per-window abs-sample sums over the [[audioWindows]] framing
    * (window/hop), bit w = 1 iff L1(w+1) > L1(w), packed LSB-first.
    * ≤64 comparisons used; clips with fewer windows simply set fewer
    * bits (≥2 windows → a defined hash; a loudness-envelope shape
    * survives re-encoding and level-preserving edits, which is what
    * makes it the near-dup mining key — pair via
    * [[graft.pipeline.Dedup.hammingPairs]]). None when the blob has no
    * decodable mono PCM.
    */
  def audioDHash(item: MediaItem, window: Int, hop: Int): Option[Long] = {
    require(window > 0 && hop > 0, "window and hop must be positive")
    pcmSamples(item.media) match {
      case Some((_, 1, samples)) =>
        val l1 = Iterator.range(0, samples.length - window + 1, hop).map { start =>
          var s = 0L
          var i = start
          while (i < start + window) { s += math.abs(samples(i).toLong); i += 1 }
          s
        }.toArray
        // fewer than 2 windows = no envelope to compare: a defined-but-
        // constant hash would pair every short clip with every other at
        // hamming 0 (and pile them into one band bucket) — exclude them
        // like undecodable blobs instead
        if (l1.length < 2) None
        else {
          var hash = 0L
          var w = 0
          while (w < l1.length - 1 && w < 64) {
            if (l1(w + 1) > l1(w)) hash |= 1L << w
            w += 1
          }
          Some(hash)
        }
      case _ => None
    }
  }

  /** Batched [[audioDHash]] → (id, ahash) rows; undecodable audio drops
    * to the exact-hash stub path, like [[dHashes]] for images.
    */
  def audioDHashes(ds: Dataset[MediaItem], window: Int, hop: Int): DataFrame = {
    import ds.sparkSession.implicits._
    ds.flatMap(i => audioDHash(i, window, hop).map(h => (i.id, h)))
      .toDF("id", "ahash")
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
