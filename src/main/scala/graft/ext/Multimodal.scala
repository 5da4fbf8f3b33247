package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) rides through the
  * pipeline as an opaque `binary` column plus typed metadata; decode /
  * feature-extraction runs as a partition-wise batch transform (the Scala
  * analogue of mapInPandas).
  *
  * Image decode is REAL for the containers the JDK ships codecs for
  * (PNG/JPEG/BMP/GIF via `javax.imageio` — no external library needed):
  * width/height/channels come from the decoded raster and the mean is over
  * actual pixel samples. Payloads ImageIO does not recognize (exotic
  * containers, audio, video) fall back to the deterministic stub, so the
  * operator is total either way. The Spark-side shape (schema,
  * partitioning, streaming per-partition iteration, typed Dataset
  * round-trip) is identical for both paths.
  */
object Multimodal extends Serializable {

  case class MediaRow(doc_id: Long, media: Array[Byte])
  case class MediaFeature(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      channels: Int,
      byte_mean: Double)

  // ImageIO defaults to spilling decode buffers through temp FILES; a
  // 100 TB scan decoding millions of small images per executor must stay
  // on-heap. Object init runs once per executor JVM.
  javax.imageio.ImageIO.setUseCache(false)

  /** Real image decode via the JDK's `javax.imageio` (PNG/JPEG/BMP/GIF...):
    * `(width, height, bands, mean-over-all-pixel-samples)`, or None when no
    * installed reader recognizes the container. */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Int, Double)] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val raster = img.getRaster
        val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
        var sum = 0L
        var b = 0
        while (b < bands) {
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { sum += raster.getSample(x, y, b); x += 1 }
            y += 1
          }
          b += 1
        }
        val n = w.toLong * h * bands
        Some((w, h, bands, if (n == 0) 0d else sum.toDouble / n))
      }
    } catch { case _: Exception => None }

  /** STUB decoder: deterministic pseudo image metadata from raw bytes —
    * the fallback for containers the JDK has no codec for. */
  def stubDecode(bytes: Array[Byte]): (Int, Int, Int, Double) = {
    val n = bytes.length
    var sum = 0L
    var i = 0
    while (i < n) { sum += bytes(i) & 0xff; i += 1 }
    val width = 16 + (math.abs(ExtOps.splitmix64(n.toLong)) % 1024).toInt
    val height = 16 + (math.abs(ExtOps.splitmix64(sum)) % 1024).toInt
    val channels = 1 + (sum % 3).toInt
    val mean = if (n == 0) 0d else sum.toDouble / n
    (width, height, channels, mean)
  }

  /** Partition-wise feature extraction over the opaque binary column.
    * One decoder instance per partition (the expensive-init pattern for
    * real codecs), streaming iterator in/out — constant memory per task.
    * Real ImageIO decode when the container is recognized; stub fallback
    * otherwise. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real codecs would be initialized once per partition here
      rows.map { r =>
        val (w, h, c, mean) = decodeImage(r.media).getOrElse(stubDecode(r.media))
        MediaFeature(r.doc_id, r.media.length, w, h, c, mean)
      }
    }
  }

  /** The documents table as a media table: text bytes standing in for an
    * encoded image payload (schema shape is what matters). */
  def asMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .as[MediaRow]
  }

  /** Deterministic synthetic PNG keyed by `docId`: a solid
    * `(4 + id%29) × (4 + id*7%23)` grayscale image with every sample equal
    * to `id*37 % 256`. Decoding it with [[decodeImage]] must yield exactly
    * those dimensions, 1 band, and an integer-valued mean — which is what
    * makes mm2 oracle-checkable on REAL codec output: the oracle recomputes
    * the generation parameters in SQL while Spark recovers them from the
    * actual encoded bytes. */
  def syntheticPng(docId: Long): Array[Byte] = {
    val w = 4 + (docId % 29).toInt
    val h = 4 + ((docId * 7) % 23).toInt
    val g = ((docId * 37) % 256).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, g); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** One synthetic PNG per document — the encode half of the mm2 round
    * trip. Map-only (generation happens inside the partition iterator, no
    * shuffle, no driver-side materialization), so the shape is the same
    * as reading real image bytes from a media column. */
  def asGeneratedImages(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => MediaRow(id, syntheticPng(id))))
  }

  case class AudioMeta(
      doc_id: Long,
      sample_rate: Int,
      channels: Int,
      n_frames: Long,
      mean_sample: Double)

  /** Real WAV decode via the JDK's `javax.sound.sampled` (RIFF/PCM — no
    * external codec): container-reported rate/channels/frame-count plus
    * the mean over the actual decoded 16-bit samples. None when no
    * installed reader recognizes the container. */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Int, Long, Double)] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        val data = in.readAllBytes()
        var sum = 0L
        var i = 0
        while (i + 1 < data.length) { // 16-bit little-endian signed PCM
          sum += ((data(i) & 0xff) | (data(i + 1).toInt << 8)).toShort
          i += 2
        }
        val n = data.length / 2
        Some((fmt.getSampleRate.toInt, fmt.getChannels, frames,
          if (n == 0) 0d else sum.toDouble / n))
      } finally in.close()
    } catch { case _: Exception => None }

  /** Deterministic synthetic WAV keyed by `docId`: 16-bit PCM, rate
    * `8000·(1 + id%3)`, `1 + id%2` channels, `100 + id%400` frames, every
    * sample equal to `id%100 − 50` — so [[decodeWav]] must recover exactly
    * those parameters and an integer-valued mean, which is what makes the
    * audio card oracle-checkable on REAL codec output (the mm2 pattern). */
  def syntheticWav(docId: Long): Array[Byte] = {
    val rate = 8000 * (1 + (docId % 3).toInt)
    val channels = 1 + (docId % 2).toInt
    val frames = 100 + (docId % 400).toInt
    val a = ((docId % 100) - 50).toShort
    val pcm = new Array[Byte](frames * channels * 2)
    var i = 0
    while (i < frames * channels) {
      pcm(2 * i) = (a & 0xff).toByte
      pcm(2 * i + 1) = ((a >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, channels,
      true, false) // signed, little-endian
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stream,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** One synthetic WAV per document (map-only, like [[asGeneratedImages]]). */
  def asGeneratedAudio(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => MediaRow(id, syntheticWav(id))))
  }

  /** Partition-wise audio metadata extraction — the audio analogue of
    * [[extractFeatures]]: real JDK decode, constant memory per task. */
  def extractAudioMeta(media: Dataset[MediaRow]): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (rate, ch, frames, mean) = decodeWav(r.media).getOrElse {
          val (w, h, c, m) = stubDecode(r.media) // total on non-audio bytes
          (w, c, h.toLong, m)
        }
        AudioMeta(r.doc_id, rate, ch, frames, mean)
      }
    }
  }

  case class ResizedRow(doc_id: Long, media: Array[Byte], width: Int, height: Int)

  /** Resize — the binary→binary transform of image pipelines: payload in,
    * (smaller) payload + updated metadata out, batched per partition like
    * the decoder. STUB: deterministic stride subsampling of the bytes down
    * to ≤`maxBytes` stands in for a real scaler; the contract that matters
    * (and is tested) is output length ≤ maxBytes, determinism, and the
    * map-only plan. */
  def resize(media: Dataset[MediaRow], maxBytes: Int = 4096): Dataset[ResizedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val n = r.media.length
        val out =
          if (n <= maxBytes) r.media
          else {
            val stride = (n + maxBytes - 1) / maxBytes
            Array.tabulate(n / stride)(i => r.media(i * stride))
          }
        val (w, h, _, _) = stubDecode(out)
        ResizedRow(r.doc_id, out, w, h)
      }
    }
  }

  /** Real image downscale via the JDK's `Graphics2D` (bilinear): longest
    * side capped at `maxDim`, aspect preserved, re-encoded as PNG. None
    * when the payload is not a decodable image; Some(original) when it
    * already fits — so callers can tell "resized" from "not an image". */
  def resizeImage(bytes: Array[Byte], maxDim: Int): Option[Array[Byte]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else if (math.max(img.getWidth, img.getHeight) <= maxDim) Some(bytes)
      else {
        val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
        val nw = math.max(1, math.round(img.getWidth * scale).toInt)
        val nh = math.max(1, math.round(img.getHeight * scale).toInt)
        val t = img.getType match {
          case java.awt.image.BufferedImage.TYPE_CUSTOM =>
            java.awt.image.BufferedImage.TYPE_INT_RGB
          case other => other
        }
        val out = new java.awt.image.BufferedImage(nw, nh, t)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, nw, nh, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    } catch { case _: Exception => None }

  /** Partition-wise REAL image resize — the production form of [[resize]]:
    * recognized images downscale through [[resizeImage]] and report their
    * actual new dimensions; non-image payloads keep the deterministic
    * stride-subsample fallback so the operator stays total. Map-only like
    * every transform in this family. */
  def resizeImages(media: Dataset[MediaRow], maxDim: Int = 256): Dataset[ResizedRow] = {
    import media.sparkSession.implicits._
    def stubResize(docId: Long, bytes: Array[Byte]): ResizedRow = {
      val n = bytes.length
      val out =
        if (n <= maxDim) bytes
        else {
          val stride = (n + maxDim - 1) / maxDim
          Array.tabulate(n / stride)(i => bytes(i * stride))
        }
      val (w, h, _, _) = stubDecode(out)
      ResizedRow(docId, out, w, h)
    }
    media.mapPartitions { rows =>
      rows.map { r =>
        // decodeImage(b) re-decodes resizeImage's own PNG output — expected
        // Some, but stay TOTAL if ImageIO ever round-trip-fails on an
        // unusual color model: route through the stub, never throw
        resizeImage(r.media, maxDim).flatMap(b =>
          decodeImage(b).map { case (w, h, _, _) => ResizedRow(r.doc_id, b, w, h) })
          .getOrElse(stubResize(r.doc_id, r.media))
      }
    }
  }

  case class VideoMeta(
      doc_id: Long,
      brand: String,
      timescale: Long,
      duration_ms: Long,
      n_tracks: Int)

  /** Real ISO-BMFF (mp4/mov) CONTAINER parse — pure-JDK byte walking of
    * the public ISO/IEC 14496-12 box structure, no codec: major brand from
    * `ftyp`, timescale + duration from `moov/mvhd` (both version 0 and
    * version 1 layouts), track count from `moov/trak`. The honest boundary
    * the JDK imposes: SAMPLES stay undecoded (no H.264 codec ships with
    * Java), but duration/timescale/track topology — what a data pipeline
    * filters and bins video corpora by — come from the actual bytes.
    * Returns (brand, timescale, durationUnits, nTracks); None when the
    * payload is not a well-formed BMFF file. */
  def parseIsoBmff(bytes: Array[Byte]): Option[(String, Long, Long, Int)] =
    try {
      def u32(p: Int): Long =
        ((bytes(p) & 0xffL) << 24) | ((bytes(p + 1) & 0xffL) << 16) |
          ((bytes(p + 2) & 0xffL) << 8) | (bytes(p + 3) & 0xffL)
      def u64(p: Int): Long = (u32(p) << 32) | u32(p + 4)
      var brand: String = null
      var timescale = -1L
      var duration = -1L
      var tracks = 0
      var malformed = false
      def walk(start: Int, end: Int): Unit = {
        var p = start
        while (p + 8 <= end && !malformed) {
          var size = u32(p)
          val typ = new String(bytes, p + 4, 4, "ISO-8859-1")
          var hdr = 8
          if (size == 1 && p + 16 <= end) { size = u64(p + 8); hdr = 16 }
          else if (size == 0) size = (end - p).toLong // last box: to end
          if (size < hdr || p + size > end) { malformed = true }
          else {
            typ match {
              case "ftyp" if size >= hdr + 4 =>
                brand = new String(bytes, p + hdr, 4, "ISO-8859-1")
              case "moov" => walk(p + hdr, p + size.toInt)
              case "mvhd" =>
                val v = bytes(p + hdr) & 0xff
                if (v == 1) { // 64-bit times: creation/modification are u64
                  timescale = u32(p + hdr + 4 + 16)
                  duration = u64(p + hdr + 4 + 20)
                } else {
                  timescale = u32(p + hdr + 4 + 8)
                  duration = u32(p + hdr + 4 + 12)
                }
              case "trak" => tracks += 1
              case _ => () // mdat, free, udta… — skipped by size, unread
            }
            p += size.toInt
          }
        }
      }
      walk(0, bytes.length)
      if (malformed || brand == null || timescale <= 0 || duration < 0) None
      else Some((brand, timescale, duration, tracks))
    } catch { case _: Exception => None }

  private def beU32(v: Long): Array[Byte] =
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def beU64(v: Long): Array[Byte] = beU32(v >>> 32) ++ beU32(v & 0xffffffffL)
  private def bmffBox(typ: String, payload: Array[Byte]): Array[Byte] =
    beU32(8L + payload.length) ++ typ.getBytes("ISO-8859-1") ++ payload

  /** Deterministic synthetic mp4 keyed by `docId`: full spec-shaped `ftyp`
    * + `moov(mvhd + trak(tkhd)×n)` with timescale `600·(1 + id%4)`,
    * duration `1000 + id%9000` units, `1 + id%3` tracks, brand `isom` —
    * alternating mvhd version 0/1 by id parity so BOTH header layouts are
    * exercised. [[parseIsoBmff]] must recover exactly those parameters,
    * which is what makes mm5 oracle-checkable on a real container parse
    * (the mm2/mm4 synthetic-fixture pattern). */
  def syntheticMp4(docId: Long): Array[Byte] = {
    val timescale = 600L * (1 + docId % 4)
    val dur = 1000L + docId % 9000
    val nTracks = (1 + docId % 3).toInt
    val v1 = docId % 2 == 1
    val ftyp = bmffBox("ftyp",
      "isom".getBytes("ISO-8859-1") ++ beU32(512) ++
        "isomiso2mp41".getBytes("ISO-8859-1")) // compatible brands
    // mvhd: FullBox(version, 0 flags), times, timescale, duration, then the
    // fixed spec tail (rate 1.0, volume 1.0, reserved, unity matrix,
    // pre_defined, next_track_ID)
    val mvhdTimes =
      if (v1) Array[Byte](1, 0, 0, 0) ++ beU64(0) ++ beU64(0) ++
        beU32(timescale) ++ beU64(dur)
      else Array[Byte](0, 0, 0, 0) ++ beU32(0) ++ beU32(0) ++
        beU32(timescale) ++ beU32(dur)
    val unityMatrix = beU32(0x00010000L) ++ beU32(0) ++ beU32(0) ++
      beU32(0) ++ beU32(0x00010000L) ++ beU32(0) ++
      beU32(0) ++ beU32(0) ++ beU32(0x40000000L)
    val mvhd = bmffBox("mvhd", mvhdTimes ++
      beU32(0x00010000L) ++ Array[Byte](1, 0, 0, 0) ++ beU64(0) ++
      unityMatrix ++ Array.fill[Byte](24)(0) ++ beU32(nTracks + 1L))
    val traks = (1 to nTracks).map { i =>
      val tkhd = bmffBox("tkhd", Array[Byte](0, 0, 0, 7) ++ // v0, enabled
        beU32(0) ++ beU32(0) ++ beU32(i.toLong) ++ beU32(0) ++ beU32(dur) ++
        beU64(0) ++ Array.fill[Byte](8)(0) ++ unityMatrix ++ beU32(0) ++ beU32(0))
      bmffBox("trak", tkhd)
    }
    ftyp ++ bmffBox("moov", mvhd ++ traks.flatten) ++
      bmffBox("mdat", Array.fill[Byte]((docId % 32).toInt)(0x5a))
  }

  /** One synthetic mp4 per document (map-only, like [[asGeneratedImages]]). */
  def asGeneratedVideo(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => MediaRow(id, syntheticMp4(id))))
  }

  /** Partition-wise video-container metadata — mm5: real BMFF parse with
    * the deterministic stub fallback on unrecognized payloads, so the
    * operator is total like the image/audio extractors. `duration_ms` is
    * integer-exact (`units · 1000 div timescale`) — engine-portable, no
    * float rounding. */
  def extractVideoMeta(media: Dataset[MediaRow]): Dataset[VideoMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        parseIsoBmff(r.media) match {
          case Some((brand, ts, dur, tracks)) =>
            VideoMeta(r.doc_id, brand, ts, dur * 1000L / ts, tracks)
          case None =>
            val (w, h, c, _) = stubDecode(r.media)
            VideoMeta(r.doc_id, "stub", w.toLong, h.toLong, c)
        }
      }
    }
  }

  case class HeaderMeta(doc_id: Long, format: String, width: Int, height: Int)

  /** HEADER-ONLY image dimensions — the 100 TB fast path: a metadata pass
    * over an image corpus should cost header bytes, not decode CPU. Pure
    * byte walk of the four container headers the JDK also decodes
    * (PNG/JPEG/GIF/BMP — public container specs), no pixel is ever
    * touched:
    *
    *   - PNG: 8-byte signature, then the IHDR chunk width/height at fixed
    *     offsets 16/20 (big-endian u32);
    *   - GIF: `GIF87a`/`GIF89a`, logical-screen width/height at 6/8
    *     (little-endian u16);
    *   - BMP: `BM`, BITMAPINFOHEADER width/height at 18/22 (little-endian
    *     i32; height may be negative for top-down rows — abs);
    *   - JPEG: marker walk (`FF D8`, then length-framed segments) to the
    *     first SOFn frame header (C0–CF minus DHT/JPG/DAC), height/width
    *     big-endian u16 at payload offsets 3/5.
    *
    * None on anything else (including truncation mid-header) — callers
    * fall back to [[decodeImage]] or the stub, so extractors stay total.
    * The contract [[ExtSpec]] pins: on any byte string BOTH paths decode,
    * header dims ≡ decoded dims. */
  def parseImageHeader(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(p: Int): Int = bytes(p) & 0xff
    def beU16(p: Int): Int = (u8(p) << 8) | u8(p + 1)
    def leU16(p: Int): Int = u8(p) | (u8(p + 1) << 8)
    def beI32(p: Int): Int = (u8(p) << 24) | (u8(p + 1) << 16) | (u8(p + 2) << 8) | u8(p + 3)
    def leI32(p: Int): Int = u8(p) | (u8(p + 1) << 8) | (u8(p + 2) << 16) | (u8(p + 3) << 24)
    try {
      val n = bytes.length
      if (n >= 24 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G' &&
          u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a &&
          new String(bytes, 12, 4, "ISO-8859-1") == "IHDR")
        Some(("png", beI32(16), beI32(20)))
      else if (n >= 10 && u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == '8' &&
          (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a')
        // LOGICAL-SCREEN dims, not the first image descriptor's: for an
        // animated or cropped-frame GIF these can differ (ImageIO decode
        // returns the frame's dims), so header≡decode is only guaranteed
        // for full-screen first frames — the common case and everything
        // ImageIO itself writes. Caveat pinned in ExtSpec.
        Some(("gif", leU16(6), leU16(8)))
      else if (n >= 26 && u8(0) == 'B' && u8(1) == 'M') {
        // Only the BITMAPINFOHEADER family (DIB size 40/52/56/108/124)
        // has i32 dims at 18/22; an OS/2 BITMAPCOREHEADER (size 12, u16
        // dims at 18/20) would parse as one garbage i32 — require the DIB
        // size first, and reject non-positive width, so we return None
        // rather than violate the header≡decode contract.
        val dib = leI32(14)
        val w = leI32(18)
        if ((dib == 40 || dib == 52 || dib == 56 || dib == 108 || dib == 124) && w > 0)
          Some(("bmp", w, math.abs(leI32(22))))
        else None
      }
      else if (n >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
        // JPEG marker walk: every non-SOF segment is skipped by its
        // declared length; standalone markers (D0–D9, 01) carry none.
        var p = 2
        var res: Option[(String, Int, Int)] = None
        var done = false
        while (!done && p + 4 <= n) {
          if (u8(p) != 0xff) { done = true }
          else {
            val m = u8(p + 1)
            if (m == 0xff) p += 1 // fill byte
            else if (m == 0x01 || (m >= 0xd0 && m <= 0xd9)) p += 2
            else {
              val len = beU16(p + 2)
              if (len < 2 || p + 2 + len > n) done = true
              else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
                if (len >= 7) res = Some(("jpeg", beU16(p + 2 + 5), beU16(p + 2 + 3)))
                done = true
              } else p += 2 + len
            }
          }
        }
        res
      } else None
    } catch { case _: Exception => None }
  }

  /** Partition-wise header-only metadata — mm6: [[parseImageHeader]] with
    * the deterministic stub fallback, total like every extractor here.
    * Same output shape per doc as the decode path, at container-header
    * cost: this is what a 100 TB corpus-stats pass runs, reserving
    * [[extractFeatures]]' full decode for the slivers that need pixels. */
  def extractHeaderMeta(media: Dataset[MediaRow]): Dataset[HeaderMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        parseImageHeader(r.media) match {
          case Some((fmt, w, h)) => HeaderMeta(r.doc_id, fmt, w, h)
          case None =>
            val (w, h, _, _) = stubDecode(r.media)
            HeaderMeta(r.doc_id, "stub", w, h)
        }
      }
    }
  }

  /** 64-bit difference hash (dHash) — the standard perceptual image
    * fingerprint (gradient-sign hash; public technique, e.g. Krawetz's
    * writeups): decode, bilinear-downscale to 9×8 luma, one bit per
    * horizontal neighbor pair (`left > right`). Near-identical images
    * (re-encodes, slight noise, small crops) land within a few bits;
    * unrelated images differ in ~32. None when the payload is not a
    * decodable image. */
  def dHash(bytes: Array[Byte]): Option[Long] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val small = new java.awt.image.BufferedImage(
          9, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val g = small.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, 9, 8, null)
        } finally g.dispose()
        val raster = small.getRaster
        var hash = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            hash <<= 1
            if (raster.getSample(x, y, 0) > raster.getSample(x + 1, y, 0)) hash |= 1L
            x += 1
          }
          y += 1
        }
        Some(hash)
      }
    } catch { case _: Exception => None }

  /** Deterministic synthetic image corpus WITH planted near-duplicates —
    * the mmd1 fixture: `docId % families` picks a base texture (pixel =
    * mixed-bit function of family and position, so the dHash gradient
    * field is family-specific), and every non-primary family member gets a
    * small per-id brightness ripple on a few pixels — the "same image,
    * slightly different bytes" a perceptual dedup must catch. Encoded as
    * real PNGs; family structure is recoverable ONLY by decoding. */
  def syntheticNearDupPng(docId: Long, families: Int): Array[Byte] = {
    val family = (docId % families).toInt
    val (w, h) = (36, 32)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ExtOps.splitmix64(family.toLong * 1000003L + x / 4 + (y / 4) * 16) & 0xff
        raster.setSample(x, y, 0, v.toInt)
        x += 1
      }
      y += 1
    }
    if (docId >= families) { // perturbed copy: ±4 on three cells
      var k = 0
      while (k < 3) {
        val px = (ExtOps.splitmix64(docId * 31 + k) & 0x7fffffff) % (w * h)
        val x = (px % w).toInt
        val y2 = (px / w).toInt
        val old = raster.getSample(x, y2, 0)
        raster.setSample(x, y2, 0, math.min(255, math.max(0, old + (if (docId % 2 == 0) 4 else -4))))
        k += 1
      }
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** One near-dup-planted PNG per document (map-only, like
    * [[asGeneratedImages]]). */
  def asNearDupImages(spark: SparkSession, dir: String,
      families: Int = 50): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => MediaRow(id, syntheticNearDupPng(id, families))))
  }

  /** 64-bit energy-envelope audio fingerprint — the audio sibling of
    * [[dHash]], from the published difference-fingerprint family
    * (Haitsma–Kalker 2002 take sign-of-difference over band energies;
    * this is the time-domain member): real JDK decode, the interleaved
    * 16-bit samples split into 65 equal windows, per-window L1 energy,
    * one bit per adjacent-window comparison (`E(w) > E(w+1)`).
    *
    * Two properties make it a dedup hash: energy COMPARISONS are
    * invariant under uniform gain (a re-mastered louder copy hashes
    * identically), and small local edits flip at most the two bits whose
    * windows they touch. Unrelated audio gives ~32 differing bits. None
    * when the payload doesn't decode or is shorter than one sample per
    * window. */
  def audioHash(bytes: Array[Byte]): Option[Long] =
    pcm16DataChunk(bytes) match {
      // FAST PATH: canonical RIFF/PCM-16 — hash straight off the data
      // chunk, no stream/SPI setup (measured 7 k clips/s through
      // AudioSystem at 200 k clips; the per-clip stream setup dominated,
      // not the fold). Byte-identical to the fallback: for PCM WAVs
      // AudioSystem returns exactly the data chunk's frames (parity
      // pinned in ExtSpec).
      case Some((off, len)) => hashOfPcm16(bytes, off, len)
      case None =>
        // fallback: any container an installed reader decodes to PCM.
        // Big-endian containers (AU, AIFF) normalize to LE so the same
        // sound fingerprints identically whatever the wrapper.
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val data = in.readAllBytes()
            if (in.getFormat.isBigEndian && in.getFormat.getSampleSizeInBits == 16) {
              var i = 0
              while (i + 1 < data.length) {
                val t = data(i); data(i) = data(i + 1); data(i + 1) = t
                i += 2
              }
            }
            hashOfPcm16(data, 0, data.length)
          } finally in.close()
        } catch { case _: Exception => None }
    }

  /** The energy-envelope fold over 16-bit little-endian PCM at
    * `[off, off+byteLen)`: 65 equal windows of L1 energy, one bit per
    * adjacent comparison. */
  private def hashOfPcm16(data: Array[Byte], off: Int, byteLen: Int): Option[Long] = {
    val n = byteLen / 2
    if (n < 65) None
    else {
      val energies = new Array[Long](65)
      var w = 0
      while (w < 65) {
        val from = (w.toLong * n / 65).toInt
        val until = ((w + 1).toLong * n / 65).toInt
        var e = 0L
        var i = from
        while (i < until) {
          e += math.abs(((data(off + 2 * i) & 0xff) |
            (data(off + 2 * i + 1).toInt << 8)).toShort.toLong)
          i += 1
        }
        energies(w) = e
        w += 1
      }
      var hash = 0L
      var k = 0
      while (k < 64) {
        hash <<= 1
        if (energies(k) > energies(k + 1)) hash |= 1L
        k += 1
      }
      Some(hash)
    }
  }

  /** Locate the `data` chunk of a canonical RIFF/WAVE file whose `fmt `
    * chunk declares uncompressed 16-bit PCM — the shape every WAV writer
    * (including the JDK's) emits. Walks the chunk list per the public
    * RIFF spec (chunks are (id, u32le size, payload) with word
    * alignment); None for anything else, routing to the decode fallback. */
  private def pcm16DataChunk(bytes: Array[Byte]): Option[(Int, Int)] = {
    def leU16(p: Int): Int = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    def leU32(p: Int): Long = (leU16(p) & 0xffffL) | ((leU16(p + 2) & 0xffffL) << 16)
    def tag(p: Int, s: String): Boolean =
      bytes.length >= p + 4 && bytes(p) == s(0).toByte && bytes(p + 1) == s(1).toByte &&
        bytes(p + 2) == s(2).toByte && bytes(p + 3) == s(3).toByte
    if (!(bytes.length >= 44 && tag(0, "RIFF") && tag(8, "WAVE"))) return None
    var p = 12
    var pcm16 = false
    while (p + 8 <= bytes.length) {
      val size = leU32(p + 4)
      if (size < 0 || size > Int.MaxValue - 8) return None
      val body = p + 8
      if (tag(p, "fmt ")) {
        if (size < 16 || body + 16 > bytes.length) return None
        pcm16 = leU16(body) == 1 && leU16(body + 14) == 16
      } else if (tag(p, "data")) {
        val len = math.min(size.toInt, bytes.length - body)
        return if (pcm16) Some((body, len)) else None
      }
      p = body + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    None
  }

  /** Deterministic synthetic audio corpus WITH planted near-duplicates —
    * the mmd2 fixture, [[syntheticNearDupPng]]'s audio twin: `docId %
    * families` picks a base "melody" (65 windows of family-keyed random
    * amplitude square wave, so the energy envelope is family-specific),
    * and every non-primary member is the same melody RE-MASTERED: a
    * uniform gain change (up to ~8%, which the fingerprint must ignore)
    * plus a ±2% amplitude ripple on one window (≤ 2 bit flips by
    * construction — both its adjacent comparisons). Family structure is
    * recoverable ONLY by decoding the PCM. */
  def syntheticNearDupWav(docId: Long, families: Int): Array[Byte] = {
    val family = (docId % families).toInt
    val windows = 65
    val wlen = 100
    val frames = windows * wlen
    val pcm = new Array[Byte](frames * 2)
    val copy = docId >= families
    val gain = if (copy) 1.0 + ((docId % 16).toInt + 1) / 200.0 else 1.0
    val ripple =
      if (copy) ((ExtOps.splitmix64(docId * 17 + 3) & 0x7fffffffL) % windows).toInt
      else -1
    var w = 0
    var i = 0
    while (w < windows) {
      val base = ((ExtOps.splitmix64(family.toLong * 1000003L + w) & 0x3fffL) + 256L).toDouble
      val rippled = if (w == ripple) base * (if (docId % 2 == 0) 1.02 else 0.98) else base
      val amp = rippled * gain // max ~16.6k * 1.1 < 2^15: never clips
      var k = 0
      while (k < wlen) {
        val s = (if (k % 2 == 0) amp else -amp).toInt.toShort
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
        k += 1
        i += 1
      }
      w += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stream,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** One near-dup-planted WAV per document (map-only, like
    * [[asNearDupImages]]). */
  def asNearDupAudio(spark: SparkSession, dir: String,
      families: Int = 50): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => MediaRow(id, syntheticNearDupWav(id, families))))
  }

  case class FrameRow(doc_id: Long, frame_idx: Long, ts_ms: Long, luma: Double)

  /** Frame sampling — the 1-row → N-rows generator shape of video
    * pipelines: each media payload yields one sampled frame per `stepMs`
    * of (stubbed) duration, capped at `maxFrames`. Map-only plan: the
    * expansion happens inside the partition iterator (constant memory, no
    * shuffle, binary payload never copied per frame). The stub "decoder"
    * derives duration from payload size (1 B ≈ 1 ms) and a deterministic
    * per-frame luma — a real ffmpeg frame grab slots into the same
    * flatMap without touching the plan shape. */
  def sampleFrames(media: Dataset[MediaRow], stepMs: Long = 1000L,
      maxFrames: Int = 4): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val durationMs = r.media.length.toLong // stub: 1 byte ≈ 1 ms
        val n = math.min(maxFrames.toLong, durationMs / stepMs + 1)
        (0L until n).iterator.map(i =>
          FrameRow(r.doc_id, i, i * stepMs, ((r.doc_id * 131 + i) % 256).toDouble))
      }
    }
  }
}
