package graft.sim

import graft.{QueryGroup, Tables}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing [NS: BASELINE.json north_star "multimodal
  * columns"]: media as opaque `binary` columns with
  * typed metadata, batch-shaped feature extraction over partitions.
  *
  * The image leg (`mm_decode_pipeline`) is a REAL codec round-trip: a
  * deterministic grayscale PNG is synthesized per document (the binary
  * media column a production table would carry), then decoded back with
  * `javax.imageio` inside `mapPartitions` — dims, band count, and pixel
  * probes come out of the actual decoded raster, and PNG is lossless so
  * the DuckDB oracle replays them in closed form. The audio leg
  * (`mm_audio_decode`) runs the same contract through the JDK's other
  * real codec: a deterministic PCM WAV per document decoded back with
  * `javax.sound.sampled` — header fields and samples must match the
  * closed form exactly. The video leg (`mm_video_frames`) completes
  * the set with the JDK's one real multi-frame container: an animated
  * GIF per document, frame count and every decoded frame replayed in
  * closed form — all three media modalities run REAL codecs. The
  * generic frame-sampling key keeps the byte-stat fixed-stride
  * chunking topology (and is oracled too: ASCII fixture bytes make
  * the per-frame rolling checksum SQL-replayable). On a cluster the same
  * `mapPartitions` shape is where a vectorized decoder (one codec/model
  * init per partition, batched inference) plugs in.
  */
object Multimodal extends QueryGroup {

  /** JVM-global ImageIO toggle, flipped exactly ONCE per executor JVM
    * (lazy val init) instead of from every partition task: the disk
    * cache is useless for in-memory blobs, and a global mutated
    * per-task both races and could stomp other code's setting
    * mid-stream. Referenced at the top of each decode partition. */
  private lazy val imageIoNoCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  final case class MediaRow(doc_id: Long, media: Array[Byte],
      lang: String, n_chars: Long)
  final case class PngRow(doc_id: Long, media: Array[Byte])
  final case class DecodedImage(doc_id: Long, img_w: Int, img_h: Int,
      n_channels: Int, px_00: Int, px_mid: Int, px_corner: Int)
  final case class DecodeStatus(doc_id: Long, status: String, img_w: Int,
      img_h: Int, px_00: Int, px_mid: Int, px_corner: Int)

  /** One tolerant decode: unclaimable blobs (ImageIO.read → null, e.g.
    * a zeroed signature) and mid-stream decoder failures (IOException,
    * e.g. a truncated body) both map to status='corrupt' with −1
    * sentinel probes — never a throw. `private[graft]` so LlmOpsSpec
    * can drive both failure arms directly (the fixture's zeroed-
    * signature rows only exercise the null arm). */
  private[graft] def decodeStatusRow(id: Long,
      media: Array[Byte]): DecodeStatus = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(media))
      catch { case _: java.io.IOException => null }
    if (img == null) DecodeStatus(id, "corrupt", -1, -1, -1, -1, -1)
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      DecodeStatus(id, "ok", w, h,
        raster.getSample(0, 0, 0),
        raster.getSample(w / 2, h / 2, 0),
        raster.getSample(w - 1, h - 1, 0))
    }
  }

  /** Deterministic synthetic grayscale PNG: pixel(x,y) =
    * (7x + 13y + id) mod 256. PNG is lossless, so a faithful decode must
    * reproduce every pixel bit-for-bit — the closed form doubles as the
    * DuckDB oracle for the decoded output. */
  def makePng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((7L * x + 13L * y + id) % 256L).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Image dims derived from row metadata — small enough that the
    * per-row encode/decode cost is codec overhead, not pixel volume. */
  def imgDims(id: Long, nChars: Long): (Int, Int) =
    (8 + (id % 25).toInt, 8 + (nChars % 17).toInt)

  final case class WavRow(doc_id: Long, media: Array[Byte])
  final case class DecodedAudio(doc_id: Long, sample_rate: Int,
      n_frames: Long, n_channels: Int, s_first: Int, s_mid: Int,
      s_last: Int, checksum: Long)

  /** Deterministic synthetic WAV (PCM s16le mono): sample(i) =
    * ((31·id + 7i) mod 65536) − 32768, rate 8000 + (id mod 8) kHz-steps,
    * 32 + (n_chars mod 41) frames. WAV is a lossless container, so a
    * faithful decode must return every header field and sample exactly —
    * the closed form doubles as the DuckDB oracle (the [[makePng]]
    * recipe transposed to the JDK's other real codec). */
  def makeWav(id: Long, nChars: Long): Array[Byte] = {
    val sr = 8000 + (id % 8).toInt * 1000
    val n = 32 + (nChars % 41).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (((31L * id + 7L * i) % 65536L) - 32768L).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sr.toFloat, 16, 1,
      true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  final case class AudioFeatures(doc_id: Long, n_frames: Long, zcr: Long,
      peak: Int, rms: Double, clipped: Long)

  final case class PhashRow(doc_id: Long, img_w: Int, img_h: Int,
      phash: Long, n_bits: Int)

  /** 16-bit average-hash over a 4×4 pooling grid: bit c set iff cell
    * c's mean exceeds the image mean, decided by integer cross-multiply
    * (exact — no division, no float). Invariant under global brightness
    * shift (±c cancels on both sides), which is what makes it a
    * PERCEPTUAL key where a byte hash is not. */
  def aHash16(img: java.awt.image.BufferedImage): (Long, Int) = {
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    val cellSum = new Array[Long](16)
    val cellN = new Array[Long](16)
    var total = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = raster.getSample(x, y, 0)
        val c = (y * 4 / h) * 4 + (x * 4 / w)
        cellSum(c) += p
        cellN(c) += 1
        total += p
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var bits = 0
    var c = 0
    while (c < 16) {
      if (cellSum(c) * w * h > total * cellN(c)) {
        hash |= (1L << c); bits += 1
      }
      c += 1
    }
    (hash, bits)
  }

  final case class ImageFeatures(doc_id: Long, img_w: Int, img_h: Int,
      mean_px: Double, min_px: Int, max_px: Int, grad_energy: Long)

  final case class GifRow(doc_id: Long, media: Array[Byte])
  final case class VideoFrame(doc_id: Long, frame_no: Int, fw: Int,
      fh: Int, px_00: Int, px_mid: Int, px_corner: Int, frame_sum: Long)
  final case class SceneCuts(doc_id: Long, n_frames: Int, n_cuts: Long,
      max_delta: Long)

  /** Deterministic synthetic "video": a multi-frame animated GIF —
    * the one multi-frame container the JDK encodes AND decodes natively
    * — with 2 + (id mod 7) frames of pixel(f,x,y) =
    * (7x + 13y + 31f + id) mod 256. A 256-level gray palette makes GIF
    * lossless here, so the closed form replays every decoded frame. */
  def makeGif(id: Long, nChars: Long): Array[Byte] = {
    val (w, h) = imgDims(id, nChars)
    val nFrames = 2 + (id % 7).toInt
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < nFrames) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0,
            ((7L * x + 13L * y + 31L * f + id) % 256L).toInt)
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), null)
      f += 1
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  /** STUB decode: deterministic fake feature extraction standing in for
    * an image/audio decoder. Real implementation would decode `bytes`
    * and emit model features; this emits byte-level stats so the
    * pipeline is testable end-to-end. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Long) = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum = (sum * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
    (bytes.length, if (bytes.isEmpty) -1 else bytes(0) & 0xff, sum)
  }

  final case class Frame(doc_id: Long, frame_no: Int, frame_bytes: Int,
      frame_checksum: Long)

  val queries: Map[String, Q] = Map(
    // frame sampling: 1→N expansion of a media blob into fixed-stride
    // chunks ("frames"), the video/audio sampling topology — each frame
    // re-enters the decode path independently.
    "mm_frame_sample" -> ((s, d) => {
      import s.implicits._
      val media = Tables(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("media"),
          col("lang"), col("n_chars"))
        .as[MediaRow]
      val frameSize = 64
      media.flatMap { r =>
        r.media.grouped(frameSize).zipWithIndex.map { case (chunk, i) =>
          val (n, _, ck) = decodeStub(chunk)
          Frame(r.doc_id, i, n, ck)
        }
      }.toDF()
        .orderBy("doc_id", "frame_no")
    }),

    // binary media column → per-partition batch decode, with a REAL
    // image codec: stage 1 materializes the PNG-bytes media column
    // (standing in for the object-store binary a production table
    // references), stage 2 decodes it back through javax.imageio. The
    // emitted dims / band count / pixel probes come from the decoded
    // raster, NOT the generator — a broken decode (wrong stride, wrong
    // color model, truncated stream) diverges from the closed-form
    // oracle immediately.
    "mm_decode_pipeline" -> ((s, d) => {
      import s.implicits._
      val media = Tables(s, d, "documents")
        .select(col("doc_id"), col("n_chars"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[(Long, Long)]
        .map { case (id, nChars) =>
          val (w, h) = imgDims(id, nChars)
          PngRow(id, makePng(id, w, h))
        }
      media.mapPartitions { rows =>
        // one codec init per partition (where a real decoder/model
        // loads); ImageIO's disk cache is useless for in-memory blobs.
        imageIoNoCache
        rows.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.media))
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          DecodedImage(r.doc_id, w, h, raster.getNumBands,
            raster.getSample(0, 0, 0),
            raster.getSample(w / 2, h / 2, 0),
            raster.getSample(w - 1, h - 1, 0))
        }
      }.toDF()
        .orderBy("doc_id")
    }),

    // corrupt-media tolerance (r13) — the scan_ignore_corrupt analog
    // for the media column: at 100 TB one mangled blob must cost one
    // ROW, not the stage. Every doc_id % 10 == 3 blob has its 8-byte
    // PNG signature zeroed (no ImageReader claims it, ImageIO.read
    // returns null); the decode leg maps that — and any decoder
    // IOException — to status='corrupt' with -1 sentinel probes
    // instead of throwing. Sentinels (not NULLs) keep every column
    // non-nullable, the cross-engine-hash-stable shape. The oracle
    // replays both legs: the corruption rule is closed-form on doc_id,
    // the ok rows replay the PNG closed form.
    "mm_decode_errors" -> ((s, d) => {
      import s.implicits._
      val media = Tables(s, d, "documents")
        .select(col("doc_id"), col("n_chars"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[(Long, Long)]
        .map { case (id, nChars) =>
          val (w, h) = imgDims(id, nChars)
          val b = makePng(id, w, h)
          if (id % 10 == 3) java.util.Arrays.fill(b, 0, 8, 0.toByte)
          PngRow(id, b)
        }
      media.mapPartitions { rows =>
        imageIoNoCache
        rows.map(r => decodeStatusRow(r.doc_id, r.media))
      }.toDF()
        .orderBy("doc_id")
    }),

    // binary media column → per-partition batch decode, with the JDK's
    // SECOND real codec (audio): stage 1 materializes a PCM-WAV media
    // column, stage 2 decodes it back through javax.sound.sampled —
    // sample rate, frame count, and channel count come from the parsed
    // RIFF header, the amplitude probes and rolling checksum from the
    // decoded little-endian s16 samples. WAV is lossless, so a broken
    // decode (wrong endianness, header-length drift, sign error)
    // diverges from the closed-form oracle immediately. (All three
    // media modalities run real codecs — see mm_video_frames for the
    // multi-frame GIF container leg.)
    "mm_audio_decode" -> ((s, d) => {
      import s.implicits._
      val media = Tables(s, d, "documents")
        .select(col("doc_id"), col("n_chars"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[(Long, Long)]
        .map { case (id, nChars) => WavRow(id, makeWav(id, nChars)) }
      media.mapPartitions { rows =>
        // AudioSystem's provider lookup runs per blob here (measured at
        // ~0.09 ms/doc in SCALE_CURVES.md); the mapPartitions boundary
        // is where a real vectorized featurizer would hoist its one
        // per-partition decoder/model init
        rows.map { r =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.media))
          val fmt = ais.getFormat
          val n = ais.getFrameLength.toInt
          val buf = ais.readAllBytes()
          def sample(i: Int): Int =
            (buf(2 * i + 1) << 8) | (buf(2 * i) & 0xff)
          var ck = 0L
          var i = 0
          while (i < n) {
            ck = (ck * 31 + (sample(i) + 32768)) % 1000000007L
            i += 1
          }
          DecodedAudio(r.doc_id, fmt.getSampleRate.toInt, n.toLong,
            fmt.getChannels, sample(0), sample(n / 2), sample(n - 1), ck)
        }
      }.toDF()
        .orderBy("doc_id")
    }),

    // VIDEO frame extraction with a REAL multi-frame container: each
    // document carries an animated GIF (the JDK's one natively
    // encodable+decodable multi-frame format), and frame sampling is a
    // genuine codec parse — ImageReader opens the container, reports
    // the frame count from the stream, and each decoded frame yields
    // pixel probes + an exact integer frame sum (the scene-change
    // statistic). All three media modalities now run real codecs. One
    // reader per partition, input reset per blob — the vectorized-
    // decoder hoisting shape. 1→N row expansion per doc, zero shuffles.
    "mm_video_frames" -> ((s, d) => {
      import s.implicits._
      // r19 opt (guide §2.5): the GIF encode+decode is compute-bound
      // but the input is 16 B/row, so the stage ran at the corpus's ~3
      // input splits; an explicit repartition of the tiny key rows
      // spreads the codec work across every core
      val media = Tables(s, d, "documents")
        .select(col("doc_id"), col("n_chars"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[(Long, Long)]
        .map { case (id, nChars) => GifRow(id, makeGif(id, nChars)) }
      media.mapPartitions { rows =>
        imageIoNoCache
        val reader = javax.imageio.ImageIO
          .getImageReadersByFormatName("gif").next()
        val frames = rows.flatMap { r =>
          // per-blob stream closed in finally (with memory caching it
          // holds no OS resources, but if any other code re-enables the
          // ImageIO disk cache an unclosed stream leaks a temp file)
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(r.media))
          try {
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            // eager IndexedSeq — all frames decoded before iis closes
            (0 until n).map { f =>
              val img = reader.read(f)
              val (w, h) = (img.getWidth, img.getHeight)
              def gray(x: Int, y: Int): Int = img.getRGB(x, y) & 0xff
              var sum = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) { sum += gray(x, y); x += 1 }
                y += 1
              }
              VideoFrame(r.doc_id, f, w, h, gray(0, 0),
                gray(w / 2, h / 2), gray(w - 1, h - 1), sum)
            }
          } finally iis.close()
        }
        // dispose the shared reader once the partition is exhausted
        frames ++ { reader.dispose(); Iterator.empty }
      }.toDF()
        .orderBy("doc_id", "frame_no")
    }),

    // VIDEO curation gate: SHOT-BOUNDARY detection over the decoded
    // frames — consecutive-frame brightness delta beyond a per-pixel
    // threshold flags a cut (the clip-segmentation primitive a video
    // pipeline samples around). ALL-INTEGER decision rule:
    // |sum_f − sum_{f−1}| > 8·w·h compares exact integer frame sums,
    // so the gate is bit-robust on both engines. Completes the
    // curation-gate triad (image/audio/video) over real codecs; one
    // container parse per blob, one output row per doc, zero shuffles.
    "mm_video_scene_cut" -> ((s, d) => {
      import s.implicits._
      // spread the codec work — see mm_video_frames
      val media = Tables(s, d, "documents")
        .select(col("doc_id"), col("n_chars"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[(Long, Long)]
        .map { case (id, nChars) => GifRow(id, makeGif(id, nChars)) }
      media.mapPartitions { rows =>
        imageIoNoCache
        val reader = javax.imageio.ImageIO
          .getImageReadersByFormatName("gif").next()
        val out = rows.map { r =>
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(r.media))
          try {
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            var prev = 0L; var cuts = 0L; var maxDelta = 0L
            var threshold = 0L
            var f = 0
            while (f < n) {
              val img = reader.read(f)
              val (w, h) = (img.getWidth, img.getHeight)
              if (f == 0) threshold = 8L * w * h
              var sum = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) { sum += img.getRGB(x, y) & 0xff; x += 1 }
                y += 1
              }
              if (f > 0) {
                val delta = math.abs(sum - prev)
                if (delta > threshold) cuts += 1
                if (delta > maxDelta) maxDelta = delta
              }
              prev = sum
              f += 1
            }
            SceneCuts(r.doc_id, n, cuts, maxDelta)
          } finally iis.close()
        }
        out ++ { reader.dispose(); Iterator.empty }
      }.toDF()
        .orderBy("doc_id")
    }),

    // image FEATURE EXTRACTION over the decoded raster — the
    // brightness/contrast/sharpness stats an image-curation gate
    // filters on (dark/blank frames, low-texture crops): per-image
    // mean/min/max pixel plus horizontal gradient energy
    // (Σ|p(x+1,y)−p(x,y)|, the sharpness proxy), one pass over the
    // REAL javax.imageio-decoded raster. Integer sums are exact, so
    // the generator's closed form replays the whole row in DuckDB.
    // PERCEPTUAL HASH (average-hash) over the decoded raster — the
    // image near-dup primitive (re-encoded / resized copies of one
    // image survive exact-byte dedup; their aHash doesn't): pixels
    // pool into a fixed 4×4 GRID (cells absorb the varying w×h, the
    // resize step of classic aHash without interpolation), each bit =
    // "cell brighter than the image mean", compared by integer
    // CROSS-MULTIPLY (cell_sum·w·h > total·cell_npx — no division, no
    // float, exact in any engine). 16-bit hash + popcount per doc;
    // Hamming bucketing downstream is embed_bitpack_hamming's shape.
    // Zero shuffles — one decoder init per partition, one raster pass.
    "mm_image_phash" -> ((s, d) => {
      import s.implicits._
      val media = Tables(s, d, "documents")
        .select(col("doc_id"), col("n_chars"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[(Long, Long)]
        .map { case (id, nChars) =>
          val (w, h) = imgDims(id, nChars)
          PngRow(id, makePng(id, w, h))
        }
      media.mapPartitions { rows =>
        imageIoNoCache
        rows.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.media))
          val (hash, bits) = aHash16(img)
          PhashRow(r.doc_id, img.getWidth, img.getHeight, hash, bits)
        }
      }.toDF().orderBy("doc_id")
    }),

    "mm_image_features" -> ((s, d) => {
      import s.implicits._
      val media = Tables(s, d, "documents")
        .select(col("doc_id"), col("n_chars"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[(Long, Long)]
        .map { case (id, nChars) =>
          val (w, h) = imgDims(id, nChars)
          PngRow(id, makePng(id, w, h))
        }
      media.mapPartitions { rows =>
        imageIoNoCache
        rows.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.media))
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          var sum = 0L; var mn = 255; var mx = 0; var gx = 0L
          var y = 0
          while (y < h) {
            var x = 0
            var prev = 0
            while (x < w) {
              val p = raster.getSample(x, y, 0)
              sum += p
              if (p < mn) mn = p
              if (p > mx) mx = p
              if (x > 0) gx += math.abs(p - prev)
              prev = p
              x += 1
            }
            y += 1
          }
          ImageFeatures(r.doc_id, w, h, sum.toDouble / (w * h), mn, mx, gx)
        }
      }.toDF()
        .withColumn("mean_px", round(col("mean_px"), 4))
        .orderBy("doc_id")
    }),

    // audio FEATURE EXTRACTION over the decoded samples — the analysis
    // leg a curation pipeline actually filters on (silence/clipping
    // gates, voice-activity proxies): zero-crossing rate, peak
    // amplitude, RMS energy, clipped-sample count, all computed from
    // the REAL decoded s16 stream in one pass per blob. Integer
    // accumulators (Σs² ≤ 72·2³⁰ stays exact), sqrt is IEEE-correctly-
    // rounded, so the closed-form waveform gives an exact DuckDB
    // replay. Same zero-shuffle mapPartitions shape as the decode leg.
    "mm_audio_features" -> ((s, d) => {
      import s.implicits._
      val media = Tables(s, d, "documents")
        .select(col("doc_id"), col("n_chars"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[(Long, Long)]
        .map { case (id, nChars) => WavRow(id, makeWav(id, nChars)) }
      media.mapPartitions { rows =>
        rows.map { r =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.media))
          val n = ais.getFrameLength.toInt
          val buf = ais.readAllBytes()
          def sample(i: Int): Int =
            (buf(2 * i + 1) << 8) | (buf(2 * i) & 0xff)
          var zcr = 0L; var peak = 0; var ss = 0L; var clipped = 0L
          var prev = 0
          var i = 0
          while (i < n) {
            val v = sample(i)
            if (i > 0 && ((prev >= 0) != (v >= 0))) zcr += 1
            val a = math.abs(v)
            if (a > peak) peak = a
            ss += v.toLong * v
            if (v == 32767 || v == -32768) clipped += 1
            prev = v
            i += 1
          }
          AudioFeatures(r.doc_id, n.toLong, zcr, peak,
            math.sqrt(ss.toDouble / n), clipped)
        }
      }.toDF()
        .withColumn("rms", round(col("rms"), 4))
        .orderBy("doc_id")
    }),

    // aspect-preserving resize planning — the third leg of the
    // decode / frame-sample / resize quartet. The stub "decoder"
    // derives source dims from the blob length (deterministic integer
    // arithmetic, so THIS mm key is DuckDB-oracled end-to-end: the
    // fixture text is ASCII, making byte length == LENGTH(text));
    // the fit-to-224 math is pure integer div. Same mapPartitions
    // batch shape a real vectorized resizer (one library init per
    // partition) drops into.
    "mm_resize_batch" -> ((s, d) => {
      import s.implicits._
      val media = Tables(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("media"),
          col("lang"), col("n_chars"))
        .as[MediaRow]
      media.mapPartitions { rows =>
        rows.map { r =>
          val len = r.media.length
          val w = 16 + (len % 2048)
          val h = 16 + ((len * 31) % 1536)
          val m = math.max(w, h)
          val (ow, oh) =
            if (m <= 224) (w, h) else ((w * 224) / m, (h * 224) / m)
          ResizePlan(r.doc_id, w, h, ow, oh)
        }
      }.toDF()
        .orderBy("doc_id")
    })
  )

  final case class ResizePlan(doc_id: Long, w: Int, h: Int,
      out_w: Int, out_h: Int)

  // All three image keys are oracled. The decode pipeline: PNG is
  // lossless, so the decoded raster must equal the generator's closed
  // form, which DuckDB computes from doc_id/n_chars alone. Frame
  // sampling: the fixture text is ASCII (byte == UNICODE(char)), so the
  // per-frame rolling checksum is the same LIST_REDUCE fold the
  // text_fingerprint oracle already replays, over SUBSTR chunks.
  /** Shared oracle CTE prefix for the video keys (the VectorOps
    * oKmeans/oPqEncode sharing pattern — one definition of the
    * generator's pixel grid, interpolated into each query): `dims`
    * (w/h/frame-count from metadata), `fr`/`xs` (frame and column
    * explodes), `px` (per-(doc, frame, x, y) closed-form pixel). A
    * formula change edits ONE place next to [[makeGif]], not N copies. */
  private def oVideoPixels: String =
    """dims AS (
      |  SELECT doc_id,
      |    CAST(8 + (doc_id % 25) AS INTEGER) AS w,
      |    CAST(8 + (n_chars % 17) AS INTEGER) AS h,
      |    CAST(2 + (doc_id % 7) AS INTEGER) AS nf
      |  FROM documents),
      |fr AS (SELECT doc_id, w, h,
      |    UNNEST(GENERATE_SERIES(0, nf - 1)) AS f FROM dims),
      |xs AS (SELECT doc_id, w, h, f,
      |    UNNEST(GENERATE_SERIES(0, w - 1)) AS x FROM fr),
      |px AS (SELECT doc_id, f,
      |    (7 * x + 13 * y + 31 * f + doc_id) % 256 AS p
      |  FROM (SELECT doc_id, w, f, x,
      |          UNNEST(GENERATE_SERIES(0, h - 1)) AS y FROM xs))""".stripMargin

  val oracles: Map[String, String] = Map(
    "mm_frame_sample" ->
      """SELECT doc_id, frame_no,
        |  CAST(LENGTH(chunk) AS INTEGER) AS frame_bytes,
        |  LIST_REDUCE(
        |    LIST_PREPEND(CAST(0 AS BIGINT),
        |      LIST_TRANSFORM(STR_SPLIT(chunk, ''),
        |        c -> CAST(UNICODE(c) AS BIGINT))),
        |    (acc, c) -> (acc * 31 + c) % 1000000007) AS frame_checksum
        |FROM (
        |  SELECT doc_id, CAST(k AS INTEGER) AS frame_no,
        |    SUBSTR(text, k * 64 + 1, 64) AS chunk
        |  FROM (
        |    SELECT doc_id, text,
        |      UNNEST(GENERATE_SERIES(0,
        |        CAST(CEIL(LENGTH(text) / 64.0) AS INTEGER) - 1)) AS k
        |    FROM documents))
        |ORDER BY doc_id, frame_no""".stripMargin,
    "mm_decode_pipeline" ->
      """SELECT doc_id, img_w, img_h, 1 AS n_channels,
        |  CAST(doc_id % 256 AS INTEGER) AS px_00,
        |  CAST((7*(img_w//2) + 13*(img_h//2) + doc_id) % 256 AS INTEGER)
        |    AS px_mid,
        |  CAST((7*(img_w-1) + 13*(img_h-1) + doc_id) % 256 AS INTEGER)
        |    AS px_corner
        |FROM (
        |  SELECT doc_id,
        |    CAST(8 + (doc_id % 25) AS INTEGER) AS img_w,
        |    CAST(8 + (n_chars % 17) AS INTEGER) AS img_h
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    // corruption rule and probes are both closed-form: doc_id%10==3
    // rows carry -1 sentinels, everything else replays the PNG formula
    "mm_decode_errors" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 10 = 3 THEN 'corrupt' ELSE 'ok' END
        |    AS status,
        |  CASE WHEN doc_id % 10 = 3 THEN -1 ELSE img_w END AS img_w,
        |  CASE WHEN doc_id % 10 = 3 THEN -1 ELSE img_h END AS img_h,
        |  CASE WHEN doc_id % 10 = 3 THEN -1
        |    ELSE CAST(doc_id % 256 AS INTEGER) END AS px_00,
        |  CASE WHEN doc_id % 10 = 3 THEN -1
        |    ELSE CAST((7*(img_w//2) + 13*(img_h//2) + doc_id) % 256
        |      AS INTEGER) END AS px_mid,
        |  CASE WHEN doc_id % 10 = 3 THEN -1
        |    ELSE CAST((7*(img_w-1) + 13*(img_h-1) + doc_id) % 256
        |      AS INTEGER) END AS px_corner
        |FROM (
        |  SELECT doc_id,
        |    CAST(8 + (doc_id % 25) AS INTEGER) AS img_w,
        |    CAST(8 + (n_chars % 17) AS INTEGER) AS img_h
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    // WAV is lossless and the waveform is closed-form: sample(i)+32768
    // = (31·id + 7i) mod 65536, so the checksum fold runs over that
    // directly; header fields replay from doc_id / n_chars alone.
    "mm_audio_decode" ->
      """SELECT doc_id,
        |  CAST(8000 + (doc_id % 8) * 1000 AS INTEGER) AS sample_rate,
        |  CAST(n AS BIGINT) AS n_frames,
        |  CAST(1 AS INTEGER) AS n_channels,
        |  CAST((31 * doc_id) % 65536 - 32768 AS INTEGER) AS s_first,
        |  CAST((31 * doc_id + 7 * (n // 2)) % 65536 - 32768 AS INTEGER)
        |    AS s_mid,
        |  CAST((31 * doc_id + 7 * (n - 1)) % 65536 - 32768 AS INTEGER)
        |    AS s_last,
        |  LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT),
        |    LIST_TRANSFORM(GENERATE_SERIES(0, n - 1),
        |      i -> (31 * doc_id + 7 * i) % 65536)),
        |    (acc, s) -> (acc * 31 + s) % 1000000007) AS checksum
        |FROM (SELECT doc_id, 32 + (n_chars % 41) AS n FROM documents)
        |ORDER BY doc_id""".stripMargin,
    // the gate replays on exact integer frame sums (LAG over the
    // per-frame grid sums) with the same integer threshold
    "mm_video_scene_cut" ->
      s"""WITH $oVideoPixels,
        |sums AS (SELECT doc_id, f, SUM(p) AS fsum
        |         FROM px GROUP BY doc_id, f),
        |deltas AS (SELECT doc_id, f,
        |    ABS(fsum - LAG(fsum) OVER (PARTITION BY doc_id ORDER BY f))
        |      AS delta
        |  FROM sums),
        |agg AS (SELECT d2.doc_id,
        |    SUM(CASE WHEN delta > 8 * w * h THEN 1 ELSE 0 END) AS n_cuts,
        |    MAX(delta) AS max_delta
        |  FROM deltas JOIN dims d2 USING (doc_id)
        |  WHERE delta IS NOT NULL GROUP BY d2.doc_id)
        |SELECT d.doc_id, d.nf AS n_frames,
        |  CAST(n_cuts AS BIGINT) AS n_cuts,
        |  CAST(max_delta AS BIGINT) AS max_delta
        |FROM dims d JOIN agg USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // GIF is lossless over the gray palette: every decoded frame must
    // equal the generator's closed form, which replays per (doc,
    // frame, x, y) over generate_series grids; the frame count is
    // metadata-derived (2 + id mod 7) and must round-trip the container
    "mm_video_frames" ->
      s"""WITH $oVideoPixels,
        |agg AS (SELECT doc_id, f, SUM(p) AS frame_sum
        |        FROM px GROUP BY doc_id, f)
        |SELECT d.doc_id, CAST(a.f AS INTEGER) AS frame_no,
        |  d.w AS fw, d.h AS fh,
        |  CAST((31 * a.f + d.doc_id) % 256 AS INTEGER) AS px_00,
        |  CAST((7 * (d.w // 2) + 13 * (d.h // 2) + 31 * a.f + d.doc_id)
        |    % 256 AS INTEGER) AS px_mid,
        |  CAST((7 * (d.w - 1) + 13 * (d.h - 1) + 31 * a.f + d.doc_id)
        |    % 256 AS INTEGER) AS px_corner,
        |  CAST(frame_sum AS BIGINT) AS frame_sum
        |FROM dims d JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id, frame_no""".stripMargin,
    // pixel stats replay from the generator's closed form over a
    // generate_series grid; the horizontal-gradient term re-derives
    // p(x+1,y) from the same formula (integer mod arithmetic, exact)
    // the closed-form raster replayed over a generate_series grid,
    // pooled by the same integer cell arithmetic
    "mm_image_phash" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |    CAST(8 + (doc_id % 25) AS INTEGER) AS w,
        |    CAST(8 + (n_chars % 17) AS INTEGER) AS h
        |  FROM documents),
        |xs AS (SELECT doc_id, w, h,
        |    UNNEST(GENERATE_SERIES(0, w - 1)) AS x FROM dims),
        |px AS (SELECT doc_id, w, h, x, y,
        |    (y * 4 // h) * 4 + (x * 4 // w) AS c,
        |    (7 * x + 13 * y + doc_id) % 256 AS p
        |  FROM (SELECT doc_id, w, h, x,
        |          UNNEST(GENERATE_SERIES(0, h - 1)) AS y FROM xs)),
        |cells AS (SELECT doc_id, w, h, c,
        |    SUM(p) AS cs, COUNT(*) AS cn
        |  FROM px GROUP BY doc_id, w, h, c),
        |tot AS (SELECT doc_id, SUM(p) AS total FROM px GROUP BY doc_id)
        |SELECT c1.doc_id, c1.w AS img_w, c1.h AS img_h,
        |  CAST(SUM(CASE WHEN cs * w * h > total * cn
        |        THEN 1::BIGINT << c ELSE 0 END) AS BIGINT) AS phash,
        |  CAST(SUM(CASE WHEN cs * w * h > total * cn
        |        THEN 1 ELSE 0 END) AS INTEGER) AS n_bits
        |FROM cells c1 JOIN tot USING (doc_id)
        |GROUP BY c1.doc_id, c1.w, c1.h
        |ORDER BY c1.doc_id""".stripMargin,
    "mm_image_features" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |    CAST(8 + (doc_id % 25) AS INTEGER) AS w,
        |    CAST(8 + (n_chars % 17) AS INTEGER) AS h
        |  FROM documents),
        |xs AS (SELECT doc_id, w, h,
        |    UNNEST(GENERATE_SERIES(0, w - 1)) AS x FROM dims),
        |px AS (SELECT doc_id, w, h, x, y,
        |    (7 * x + 13 * y + doc_id) % 256 AS p
        |  FROM (SELECT doc_id, w, h, x,
        |          UNNEST(GENERATE_SERIES(0, h - 1)) AS y FROM xs)),
        |agg AS (SELECT doc_id,
        |    SUM(p) AS sp, MIN(p) AS pmin, MAX(p) AS pmax,
        |    SUM(CASE WHEN x < w - 1 THEN
        |          ABS((7 * (x + 1) + 13 * y + doc_id) % 256 - p)
        |        ELSE 0 END) AS gx
        |  FROM px GROUP BY doc_id)
        |SELECT d.doc_id, d.w AS img_w, d.h AS img_h,
        |  ROUND(CAST(sp AS DOUBLE) / (d.w * d.h), 4) AS mean_px,
        |  CAST(pmin AS INTEGER) AS min_px,
        |  CAST(pmax AS INTEGER) AS max_px,
        |  CAST(gx AS BIGINT) AS grad_energy
        |FROM dims d JOIN agg USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // features replay from the closed-form waveform: ZCR via LAG sign
    // comparison, peak/Σs²/clip-count as integer aggregates, RMS as
    // SQRT over the exact integer power sum (sqrt is IEEE-correctly-
    // rounded on both engines — the agg_moments discipline).
    "mm_audio_features" ->
      """WITH base AS (
        |  SELECT doc_id, 32 + (n_chars % 41) AS n FROM documents),
        |samp AS (
        |  SELECT doc_id, n, i,
        |    (31 * doc_id + 7 * i) % 65536 - 32768 AS s
        |  FROM (SELECT doc_id, n,
        |          UNNEST(GENERATE_SERIES(0, n - 1)) AS i FROM base)),
        |lagged AS (
        |  SELECT doc_id, i, s,
        |    LAG(s) OVER (PARTITION BY doc_id ORDER BY i) AS sprev
        |  FROM samp),
        |agg AS (
        |  SELECT doc_id,
        |    SUM(CASE WHEN i > 0 AND ((sprev >= 0) <> (s >= 0))
        |        THEN 1 ELSE 0 END) AS zcr,
        |    MAX(ABS(s)) AS peak,
        |    SUM(s * s) AS ss,
        |    SUM(CASE WHEN s = 32767 OR s = -32768 THEN 1 ELSE 0 END)
        |      AS clipped
        |  FROM lagged GROUP BY doc_id)
        |SELECT b.doc_id, CAST(b.n AS BIGINT) AS n_frames,
        |  CAST(zcr AS BIGINT) AS zcr, CAST(peak AS INTEGER) AS peak,
        |  ROUND(SQRT(CAST(ss AS DOUBLE) / b.n), 4) AS rms,
        |  CAST(clipped AS BIGINT) AS clipped
        |FROM base b JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin,
    "mm_resize_batch" ->
      """SELECT doc_id, w, h,
        |  CAST(CASE WHEN GREATEST(w, h) <= 224 THEN w
        |    ELSE w * 224 // GREATEST(w, h) END AS INTEGER) AS out_w,
        |  CAST(CASE WHEN GREATEST(w, h) <= 224 THEN h
        |    ELSE h * 224 // GREATEST(w, h) END AS INTEGER) AS out_h
        |FROM (
        |  SELECT doc_id,
        |    CAST(16 + (LENGTH(text) % 2048) AS INTEGER) AS w,
        |    CAST(16 + ((LENGTH(text) * 31) % 1536) AS INTEGER) AS h
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin)
}
