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
  * the DuckDB oracle replays them in closed form. The frame-sampling key
  * keeps the deterministic byte-stat stand-in for codecs this container
  * lacks (video/audio) — but is oracled too: ASCII fixture bytes make
  * the per-frame rolling checksum SQL-replayable. On a cluster the same
  * `mapPartitions` shape is where a vectorized decoder (one codec/model
  * init per partition, batched inference) plugs in.
  */
object Multimodal extends QueryGroup {

  final case class MediaRow(doc_id: Long, media: Array[Byte],
      lang: String, n_chars: Long)
  final case class PngRow(doc_id: Long, media: Array[Byte])
  final case class DecodedImage(doc_id: Long, img_w: Int, img_h: Int,
      n_channels: Int, px_00: Int, px_mid: Int, px_corner: Int)

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
        .as[(Long, Long)]
        .map { case (id, nChars) =>
          val (w, h) = imgDims(id, nChars)
          PngRow(id, makePng(id, w, h))
        }
      media.mapPartitions { rows =>
        // one codec init per partition (where a real decoder/model
        // loads); ImageIO's disk cache is useless for in-memory blobs.
        javax.imageio.ImageIO.setUseCache(false)
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
