package graft.sim

import graft.{QueryGroup, Tables}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing [NS: BASELINE.json north_star "multimodal
  * columns"]: media as opaque `binary` columns with
  * typed metadata, batch-shaped feature extraction over partitions.
  *
  * The decode step is a clearly-marked deterministic STUB (image/audio
  * codecs are not available in this environment); everything around it —
  * schema (id, media binary, meta struct), partition-parallel batch
  * processing, typed output — is the real plumbing a production decode
  * UDF drops into. On a cluster the same `mapPartitions` shape is where
  * a vectorized decoder (one model/codec init per partition, batched
  * inference) plugs in.
  */
object Multimodal extends QueryGroup {

  final case class MediaRow(doc_id: Long, media: Array[Byte],
      lang: String, n_chars: Long)
  final case class MediaFeatures(doc_id: Long, n_bytes: Int,
      head_byte: Int, checksum: Long, lang: String)

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

    // binary media column + struct metadata → per-partition batch decode.
    "mm_decode_pipeline" -> ((s, d) => {
      import s.implicits._
      val media = Tables(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("media"),
          col("lang"), col("n_chars"))
        .as[MediaRow]
      media.mapPartitions { rows =>
        // one init per partition (where a real codec/model would load),
        // then batch over the partition's rows.
        rows.map { r =>
          val (n, head, ck) = decodeStub(r.media)
          MediaFeatures(r.doc_id, n, head, ck, r.lang)
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

  // the byte-level keys are engine-internal (LlmOpsSpec); the resize
  // plan is integer arithmetic on the blob length, which DuckDB can
  // replay from LENGTH(text) (ASCII fixture ⇒ byte length).
  val oracles: Map[String, String] = Map(
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
