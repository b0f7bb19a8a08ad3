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
    })
  )

  // engine-internal byte handling — covered by MultimodalSpec, not DuckDB.
  val oracles: Map[String, String] = Map.empty
}
