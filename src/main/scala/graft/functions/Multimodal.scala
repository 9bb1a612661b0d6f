package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.K `multimodal_struct`).
  *
  * Pattern: media payloads are opaque `binary` columns riding next to a
  * typed metadata struct; decode / feature-extract / resize / frame-sample
  * run per-partition over a typed Dataset so a real decoder would amortize
  * native-library init per partition (not per row) — the same batch shape
  * `mapInPandas` gives Python pipelines.
  *
  * The decode step itself is a DETERMINISTIC FAKE (this container has no
  * image/audio codecs): "frame-sample" = every 4th byte, "feature" = md5 of
  * the payload. The schema, partition processing, and output contract are
  * the real thing — swap `fakeDecode` for a codec call and nothing else
  * changes.
  *
  * Scale notes: payload bytes are never touched until this stage projects
  * them (columnar parquet reads skip the blob column for metadata-only
  * queries); per-row output is O(meta), so the shuffle after this stage
  * carries features, not media.
  */
object Multimodal {

  /** A media record: opaque payload + typed metadata. */
  final case class MediaRecord(doc_id: Long, payload: Array[Byte], width: Int, height: Int)

  /** Extracted features — what downstream training-data queries consume. */
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, meta_width: Long,
                                 meta_height: Long, thumb_bytes: Long, feature_hash: String)

  /** Deterministic stand-in for a codec: sample every 4th byte ("frame
    * sample"), hash the payload ("embedding"). Replace with a real decoder
    * in production — signature and batch shape stay identical.
    */
  private def fakeDecode(r: MediaRecord): MediaFeatures = {
    val sampled = r.payload.indices.count(_ % 4 == 0)
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(r.payload).map("%02x".format(_)).mkString
    MediaFeatures(r.doc_id, r.payload.length.toLong, r.width.toLong, r.height.toLong,
                  sampled.toLong, hex)
  }

  /** documents → media records (text bytes stand in for image bytes) →
    * per-partition decode → feature rows.
    */
  def pipeline(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val media: Dataset[MediaRecord] = documents
      .select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        (col("n_chars") % 640).cast("int").as("width"),
        ((col("n_chars") * 7) % 480).cast("int").as("height"))
      .as[MediaRecord]
    // mapPartitions: decoder state (here: the MessageDigest) could be
    // hoisted per partition; rows stream through without materializing the
    // whole partition.
    media.mapPartitions(_.map(fakeDecode)).toDF()
  }
}
