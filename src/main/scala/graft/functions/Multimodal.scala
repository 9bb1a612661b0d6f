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

  /** REAL image lane (VERDICT r16 #4, `multimodal_image_decode`): the
    * container ships no external codecs, but the JDK itself ships a PNG
    * codec in `javax.imageio` — so this half of the surface decodes
    * genuine bytes, not a fake. The pixel recipe is deterministic pure
    * integer arithmetic in `doc_id` (dims ≤ 8×8, channel bases < 200 so
    * base + x + y < 256 never wraps), which makes the per-image channel
    * SUMS closed-form — the DuckDB oracle recomputes them from `doc_id`
    * alone while the Spark side must round-trip actual PNG bytes through
    * the codec to produce the same integers. TYPE_INT_RGB + PNG is
    * lossless, so equality is exact, never tolerance-based.
    */
  def pngDims(docId: Long): (Int, Int) =
    (1 + (docId % 8).toInt, 1 + ((docId * 3) % 8).toInt)

  /** Encode the deterministic test image for `docId` as real PNG bytes.
    * Runs executor-side in the one-time layout build (object-store-put
    * shape, no driver funnel) — one BufferedImage per asset, bounded 8×8.
    */
  def makePng(docId: Long): Array[Byte] = {
    val (w, h) = pngDims(docId)
    val r0 = (docId % 200).toInt
    val g0 = ((docId * 3) % 200).toInt
    val b0 = ((docId * 7) % 200).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((r0 + x + y) << 16) | ((g0 + x) << 8) | (b0 + y))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode PNG bytes → (width, height, channel sums). Fails LOUD on an
    * undecodable payload (a silent null would let corrupt assets pass as
    * zero-sum images). Channel sums are exact BIGINTs — the quantity a
    * curation pipeline aggregates (mean brightness per channel) without
    * introducing a float rounding surface.
    */
  def decodeSums(bytes: Array[Byte]): (Long, Long, Long, Long, Long) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"multimodal_image_decode: payload of ${bytes.length} bytes is not a decodable image")
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    (img.getWidth.toLong, img.getHeight.toLong, sr, sg, sb)
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
