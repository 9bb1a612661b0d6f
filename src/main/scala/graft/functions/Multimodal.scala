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

  /** Decode PNG bytes and EXECUTE an aspect-preserving nearest-neighbor
    * resize into a `box`×`box` target (`multimodal_resize_exec` — the
    * byte half of the geometry `multimodal_resize_plan` computes as
    * metadata): scale_ppm = min(box·1e6 DIV w, box·1e6 DIV h), output
    * dims by integer DIV, source pixel of output (x, y) =
    * (x·w DIV ow, y·h DIV oh) — every step exact integer arithmetic, so
    * the resized channel sums are closed-form for the oracle while the
    * pixels themselves must come out of the real codec. Returns
    * (out_w, out_h, sum_r, sum_g, sum_b).
    */
  def decodeResizeSums(bytes: Array[Byte], box: Int): (Long, Long, Long, Long, Long) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"multimodal_resize_exec: payload of ${bytes.length} bytes is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val sp = math.min(box.toLong * 1000000L / w, box.toLong * 1000000L / h)
    val ow = (w.toLong * sp / 1000000L).toInt
    val oh = (h.toLong * sp / 1000000L).toInt
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < oh) {
      val sy = y * h / oh
      var x = 0
      while (x < ow) {
        val p = img.getRGB(x * w / ow, sy)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    (ow.toLong, oh.toLong, sr, sg, sb)
  }

  /** Decode PNG bytes → 64-bit perceptual difference hash (dHash,
    * `multimodal_phash`): nearest-neighbor-sample the decoded pixels
    * onto a 9×8 grid with the SAME exact-integer convention as
    * [[decodeResizeSums]] (source pixel = (x·w DIV 9, y·h DIV 8)),
    * integer-luma each cell (gray = (299r + 587g + 114b) DIV 1000 —
    * the ITU-R 601 weights in exact per-mille arithmetic), and emit
    * bit (x,y) = [gray(x+1,y) > gray(x,y)] — 8 comparisons per row ×
    * 8 rows. Packed MSB-first into TWO 32-bit words carried in BIGINTs
    * (rows 0-3 → hi, rows 4-7 → lo; the emb_binary_hamming device — a
    * single 64-bit word would overflow the sign under the oracle's
    * integer reconstruction). Every step is exact integer arithmetic
    * on losslessly round-tripped pixels, so the hash is closed-form
    * for the oracle while the engine must earn it through the codec. */
  def decodePhash(bytes: Array[Byte]): (Long, Long) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"multimodal_phash: payload of ${bytes.length} bytes is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val gray = Array.ofDim[Int](8, 9)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 9) {
        val p = img.getRGB(x * w / 9, y * h / 8)
        gray(y)(x) = (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) + 114 * (p & 0xff)) / 1000
        x += 1
      }
      y += 1
    }
    var hi = 0L
    var lo = 0L
    y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (gray(y)(x + 1) > gray(y)(x)) {
          if (y < 4) hi |= 1L << (31 - (y * 8 + x))
          else lo |= 1L << (31 - ((y - 4) * 8 + x))
        }
        x += 1
      }
      y += 1
    }
    (hi, lo)
  }

  /** REAL audio lane (`multimodal_audio_decode`) — same argument as the
    * PNG lane: the JDK ships a WAV (RIFF/PCM) codec in
    * `javax.sound.sampled`, so the audio half of the multimodal surface
    * can decode genuine bytes too. The sample recipe is deterministic
    * integer arithmetic in `doc_id` (16-bit PCM, values in ±1000), so
    * per-clip frame counts and absolute-amplitude sums are closed-form
    * for the oracle while the Spark side must round-trip real WAV
    * framing (RIFF header, fmt chunk, little-endian int16 data) through
    * the codec to produce the same integers.
    */
  val AudioSampleRate = 8000f

  def wavFrames(docId: Long): Int = 64 + (docId % 64).toInt

  /** The i-th PCM sample of the deterministic test clip for `docId`. */
  def wavSample(docId: Long, i: Int): Int =
    (((docId * 31 + i.toLong * 7) % 2001) - 1000).toInt

  /** Encode the deterministic test clip as real WAV bytes (16-bit mono
    * PCM, little-endian — the RIFF layout AudioSystem writes). */
  def makeWav(docId: Long): Array[Byte] = {
    val n = wavFrames(docId)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = wavSample(docId, i)
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(AudioSampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode WAV bytes → (sample_rate, n_frames, sum of |sample|). Fails
    * LOUD on non-WAV payloads and on any format other than the 16-bit
    * mono PCM contract (a silent skip would let corrupt assets pass as
    * empty clips). The amplitude sum is an exact BIGINT — the loudness
    * statistic an audio curation pass aggregates without a float
    * surface.
    */
  def decodeWav(bytes: Array[Byte]): (Long, Long, Long) = {
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch {
        case e: javax.sound.sampled.UnsupportedAudioFileException =>
          throw new IllegalArgumentException(
            s"multimodal_audio_decode: payload of ${bytes.length} bytes is not decodable audio", e)
      }
    val f = ais.getFormat
    require(f.getSampleSizeInBits == 16 && f.getChannels == 1 && !f.isBigEndian,
      s"multimodal_audio_decode: expected 16-bit mono little-endian PCM, got $f")
    val pcm = ais.readAllBytes()
    val n = pcm.length / 2
    var sum = 0L
    var i = 0
    while (i < n) {
      val s = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt
      sum += math.abs(s.toLong)
      i += 1
    }
    (f.getSampleRate.toLong, n.toLong, sum)
  }

  /** Decode WAV bytes → the raw int16 sample array, with the same
    * loud-failure contract as [[decodeWav]] (shared by the windowed
    * feature lane `multimodal_audio_rms`). */
  def decodeWavSamples(bytes: Array[Byte]): Array[Int] = {
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch {
        case e: javax.sound.sampled.UnsupportedAudioFileException =>
          throw new IllegalArgumentException(
            s"multimodal_audio_rms: payload of ${bytes.length} bytes is not decodable audio", e)
      }
    val f = ais.getFormat
    require(f.getSampleSizeInBits == 16 && f.getChannels == 1 && !f.isBigEndian,
      s"multimodal_audio_rms: expected 16-bit mono little-endian PCM, got $f")
    val pcm = ais.readAllBytes()
    Array.tabulate(pcm.length / 2) { i =>
      ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt
    }
  }

  /** documents → media records (text bytes stand in for image bytes) →
    * per-partition decode → feature rows.
    */
  def pipeline(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val media: Dataset[MediaRecord] = documents
      // a NULL payload is a failed fetch upstream, not a decodable asset:
      // the row drops here (quarantine semantics) instead of NPE-ing the
      // decode task (NullInputSpec)
      .where(col("text").isNotNull)
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
