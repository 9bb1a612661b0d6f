package graft.sources

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream, RandomAccessFile}
import java.nio.charset.StandardCharsets

/** A PBF-SHAPED blockwise binary file format ("graftblk") — the byte-level
  * stand-in for the reference's actual input, OSM PBF extracts
  * (`/root/reference/README.md:97`, `osm_etl.py:54-55`). PBF itself is a
  * sequence of length-prefixed, independently-decodable blocks, each with
  * a string table and delta/varint-packed element payloads; this format
  * keeps exactly those properties (they are what make PBF splittable and
  * skippable) while dropping the protobuf framing:
  *
  *   file   := magic "GRFB" | uint32 version | block*
  *   block  := uint32 bodyLen | body
  *   body   := int64 minId | int64 maxId              (block id index)
  *           | uint32 nStrings | (uint32 len | utf8)* (string table)
  *           | uint32 nElems   | elem*
  *   elem   := varint zigzag(idΔ)                     (delta vs prev id)
  *           | varint kindRef | varint nameRef        (string-table refs)
  *           | varint zigzag(lonΔ) | varint zigzag(latΔ)
  *
  * Why this matters for the DSv2 source over it
  * ([[OsmPbfLikeSource]]): splits are BLOCKS (planned from the 20-byte
  * headers alone, no payload read on the driver), id-range predicates
  * skip whole blocks via the min/max index (the PBF analog of skipping
  * blobs by their index), and column pruning skips string-table
  * materialization when no string column is projected — i.e. the real
  * work of a PBF reader (seek, length-prefix walk, delta/varint decode,
  * string-table resolve) on real bytes.
  */
object GraftBlockFormat {
  val Magic: Int = 0x47524642 // "GRFB"
  val Version: Int = 1

  /** One element, the decoded unit (ids/coords in the engine's exact
    * centi-unit convention). */
  final case class Elem(id: Long, kind: String, name: String, lonC: Long, latC: Long)

  /** Driver-side block index entry: everything split planning and block
    * skipping need, nothing of the payload. */
  final case class BlockMeta(offset: Long, bodyLen: Int, minId: Long, maxId: Long)

  // --- varint / zigzag (the PBF wire primitives) ---

  def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  def writeVarint(out: DataOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) {
      out.writeByte(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.writeByte(v.toInt)
  }

  /** Reads one varint from `buf` starting at `pos(0)`, advancing it. */
  def readVarint(buf: Array[Byte], pos: Array[Int]): Long = {
    var shift = 0
    var v = 0L
    var b = 0
    do {
      b = buf(pos(0)) & 0xff
      pos(0) += 1
      v |= (b & 0x7fL) << shift
      shift += 7
    } while ((b & 0x80) != 0)
    v
  }

  // --- writer ---

  /** Writes elements into `blockSize`-element blocks. Elements must be in
    * ascending id order (PBF extracts are) — that is what makes the
    * per-block [minId, maxId] index a disjoint range partition that
    * id predicates can prune against.
    */
  def write(path: String, elems: Iterator[Elem], blockSize: Int): Unit = {
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try {
      out.writeInt(Magic)
      out.writeInt(Version)
      elems.grouped(blockSize).foreach { block =>
        val body = new java.io.ByteArrayOutputStream()
        val b = new DataOutputStream(body)
        b.writeLong(block.head.id)
        b.writeLong(block.last.id)
        // string table: first-seen order, one entry per distinct string
        val table = scala.collection.mutable.LinkedHashMap[String, Int]()
        def ref(s: String): Int = table.getOrElseUpdate(s, table.size)
        val packed = block.map(e => (e, ref(e.kind), ref(e.name)))
        b.writeInt(table.size)
        table.keys.foreach { s =>
          val bytes = s.getBytes(StandardCharsets.UTF_8)
          b.writeInt(bytes.length)
          b.write(bytes)
        }
        b.writeInt(block.size)
        var prevId = 0L
        var prevLon = 0L
        var prevLat = 0L
        packed.foreach { case (e, kindRef, nameRef) =>
          writeVarint(b, zigzag(e.id - prevId))
          writeVarint(b, kindRef.toLong)
          writeVarint(b, nameRef.toLong)
          writeVarint(b, zigzag(e.lonC - prevLon))
          writeVarint(b, zigzag(e.latC - prevLat))
          prevId = e.id; prevLon = e.lonC; prevLat = e.latC
        }
        b.flush()
        out.writeInt(body.size())
        body.writeTo(out)
      }
    } finally out.close()
  }

  // --- block index (driver-side planning) ---

  /** Reads ONLY the 4-byte length prefixes + 16-byte id ranges, seeking
    * past every payload — the whole file index costs 20 bytes of I/O per
    * block regardless of block size (how a PBF reader plans splits
    * without decoding blobs).
    */
  def index(path: String): Seq[BlockMeta] = {
    val f = new RandomAccessFile(path, "r")
    try {
      require(f.readInt() == Magic, s"$path: not a graftblk file")
      require(f.readInt() == Version, s"$path: unsupported version")
      val metas = Seq.newBuilder[BlockMeta]
      val len = f.length()
      while (f.getFilePointer < len) {
        val bodyLen = f.readInt()
        val offset = f.getFilePointer
        val minId = f.readLong()
        val maxId = f.readLong()
        metas += BlockMeta(offset, bodyLen, minId, maxId)
        f.seek(offset + bodyLen)
      }
      metas.result()
    } finally f.close()
  }

  /** Decodes one block body. `wantStrings` mirrors PBF reader reality:
    * the packed stream must be walked either way (deltas are cumulative),
    * but string materialization — the allocation-heavy part — is skipped
    * when no string column is projected.
    */
  def decode(body: Array[Byte], wantStrings: Boolean): Array[Elem] = {
    val pos = Array(0)
    def readLong8(): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (body(pos(0)) & 0xffL); pos(0) += 1; i += 1 }
      v
    }
    def readInt4(): Int = readLong8N(4).toInt
    def readLong8N(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 8) | (body(pos(0)) & 0xffL); pos(0) += 1; i += 1 }
      v
    }
    readLong8(); readLong8() // minId/maxId: consumed by planning already
    val nStrings = readInt4()
    val table = new Array[String](nStrings)
    var si = 0
    while (si < nStrings) {
      val slen = readInt4()
      if (wantStrings)
        table(si) = new String(body, pos(0), slen, StandardCharsets.UTF_8)
      pos(0) += slen
      si += 1
    }
    val nElems = readInt4()
    val out = new Array[Elem](nElems)
    var prevId = 0L
    var prevLon = 0L
    var prevLat = 0L
    var i = 0
    while (i < nElems) {
      val id = prevId + unzigzag(readVarint(body, pos))
      val kindRef = readVarint(body, pos).toInt
      val nameRef = readVarint(body, pos).toInt
      val lon = prevLon + unzigzag(readVarint(body, pos))
      val lat = prevLat + unzigzag(readVarint(body, pos))
      out(i) = Elem(id,
        if (wantStrings) table(kindRef) else null,
        if (wantStrings) table(nameRef) else null,
        lon, lat)
      prevId = id; prevLon = lon; prevLat = lat
      i += 1
    }
    out
  }
}
