package graft.sources

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream, RandomAccessFile}
import java.nio.charset.StandardCharsets
import java.util.zip.{Deflater, Inflater}

/** The REAL OpenStreetMap PBF wire format (`.osm.pbf`), hand-rolled from
  * the public spec — the reference's actual input (geofabrik extracts,
  * `/root/reference/osm_etl.py:54-55`, `README.md:97`). This replaces
  * round 3's PBF-SHAPED stand-in (`GraftBlockFormat`) with the genuine
  * article: protobuf wire decoding, BlobHeader/Blob framing, zlib
  * compression, delta/zigzag-packed DenseNodes, string tables.
  *
  * File layout (fileformat.proto, public):
  *
  *   file   := (int32-BE headerLen | BlobHeader | Blob)*
  *   BlobHeader := { 1: type (string: "OSMHeader"|"OSMData"),
  *                   2: indexdata (bytes, free-form),
  *                   3: datasize (varint) }
  *   Blob   := { 1: raw (bytes) | 3: zlib_data (bytes), 2: raw_size }
  *
  * Payload (osmformat.proto, public):
  *
  *   PrimitiveBlock := { 1: StringTable { 1: bytes* },
  *                       2: PrimitiveGroup*,
  *                       17: granularity (default 100),
  *                       19: lat_offset, 20: lon_offset }
  *   PrimitiveGroup := { 1: Node*, 2: DenseNodes, 3: Way*, 4: Relation* }
  *   DenseNodes := { 1: packed sint64 id (DELTA), 8/9: packed sint64
  *                   lat/lon (DELTA), 10: packed int32 keys_vals
  *                   ((k,v)* 0 per node), 5: DenseInfo (skipped) }
  *   Way      := { 1: id, 2/3: packed uint32 keys/vals,
  *                 8: packed sint64 refs (DELTA) }
  *   Relation := { 1: id, 2/3: keys/vals, 8: roles_sid,
  *                 9: packed sint64 memids (DELTA), 10: member types }
  *
  * Coordinates: degrees = 1e-9 * (offset + granularity * raw).
  *
  * Why a protobuf reader prunes BETTER than the old stand-in: protobuf
  * fields are length-prefixed, so an unprojected packed array (way refs,
  * dense lat/lon, keys_vals) is skipped in O(1) by its length — the old
  * format had to walk every varint regardless. Only the dense id stream
  * (always projected) must be walked.
  *
  * The writer emits BlobHeader.indexdata = 16 bytes big-endian
  * [minId, maxId] per OSMData blob — indexdata is the spec's designated
  * free-form slot for exactly this kind of index; readers that don't
  * know it skip it. Foreign files without indexdata still decode
  * (their blobs simply can't be id-skipped at planning).
  */
object OsmPbf {

  /** One decoded OSM element. `lonNano`/`latNano` are exact integer
    * nanodegrees (only meaningful when `hasCoord`); `tags`/`refs` are
    * null when the decode was pruned, never when merely empty.
    */
  final case class Element(
      id: Long, kind: String,
      lonNano: Long, latNano: Long, hasCoord: Boolean,
      tags: Array[(String, String)],
      refs: Array[Long])

  object Element {
    def node(id: Long, lonNano: Long, latNano: Long,
             tags: Array[(String, String)]): Element =
      Element(id, "node", lonNano, latNano, hasCoord = true, tags, Array.emptyLongArray)
    def way(id: Long, refs: Array[Long], tags: Array[(String, String)]): Element =
      Element(id, "way", 0L, 0L, hasCoord = false, tags, refs)
    def relation(id: Long, memids: Array[Long], tags: Array[(String, String)]): Element =
      Element(id, "relation", 0L, 0L, hasCoord = false, tags, memids)
  }

  /** Driver-side planning record for one blob: byte extent + id-skip
    * bounds, read from ~30 header bytes — never the payload. */
  final case class BlockMeta(offset: Long, dataSize: Int, blobType: String,
                             minId: Long, maxId: Long)

  /** Which parts of the element to materialize (column pruning pushed
    * into the byte decode; unwanted length-delimited fields are skipped
    * in O(1)). */
  final case class Want(tags: Boolean, coords: Boolean, refs: Boolean)
  val WantAll: Want = Want(tags = true, coords = true, refs = true)

  // ---- protobuf wire primitives ----

  def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  /** Protobuf message builder (wire types 0 and 2 — all OSM PBF needs). */
  final class PbOut {
    private val buf = new java.io.ByteArrayOutputStream()
    def size: Int = buf.size()
    def toBytes: Array[Byte] = buf.toByteArray
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { buf.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      buf.write(v.toInt)
    }
    private def key(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)
    def int(field: Int, v: Long): Unit = { key(field, 0); varint(v) }
    def sint(field: Int, v: Long): Unit = { key(field, 0); varint(zigzag(v)) }
    def bytes(field: Int, b: Array[Byte]): Unit = { key(field, 2); varint(b.length); buf.write(b, 0, b.length) }
    def str(field: Int, s: String): Unit = bytes(field, s.getBytes(StandardCharsets.UTF_8))
    def msg(field: Int)(f: PbOut => Unit): Unit = { val sub = new PbOut; f(sub); bytes(field, sub.toBytes) }
    /** Packed repeated varint (uint). */
    def packed(field: Int, vs: Iterable[Long]): Unit = {
      val sub = new PbOut; vs.foreach(sub.varint); bytes(field, sub.toBytes)
    }
    /** Packed repeated sint64, optionally delta-coded (ids/coords/refs). */
    def packedSint(field: Int, vs: Iterable[Long], delta: Boolean): Unit = {
      val sub = new PbOut
      var prev = 0L
      vs.foreach { v => sub.varint(zigzag(if (delta) v - prev else v)); if (delta) prev = v }
      bytes(field, sub.toBytes)
    }
  }

  /** Protobuf slice reader over `buf[pos, end)`. */
  final class PbIn(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var v = 0L; var b = 0
      do {
        b = buf(pos) & 0xff; pos += 1
        v |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    def sint(): Long = unzigzag(varint())
    /** Returns (fieldNumber, wireType). */
    def key(): (Int, Int) = { val k = varint(); ((k >>> 3).toInt, (k & 7).toInt) }
    /** Skip one field value of the given wire type (unknown/unwanted
      * fields — Info, DenseInfo, changesets, foreign extensions). */
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 1 => pos += 8
      case 2 => val l = varint().toInt; pos += l
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"osm.pbf: unsupported wire type $w")
    }
    /** Consume a length-delimited field as a sub-slice. */
    def slice(): PbIn = { val l = varint().toInt; val s = new PbIn(buf, pos, pos + l); pos += l; s }
    def sliceBytes(): Array[Byte] = { val l = varint().toInt; val b = java.util.Arrays.copyOfRange(buf, pos, pos + l); pos += l; b }
    def packedLongs(delta: Boolean): Array[Long] = {
      val s = slice()
      val out = Array.newBuilder[Long]
      var acc = 0L
      while (s.hasMore) { val v = s.sint(); acc = if (delta) acc + v else v; out += acc }
      out.result()
    }
    def packedUints(): Array[Int] = {
      val s = slice()
      val out = Array.newBuilder[Int]
      while (s.hasMore) out += s.varint().toInt
      out.result()
    }
  }

  // ---- writer ----

  /** Writes a valid `.osm.pbf`: OSMHeader blob, then `blockSize`-element
    * OSMData blobs (zlib-deflated), one single-kind PrimitiveGroup per
    * blob — nodes as delta-packed DenseNodes with keys_vals, ways and
    * relations as repeated messages. Caller supplies elements grouped by
    * kind with ascending ids within each kind (the layout of real
    * extracts); that makes each blob's [minId, maxId] indexdata a usable
    * skip range. Coordinates must be multiples of `granularity` nano
    * (offsets are written as 0).
    */
  def write(path: String, elems: Iterator[Element], blockSize: Int,
            granularity: Int = 100): Unit = {
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try {
      writeBlob(out, "OSMHeader", headerPayload(), indexdata = null)

      // One kind per blob: real extracts order nodes, then ways, then
      // relations; splitting runs at kind boundaries keeps every blob
      // single-kind AND id-ascending, so the indexdata range is tight.
      val runs = new Iterator[Seq[Element]] {
        val it = elems.buffered
        def hasNext: Boolean = it.hasNext
        def next(): Seq[Element] = {
          val kind = it.head.kind
          val b = Seq.newBuilder[Element]
          var n = 0
          while (n < blockSize && it.hasNext && it.head.kind == kind) { b += it.next(); n += 1 }
          b.result()
        }
      }
      runs.foreach { block =>
        val (payload, idx) = encodeBlock(block, granularity)
        writeBlob(out, "OSMData", payload, idx)
      }
    } finally out.close()
  }

  /** OSMHeader payload (bbox + required features + writingprogram). */
  private[sources] def headerPayload(): Array[Byte] = {
    val header = new PbOut
    header.msg(1) { bb => bb.sint(1, -1800000000L); bb.sint(2, 1800000000L)
                          bb.sint(3, 900000000L); bb.sint(4, -900000000L) }
    header.str(4, "OsmSchema-V0.6")
    header.str(4, "DenseNodes")
    header.str(16, "graft-osm-pbf-writer")
    header.toBytes
  }

  /** Encodes one single-kind, id-ascending block as an OSMData
    * PrimitiveBlock payload plus its 16-byte [minId, maxId] indexdata —
    * the streaming unit [[write]] and the DSv2 sink share. */
  private[sources] def encodeBlock(block: Seq[Element],
                                   granularity: Int): (Array[Byte], Array[Byte]) = {
    val pb = new PbOut
    // string table: index 0 is the reserved empty entry (keys_vals
    // uses 0 as the per-node tag-list terminator)
    val table = scala.collection.mutable.LinkedHashMap[String, Int]("" -> 0)
    def ref(s: String): Int = table.getOrElseUpdate(s, table.size)
    // intern tag strings first so the table is complete before encode
    val withRefs = block.map { e =>
      (e, e.tags.map { case (k, v) => (ref(k), ref(v)) })
    }
    val roleRef = if (block.head.kind == "relation") ref("member") else 0
    pb.msg(1) { st => table.keys.foreach(s => st.str(1, s)) }
    pb.int(17, granularity.toLong)
    pb.int(19, 0L); pb.int(20, 0L)
    block.head.kind match {
      case "node" =>
        pb.msg(2) { g =>
          g.msg(2) { dn =>
            dn.packedSint(1, block.map(_.id), delta = true)
            dn.packedSint(8, block.map(_.latNano / granularity), delta = true)
            dn.packedSint(9, block.map(_.lonNano / granularity), delta = true)
            val kvs = withRefs.flatMap { case (_, trs) =>
              trs.flatMap(t => Seq(t._1.toLong, t._2.toLong)) :+ 0L
            }
            dn.packed(10, kvs)
          }
        }
      case "way" =>
        pb.msg(2) { g =>
          withRefs.foreach { case (e, trs) =>
            g.msg(3) { w =>
              w.int(1, e.id)
              w.packed(2, trs.map(_._1.toLong))
              w.packed(3, trs.map(_._2.toLong))
              w.packedSint(8, e.refs, delta = true)
            }
          }
        }
      case "relation" =>
        pb.msg(2) { g =>
          withRefs.foreach { case (e, trs) =>
            g.msg(4) { r =>
              r.int(1, e.id)
              r.packed(2, trs.map(_._1.toLong))
              r.packed(3, trs.map(_._2.toLong))
              r.packed(8, e.refs.map(_ => roleRef.toLong))
              r.packedSint(9, e.refs, delta = true)
              r.packed(10, e.refs.map(_ => 0L))
            }
          }
        }
    }
    val idx = new Array[Byte](16)
    val bb = java.nio.ByteBuffer.wrap(idx)
    bb.putLong(block.map(_.id).min); bb.putLong(block.map(_.id).max)
    (pb.toBytes, idx)
  }

  private[sources] def writeBlob(out: DataOutputStream, blobType: String,
                                 payload: Array[Byte], indexdata: Array[Byte]): Unit = {
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(payload); deflater.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) zbuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val blob = new PbOut
    blob.int(2, payload.length.toLong) // raw_size
    blob.bytes(3, zbuf.toByteArray)    // zlib_data
    val blobBytes = blob.toBytes
    val header = new PbOut
    header.str(1, blobType)
    if (indexdata != null) header.bytes(2, indexdata)
    header.int(3, blobBytes.length.toLong)
    val headerBytes = header.toBytes
    out.writeInt(headerBytes.length) // int32 big-endian per spec
    out.write(headerBytes)
    out.write(blobBytes)
  }

  // ---- reader ----

  /** Walks BlobHeaders only: 4-byte length + ~30 header bytes per blob,
    * seeking past every payload — planning is O(#blobs), not O(bytes).
    * indexdata (when present and 16 bytes) becomes the id-skip range;
    * foreign blobs without it get the full range (never skipped, always
    * correct).
    */
  def index(path: String): Seq[BlockMeta] = {
    val f = new RandomAccessFile(path, "r")
    try {
      val metas = Seq.newBuilder[BlockMeta]
      val len = f.length()
      while (f.getFilePointer < len) {
        val headerLen = f.readInt()
        val hb = new Array[Byte](headerLen)
        f.readFully(hb)
        val in = new PbIn(hb, 0, hb.length)
        var blobType: String = ""
        var dataSize = -1
        var minId = Long.MinValue
        var maxId = Long.MaxValue
        while (in.hasMore) in.key() match {
          case (1, 2) => blobType = new String(in.sliceBytes(), StandardCharsets.UTF_8)
          case (2, 2) =>
            val idx = in.sliceBytes()
            if (idx.length == 16) {
              val bb = java.nio.ByteBuffer.wrap(idx)
              minId = bb.getLong(); maxId = bb.getLong()
            }
          case (3, 0) => dataSize = in.varint().toInt
          case (_, w) => in.skip(w)
        }
        require(dataSize >= 0, s"$path: BlobHeader without datasize")
        val offset = f.getFilePointer
        metas += BlockMeta(offset, dataSize, blobType, minId, maxId)
        f.seek(offset + dataSize)
      }
      metas.result()
    } finally f.close()
  }

  /** Blob envelope → uncompressed PrimitiveBlock/HeaderBlock payload
    * (raw passthrough or zlib inflate — the two encodings the spec
    * requires every reader to support). */
  def inflateBlob(blob: Array[Byte]): Array[Byte] = {
    val in = new PbIn(blob, 0, blob.length)
    var raw: Array[Byte] = null
    var rawSize = -1
    var zlib: Array[Byte] = null
    while (in.hasMore) in.key() match {
      case (1, 2) => raw = in.sliceBytes()
      case (2, 0) => rawSize = in.varint().toInt
      case (3, 2) => zlib = in.sliceBytes()
      case (_, w) => in.skip(w) // lzma/bzip2 lanes: not emitted by any mainstream writer
    }
    if (raw != null) raw
    else {
      require(zlib != null, "osm.pbf: blob has neither raw nor zlib_data")
      require(rawSize >= 0, "osm.pbf: zlib blob without raw_size")
      val out = new Array[Byte](rawSize)
      val inf = new Inflater()
      inf.setInput(zlib)
      var off = 0
      while (off < rawSize && !inf.finished()) off += inf.inflate(out, off, rawSize - off)
      inf.end()
      require(off == rawSize, s"osm.pbf: inflate produced $off of $rawSize bytes")
      out
    }
  }

  /** Reads one OSMData blob at a known extent (executor side: one seek,
    * one contiguous read, decode). */
  def readBlock(path: String, offset: Long, dataSize: Int, want: Want): Array[Element] = {
    val f = new RandomAccessFile(path, "r")
    val blob = try {
      f.seek(offset)
      val b = new Array[Byte](dataSize)
      f.readFully(b)
      b
    } finally f.close()
    decodePrimitiveBlock(inflateBlob(blob), want)
  }

  /** PrimitiveBlock → elements. Pruning is pushed into the bytes: the
    * string table is only materialized for `want.tags`; unprojected
    * packed arrays (dense lat/lon, way refs, relation memids, keys_vals)
    * are skipped in O(1) via their length prefix. Field order is
    * arbitrary per protobuf, so group slices are decoded only after the
    * whole block message is walked (granularity/offset may trail).
    */
  def decodePrimitiveBlock(payload: Array[Byte], want: Want): Array[Element] = {
    val in = new PbIn(payload, 0, payload.length)
    var stringTableSlice: PbIn = null
    val groups = Seq.newBuilder[PbIn]
    var granularity = 100L
    var latOffset = 0L
    var lonOffset = 0L
    while (in.hasMore) in.key() match {
      case (1, 2)  => stringTableSlice = in.slice()
      case (2, 2)  => groups += in.slice()
      case (17, 0) => granularity = in.varint()
      case (19, 0) => latOffset = in.varint()
      case (20, 0) => lonOffset = in.varint()
      case (_, w)  => in.skip(w)
    }
    val table: Array[String] =
      if (!want.tags || stringTableSlice == null) null
      else {
        val b = Seq.newBuilder[String]
        while (stringTableSlice.hasMore) stringTableSlice.key() match {
          case (1, 2) =>
            val s = stringTableSlice
            val l = s.varint().toInt
            b += new String(s.buf, s.pos, l, StandardCharsets.UTF_8)
            s.pos += l
          case (_, w) => stringTableSlice.skip(w)
        }
        b.result().toArray
      }
    def tagsOf(keys: Array[Int], vals: Array[Int]): Array[(String, String)] =
      if (table == null) null
      else keys.indices.map(i => (table(keys(i)), table(vals(i)))).toArray
    val out = Array.newBuilder[Element]
    groups.result().foreach { g =>
      while (g.hasMore) g.key() match {
        case (1, 2) => out += decodeNode(g.slice(), want, table, granularity, latOffset, lonOffset)
        case (2, 2) => decodeDense(g.slice(), want, table, granularity, latOffset, lonOffset, out)
        case (3, 2) => out += decodeWayOrRel(g.slice(), "way", 8, want, tagsOf)
        case (4, 2) => out += decodeWayOrRel(g.slice(), "relation", 9, want, tagsOf)
        case (_, w) => g.skip(w) // changesets (5) and extensions
      }
    }
    out.result()
  }

  private def decodeNode(n: PbIn, want: Want, table: Array[String],
                         gran: Long, latOff: Long, lonOff: Long): Element = {
    var id = 0L; var lat = 0L; var lon = 0L
    var keys: Array[Int] = null; var vals: Array[Int] = null
    while (n.hasMore) n.key() match {
      case (1, 0) => id = n.sint()
      case (2, 2) => if (want.tags) keys = n.packedUints() else n.skip(2)
      case (3, 2) => if (want.tags) vals = n.packedUints() else n.skip(2)
      case (8, 0) => lat = n.sint()
      case (9, 0) => lon = n.sint()
      case (_, w) => n.skip(w)
    }
    val tags =
      if (table == null) null
      else if (keys == null) Array.empty[(String, String)]
      else keys.indices.map(i => (table(keys(i)), table(vals(i)))).toArray
    Element(id, "node", lonOff + gran * lon, latOff + gran * lat,
            hasCoord = true, tags, if (want.refs) Array.emptyLongArray else null)
  }

  private def decodeDense(dn: PbIn, want: Want, table: Array[String],
                          gran: Long, latOff: Long, lonOff: Long,
                          out: scala.collection.mutable.Builder[Element, Array[Element]]): Unit = {
    var ids: Array[Long] = null
    var lats: Array[Long] = null
    var lons: Array[Long] = null
    var kvs: Array[Int] = null
    while (dn.hasMore) dn.key() match {
      case (1, 2)  => ids = dn.packedLongs(delta = true)
      case (8, 2)  => if (want.coords) lats = dn.packedLongs(delta = true) else dn.skip(2)
      case (9, 2)  => if (want.coords) lons = dn.packedLongs(delta = true) else dn.skip(2)
      case (10, 2) => if (want.tags) kvs = dn.packedUints() else dn.skip(2)
      case (_, w)  => dn.skip(w) // denseinfo (5)
    }
    if (ids == null) return
    var kv = 0
    var i = 0
    while (i < ids.length) {
      val tags: Array[(String, String)] =
        if (table == null) null
        else if (kvs == null || kv >= kvs.length) Array.empty
        else {
          val b = Seq.newBuilder[(String, String)]
          while (kv < kvs.length && kvs(kv) != 0) {
            b += ((table(kvs(kv)), table(kvs(kv + 1)))); kv += 2
          }
          kv += 1 // the 0 terminator
          b.result().toArray
        }
      out += Element(ids(i), "node",
        if (lons != null) lonOff + gran * lons(i) else 0L,
        if (lats != null) latOff + gran * lats(i) else 0L,
        hasCoord = want.coords,
        tags, if (want.refs) Array.emptyLongArray else null)
      i += 1
    }
  }

  private def decodeWayOrRel(m: PbIn, kind: String, refsField: Int, want: Want,
                             tagsOf: (Array[Int], Array[Int]) => Array[(String, String)]): Element = {
    var id = 0L
    var keys: Array[Int] = null
    var vals: Array[Int] = null
    var refs: Array[Long] = null
    while (m.hasMore) m.key() match {
      case (1, 0) => id = m.varint()
      case (2, 2) => if (want.tags) keys = m.packedUints() else m.skip(2)
      case (3, 2) => if (want.tags) vals = m.packedUints() else m.skip(2)
      case (f, 2) if f == refsField => if (want.refs) refs = m.packedLongs(delta = true) else m.skip(2)
      case (_, w) => m.skip(w) // info (4), roles_sid (8), member types (10)
    }
    val tags =
      if (!want.tags) null
      else if (keys == null) Array.empty[(String, String)]
      else tagsOf(keys, vals)
    Element(id, kind, 0L, 0L, hasCoord = false, tags,
            if (!want.refs) null else if (refs == null) Array.emptyLongArray else refs)
  }
}
