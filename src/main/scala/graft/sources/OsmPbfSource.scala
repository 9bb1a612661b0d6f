package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for REAL `.osm.pbf` files ([[OsmPbf]] is the
  * wire codec) — the reference's actual input format (geofabrik
  * extracts, `osm_etl.py:54-55`, `README.md:97`); a user migrating off
  * the reference points this at the same file they feed pgosm-flex.
  *
  * Scale behavior, mapped to what a planet-scale PBF ingest needs:
  *   - PLANNING reads only BlobHeaders (4-byte length + ~30 bytes per
  *     blob, seeking past payloads): driver work is O(#blobs), not
  *     O(bytes) — a 70 GB planet file plans from ~2 MB of header I/O;
  *   - SPLITS are blobs (the format's independently-decodable unit —
  *     each has its own string table and delta chains): every executor
  *     seeks to its blobs and decodes in isolation, so retries and
  *     speculation re-read only their own blobs;
  *   - BLOB SKIPPING: pushed element_id range predicates drop whole
  *     blobs via BlobHeader.indexdata [minId, maxId] (written by
  *     [[OsmPbf.write]]; the spec's free-form index slot). Foreign
  *     files without indexdata decode everything — correct, just
  *     unskippable;
  *   - COLUMN PRUNING reaches the bytes: protobuf length-prefixes let
  *     the decoder skip unprojected packed fields (dense lat/lon, way
  *     refs, keys_vals) in O(1), and the per-blob string table is only
  *     materialized when `tags` is projected.
  *
  * Usage: spark.read.format("graft.sources.OsmPbfSource")
  *          .option("path", f).load()
  */
class OsmPbfSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    OsmPbfSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PbfTable(properties.get("path"))
}

object OsmPbfSource {
  /** The relational projection of the OSM data model: one row per
    * element; node coordinates in exact integer milli-degrees (floor of
    * nanodegrees/1e6 — the engine's centi-unit convention), way refs /
    * relation member ids as one ordered array, tags as a map. */
  val schema: StructType = StructType(Seq(
    StructField("element_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("lon_c", LongType, nullable = true),
    StructField("lat_c", LongType, nullable = true),
    StructField("tags", MapType(StringType, StringType, valueContainsNull = false),
                nullable = false),
    StructField("refs", ArrayType(LongType, containsNull = false), nullable = false)))
}

private class PbfTable(path: String) extends Table with SupportsRead {
  require(path != null, "OsmPbfSource requires option(\"path\", ...)")
  override def name(): String = s"osmpbf($path)"
  override def schema(): StructType = OsmPbfSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PbfScanBuilder(path)
}

private class PbfScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  import org.apache.spark.sql.sources._

  private var required: StructType = OsmPbfSource.schema
  private var lo = Long.MinValue
  private var hi = Long.MaxValue // inclusive
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Id-range predicates become blob-skip bounds; everything else stays
    * a residual filter above the scan. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThan("element_id", _: Long) | GreaterThanOrEqual("element_id", _: Long) |
           LessThan("element_id", _: Long) | LessThanOrEqual("element_id", _: Long) |
           EqualTo("element_id", _: Long) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThan("element_id", v: Long)        => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("element_id", v: Long) => lo = math.max(lo, v)
      case LessThan("element_id", v: Long)           => hi = math.min(hi, v - 1)
      case LessThanOrEqual("element_id", v: Long)    => hi = math.min(hi, v)
      case EqualTo("element_id", v: Long)            => lo = math.max(lo, v); hi = math.min(hi, v)
      case _                                         => ()
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    // Planning I/O: BlobHeaders only. OSMHeader blobs carry no elements;
    // OSMData blobs that cannot intersect [lo, hi] are skipped here.
    // Pushed bounds are also re-applied per-row in the reader (blob
    // granularity over-approximates).
    val all = OsmPbf.index(path).filter(_.blobType == "OSMData")
    val kept = all.filter(b => b.maxId >= lo && b.minId <= hi)
    new PbfScan(path, kept, all.size, lo, hi, required)
  }
}

private case class PbfBlobPartition(
    path: String, offset: Long, dataSize: Int, lo: Long, hi: Long) extends InputPartition

private class PbfScan(
    path: String, blobs: Seq[OsmPbf.BlockMeta], totalBlobs: Int,
    lo: Long, hi: Long, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"osmpbf blocks=${blobs.size}/$totalBlobs idRange=[$lo,$hi]"
  override def planInputPartitions(): Array[InputPartition] =
    blobs.map(b => PbfBlobPartition(path, b.offset, b.dataSize, lo, hi))
      .toArray[InputPartition]
  override def createReaderFactory(): PartitionReaderFactory =
    new PbfReaderFactory(required)
}

private class PbfReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PbfBlobPartition]
    new PartitionReader[InternalRow] {
      private val names = required.fieldNames
      private val want = OsmPbf.Want(
        tags = names.contains("tags"),
        coords = names.contains("lon_c") || names.contains("lat_c"),
        refs = names.contains("refs"))
      // executor-side: one seek + one contiguous read + decode per blob
      private val elems: Array[OsmPbf.Element] =
        OsmPbf.readBlock(p.path, p.offset, p.dataSize, want)
      private val getters: Array[OsmPbf.Element => Any] = names.map {
        case "element_id" => (e: OsmPbf.Element) => e.id
        case "kind"       => (e: OsmPbf.Element) => UTF8String.fromString(e.kind)
        case "lon_c"      => (e: OsmPbf.Element) =>
          if (e.hasCoord) Math.floorDiv(e.lonNano, 1000000L) else null
        case "lat_c"      => (e: OsmPbf.Element) =>
          if (e.hasCoord) Math.floorDiv(e.latNano, 1000000L) else null
        case "tags"       => (e: OsmPbf.Element) =>
          new ArrayBasedMapData(
            new GenericArrayData(e.tags.map(t => UTF8String.fromString(t._1)): Array[Any]),
            new GenericArrayData(e.tags.map(t => UTF8String.fromString(t._2)): Array[Any]))
        case "refs"       => (e: OsmPbf.Element) =>
          new GenericArrayData(e.refs)
      }
      private var i = -1
      override def next(): Boolean = {
        // re-apply pushed id bounds at row grain; no sortedness assumed
        // (foreign files may interleave kinds inside a blob)
        i += 1
        while (i < elems.length && (elems(i).id < p.lo || elems(i).id > p.hi)) i += 1
        i < elems.length
      }
      override def get(): InternalRow =
        new GenericInternalRow(getters.map(g => g(elems(i))).asInstanceOf[Array[Any]])
      override def close(): Unit = ()
    }
  }
}
