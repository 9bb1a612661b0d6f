package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 source generating a deterministic synthetic OSM element
  * stream — the skeleton a real PBF reader would fill in (SURVEY.md §7.4
  * documents the PBF binary reader as future work; THIS is its Spark
  * extension-point: `TableProvider` → `ScanBuilder` → partitioned
  * `PartitionReader`s).
  *
  * What it demonstrates, scale-first:
  *   - split planning: the row space is divided into `partitions` input
  *     partitions, each read independently by an executor — exactly how a
  *     PBF reader would map file blocks to splits;
  *   - column pruning: `SupportsPushDownRequiredColumns` narrows the
  *     reader to the projected fields (a real reader skips decoding
  *     unprojected tag/geometry payloads);
  *   - zero driver state: every value is a pure function of the row id,
  *     so any executor can (re)compute its split — the property that
  *     makes retries/speculation free.
  *
  * Usage: spark.read.format("graft.sources.OsmSyntheticSource")
  *          .option("rows", n).option("partitions", p).load()
  */
class OsmSyntheticSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    OsmSyntheticSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new OsmSyntheticTable(
      properties.getOrDefault("rows", "10000").toLong,
      properties.getOrDefault("partitions", "8").toInt)
}

object OsmSyntheticSource {
  val schema: StructType = StructType(Seq(
    StructField("element_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("lon_c", LongType, nullable = false),
    StructField("lat_c", LongType, nullable = false)))

  /** Deterministic element attributes (the contract the oracle mirrors). */
  def kindOf(i: Long): String =
    (i % 3) match { case 0 => "node"; case 1 => "way"; case _ => "relation" }
  def lonOf(i: Long): Long = (i * 37) % 360000 - 180000
  def latOf(i: Long): Long = (i * 61) % 180000 - 90000
}

private class OsmSyntheticTable(rows: Long, partitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"osm_synthetic($rows)"
  override def schema(): StructType = OsmSyntheticSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new OsmSyntheticScanBuilder(rows, partitions)
}

private class OsmSyntheticScanBuilder(rows: Long, partitions: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  import org.apache.spark.sql.sources._

  private var required: StructType = OsmSyntheticSource.schema
  private var lo = 0L
  private var hi = rows
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Range predicates on element_id narrow the planned row range — the
    * analog of skipping whole PBF blocks by their id index. Everything
    * else stays a residual filter evaluated above the scan.
    */
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
      case LessThan("element_id", v: Long)           => hi = math.min(hi, v)
      case LessThanOrEqual("element_id", v: Long)    => hi = math.min(hi, v + 1)
      case EqualTo("element_id", v: Long)            => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _                                         => ()
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new OsmSyntheticScan(lo, math.max(lo, hi), partitions, required)
}

private case class OsmRangePartition(start: Long, end: Long) extends InputPartition

private class OsmSyntheticScan(lo: Long, hi: Long, partitions: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"osm_synthetic range=[$lo,$hi)"
  override def planInputPartitions(): Array[InputPartition] = {
    val rows = hi - lo
    val per = math.max(1L, (rows + partitions - 1) / partitions)
    (lo until hi by per).map(s => OsmRangePartition(s, math.min(s + per, hi)))
      .toArray[InputPartition]
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new OsmSyntheticReaderFactory(required)
}

private class OsmSyntheticReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[OsmRangePartition]
    new PartitionReader[InternalRow] {
      private var i = p.start - 1
      // pruned projection: only the requested fields are materialized
      private val getters: Array[Long => Any] = required.fields.map(_.name).map {
        case "element_id" => (i: Long) => i
        case "kind"       => (i: Long) => UTF8String.fromString(OsmSyntheticSource.kindOf(i))
        case "lon_c"      => (i: Long) => OsmSyntheticSource.lonOf(i)
        case "lat_c"      => (i: Long) => OsmSyntheticSource.latOf(i)
      }
      override def next(): Boolean = { i += 1; i < p.end }
      override def get(): InternalRow =
        new GenericInternalRow(getters.map(g => g(i)).asInstanceOf[Array[Any]])
      override def close(): Unit = ()
    }
  }
}
