package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** Fixed-domain bitmap: one bit per possible id in [0, capacity). */
final class BitmapBuffer(val capacity: Int) extends Serializable {
  val words: Array[Long] = new Array[Long]((capacity + 63) >>> 6)

  def add(v: Long): Unit = {
    require(v >= 0 && v < capacity,
      s"bitmap_distinct: value $v outside the declared domain [0, $capacity) — " +
        "widen the capacity or pre-filter; a silent clamp would undercount")
    words((v >>> 6).toInt) |= 1L << (v & 63)
  }

  def merge(o: BitmapBuffer): Unit = {
    var i = 0
    while (i < words.length) { words(i) |= o.words(i); i += 1 }
  }

  def cardinality: Long = {
    var c = 0L
    var i = 0
    while (i < words.length) { c += java.lang.Long.bitCount(words(i)); i += 1 }
    c
  }
}

/** EXACT count-distinct for BOUNDED integer domains as a custom Catalyst
  * `TypedImperativeAggregate` — the bitmap-index trick ClickHouse/Doris
  * ship as `groupBitmap`/`bitmap_union_count`, on Spark (SURVEY §2.D
  * `agg_bitmap_distinct`).
  *
  * Why it beats `count(DISTINCT x)` when the domain is bounded: Spark's
  * exact distinct plans an Expand (one extra row copy per distinct
  * column per input row) and shuffles the expanded stream; the bitmap
  * is a ⌈capacity/64⌉-word buffer updated in place per row (one OR),
  * merged wordwise map-side, so the shuffle carries capacity/8 bytes
  * per group REGARDLESS of input size — and unlike HLL it is exact, not
  * an estimate. The domain bound is a loud CONTRACT: out-of-range
  * values throw with the offending value rather than silently clamp
  * (ids outside the declared universe mean the universe declaration is
  * wrong — the analyst must widen it consciously).
  */
case class BitmapDistinctAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitmapBuffer] {

  override def createAggregationBuffer(): BitmapBuffer = new BitmapBuffer(capacity)

  override def update(buf: BitmapBuffer, input: InternalRow): BitmapBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BitmapBuffer, other: BitmapBuffer): BitmapBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: BitmapBuffer): Any = buf.cardinality

  override def serialize(buf: BitmapBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.words.length * 8)
    bb.asLongBuffer().put(buf.words)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BitmapBuffer = {
    val b = new BitmapBuffer(capacity)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(b.words)
    b
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(offset: Int): BitmapDistinctAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BitmapDistinctAgg =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "bitmap_distinct"
}

object BitmapDistinctAgg {
  /** Column form: exact COUNT(DISTINCT c) for c ∈ [0, capacity). */
  def apply(c: Column, capacity: Int): Column =
    GraftColumnBridge.column(
      BitmapDistinctAgg(GraftColumnBridge.expression(c), capacity).toAggregateExpression())
}
