package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** HyperLogLog register file: dense byte-per-register, p = log2(m). */
final class HllBuffer(val p: Int) extends Serializable {
  val m: Int = 1 << p
  val regs: Array[Byte] = new Array[Byte](m)

  def add(hash: Long): Unit = {
    val idx = (hash >>> (64 - p)).toInt
    // rank = leading zeros of the remaining 64-p bits, + 1
    val w = hash << p
    val rank = (if (w == 0) 64 - p else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rank > regs(idx)) regs(idx) = rank.toByte
  }

  def merge(o: HllBuffer): Unit = {
    var i = 0
    while (i < m) { if (o.regs(i) > regs(i)) regs(i) = o.regs(i); i += 1 }
  }

  /** Standard HLL estimate with small-range (linear counting) correction. */
  def estimate: Long = {
    val alpha = 0.7213 / (1 + 1.079 / m)
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += 1.0 / (1L << regs(i))
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val e = alpha * m * m / sum
    val corrected =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) // linear counting
      else e
    math.round(corrected)
  }
}

/** SURVEY.md §2.L `udaf_imperative` / §4 item 1: a custom Catalyst
  * `TypedImperativeAggregate` carrying a binary HLL register file.
  *
  * Why imperative rather than an `Aggregator`: the buffer is a mutable
  * fixed-size byte array updated in place per row and merged bytewise —
  * exactly the shape `TypedImperativeAggregate` exists for (no per-row
  * encoder round-trip, binary-serialized between partial and final).
  * This is the 100 TB count-distinct: register files merge map-side, the
  * shuffle carries 2^p bytes per group regardless of input size.
  *
  * p=12 → 4096 registers, standard error ≈ 1.04/√m ≈ 1.6%.
  */
case class HllSketchAgg(
    child: Expression,
    p: Int = 12,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllBuffer] {

  private val hasher = XxHash64(Seq(child), 42L)

  override def createAggregationBuffer(): HllBuffer = new HllBuffer(p)

  override def update(buf: HllBuffer, input: InternalRow): HllBuffer = {
    if (child.eval(input) != null) buf.add(hasher.eval(input).asInstanceOf[Long])
    buf
  }

  override def merge(buf: HllBuffer, other: HllBuffer): HllBuffer = { buf.merge(other); buf }

  override def eval(buf: HllBuffer): Any = buf.estimate

  override def serialize(buf: HllBuffer): Array[Byte] = buf.regs

  override def deserialize(bytes: Array[Byte]): HllBuffer = {
    val b = new HllBuffer(p)
    System.arraycopy(bytes, 0, b.regs, 0, bytes.length)
    b
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(offset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "hll_sketch_estimate"
}

object HllSketchAgg {
  /** Column form: hllDistinct(col) — approximate COUNT(DISTINCT col). */
  def apply(c: Column): Column =
    GraftColumnBridge.column(HllSketchAgg(GraftColumnBridge.expression(c)).toAggregateExpression())
}
