package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StructField, StructType}

/** Custom Catalyst HLL aggregate — closes SURVEY §4.3's declared
  * `expr_custom_hll` gap with the one custom-aggregate shape the stock
  * `approx_count_distinct` can't give us: a sketch whose REGISTERS are
  * a portable, engine-independent function of the input, so the whole
  * sketch (not just the estimate) is replayable in plain SQL on
  * another engine. Flajolet et al. HyperLogLog, p = 9 → m = 512
  * byte registers.
  *
  * Contract (mirrored verbatim by the DuckDB oracle):
  *  - input is the repo's portable 60-bit md5-prefix hash
  *    (`conv(substring(md5(x), 1, 15), 16, 10)` — the
  *    audit_table_checksum precedent), NOT xxhash64, whose variants
  *    differ per engine;
  *  - bucket = h mod 512; rest = h >> 9 (51 significant bits);
  *    rho = 52 − bitlength(rest) (52 when rest = 0);
  *  - the register sum is kept as the EXACT integer Σ 2^(52−r_j)
  *    (max 512·2^52 < 2^63) — the float Σ 2^−r_j is order-dependent
  *    in its last ulp, the scaled-integer form is not, so `s_scaled`
  *    hash-matches across engines exactly;
  *  - estimate = α·m²·2^52 / s_scaled with the standard small-range
  *    linear-counting correction (α = 0.7213/(1 + 1.079/m)); the
  *    arithmetic is written in the same left-to-right association on
  *    both engines so the double is bitwise identical (the final
  *    round(4) only absorbs the correction branch's libm-ln ulp).
  *
  * Scale shape: the buffer is 512 bytes per group regardless of
  * cardinality; update is O(1) per row, merge is a bytewise max — the
  * classic mergeable-sketch contract, map-side combinable, shuffling
  * 512 bytes per (group, partition) at 100 TB.
  */
case class HllSketchAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  private val p = 9
  private val m = 1 << p // 512

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bucket = (h & (m - 1)).toInt
      val rest = h >>> p
      // bitlength(rest) = 64 - nlz; rest < 2^51 so rho ∈ [1, 52]
      val rho = (52 - (64 - java.lang.Long.numberOfLeadingZeros(rest))).toByte
      if (rho > buf(bucket)) buf(bucket) = rho
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    var s = 0L; var zeros = 0; var i = 0
    while (i < m) {
      s += 1L << (52 - buf(i))
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    // association mirrored in the oracle: (((α·m)·m)·2^52)/s
    val raw = alpha * m * m * 4503599627370496.0 / s.toDouble
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    new GenericInternalRow(Array[Any](est, s, zeros))
  }

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = StructType(Seq(
    StructField("est", DoubleType),
    StructField("s_scaled", LongType),
    StructField("zeros", IntegerType)))
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(
      newOffset: Int): HllSketchAgg = copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): HllSketchAgg = copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): HllSketchAgg = copy(child = newChild)
  override def prettyName: String = "graft_hll"
}
