package org.apache.spark.sql.graftshim

import graft.model.{AtrState, Candle}
import graft.operators.Atr
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import scala.collection.mutable.ArrayBuffer

/** `wilder_atr(struct(wkey, high, low, close))` — the Wilder ATR recursion
  * as a native aggregate function (the SURVEY.md §4 stretch goal), so the
  * per-symbol series can be computed in a plain `groupBy(symbol).agg(...)`
  * without converting to a typed Dataset.
  *
  * Semantics are exactly [[graft.operators.Atr.step]] (14-period warmup
  * mean, integer-tick half-up Wilder smoothing, clamp ≥ 0 —
  * /root/reference/modules/atr/atr_engine.py:109-192). The buffer holds the
  * group's (wkey, high, low, close) rows; partial aggregation merges
  * buffers, and the recursion runs once at eval over the window-sorted
  * series. Memory per group is bounded by windows-per-session, the same
  * bound the flatMapGroups path relies on.
  *
  * Output: array<struct<wkey:long, tr:double, atr:double?>> sorted by wkey.
  */
case class WilderAtrAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, Double, Double, Double)]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("wkey", LongType, nullable = false),
    StructField("tr", DoubleType, nullable = false),
    StructField("atr", DoubleType, nullable = true))))
  override def prettyName: String = "wilder_atr"

  override def createAggregationBuffer(): ArrayBuffer[(Long, Double, Double, Double)] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Long, Double, Double, Double)],
                      input: InternalRow): ArrayBuffer[(Long, Double, Double, Double)] = {
    val row = child.eval(input).asInstanceOf[InternalRow]
    if (row != null)
      buf += ((row.getLong(0), row.getDouble(1), row.getDouble(2), row.getDouble(3)))
    buf
  }

  override def merge(a: ArrayBuffer[(Long, Double, Double, Double)],
                     b: ArrayBuffer[(Long, Double, Double, Double)]): ArrayBuffer[(Long, Double, Double, Double)] =
    a ++= b

  override def eval(buf: ArrayBuffer[(Long, Double, Double, Double)]): Any = {
    val sorted = buf.sortBy(_._1)
    var state = AtrState.empty
    val out = sorted.map { case (wkey, high, low, close) =>
      val (next, tr, atr) = Atr.step(state, high, low, close)
      state = next
      InternalRow(wkey, tr, atr.map(Double.box).orNull)
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Long, Double, Double, Double)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (w, h, l, c) =>
      out.writeLong(w); out.writeDouble(h); out.writeDouble(l); out.writeDouble(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Double, Double, Double)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[(Long, Double, Double, Double)](n)
    var i = 0
    while (i < n) {
      buf += ((in.readLong(), in.readDouble(), in.readDouble(), in.readDouble()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): WilderAtrAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): WilderAtrAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): WilderAtrAgg =
    copy(child = newChildren.head)
}

object WilderAtrAgg {
  def wilder_atr(c: Column): Column =
    ColumnBridge.column(
      WilderAtrAgg(ColumnBridge.expression(c)).toAggregateExpression())
}
