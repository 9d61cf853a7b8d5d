package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Intersection SIZE of two SORTED DISTINCT string arrays by linear merge,
  * with a lower-bound early exit.
  *
  * `size(array_intersect(a, b))` builds a hash set over one side and
  * materializes the intersection array per row just to take its length —
  * for a verify join evaluating hundreds of thousands of candidate pairs
  * that is an allocation and a hash probe per element. Inputs here are
  * `array_sort(array_distinct(...))` by construction at every call site,
  * so one branch-per-element merge computes the same count with zero
  * allocation, inside whole-stage codegen.
  *
  * `required` is the caller's pass threshold (the smallest intersection
  * that can still pass its Jaccard gate). The merge stops as soon as
  * `count + min(remaining_a, remaining_b) < required` — the pair provably
  * fails — and returns the partial count, which is then < required too.
  * Semantics contract: the result is EXACT whenever it is ≥ `required`;
  * any early-exited value is < `required` and the true count is also
  * < `required`, so a monotone `n >= required`-style gate filters the
  * identical row set as the exact count. Callers must not expose the
  * value of rows that fail the gate. Pass `required` = 0 for an exact
  * count with no early exit.
  *
  * String comparison is UTF8String binary order — the same ordering
  * `array_sort` applied, so merge-advance decisions are consistent.
  */
case class SortedIntersectCount(first: Expression, second: Expression,
                                third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType), LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any, r: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val req = r.asInstanceOf[Long]
    val n1 = x.numElements()
    val n2 = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < n1 && j < n2 &&
      c + math.min(n1 - i, n2 - j) >= req) {
      val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, r) => {
      val n1 = ctx.freshName("n1")
      val n2 = ctx.freshName("n2")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val cmp = ctx.freshName("cmp")
      val u = classOf[UTF8String].getName
      s"""
         |int $n1 = $a.numElements();
         |int $n2 = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $n1 && $j < $n2 &&
         |    $c + java.lang.Math.min($n1 - $i, $n2 - $j) >= $r) {
         |  int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): SortedIntersectCount =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object ArrayFunctions {
  /** Column API: see [[SortedIntersectCount]]. */
  def sorted_intersect_count(a: Column, b: Column, required: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b),
      ColumnBridge.expression(required)))
}
