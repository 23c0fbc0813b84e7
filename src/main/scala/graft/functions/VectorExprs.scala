package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** JVM-native Catalyst expressions for the embedding hot path (ANN
  * brute-force / IVF probe / near-dup verify).
  *
  * The `aggregate(zip_with(...))` formulations in [[VectorFns]] are
  * interpreted (higher-order functions don't codegen) and allocate a zipped
  * array per pair; these do the same arithmetic as one tight loop. The
  * summation ORDER is identical to the column versions (sequential
  * left-fold in index order, accumulator starts at 0.0, elements cast to
  * double before multiply) so results are bit-identical — pinned by
  * TextVectorSpec. [[VectorFns]] stays as the readable reference.
  */

private[functions] object VecRead {
  /** Element reader for float/double arrays, promoted to double. */
  def reader(dt: DataType): (ArrayData, Int) => Double = {
    dt.asInstanceOf[ArrayType].elementType match {
      case FloatType => (a, i) => a.getFloat(i).toDouble
      case DoubleType => (a, i) => a.getDouble(i)
      case IntegerType => (a, i) => a.getInt(i).toDouble
      case LongType => (a, i) => a.getLong(i).toDouble
      case other => throw new IllegalArgumentException(
        s"unsupported embedding element type $other")
    }
  }

  /** The same element read as generated Java (static dispatch on the
    * analysis-time element type — no per-row type tests in the loop). */
  def getterCode(dt: DataType, arr: String, i: String): String = {
    dt.asInstanceOf[ArrayType].elementType match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case DoubleType => s"$arr.getDouble($i)"
      case IntegerType => s"(double) $arr.getInt($i)"
      case LongType => s"(double) $arr.getLong($i)"
      case other => throw new IllegalArgumentException(
        s"unsupported embedding element type $other")
    }
  }
}

/** Dot product of two numeric arrays in double precision. NULL if either
  * side is NULL, lengths differ, or any element is NULL — exactly the
  * `aggregate(zip_with(...))` column form (zip_with pads the shorter array
  * with NULLs and one NULL product poisons the whole fold). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // Returns NULL for non-null inputs (length mismatch, null element), so
  // nullability must not be inferred from the children.
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  @transient private lazy val readL = VecRead.reader(left.dataType)
  @transient private lazy val readR = VecRead.reader(right.dataType)

  /** Whole-stage-codegen body: the identical index-order left-fold as
    * nullSafeEval, emitted as a tight primitive loop (a CodegenFallback
    * here would call the interpreted eval per ROW PAIR — exactly the
    * per-candidate cost the ANN kernels exist to avoid). */
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val getL = VecRead.getterCode(left.dataType, a, i)
      val getR = VecRead.getterCode(right.dataType, b, i)
      s"""
        int $n = $a.numElements();
        if ($b.numElements() != $n) {
          ${ev.isNull} = true;
        } else {
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            $acc += ($getL) * ($getR);
          }
          if (!${ev.isNull}) ${ev.value} = $acc;
        }
      """
    })

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += readL(a, i) * readR(b, i)
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity in one pass (three accumulators, each summed in index
  * order — bit-identical to dot/sqrt of the column forms). NULL when either
  * norm is 0 (zero vector), lengths differ, or any element is NULL,
  * matching `VectorFns.cosine` on every input class. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // NULL on length mismatch, null element, or zero-norm input — never
  // inherit non-nullability from the children.
  override def nullable: Boolean = true
  override def prettyName: String = "vec_cosine"

  @transient private lazy val readL = VecRead.reader(left.dataType)
  @transient private lazy val readR = VecRead.reader(right.dataType)

  /** Same three-accumulator single pass as nullSafeEval, in generated
    * Java — accumulation order identical, so codegen and interpreted
    * modes are bit-identical (pinned by spec in both modes). */
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("dd")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val sa = ctx.freshName("sa")
      val sb = ctx.freshName("sb")
      val getL = VecRead.getterCode(left.dataType, a, i)
      val getR = VecRead.getterCode(right.dataType, b, i)
      s"""
        int $n = $a.numElements();
        if ($b.numElements() != $n) {
          ${ev.isNull} = true;
        } else {
          double $d = 0.0; double $na = 0.0; double $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            double $x = $getL;
            double $y = $getR;
            $d += $x * $y;
            $na += $x * $x;
            $nb += $y * $y;
          }
          if (!${ev.isNull}) {
            double $sa = java.lang.Math.sqrt($na);
            double $sb = java.lang.Math.sqrt($nb);
            if ($sa > 0 && $sb > 0) { ${ev.value} = $d / ($sa * $sb); }
            else { ${ev.isNull} = true; }
          }
        }
      """
    })

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var d = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = readL(a, i)
      val y = readR(b, i)
      d += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val sa = math.sqrt(na)
    val sb = math.sqrt(nb)
    if (sa > 0 && sb > 0) d / (sa * sb) else null
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
