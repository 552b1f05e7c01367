package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector-similarity hot path.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) are
  * CodegenFallback: every element evaluation goes through the
  * interpreted lambda machinery, which is the bottleneck of an
  * all-pairs cosine join (millions of pairs × 64 dims). These
  * expressions generate a primitive double[] loop inside whole-stage
  * codegen instead — same sequential accumulation order as the
  * `aggregate` fold and DuckDB's `list_dot_product`, so results stay
  * bit-identical to the oracle.
  *
  * Registered as SQL functions `vec_dot(a, b)` / `vec_norm(a)` via
  * [[VectorExpressions.register]].
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    val n = math.min(x.length, y.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += x(i) * y(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs")
      val ys = ctx.freshName("ys")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |double[] $xs = $a.toDoubleArray();
         |double[] $ys = $b.toDoubleArray();
         |int $n = java.lang.Math.min($xs.length, $ys.length);
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $s += $xs[$i] * $ys[$i]; }
         |${ev.value} = $s;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** L2 norm: sqrt(vec_dot(v, v)) in one pass. */
case class VecNorm(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    var s = 0.0
    var i = 0
    while (i < x.length) { s += x(i) * x(i); i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xs = ctx.freshName("xs")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |double[] $xs = $a.toDoubleArray();
         |double $s = 0.0;
         |for (int $i = 0; $i < $xs.length; $i++) { $s += $xs[$i] * $xs[$i]; }
         |${ev.value} = java.lang.Math.sqrt($s);
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
}

/** Integer dot product over int8-quantized vectors (`array<tinyint>`):
  * the scalar-quantization serving kernel — the quantized corpus is ¼
  * the bytes of the float one (scan, cache, and shuffle bandwidth all
  * shrink 4×), and the inner loop is pure integer multiply-adds. Sum
  * is exact in long (no accumulation-order sensitivity at all), so
  * quantized scores are bit-identical across partitionings. */
case class VecDotI8(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType

  /** STRICT on dimensions, unlike the float kernel: vec_dot tolerates
    * length mismatch because callers (PQ subspace slices) rely on it
    * and guard at their own boundaries; the int8 path has no such
    * caller, and a silent truncation here would let a mis-dimensioned
    * vector score plausibly into an SQ8 shortlist — the
    * silent-corruption class the IVF append guard exists to block. */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toByteArray()
    val y = b.asInstanceOf[ArrayData].toByteArray()
    require(x.length == y.length,
      s"vec_dot_i8 dimension mismatch: ${x.length} vs ${y.length}")
    var s = 0L
    var i = 0
    while (i < x.length) { s += x(i) * y(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs")
      val ys = ctx.freshName("ys")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |byte[] $xs = $a.toByteArray();
         |byte[] $ys = $b.toByteArray();
         |if ($xs.length != $ys.length) {
         |  throw new IllegalArgumentException(
         |    "vec_dot_i8 dimension mismatch: " + $xs.length + " vs " + $ys.length);
         |}
         |long $s = 0L;
         |for (int $i = 0; $i < $xs.length; $i++) { $s += $xs[$i] * $ys[$i]; }
         |${ev.value} = $s;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotI8 =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Idempotently register vec_dot / vec_norm / vec_dot_i8 in the
    * session's function registry so expr("vec_dot(a, b)") resolves. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot",
      exprs => VecDot(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_norm",
      exprs => VecNorm(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("vec_dot_i8",
      exprs => VecDotI8(exprs.head, exprs(1)), "built-in")
  }
}
