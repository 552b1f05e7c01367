package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
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

/** Nearest-centroid assignment against a whole (sorted) codebook as
  * ONE expression: `vec_argmin_code(sub, cbs)` where `cbs` is
  * `array<struct<code:int, c:array<double>>>` sorted by code
  * ascending. Returns the code minimizing
  * `(dot(sub,sub) − 2·dot(sub,c)) + dot(c,c)`, ties to the SMALLEST
  * code.
  *
  * This replaces the ksub-way candidate join + `min(struct(d2, code))`
  * aggregate in PQ training/encode: the frame stays |sub-vectors|
  * rows instead of |sub-vectors|·ksub, and the per-candidate shuffle
  * and re-aggregation disappear (the 100× probe measured the join
  * form's build at 112 s for 200k×8 sub-vectors × 64 codes — almost
  * all of it this explosion). Arithmetic is EXACTLY the join path's:
  * each dot is the same left-to-right fold the codegen'd [[VecDot]]
  * (and DuckDB's `list_dot_product`, which the sim_topk_ivfpq oracle
  * replays) performs, the d2 composition keeps the same operation
  * order, and ascending-code iteration with strict-less updates
  * reproduces the lexicographic `min(struct(d2, code))` tie-break —
  * so trained codebooks and encodings are bit-identical to the join
  * form and the saved-index oracle stays valid.
  *
  * NaN ordering matches Spark's double sort order (NaN greater than
  * every double, equal to itself): a NaN d2 — a NaN component in a
  * vector or centroid — can never beat a finite candidate, exactly as
  * the replaced `min(struct(d2, code))` aggregate ordered it. */
case class VecArgminCode(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sub = a.asInstanceOf[ArrayData].toDoubleArray()
    val cbs = b.asInstanceOf[ArrayData]
    require(cbs.numElements() > 0, "vec_argmin_code: empty codebook")
    var aa = 0.0
    var i = 0
    while (i < sub.length) { aa += sub(i) * sub(i); i += 1 }
    var best = 0.0
    var bestCode = 0
    var first = true
    var j = 0
    while (j < cbs.numElements()) {
      val row = cbs.getStruct(j, 2)
      val c = row.getArray(1).toDoubleArray()
      val n = math.min(sub.length, c.length)
      var bb = 0.0
      var k = 0
      while (k < n) { bb += sub(k) * c(k); k += 1 }
      var cc = 0.0
      k = 0
      while (k < c.length) { cc += c(k) * c(k); k += 1 }
      val d2 = (aa - 2.0 * bb) + cc
      // NaN-safe strict-less: NaN sorts greater than every double
      // (Spark's ordering), so a finite d2 also beats a NaN best
      if (first || (best.isNaN && !d2.isNaN) || d2 < best) {
        best = d2; bestCode = row.getInt(0); first = false
      }
      j += 1
    }
    bestCode
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val sub = ctx.freshName("sub")
      val cbs = ctx.freshName("cbs")
      val aa = ctx.freshName("aa")
      val best = ctx.freshName("best")
      val bestCode = ctx.freshName("bestCode")
      val first = ctx.freshName("first")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val row = ctx.freshName("row")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val bb = ctx.freshName("bb")
      val cc = ctx.freshName("cc")
      val d2 = ctx.freshName("d2")
      val nanLoses = ctx.freshName("nanLoses")
      s"""
         |double[] $sub = $a.toDoubleArray();
         |org.apache.spark.sql.catalyst.util.ArrayData $cbs = $b;
         |if ($cbs.numElements() == 0) {
         |  throw new IllegalArgumentException("vec_argmin_code: empty codebook");
         |}
         |double $aa = 0.0;
         |for (int $i = 0; $i < $sub.length; $i++) { $aa += $sub[$i] * $sub[$i]; }
         |double $best = 0.0;
         |int $bestCode = 0;
         |boolean $first = true;
         |for (int $j = 0; $j < $cbs.numElements(); $j++) {
         |  org.apache.spark.sql.catalyst.InternalRow $row = $cbs.getStruct($j, 2);
         |  double[] $c = $row.getArray(1).toDoubleArray();
         |  int $n = java.lang.Math.min($sub.length, $c.length);
         |  double $bb = 0.0;
         |  for (int $k = 0; $k < $n; $k++) { $bb += $sub[$k] * $c[$k]; }
         |  double $cc = 0.0;
         |  for (int $k = 0; $k < $c.length; $k++) { $cc += $c[$k] * $c[$k]; }
         |  double $d2 = ($aa - 2.0 * $bb) + $cc;
         |  boolean $nanLoses =
         |    java.lang.Double.isNaN($best) && !java.lang.Double.isNaN($d2);
         |  if ($first || $nanLoses || $d2 < $best) {
         |    $best = $d2; $bestCode = $row.getInt(0); $first = false;
         |  }
         |}
         |${ev.value} = $bestCode;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecArgminCode =
    copy(left = newLeft, right = newRight)
}

/** Top-n nearest-code assignment against a whole (sorted) codebook as
  * ONE expression: `vec_argmin_topn(v, cbs, n)` where `cbs` is
  * `array<struct<code:int, c:array<double>>>` sorted by code
  * ascending. Returns the min(n, |cbs|) codes ordered by (d2, code)
  * ascending — the multi-cell-probe generalization of
  * [[VecArgminCode]] (n = 1 returns exactly that argmin).
  *
  * This replaces the k-way candidate cross join + per-vec_id
  * `row_number` window in `VecKMeans.assignTopN`: the probe frame
  * stays |probes| rows instead of |probes|·k, and the window's
  * per-vec exchange disappears — nProbe cell assignment becomes a
  * pure projection, the same plan shape `assign` got from
  * vec_argmin_code. The (d2, code) order is the window's
  * `orderBy(d2, cid)` with Spark's double sort semantics (NaN greater
  * than every double), and d2 uses the identical left-to-right fold
  * arithmetic, so probed cell sets are bit-identical to the join
  * form's. */
case class VecArgminTopN(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  /** Spark's nan-safe double compare: NaN > every double, NaN = NaN. */
  private def cmp(x: Double, y: Double): Int = {
    val xn = java.lang.Double.isNaN(x)
    val yn = java.lang.Double.isNaN(y)
    if ((xn && yn) || x == y) 0
    else if (xn) 1
    else if (yn) -1
    else if (x > y) 1 else -1
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val v = a.asInstanceOf[ArrayData].toDoubleArray()
    val cbs = b.asInstanceOf[ArrayData]
    val n = c.asInstanceOf[Int]
    require(n > 0, s"vec_argmin_topn: n must be positive, got $n")
    require(cbs.numElements() > 0, "vec_argmin_topn: empty codebook")
    var aa = 0.0
    var i = 0
    while (i < v.length) { aa += v(i) * v(i); i += 1 }
    val bd = new Array[Double](n)
    val bc = new Array[Int](n)
    var cnt = 0
    var j = 0
    while (j < cbs.numElements()) {
      val row = cbs.getStruct(j, 2)
      val cen = row.getArray(1).toDoubleArray()
      val m = math.min(v.length, cen.length)
      var bb = 0.0
      var k = 0
      while (k < m) { bb += v(k) * cen(k); k += 1 }
      var cc = 0.0
      k = 0
      while (k < cen.length) { cc += cen(k) * cen(k); k += 1 }
      val d2 = (aa - 2.0 * bb) + cc
      val code = row.getInt(0)
      // sorted-insert into the (d2, code)-ascending top-n buffer
      var pos = cnt
      var t = 0
      var found = false
      while (t < cnt && !found) {
        val cr = cmp(d2, bd(t))
        if (cr < 0 || (cr == 0 && code < bc(t))) { pos = t; found = true }
        t += 1
      }
      if (pos < n) {
        var s = math.min(cnt, n - 1)
        while (s > pos) { bd(s) = bd(s - 1); bc(s) = bc(s - 1); s -= 1 }
        bd(pos) = d2
        bc(pos) = code
        if (cnt < n) cnt += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(bc, cnt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, nIn) => {
      val before = ctx.addNewFunction("vecArgminTopnBefore",
        s"""
           |private boolean vecArgminTopnBefore(double da, int ca, double db, int cb) {
           |  boolean an = java.lang.Double.isNaN(da);
           |  boolean bn = java.lang.Double.isNaN(db);
           |  int c;
           |  if ((an && bn) || da == db) c = 0;
           |  else if (an) c = 1;
           |  else if (bn) c = -1;
           |  else c = (da > db) ? 1 : -1;
           |  return c < 0 || (c == 0 && ca < cb);
           |}
           |""".stripMargin)
      val v = ctx.freshName("v")
      val cbs = ctx.freshName("cbs")
      val n = ctx.freshName("n")
      val aa = ctx.freshName("aa")
      val bd = ctx.freshName("bd")
      val bc = ctx.freshName("bc")
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val t = ctx.freshName("t")
      val s = ctx.freshName("s")
      val row = ctx.freshName("row")
      val cen = ctx.freshName("cen")
      val m = ctx.freshName("m")
      val bb = ctx.freshName("bb")
      val cc = ctx.freshName("cc")
      val d2 = ctx.freshName("d2")
      val code = ctx.freshName("code")
      val pos = ctx.freshName("pos")
      val found = ctx.freshName("found")
      s"""
         |double[] $v = $a.toDoubleArray();
         |org.apache.spark.sql.catalyst.util.ArrayData $cbs = $b;
         |int $n = $nIn;
         |if ($n <= 0) {
         |  throw new IllegalArgumentException(
         |    "vec_argmin_topn: n must be positive, got " + $n);
         |}
         |if ($cbs.numElements() == 0) {
         |  throw new IllegalArgumentException("vec_argmin_topn: empty codebook");
         |}
         |double $aa = 0.0;
         |for (int $i = 0; $i < $v.length; $i++) { $aa += $v[$i] * $v[$i]; }
         |double[] $bd = new double[$n];
         |int[] $bc = new int[$n];
         |int $cnt = 0;
         |for (int $j = 0; $j < $cbs.numElements(); $j++) {
         |  org.apache.spark.sql.catalyst.InternalRow $row = $cbs.getStruct($j, 2);
         |  double[] $cen = $row.getArray(1).toDoubleArray();
         |  int $m = java.lang.Math.min($v.length, $cen.length);
         |  double $bb = 0.0;
         |  for (int $k = 0; $k < $m; $k++) { $bb += $v[$k] * $cen[$k]; }
         |  double $cc = 0.0;
         |  for (int $k = 0; $k < $cen.length; $k++) { $cc += $cen[$k] * $cen[$k]; }
         |  double $d2 = ($aa - 2.0 * $bb) + $cc;
         |  int $code = $row.getInt(0);
         |  int $pos = $cnt;
         |  boolean $found = false;
         |  for (int $t = 0; $t < $cnt && !$found; $t++) {
         |    if ($before($d2, $code, $bd[$t], $bc[$t])) { $pos = $t; $found = true; }
         |  }
         |  if ($pos < $n) {
         |    for (int $s = java.lang.Math.min($cnt, $n - 1); $s > $pos; $s--) {
         |      $bd[$s] = $bd[$s - 1]; $bc[$s] = $bc[$s - 1];
         |    }
         |    $bd[$pos] = $d2;
         |    $bc[$pos] = $code;
         |    if ($cnt < $n) $cnt++;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($bc, $cnt));
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): VecArgminTopN =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object VectorExpressions {
  /** Idempotently register vec_dot / vec_norm / vec_dot_i8 /
    * vec_argmin_code / vec_argmin_topn in the session's function
    * registry so expr("vec_dot(a, b)") resolves. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot",
      exprs => VecDot(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_norm",
      exprs => VecNorm(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("vec_dot_i8",
      exprs => VecDotI8(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_argmin_code",
      exprs => VecArgminCode(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_argmin_topn",
      exprs => VecArgminTopN(exprs.head, exprs(1), exprs(2)), "built-in")
  }
}
