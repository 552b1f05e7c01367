package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Early-exit sorted-merge intersection count for the set-similarity
  * verify stage (round-2 VERDICT item 4).
  *
  * `sorted_intersect_count(a, b, minNeeded)` takes two ASCENDING-
  * sorted, duplicate-free string arrays and merge-counts their common
  * elements — one linear pass, no hash set, no intermediate array —
  * BAILING OUT as soon as the elements still unread cannot lift the
  * count to `minNeeded`: `count + min(remaining_a, remaining_b) <
  * minNeeded` ⇒ the pair can never reach the similarity threshold, so
  * any value `< minNeeded` (the partial count) is returned and the
  * caller's threshold filter drops the row. For rows that CAN reach
  * `minNeeded` the bail-out never fires and the exact count is
  * returned — so a filter `f(count) ⇔ count ≥ minNeeded` behaves
  * exactly as with the exact count, while dissimilar candidate pairs
  * (the bulk, on dup-dense corpora where verify is output-bound) cost
  * only the shared prefix of their shingle sets.
  *
  * Preconditions (both guaranteed by the PPJoin caller, which builds
  * the arrays with array_sort over per-doc DISTINCT shingles): sorted
  * ascending in UTF8String binary order, no nulls, no duplicates.
  */
case class SortedIntersectCountMin(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with ExpectsInputTypes
    with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  // wrong-typed SQL calls fail at ANALYSIS (clean error naming the
  // function), not at execution with a ClassCastException — this
  // expression is injected into every session via GraftExtensions.
  // (Declared as the covariant Seq[DataType]: AbstractDataType is
  // private[sql], but every expected type here is concrete.)
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), ArrayType(StringType), IntegerType)

  override def nullSafeEval(a: Any, b: Any, m: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val minNeeded = m.asInstanceOf[Int]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var cnt = 0
    while (i < nx && j < ny &&
        cnt + math.min(nx - i, ny - j) >= minNeeded) {
      val xv = x.getUTF8String(i)
      val c = xv.compareTo(y.getUTF8String(j))
      if (c == 0) { cnt += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    cnt
  }

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): SortedIntersectCountMin =
    copy(first = f, second = s, third = t)
}

object SetExpressions {

  /** Arity check shared by every registration site: a wrong-arity SQL
    * call gets a clean error naming the function, not an
    * IndexOutOfBoundsException from exprs(2). */
  def build(exprs: Seq[Expression]): SortedIntersectCountMin = {
    if (exprs.length != 3)
      throw new IllegalArgumentException(
        s"sorted_intersect_count expects 3 arguments (a, b, minNeeded), " +
          s"got ${exprs.length}")
    SortedIntersectCountMin(exprs(0), exprs(1), exprs(2))
  }

  /** Idempotently register sorted_intersect_count(a, b, minNeeded). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count", build, "built-in")
}
