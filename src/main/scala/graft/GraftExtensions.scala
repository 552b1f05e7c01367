package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CharNgrams, TextExpressions, VecArgminCode, VecArgminTopN, VecDot, VecDotI8, VecNorm, WordNgrams}

/** Session-extension entry point: makes the engine's native functions
  * available to ANY session (including pure-SQL users on a cluster)
  * via config, with no code changes:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * The per-session `register(spark)` helpers on VectorExpressions /
  * TextExpressions stay for programmatic use; this class is the
  * deployment-grade path (functions resolve before any query runs,
  * on every session derived from the config).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, "", name,
      usage, "", "", "", "", "", "", "built-in")

  private def intLit(name: String, e: Expression): Int =
    TextExpressions.intLitArg(name, e)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(graft.plans.IntersectSizeRewrite(_))
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two double arrays"),
      (exprs: Seq[Expression]) => VecDot(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("vec_norm"),
      info("vec_norm", "vec_norm(a) - L2 norm of a double array"),
      (exprs: Seq[Expression]) => VecNorm(exprs.head)))
    ext.injectFunction((FunctionIdentifier("vec_dot_i8"),
      info("vec_dot_i8", "vec_dot_i8(a, b) - exact long dot product of " +
        "two int8 (tinyint array) vectors of equal dimension"),
      (exprs: Seq[Expression]) => VecDotI8(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("vec_argmin_code"),
      info("vec_argmin_code", "vec_argmin_code(v, cbs) - code of the " +
        "nearest codebook entry by squared euclidean distance"),
      (exprs: Seq[Expression]) => VecArgminCode(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("vec_argmin_topn"),
      info("vec_argmin_topn", "vec_argmin_topn(v, cbs, n) - codes of " +
        "the n nearest codebook entries, (distance, code) ascending"),
      (exprs: Seq[Expression]) => VecArgminTopN(exprs.head, exprs(1),
        exprs(2))))
    ext.injectFunction((FunctionIdentifier("word_ngrams"),
      info("word_ngrams", "word_ngrams(tokens, n) - sliding word n-grams"),
      (exprs: Seq[Expression]) => WordNgrams(exprs.head,
        intLit("word_ngrams", exprs(1)))))
    ext.injectFunction((FunctionIdentifier("char_ngrams"),
      info("char_ngrams",
        "char_ngrams(s, n[, step]) - sliding character n-grams"),
      (exprs: Seq[Expression]) => CharNgrams(exprs.head,
        intLit("char_ngrams", exprs(1)),
        if (exprs.length > 2) intLit("char_ngrams", exprs(2)) else 1)))
    ext.injectFunction((FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count",
        "sorted_intersect_count(a, b, minNeeded) - early-exit merge " +
          "count of two sorted distinct string arrays"),
      (exprs: Seq[Expression]) => graft.functions.SetExpressions.build(exprs)))
  }
}
