package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram generation as a single-pass native expression.
  *
  * The composable form — `transform(sequence(...), i -> concat_ws(...))`
  * — evaluates an interpreted lambda per n-gram (higher-order functions
  * are CodegenFallback), which made shingle generation the hottest
  * stage of the dedup pipeline. This expression emits the whole n-gram
  * array in one JVM pass over the token array: one virtual call per
  * ROW instead of per ELEMENT.
  *
  * Registered as `word_ngrams(tokens, n)` via
  * [[TextExpressions.register]].
  */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "ngram size must be >= 1")
  private val space = UTF8String.fromString(" ")

  // UTF8String.concat returns null when any token is null, so a
  // null-admitting input array yields null n-gram elements — the
  // declared type must admit them or downstream codegen would treat
  // the array as null-free (undefined behavior).
  override def dataType: DataType = child.dataType match {
    case ArrayType(_, cn) => ArrayType(StringType, containsNull = cn)
    case _ => ArrayType(StringType, containsNull = false)
  }

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val m = toks.numElements() - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val parts = new Array[UTF8String](2 * n - 1)
      var j = 0
      while (j < n) {
        if (j > 0) parts(2 * j - 1) = space
        parts(2 * j) = toks.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concat(parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

/** Character n-gram (sliding substring) generation, one pass per row —
  * same motivation as [[WordNgrams]]; used by the fingerprint sketch
  * and (with `step` = 2 over a hex string) the byte-aligned window
  * features of the perceptual-hash near-dup pass.
  * Registered as `char_ngrams(str, n[, step])` (step defaults 1). */
case class CharNgrams(child: Expression, n: Int, step: Int = 1)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "ngram size must be >= 1")
  require(step >= 1, "ngram step must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    val len = s.numChars()
    val m = len - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any]((m + step - 1) / step)
    var i = 0
    var j = 0
    while (i < m) {
      out(j) = s.substring(i, i + n)
      i += step
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild, n = n, step = step)
}

object TextExpressions {

  /** Resolve the n argument of an n-gram function: must be a foldable
    * non-null integer — anything else is an analysis error, not an
    * NPE/ClassCastException at resolution time. */
  private[graft] def intLitArg(fname: String, e: Expression): Int = {
    def bad(what: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException("INTERNAL_ERROR",
        Map("message" ->
          s"$fname: the n argument must be an integer literal, got $what"))
    if (!e.foldable) bad(s"non-foldable expression ${e.sql}")
    e.eval(null) match {
      case n: Number => n.intValue()
      case null => bad("NULL")
      case other => bad(s"${other.getClass.getSimpleName} literal")
    }
  }

  /** Idempotently register word_ngrams(tokens, n) / char_ngrams(s, n)
    * / simhash_sig(features, bits). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("word_ngrams",
      exprs => WordNgrams(exprs.head, intLitArg("word_ngrams", exprs(1))),
      "built-in")
    reg.createOrReplaceTempFunction("char_ngrams",
      exprs => CharNgrams(exprs.head, intLitArg("char_ngrams", exprs(1)),
        if (exprs.length > 2) intLitArg("char_ngrams", exprs(2)) else 1),
      "built-in")
    reg.createOrReplaceTempFunction("simhash_sig",
      exprs => SimhashSig(exprs.head,
        intLitArg("simhash_sig", exprs(1))),
      "built-in")
  }
}

/** Per-row SimHash SIGNATURE as a single-pass native expression —
  * sign vector of per-bit ±1 balances over the portable 48-bit hash
  * (`CAST(conv(substr(md5(t), 1, 12), 16, 10) AS BIGINT)` — the first
  * 6 md5 bytes big-endian) of each feature string.
  *
  * The composable per-row form — `aggregate(transform(feats, md5…),
  * zip_with(…bit votes…))` — evaluates interpreted lambdas per
  * feature×bit with Catalyst value conversion at every step; on the
  * multimodal phash ingest stream that cost ~84 ms per arrival. This
  * expression does the identical arithmetic in one JVM pass: one md5
  * per feature, primitive int balances, no boxing. Bit-for-bit equal
  * to [[graft.api.Dedup.simhashSignatures]]/32 over the same feature
  * tokens (±1 integer sums are order-free; MultimodalStreamsSpec pins
  * all three forms). NOTE: callers pass DISTINCT features — this
  * expression votes once per array element, exactly like the
  * aggregate form votes once per distinct token.
  *
  * Registered as `simhash_sig(features array<string>, bits)` via
  * [[TextExpressions.register]]. */
case class SimhashSig(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {
  require(bits == 16 || bits == 32, "simhash tiers are 16 or 32 bits")

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val feats = v.asInstanceOf[ArrayData]
    val md = java.security.MessageDigest.getInstance("MD5")
    val bal = new Array[Int](bits)
    var i = 0
    val n = feats.numElements()
    while (i < n) {
      val t = feats.getUTF8String(i)
      if (t != null) {
        md.reset()
        val d = md.digest(t.getBytes)
        // first 12 hex chars = first 6 bytes, big-endian unsigned
        var h = 0L
        var k = 0
        while (k < 6) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
        var j = 0
        while (j < bits) {
          if (((h >>> j) & 1L) == 1L) bal(j) += 1 else bal(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (bal(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression): SimhashSig =
    copy(child = c)
}
