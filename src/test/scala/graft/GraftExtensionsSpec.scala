package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions path must give a config-built session the native
  * functions with zero registration calls.
  *
  * Suites share one JVM (and possibly one SparkContext): clear the
  * default/active session so getOrCreate builds a NEW SparkSession
  * (with extensions applied) over the existing context, then restore —
  * and never stop the shared context. */
class GraftExtensionsSpec extends AnyFunSuite {
  test("spark.sql.extensions=graft.GraftExtensions resolves all functions") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // withExtensions exercises the same GraftExtensions.apply
      // injection as the spark.sql.extensions conf; the conf itself is
      // static (read from the FIRST SparkContext's conf), so it cannot
      // be tested on a shared test context.
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-spec")
        .withExtensions(new GraftExtensions)
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val row = spark.sql(
        """SELECT vec_dot(array(1D, 2D), array(3D, 4D)) AS d,
          |  vec_norm(array(3D, 4D)) AS n,
          |  word_ngrams(array('a', 'b', 'c'), 2) AS wg,
          |  char_ngrams('abcd', 2) AS cg""".stripMargin).head()
      assert(row.getDouble(0) == 11.0)
      assert(row.getDouble(1) == 5.0)
      assert(row.getSeq[String](2) == Seq("a b", "b c"))
      assert(row.getSeq[String](3) == Seq("ab", "bc", "cd"))
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
