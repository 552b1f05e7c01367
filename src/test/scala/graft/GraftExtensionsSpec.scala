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
          |  char_ngrams('abcd', 2) AS cg,
          |  sorted_intersect_count(array('a', 'b', 'c'),
          |    array('b', 'c', 'd'), 1) AS ic""".stripMargin).head()
      assert(row.getDouble(0) == 11.0)
      assert(row.getDouble(1) == 5.0)
      assert(row.getSeq[String](2) == Seq("a b", "b c"))
      assert(row.getSeq[String](3) == Seq("ab", "bc", "cd"))
      assert(row.getInt(4) == 2)

      // the injected optimizer rule rewrites size(array_intersect) to
      // the counting expression (inputs must be non-foldable — all-
      // literal forms are constant-folded before user rules run)
      val q = spark.range(1).selectExpr(
        "size(array_intersect(array(CAST(id AS STRING),'b','b','c'), array('b','c','d'))) AS n")
      assert(q.queryExecution.optimizedPlan.toString
        .contains("array_intersect_size"),
        q.queryExecution.optimizedPlan.toString)
      assert(q.head().getInt(0) == 2)
      // composed-form semantics on edge cases (each carries an
      // id-dependent element so it reaches execution): duplicates
      // counted once, null element once when in both, null array ->
      // null, empty intersection -> 0, long element type
      val edge = spark.range(1).selectExpr(
        "size(array_intersect(array('x','x',concat('z',id)), array('x'))) AS dup",
        "size(array_intersect(array('x',NULL,NULL,concat('z',id)), array(NULL,'y'))) AS nul",
        "size(array_intersect(CASE WHEN id >= 0 THEN CAST(NULL AS ARRAY<STRING>) ELSE array('x') END, array('x'))) AS na",
        "size(array_intersect(array(concat('z',id)), array('y'))) AS empty",
        "size(array_intersect(array(id + 1L, 2L, 2L), array(2L, 3L))) AS lng")
      assert(edge.queryExecution.optimizedPlan.toString
        .contains("array_intersect_size"))
      val er = edge.head()
      assert(er.getInt(0) == 1)
      assert(er.getInt(1) == 1)
      assert(er.isNullAt(2))
      assert(er.getInt(3) == 0)
      assert(er.getInt(4) == 1)
      // unsupported element types keep the composed form (no rewrite)
      val dq = spark.range(1).selectExpr(
        "size(array_intersect(array(CAST(id AS DOUBLE), 1.5D), array(1.5D))) AS d")
      assert(!dq.queryExecution.optimizedPlan.toString
        .contains("array_intersect_size"))
      assert(dq.head().getInt(0) == 1)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
