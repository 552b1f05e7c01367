package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Unit coverage for the custom expressions and the UDAF demo. */
class FunctionsSpec extends SparkTestBase {
  initQuiet()
  import spark.implicits._

  test("vec_dot / vec_norm match hand-computed values") {
    VectorExpressions.register(spark)
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b")
    val r = df.select(expr("vec_dot(a, b)"), expr("vec_norm(a)"))
      .as[(Double, Double)].head()
    assert(r._1 == 32.0)
    assert(math.abs(r._2 - math.sqrt(14.0)) < 1e-12)
  }

  test("vec_dot matches the interpreted zip_with/aggregate fold bit-for-bit") {
    VectorExpressions.register(spark)
    val vs = graft.sources.Tables.embeddings(spark, sfDir)
      .select($"vec_id", expr("transform(embedding, x -> CAST(x AS DOUBLE))")
        .as("v"))
      .limit(50)
    val both = vs.select(
      expr("vec_dot(v, v)").as("native"),
      expr("aggregate(zip_with(v, v, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, p) -> acc + p)")
        .as("hof"))
    assert(both.filter($"native" =!= $"hof").count() == 0)
  }

  test("word_ngrams / char_ngrams produce expected sequences") {
    TextExpressions.register(spark)
    val df = Seq("a b c d").toDF("t")
    val grams = df.select(expr("word_ngrams(split(t, ' '), 3)"))
      .as[Seq[String]].head()
    assert(grams == Seq("a b c", "b c d"))
    val chars = df.select(expr("char_ngrams(t, 3)")).as[Seq[String]].head()
    assert(chars == Seq("a b", " b ", "b c", " c ", "c d"))
    // degenerate: fewer tokens than n -> empty array, not an error
    val empty = Seq("a b").toDF("t")
      .select(expr("word_ngrams(split(t, ' '), 3)")).as[Seq[String]].head()
    assert(empty.isEmpty)
  }

  test("gini aggregator: pure and uniform label distributions") {
    spark.udf.register("gini", udaf(GiniAggregator))
    val pure = Seq(1, 1, 1, 1).toDF("label")
    assert(pure.selectExpr("gini(label)").as[Double].head() == 0.0)
    val uniform = Seq(0, 1, 2, 3).toDF("label")
    assert(math.abs(
      uniform.selectExpr("gini(label)").as[Double].head() - 0.75) < 1e-12)
    // on the fixture: 10 roughly balanced labels -> gini near 0.9
    val g = graft.sources.Tables.embeddings(spark, sfDir)
      .selectExpr("gini(label)").as[Double].head()
    assert(g > 0.85 && g < 0.91)
  }
}
