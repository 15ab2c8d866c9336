package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  test("separable corpus self-classifies perfectly") {
    val docs = Seq(
      (1L, "x", "foo foo baz"), (2L, "x", "foo baz"), (3L, "x", "foo"),
      (4L, "y", "bar qux"), (5L, "y", "bar bar"), (6L, "y", "bar qux qux"))
      .toDF("id", "lab", "text")
    val out = NaiveBayes.selfClassify(docs, col("id"), col("lab"),
      split(col("text"), " "))
    assert(out.filter(col("actual") =!= col("predicted")).count() == 0)
    assert(out.count() == 6)
  }

  test("prior dominates for a doc of only shared words") {
    // 'common' appears once in each class; class y has 2 docs vs 1, so
    // the prior ln(2/3) > ln(1/3) must route the shared-only doc to y.
    val docs = Seq(
      (1L, "x", "foo common"),
      (2L, "y", "bar common"), (3L, "y", "bar")).toDF("id", "lab", "text")
    val out = NaiveBayes.selfClassify(docs, col("id"), col("lab"),
        split(col("text"), " "))
      .filter(col("doc_id") === 1L).collect()
    // doc 1 contains 'foo' (x-only) and 'common': x-likelihood for foo
    // beats y's smoothing floor, so doc 1 stays x despite the prior.
    assert(out.head.getString(2) == "x")
  }

  test("deterministic and total on the real corpus") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val run = () => NaiveBayes.selfClassify(docs, col("doc_id"),
        col("lang"), graft.text.Analyzer.tokenize(col("text")))
      .groupBy("actual", "predicted").count()
      .orderBy("actual", "predicted").collect().toSeq
    val a = run()
    assert(a == run())
    val total = a.map(_.getLong(2)).sum
    assert(total == docs.count())
    // The synthetic corpus draws text and lang independently, so NB
    // cannot truly discriminate — but training on the evaluation set
    // must still beat the majority-class baseline via overfit.
    val correct = a.filter(r => r.getString(0) == r.getString(1))
      .map(_.getLong(2)).sum
    val majority = docs.groupBy("lang").count()
      .agg(max("count")).head().getLong(0)
    assert(correct > majority, s"accuracy $correct/$total vs $majority")
  }
}
