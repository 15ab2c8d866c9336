package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CHECK constraints: named SQL predicates enforced on every staged
  * write through the single stage() choke point — a violating batch
  * fails loudly BEFORE any data bytes land. */
class ConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def scratch(tag: String) = graft.util.TempDirs.scratch(tag)

  test("violating batches are refused before anything lands; valid ones commit") {
    val root = scratch("graft_cons_basic")
    Versioned.addCheckConstraint(spark, root, "k_nonneg", "k >= 0")
    // the very first commit is already under the rule
    val ex = intercept[IllegalArgumentException] {
      Versioned.commitAppend(Seq(-1L, 2L).toDF("k"), root)
    }
    assert(ex.getMessage.contains("k_nonneg") &&
      ex.getMessage.contains("1 staged rows"))
    assert(Versioned.latestVersion(root) == 0L,
      "a refused batch must not advance the table")
    Versioned.commitAppend(Seq(1L, 2L).toDF("k"), root)
    assert(Versioned.read(spark, root).count() == 2L)
    // NULL predicate passes (SQL CHECK semantics: violation = FALSE)
    Versioned.commitAppend(Seq(Some(3L), None).toDF("k"), root)
    assert(Versioned.read(spark, root).count() == 4L)
  }

  test("adding a rule existing data breaks is refused; drop re-admits") {
    val root = scratch("graft_cons_add")
    Versioned.commitAppend(Seq(5L, 50L).toDF("k"), root)
    val ex = intercept[IllegalArgumentException] {
      Versioned.addCheckConstraint(spark, root, "small", "k < 10")
    }
    assert(ex.getMessage.contains("1 existing rows"))
    Versioned.addCheckConstraint(spark, root, "positive", "k > 0")
    intercept[IllegalArgumentException] {
      Versioned.commitAppend(Seq(0L).toDF("k"), root)
    }
    Versioned.dropCheckConstraint(root, "positive")
    Versioned.commitAppend(Seq(0L).toDF("k"), root)
    assert(Versioned.read(spark, root).count() == 3L)
  }

  test("rewrite paths enforce too, and escaped predicates round-trip") {
    val root = scratch("graft_cons_rw")
    Versioned.commitAppend(
      spark.range(0, 20).toDF("k").withColumn("tag", lit("ok")), root)
    Versioned.addCheckConstraint(spark, root, "tagged",
      """tag IN ('ok', 'it''s "fine"')""")
    assert(Versioned.checkConstraints(root).head._2
      .contains("it''s \"fine\""), "escaping must round-trip")
    // a merge whose updates violate is refused
    intercept[IllegalArgumentException] {
      Versioned.commitMerge(
        Seq((3L, "bad")).toDF("k", "tag"), root, Seq("k"))
    }
    // a valid merge passes (survivors + updates both validated)
    Versioned.commitMerge(
      Seq((3L, "it's \"fine\"")).toDF("k", "tag"), root, Seq("k"))
    assert(Versioned.read(spark, root)
      .filter(col("k") === 3L).head.getString(1) == "it's \"fine\"")
  }
}
