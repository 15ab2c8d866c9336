package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private val K = 3
  private val M = 1024

  test("no false negatives: every truly-matching row passes the probe") {
    val small = (1 to 50).map(i => i * 7L).toDF("k")
    val big = (1 to 2000).map(i => (i.toLong, s"row$i")).toDF("k", "payload")
    val bits = RuntimeFilter.bloomBits(small, col("k"), K, M)
    val passed = RuntimeFilter.probe(big, col("k"), bits, K, M)
      .as[(Long, String)].collect().map(_._1).toSet
    val truly = big.join(small, Seq("k"), "left_semi")
      .as[(Long, String)].collect().map(_._1).toSet
    assert(truly.subsetOf(passed), s"missing: ${truly -- passed}")
    assert(truly == (1 to 50).map(i => i * 7L).filter(_ <= 2000).toSet)
  }

  test("probe keeps all columns and false positives are join-cullable") {
    val small = (1 to 100).map(_.toLong * 3).toDF("k")
    val big = (1 to 5000).map(i => (i.toLong, i % 13)).toDF("k", "v")
    val bits = RuntimeFilter.bloomBits(small, col("k"), K, M)
    val pass = RuntimeFilter.probe(big, col("k"), bits, K, M)
    assert(pass.columns.toSeq == Seq("k", "v")) // no bloom residue
    // exact verify after the bloom pre-filter == exact verify alone
    val refined = pass.join(small, Seq("k"), "left_semi").count()
    val direct = big.join(small, Seq("k"), "left_semi").count()
    assert(refined == direct)
    // and with 300 set bits over 1024 the pre-filter must actually prune
    assert(pass.count() < big.count())
  }

  test("bit table is bounded and partitioning-invariant") {
    val small = (1 to 200).map(_.toLong).toDF("k")
    val a = RuntimeFilter.bloomBits(small.repartition(7), col("k"), K, M)
      .as[Long].collect().toSet
    val b = RuntimeFilter.bloomBits(small.coalesce(1), col("k"), K, M)
      .as[Long].collect().toSet
    assert(a == b)
    assert(a.size <= K * 200)
    assert(a.forall(bit => bit >= 0 && bit < M))
  }

  test("probes are broadcast semi-joins (big side never shuffles)") {
    val small = (1 to 20).map(_.toLong).toDF("k")
    val big = spark.range(1000).select(col("id").as("k"))
    val bits = RuntimeFilter.bloomBits(small, col("k"), K, M)
    val plan = RuntimeFilter.probe(big, col("k"), bits, K, M)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"))
    assert(!plan.contains("SortMergeJoin"))
  }
}
