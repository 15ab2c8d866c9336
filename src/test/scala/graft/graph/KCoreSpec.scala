package graft.graph

import graft.SparkSpec

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def core(es: Seq[(Long, Long)], k: Int, rounds: Int = 10,
                   earlyStop: Boolean = true): Map[Long, Long] =
    KCore.run(es.toDF("src", "dst"), k, rounds, earlyStop)
      .as[(Long, Long)].collect().toMap

  test("a K4 clique survives 3-core peeling; its pendant tail dies") {
    // K4 on 1-4, plus a chain 4-5-6 hanging off it.
    val es = Seq[(Long, Long)](
      (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6))
    val m = core(es, k = 3)
    assert(m.keySet == Set(1L, 2L, 3L, 4L))
    assert(m.values.forall(_ == 3L)) // within-core degrees
  }

  test("a tree peels to nothing at k=2; a cycle survives untouched") {
    val tree = Seq[(Long, Long)]((1, 2), (1, 3), (2, 4), (2, 5))
    assert(core(tree, k = 2).isEmpty)
    val cycle = Seq[(Long, Long)]((1, 2), (2, 3), (3, 4), (4, 1))
    assert(core(cycle, k = 2).keySet == Set(1L, 2L, 3L, 4L))
  }

  test("peeling cascades: a path needs one round per endpoint layer") {
    // Path 1-2-3-4-5 at k=2: endpoints peel one layer per round until
    // nothing is left — exercises multi-round convergence, and the
    // early-stop path must agree with a fixed over-provisioned run.
    val path = Seq[(Long, Long)]((1, 2), (2, 3), (3, 4), (4, 5))
    assert(core(path, k = 2).isEmpty)
    assert(core(path, k = 2, rounds = 10, earlyStop = false).isEmpty)
  }

  test("fixed-round lazy run equals the early-stop run at the fixpoint") {
    val es = Seq[(Long, Long)](
      (1, 2), (1, 3), (2, 3), // triangle: the 2-core
      (3, 4), (4, 5)) // tail that takes 2 rounds to peel
    val lazyRun = core(es, k = 2, rounds = 6, earlyStop = false)
    val eager = core(es, k = 2, rounds = 6, earlyStop = true)
    assert(lazyRun == eager)
    assert(lazyRun.keySet == Set(1L, 2L, 3L))
  }
}
