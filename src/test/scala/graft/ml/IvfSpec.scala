package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("ivf on well-separated clusters: perfect recall at nprobe=1") {
    // three tight clusters around orthogonal axes
    def jitter(base: Seq[Float], i: Int): Seq[Float] =
      base.zipWithIndex.map { case (x, d) =>
        x + 0.01f * (((i * 31 + d * 7) % 5) - 2)
      }
    val rows = (0 until 30).map { i =>
      val base = (i % 3) match {
        case 0 => Seq(1f, 0f, 0f, 0f)
        case 1 => Seq(0f, 1f, 0f, 0f)
        case _ => Seq(0f, 0f, 1f, 0f)
      }
      (i.toLong, jitter(base, i))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val idx = Ivf.build(emb, k = 3, iters = 4)

    // every member of cluster-0's axis family found from an axis query
    val top = Ivf.topK(idx, Seq(1f, 0f, 0f, 0f), 10, nprobe = 1)
      .select("vec_id").as[Long].collect().toSet
    assert(top == (0 until 30 by 3).map(_.toLong).toSet)
  }

  test("ivf recall vs brute force on the real embeddings") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") === 3).select("embedding")
      .as[Seq[Float]].head()
    val exact = Similarity.bruteForceTopK(emb, q, 10)
      .select("vec_id").as[Long].collect().toSet
    val idx = Ivf.build(emb, k = 8, iters = 3)
    val approx = Ivf.topK(idx, q, 10, nprobe = 3)
      .select("vec_id").as[Long].collect().toSet
    assert(approx.contains(3L)) // the query's own vector
    assert((exact & approx).size >= 5, // ≥ half the true neighbours
      s"recall too low: ${(exact & approx).size}/10")
  }

  test("batched probe ≡ per-query topK, row for row") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val idx = Ivf.build(emb, k = 8, iters = 3)
    val qids = Seq(1L, 3L, 7L)
    val queries = emb.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val batch = Ivf.topKBatch(idx, queries, k = 5, nprobe = 2)
      .select("qid", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    qids.foreach { q =>
      val qv = emb.filter(col("vec_id") === q).select("embedding")
        .as[Seq[Float]].head()
      val single = Ivf.topK(idx, qv, 5, nprobe = 2)
        .select("vec_id").as[Long].collect().toSet
      assert(batch(q) === single, s"qid $q")
    }
  }

  test("assignments cover every vector exactly once") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val idx = Ivf.build(emb, k = 8, iters = 2)
    assert(idx.assignments.count() == emb.count())
    assert(idx.assignments.select("vec_id").distinct().count()
      == emb.count())
  }

  test("append to a frozen quantizer ≡ rebuild assignment") {
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cluster"),
        transform(col("embedding"), _.cast("double")).as("centroid"))
    val isDelta = col("vec_id") % 5 === 1
    val appended = Ivf.append(
      Ivf.Index(Ivf.assign(emb.filter(!isDelta), cents), cents),
      emb.filter(isDelta))
    val rebuilt = Ivf.assign(emb, cents)
    val a = appended.assignments.select("vec_id", "cluster")
      .as[(Long, Long)].collect().toSet
    val r = rebuilt.select("vec_id", "cluster")
      .as[(Long, Long)].collect().toSet
    assert(a === r)
  }

  test("centroid refresh through the versioned store: the pinned " +
      "pre-refresh probe is immune to the refresh commit; the new " +
      "version probes the refreshed quantizer") {
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val q = emb.filter(col("vec_id") === 3).select("embedding")
      .as[Seq[Float]].head()
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cluster"),
        transform(col("embedding"), _.cast("double")).as("centroid"))
    val idx = Ivf.Index(Ivf.assign(emb, cents), cents)
    val aroot = graft.util.TempDirs.scratch("ivfspec_assign")
    val croot = graft.util.TempDirs.scratch("ivfspec_cents")
    graft.store.Versioned.commitAppend(idx.assignments, aroot)
    graft.store.Versioned.commitAppend(idx.centroids, croot)
    def probeAt(v: Long) = Ivf.topK(Ivf.Index(
        graft.store.Versioned.read(spark, aroot, v),
        graft.store.Versioned.read(spark, croot, v)),
      q, 10, nprobe = 2)
      .select("vec_id").as[Long].collect().toSeq
    val pre = probeAt(1)
    val refreshed = Ivf.refresh(Ivf.Index(
      graft.store.Versioned.read(spark, aroot, 1),
      graft.store.Versioned.read(spark, croot, 1)))
    graft.store.Versioned.commitOverwrite(refreshed.assignments, aroot)
    graft.store.Versioned.commitOverwrite(refreshed.centroids, croot)
    // the quantizer actually moved (means ≠ the seed member vectors)
    val oldC = cents.as[(Long, Seq[Double])].collect().toMap
    val newC = refreshed.centroids.select("cluster", "centroid")
      .as[(Long, Seq[Double])].collect().toMap
    assert(newC.exists { case (k, v) => oldC(k) != v },
      "refresh must move at least one centroid")
    // pinned old version reads exactly the pre-refresh ranking
    assert(probeAt(1) == pre)
    // the new version's probe is the refreshed index's probe
    val direct = Ivf.topK(refreshed, q, 10, nprobe = 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(probeAt(2) == direct)
    // and the refreshed assignment is consistent with its quantizer
    val reassigned = Ivf.assign(refreshed.assignments
        .select("vec_id", "embedding"), refreshed.centroids)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toSet
    val stored = refreshed.assignments.select("vec_id", "cluster")
      .as[(Long, Long)].collect().toSet
    assert(reassigned === stored)
  }
}
