package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  test("pq on separated clusters: ADC ranks the query's cluster first") {
    // three tight clusters around orthogonal axes in 4 dims; m=2
    // subspaces of 2 dims with ideal codebooks — every member of the
    // query's axis family must outrank all others under ADC (this
    // pins encode + the asymmetric-distance math; codebook QUALITY
    // under Lloyd training is the recall test below)
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
    val books: Array[(Array[Long], Array[Array[Double]])] = Array(
      (Array(0L, 1L, 2L), Array(Array(1.0, 0.0), Array(0.0, 1.0),
        Array(0.0, 0.0))),
      (Array(0L, 1L), Array(Array(0.0, 0.0), Array(1.0, 0.0))))
    val encoded = Pq.encode(emb, books, subDim = 2)
    val top = Pq.adcTopK(encoded, books, Seq(1f, 0f, 0f, 0f), 10,
        subDim = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(top == (0 until 30 by 3).map(_.toLong).toSet)
  }

  test("ivf-pq: coarse probe prunes to the query's cluster, ADC ranks " +
      "inside it") {
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
    val coarse = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (1L, Seq(0.0, 1.0, 0.0, 0.0)),
      (2L, Seq(0.0, 0.0, 1.0, 0.0))).toDF("cluster", "centroid")
    val idx = Ivf.Index(Ivf.assign(emb, coarse), coarse)
    val books: Array[(Array[Long], Array[Array[Double]])] = Array(
      (Array(0L, 1L, 2L), Array(Array(1.0, 0.0), Array(0.0, 1.0),
        Array(0.0, 0.0))),
      (Array(0L, 1L), Array(Array(0.0, 0.0), Array(1.0, 0.0))))
    // nprobe=1: ONLY the x-axis cluster is even scored
    val top = Pq.ivfPqTopK(idx, books, Seq(1f, 0f, 0f, 0f), 20,
        nprobe = 1, subDim = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(top == (0 until 30 by 3).map(_.toLong).toSet)
  }

  test("codes are m small ids (the 32x compression) and encoding is " +
      "partition-invariant") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val books = Pq.collectBooks(Pq.train(emb, m = 8, k = 16, iters = 2),
      m = 8)
    val a = Pq.encode(emb, books, subDim = 8)
      .as[(Long, Seq[Long])].collect().toMap
    assert(a.values.forall(c => c.length == 8 &&
      c.forall(id => id >= 1 && id <= 16)))
    val b = Pq.encode(emb.repartition(13), books, subDim = 8)
      .as[(Long, Seq[Long])].collect().toMap
    assert(a == b)
  }

  test("pq recall vs brute force on the real embeddings") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val q = emb.filter(col("vec_id") === 3).select("embedding")
      .as[Seq[Float]].head()
    // exact top-10 by squared L2 (ADC approximates L2, not cosine)
    val qArr = q.map(_.toDouble).toArray
    val qCol = array(qArr.map(lit(_)): _*)
    val exact = emb.select(col("vec_id"),
        aggregate(zip_with(transform(col("embedding"), _.cast("double")),
          qCol, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _).as("d"))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .select("vec_id").as[Long].collect().toSet
    val books = Pq.collectBooks(Pq.train(emb, m = 8, k = 16, iters = 2),
      m = 8)
    val approx = Pq.adcTopK(Pq.encode(emb, books, subDim = 8), books,
        q, 20, subDim = 8)
      .select("vec_id").as[Long].collect().toSet
    // 8 bytes of code per 256-byte vector: modest recall floor on
    // unstructured random embeddings, but the true neighbourhood must
    // survive quantization measurably
    assert((exact & approx).size >= 3,
      s"pq recall too low: ${(exact & approx).size}/10 in top-20")
  }

  test("residual ivf-pq recall@10 >= raw ivf-pq on the real " +
      "embeddings (Jégou 2011: residuals concentrate, same codebook " +
      "budget covers a smaller cell)") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val idx = Ivf.build(emb, k = 8, iters = 2)
    val rawBooks = Pq.collectBooks(
      Pq.train(emb, m = 8, k = 16, iters = 2), m = 8)
    val resBooks = Pq.collectBooks(
      Pq.train(Pq.residuals(idx), m = 8, k = 16, iters = 2,
        vecCol = "res"), m = 8)
    // probe ALL clusters so both variants score the full corpus and
    // the comparison isolates QUANTIZATION quality, not coarse pruning
    def recall(qid: Long,
               topOf: Seq[Float] => org.apache.spark.sql.DataFrame)
        : Int = {
      val q = emb.filter(col("vec_id") === qid).select("embedding")
        .as[Seq[Float]].head()
      val qCol = array(q.map(x => lit(x.toDouble)): _*)
      val exact = emb.select(col("vec_id"),
          aggregate(zip_with(
            transform(col("embedding"), _.cast("double")), qCol,
            (x, y) => (x - y) * (x - y)), lit(0.0), _ + _).as("d"))
        .orderBy(col("d"), col("vec_id")).limit(10)
        .select("vec_id").as[Long].collect().toSet
      (exact & topOf(q).select("vec_id").as[Long].collect().toSet).size
    }
    val qids = Seq(3L, 17L, 42L, 77L, 101L)
    val raw = qids.map(recall(_,
      q => Pq.ivfPqTopK(idx, rawBooks, q, 10, nprobe = 8,
        subDim = 8))).sum
    val res = qids.map(recall(_,
      q => Pq.ivfPqResidualTopK(idx, resBooks, q, 10, nprobe = 8,
        subDim = 8))).sum
    assert(res >= raw,
      s"residual recall $res < raw recall $raw (summed over 5 queries)")
    assert(res >= 15, s"residual recall floor: $res/50 too low")
  }
}
