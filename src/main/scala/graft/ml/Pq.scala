package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the vector-compression scale path for
  * ANN at 100 TB (Jégou, Douze, Schmid, "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011): split each D-dim vector into
  * `m` subvectors, learn a small codebook per subspace, and store each
  * vector as its `m` codeword ids — 64 float dims (256 B) become 8
  * one-byte codes, a 32× memory compression that is what lets a
  * billion-vector index live in RAM. Search uses ASYMMETRIC DISTANCE
  * (ADC): the query stays exact, and its distance to every codeword of
  * every subspace is precomputed ONCE (an m×k table, driver-side,
  * broadcast as literals into a codegen'd expression) — scoring a
  * vector is then m array lookups + adds, no float-vector math per row.
  *
  * Complements [[Ivf]] (which prunes WHICH vectors to score; PQ
  * compresses HOW each is scored — production systems compose them as
  * IVF-PQ). Everything here is deterministic: codebooks either come
  * from fixed seed vectors (the oracle-checked q221 path) or from
  * per-subspace Lloyd rounds via [[Ivf.build]] (hash-seeded, fixed
  * iteration count). */
object Pq {

  /** 1-based slice of subspace `sub` (0-based) from a vector column. */
  def subvector(vec: Column, sub: Int, subDim: Int): Column =
    slice(vec, sub * subDim + 1, subDim)

  /** Train per-subspace codebooks with Lloyd rounds ([[Ivf.build]] per
    * subspace — hash-seeded init, deterministic). Output:
    * (sub, cluster, centroid array<double>[subDim]). */
  def train(emb: DataFrame, m: Int, k: Int, iters: Int = 3,
            idCol: String = "vec_id",
            vecCol: String = "embedding"): DataFrame = {
    val subDim = firstDim(emb, vecCol) / m
    (0 until m).map { s =>
      Ivf.build(emb.select(col(idCol),
          subvector(col(vecCol), s, subDim).as(vecCol)),
        k, iters, idCol, vecCol)
        .centroids.select(lit(s).as("sub"), col("cluster"),
          col("centroid"))
    }.reduce(_.unionByName(_))
  }

  private def firstDim(emb: DataFrame, vecCol: String): Int =
    emb.select(size(col(vecCol))).first().getInt(0)

  /** Collected codebooks: per subspace, (sorted cluster ids, their
    * centroids) — m×k×subDim doubles, driver-sized by construction. */
  def collectBooks(books: DataFrame, m: Int)
      : Array[(Array[Long], Array[Array[Double]])] = {
    val rows = books.select("sub", "cluster", "centroid").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray))
    (0 until m).map { s =>
      val sub = rows.filter(_._1 == s).sortBy(_._2)
      (sub.map(_._2), sub.map(_._3))
    }.toArray
  }

  /** Encode every vector as its m codeword ids — one codegen'd
    * nearest-centroid expression per subspace, zero shuffles; at scale
    * this is the one full-corpus pass PQ ever takes. Output:
    * (id, codes array<long>). */
  def encode(emb: DataFrame,
             books: Array[(Array[Long], Array[Array[Double]])],
             subDim: Int, idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    val codes = books.zipWithIndex.map { case ((ids, cents), s) =>
      graft.functions.VecFunctions.nearestCentroid(
        subvector(col(vecCol), s, subDim), ids, cents)
    }
    emb.select(col(idCol), array(codes: _*).as("codes"))
  }

  /** Residuals against the coarse quantizer: (id, cluster,
    * res = vector − centroid(cluster)) — the representation IVFADC
    * (Jégou 2011 §IV) actually quantizes. Residuals concentrate near
    * zero (the coarse quantizer removed the between-cluster variance),
    * so a codebook of the SAME size spends its codewords on a much
    * smaller cell — the accuracy-critical half of the composition that
    * raw-vector IVF-PQ ([[ivfPqTopK]]) leaves on the table. Broadcast
    * join + zip_with: one narrow pass, no shuffle. */
  def residuals(index: Ivf.Index, idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame =
    index.assignments
      .join(broadcast(index.centroids), "cluster")
      .select(col(idCol), col("cluster"),
        zip_with(transform(col(vecCol), _.cast("double")),
          col("centroid"), (x, c) => x - c).as("res"))

  /** Encode residuals as codeword ids, KEEPING the coarse cluster —
    * ADC over residuals needs it, because the query-side residual (and
    * so the distance table) differs per probed cluster. Input: the
    * [[residuals]] frame. Output: (id, cluster, codes). */
  def encodeResidual(res: DataFrame,
                     books: Array[(Array[Long], Array[Array[Double]])],
                     subDim: Int, idCol: String = "vec_id"): DataFrame = {
    val codes = books.zipWithIndex.map { case ((ids, cents), s) =>
      graft.functions.VecFunctions.nearestCentroid(
        subvector(col("res"), s, subDim), ids, cents)
    }
    res.select(col(idCol), col("cluster"), array(codes: _*).as("codes"))
  }

  /** Residual IVF-PQ top-k — full IVFADC: candidates from the nprobe
    * nearest coarse cells, each scored by ADC in RESIDUAL space. The
    * query's residual differs per probed cluster (q − c_i), so there
    * are nprobe query→codeword tables instead of one; they ride into
    * codegen as ONE map-of-arrays literal per subspace keyed by
    * cluster id (nprobe × m × k doubles, driver-sized by
    * construction), and a candidate's per-subspace cost stays two
    * `element_at`s + an add. Top-k is TakeOrderedAndProject. At 100 TB
    * the residual codes are precomputed at ingest next to the
    * assignments (same one-pass argument as [[encode]]); here the
    * pruned candidate batch encodes inline, same plan shape. */
  def ivfPqResidualTopK(index: Ivf.Index,
                        books: Array[(Array[Long], Array[Array[Double]])],
                        query: Seq[Float], k: Int, nprobe: Int,
                        subDim: Int, idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    val q = query.map(_.toDouble).toArray
    val probed = Ivf.probeClusters(index.centroids, query, nprobe)
    val pc = index.centroids.join(broadcast(probed), "cluster")
      .select("cluster", "centroid").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    // per probed cluster: its query residual's distance to every
    // codeword of every subspace (nprobe small maps, driver-side)
    val qd: Map[Long, Array[Array[Double]]] = pc.map { case (cid, cent) =>
      val qres = q.indices.map(i => q(i) - cent(i)).toArray
      cid -> books.zipWithIndex.map { case ((ids, cents), s) =>
        val table = new Array[Double](ids.max.toInt + 1)
        ids.zip(cents).foreach { case (id, c) =>
          var d = 0.0
          var i = 0
          while (i < subDim) {
            val diff = qres(s * subDim + i) - c(i)
            d += diff * diff
            i += 1
          }
          table(id.toInt) = d
        }
        table
      }
    }.toMap
    val clusters = pc.map(_._1)
    val cand = Ivf.Index(
      index.assignments.join(broadcast(probed), Seq("cluster"),
        "left_semi"),
      index.centroids)
    val encoded = encodeResidual(residuals(cand, idCol, vecCol), books,
      subDim, idCol)
    val adc = books.indices.map { s =>
      val mapS = map_from_arrays(lit(clusters),
        array(clusters.map(c => lit(qd(c)(s))): _*))
      element_at(element_at(mapS, col("cluster")),
        col("codes").getItem(s).cast("int") + 1)
    }.reduce(_ + _)
    encoded.select(col(idCol), adc.as("adc"))
      .orderBy(col("adc"), col(idCol))
      .limit(k)
  }

  /** IVF-PQ — the production ANN composition: the coarse quantizer
    * prunes WHICH vectors get scored (~nprobe/k of the corpus, the
    * [[Ivf]] half) and PQ compresses HOW each survivor is scored (m
    * codeword lookups, no float-vector math — this object's half). At
    * 100 TB the codes are precomputed alongside the assignments (one
    * encode pass at ingest; 8 B/vector rides in memory) so a probe
    * touches only its clusters' code blocks; here the candidate batch
    * is encoded inline because the harness stores nothing ambient —
    * same plan shape, the encode input is already pruned.
    * [[ivfPqResidualTopK]] is the accuracy-preferred residual
    * (IVFADC) variant. */
  def ivfPqTopK(index: Ivf.Index,
                books: Array[(Array[Long], Array[Array[Double]])],
                query: Seq[Float], k: Int, nprobe: Int, subDim: Int,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val probed = Ivf.probeClusters(index.centroids, query, nprobe)
    val cand = index.assignments
      .join(broadcast(probed), Seq("cluster"), "left_semi")
    adcTopK(encode(cand, books, subDim, idCol, vecCol), books, query,
      k, subDim, idCol)
  }

  /** Approximate top-k by ADC: squared-L2 from the EXACT query to each
    * row's codeword chain. The query→codeword distance table (m×k
    * doubles) is computed once driver-side and baked in as array
    * literals, so per-row cost is m `element_at` lookups + adds inside
    * whole-stage codegen, and the global top-k is
    * TakeOrderedAndProject — no sort of the losers. */
  def adcTopK(encoded: DataFrame,
              books: Array[(Array[Long], Array[Array[Double]])],
              query: Seq[Float], k: Int, subDim: Int,
              idCol: String = "vec_id"): DataFrame = {
    val q = query.map(_.toDouble).toArray
    // dist table indexed by codeword id (ids are small by construction)
    val qd: Array[Array[Double]] = books.zipWithIndex.map {
      case ((ids, cents), s) =>
        val table = new Array[Double](ids.max.toInt + 1)
        ids.zip(cents).foreach { case (id, c) =>
          var d = 0.0
          var i = 0
          while (i < subDim) {
            val diff = q(s * subDim + i) - c(i)
            d += diff * diff
            i += 1
          }
          table(id.toInt) = d
        }
        table
    }
    val adc = (0 until books.length).map { s =>
      element_at(lit(qd(s)), col("codes").getItem(s).cast("int") + 1)
    }.reduce(_ + _)
    encoded.select(col(idCol), adc.as("adc"))
      .orderBy(col("adc"), col(idCol))
      .limit(k)
  }
}
