package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-batch gradient-descent logistic regression over micro
  * fixed-point features — the trainable quality-classifier step of a
  * data-curation pipeline (fastText/CCNet-style: train a small linear
  * model on "known-good vs raw" labels, score every document, keep the
  * high-probability slice).
  *
  * Determinism: features and per-row probabilities are integer micros;
  * each iteration's gradient is an exact integer sum (order-free across
  * partitions), and the weight update snaps back to micros with the
  * shared floor(x+0.5) rule — so the whole descent is reproducible
  * bit-for-bit and a SQL oracle can replay it as one unrolled CTE chain.
  * The only FP steps are one exp + two divides per row, written with a
  * fixed parenthesization on both engines.
  *
  * Driver actions: ONE collected row (the gradient vector) per
  * iteration — gradient descent is inherently sequential, the same
  * cardinality argument as Bpe.learnMerges' one-row-per-merge bound.
  *
  * Scale: each iteration is one map-side-combinable aggregation pass;
  * the model (a handful of longs) rides the closure. At 100 TB this is
  * MLlib's batch-GD shape minus float reassociation.
  */
object LogReg {

  /** z in 1e-12 units: w0·1e6 + Σ_j wj·xj — all longs, exact. */
  private def zP12(w: Array[Long], xCols: Seq[String]): Column =
    xCols.zipWithIndex.foldLeft(lit(w(0)) * lit(1000000L)) {
      case (acc, (c, j)) => acc + lit(w(j + 1)) * col(c)
    }

  /** sigmoid(w·x) snapped to integer micros. */
  def probMicros(w: Array[Long], xCols: Seq[String]): Column = {
    val z = zP12(w, xCols).cast("double") / lit(1.0e12)
    floor(lit(1.0) / (lit(1.0) + exp(-z)) * 1000000d + 0.5).cast("long")
  }

  /** Integer-micros document features (the q225 feature recipe): from
    * (doc_id, lang, text) rows, x1 = tokens/50, x2 = English-marker
    * ratio, x3 = mean token length / 10, y = (lang = 'en'). Shared by
    * the standalone classifier queries and the curation lineage so both
    * train on the SAME exact-micros feature space. */
  def docFeatures(docs: DataFrame): DataFrame = {
    import graft.util.Exact
    val enMarkers = graft.text.TextStats.LangMarkers.head._2
    val toks = graft.text.Analyzer.tokenize(col("text"))
    docs
      .select(col("doc_id"), (col("lang") === "en").cast("long").as("y"),
        toks.as("t"))
      .select(col("doc_id"), col("y"),
        size(col("t")).cast("long").as("n"),
        aggregate(transform(col("t"), x => length(x).cast("long")),
          lit(0L), _ + _).as("slen"),
        size(filter(col("t"), x => x.isin(enMarkers: _*))).cast("long")
          .as("mk"))
      .select(col("doc_id"), col("y"),
        Exact.micros(col("n").cast("double") / 50.0).as("x1"),
        Exact.micros(col("mk").cast("double") /
          greatest(col("n"), lit(1L)).cast("double")).as("x2"),
        Exact.micros(col("slen").cast("double") /
          (greatest(col("n"), lit(1L)).cast("double") * 10.0)).as("x3"))
  }

  /** `iters` full-batch GD steps at rate `lr` from w = 0. `xCols` are
    * integer-micros feature columns; `yCol` is a 0/1 label. Returns the
    * learned weights in micros (bias first). */
  def fit(df: DataFrame, xCols: Seq[String], yCol: String,
          iters: Int, lr: Double): Array[Long] = {
    val n = df.count()
    require(n > 0, "logreg fit on an empty frame")
    var w = Array.fill(xCols.size + 1)(0L)
    for (_ <- 1 to iters) {
      val r = probMicros(w, xCols) - col(yCol).cast("long") * lit(1000000L)
      // per-row product r·x is ≤ ~1e14 (fits a long with headroom), but
      // the SUM grows with row count and would wrap silently past
      // ~1e6-1e7 rows with ANSI off — accumulate in DECIMAL(38,0) so
      // the gradient stays exact at any corpus size
      val gradCols = (lit(1000000L) +: xCols.map(col)).zipWithIndex.map {
        case (x, j) => sum((r * x).cast("decimal(38,0)")).as(s"g$j")
      }
      val row = df.agg(gradCols.head, gradCols.tail: _*).head()
      w = w.indices.map { j =>
        val g = row.getDecimal(j).doubleValue()
        w(j) - math.floor(lr * g / (n * 1.0e6) + 0.5).toLong
      }.toArray
    }
    w
  }
}
