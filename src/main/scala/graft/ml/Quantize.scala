package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 embedding quantization — the 4x storage/bandwidth
  * compression every large embedding corpus ships with (the same
  * scheme FAISS calls SQ8 with per-vector scaling).
  *
  * Each vector gets one scale s = max|x_i|; components store as
  * round(x*127/s) in a byte. Everything is per-row `transform`/
  * `zip_with` column math — codegen'd, no UDF, no shuffle — and
  * deterministic: max is order-free and the round-trip arithmetic is
  * identical IEEE-754 ops in any engine, which is how q57 hash-checks
  * an (approximate-by-construction) representation against DuckDB.
  *
  * `floor(x + 0.5)` rather than `round(x)`: engines disagree on
  * round's half-even vs half-away tie rule; floor(+0.5) is the same
  * everywhere.
  */
object Quantize {

  /** Per-vector scale: max absolute component (DOUBLE). */
  def scaleOf(emb: Column): Column =
    array_max(transform(emb, x => abs(x.cast("double"))))

  /** Division-safe scale: an all-zero vector has scale 0, and 0/0 would
    * turn its codes into NaN->null; the epsilon keeps 0*127/eps = 0, so
    * zero vectors quantize to all-zero codes and reconstruct exactly. */
  private def safe(scale: Column): Column = greatest(scale, lit(1e-30))

  /** int8 codes as array<tinyint>; `scale` must be [[scaleOf]] (or any
    * bound >= max|x|, else codes clip past a byte). */
  def quantize(emb: Column, scale: Column): Column =
    transform(emb, x =>
      floor(x.cast("double") * 127.0 / safe(scale) + 0.5).cast("tinyint"))

  /** Reconstruction (DOUBLE components). */
  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, q => q.cast("double") * scale / 127.0)

  /** Per-vector round-trip report: (idCol, scale_micros, max_err_micros).
    * The error column computes the quantize->dequantize round trip
    * inline (no materialized code array), so the whole report is one
    * narrow scan-stage projection. */
  def roundtripStats(df: DataFrame, embCol: String = "embedding",
                     idCol: String = "vec_id"): DataFrame = {
    val withScale = df.withColumn("__s", scaleOf(col(embCol)))
    val err = array_max(transform(col(embCol), x =>
      abs(floor(x.cast("double") * 127.0 / safe(col("__s")) + 0.5)
        * col("__s") / 127.0 - x.cast("double"))))
    withScale.select(col(idCol),
      floor(col("__s") * 1000000d + 0.5d).cast("long").as("scale_micros"),
      floor(err * 1000000d + 0.5d).cast("long").as("max_err_micros"))
  }
}
