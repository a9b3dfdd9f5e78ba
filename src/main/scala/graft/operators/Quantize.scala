package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization of embedding columns — the standard 4×
  * storage/bandwidth cut a 100 TB vector corpus takes before indexing
  * (per-vector absmax scaling, the symmetric int8 scheme inference
  * runtimes use).
  *
  * All math is engine-portable by construction: the quantized value is
  * `floor(x / scale * 127 + 0.5)` (explicit floor-rounding — no reliance
  * on an engine's round-half mode), reconstruction is `q * scale / 127`,
  * and the per-vector error summary uses only order-independent
  * aggregates (max), so a DuckDB CTE reproduces it bit-for-bit. Zero
  * vectors quantize to all-zero with zero error (the nullif guard).
  *
  * Shape: posexplode, then the per-vector scale as a whole-partition
  * window max — ONE shuffle on vec_id, which the final groupBy reuses
  * (same partitioning), where a groupBy-scale + join-back plan paid six
  * exchanges. No driver round-trips, no higher-order functions
  * (CodegenFallback) on the per-element path.
  */
object Quantize {

  private def qi(x: Column, scale: Column): Column =
    coalesce(floor(x / nullif(scale, lit(0.0)) * 127 + 0.5), lit(0.0))

  /** Per-vector quantization summary: (id, scale, max_err, n_dims) with
    * scale/max_err rounded to 6 dp (cross-engine float currency). */
  def int8Stats(df: DataFrame, idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val e = df.select(col(idCol).as("vec_id"),
      posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "x")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
    e.withColumn("scale", max(abs(col("x"))).over(w))
      .withColumn("q", qi(col("x"), col("scale")))
      .withColumn("err", abs(col("x") - col("q") * col("scale") / 127))
      .groupBy(col("vec_id"))
      .agg(round(max(col("scale")), 6).as("scale"),
        round(max(col("err")), 6).as("max_err"),
        count(lit(1)).as("n_dims"))
  }
}
