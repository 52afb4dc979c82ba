package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 quantization for embedding storage — the
  * 4× (float32) / 8× (float64) compression that makes a 100 TB embedding
  * store a 25 TB one, at ≲0.5% cosine error for typical corpora.
  *
  * Scheme: per-vector scale = max|x| / 127; codes = round(x / scale) ∈
  * [−127, 127] stored as tinyint, scale stored alongside. Symmetric
  * (no zero-point) so dot products of dequantized vectors need only one
  * multiply. An all-zero vector gets scale 0 and all-zero codes, and
  * dequantizes back to exact zeros (0 × 0 = 0 — no division guard
  * needed on the read path).
  *
  * Everything is a narrow codegen'd projection (`transform` +
  * `aggregate`): quantization runs at parquet-scan speed with no
  * shuffle, and both directions are deterministic — byte-identical
  * re-runs, exactly mirrorable in an engine-independent oracle. */
object Quantize {

  /** Per-vector symmetric scale: max|x| / 127 as double (0 for an
    * all-zero or empty vector). */
  def int8Scale(vec: Column): Column =
    aggregate(vec, lit(0.0d),
      (acc, x) => greatest(acc, abs(x.cast("double")))) / 127.0

  /** Quantize to int8 codes: round(x / scale), all-zero when scale is 0.
    * `scale` must be [[int8Scale]] of the same vector. */
  def int8Codes(vec: Column, scale: Column): Column =
    when(scale === 0.0d,
      transform(vec, _ => lit(0).cast("tinyint")))
      .otherwise(transform(vec,
        x => round(x.cast("double") / scale, 0).cast("tinyint")))

  /** Dequantize codes back to doubles: code × scale. */
  def int8Dequantize(codes: Column, scale: Column): Column =
    transform(codes, c => c.cast("double") * scale)
}
