package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `array<float|double>` embedding columns.
  *
  * Built on Spark's higher-order functions (`zip_with`/`aggregate`), which
  * evaluate per-row on the executors with no shuffle and no UDF
  * serialization boundary. All arithmetic is done in DOUBLE regardless of
  * the storage type so results are reproducible against external oracles
  * (float32 accumulation is order-sensitive; double over float32 inputs
  * summed left-to-right is deterministic).
  */
object VectorFunctions {

  /** Elementwise cast to double (embeddings are stored float32). */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Left-to-right folded dot product. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), _ * _), lit(0.0), _ + _)

  def l2Norm(v: Column): Column =
    sqrt(aggregate(toDouble(v), lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity; null-safe on zero-norm vectors (returns null via
    * division). */
  def cosineSimilarity(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))
}
