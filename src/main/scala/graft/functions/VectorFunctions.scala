package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.ArrayDotProduct

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

  /** Dot product — native codegen expression ([[ArrayDotProduct]]); a
    * tight primitive loop instead of the interpreted HOF equivalent. */
  def dotProduct(a: Column, b: Column): Column = ArrayDotProduct(a, b)

  def l2Norm(v: Column): Column = sqrt(ArrayDotProduct(v, v))

  /** Cosine similarity; null-safe on zero-norm vectors (returns null via
    * division). */
  def cosineSimilarity(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine from a precomputed-norm layout: on all-pairs workloads,
    * compute `l2Norm` once per row BEFORE the join and combine with one
    * dot per pair — identical float result (same sums, same sqrt) at a
    * third of the per-pair arithmetic. */
  def cosineWithNorms(dotCol: Column, normA: Column, normB: Column): Column =
    dotCol / (normA * normB)
}
