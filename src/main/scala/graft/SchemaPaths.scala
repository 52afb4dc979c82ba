package graft

import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Schema flattening + path-depth helpers.
  *
  * Behavioral contract from the reference library
  * (`/root/reference/src/config_driven_pyspark/utils.py:6-48`): a schema is
  * flattened to dotted lowercase-comparable paths where every array level
  * appends a `[]` token to the segment it wraps — e.g.
  * `pets[].face.eyes[].colour`. Field order follows schema order.
  *
  * Divergence (documented, strictly more capable): a `MapType` anywhere in
  * the schema crashes the reference (`KeyError: 'fields'`, SURVEY.md §8);
  * here a map flattens to its whole-column leaf (so maps pass through
  * untouched and can be targeted as whole-column leaves) PLUS `{}`-token
  * paths into its VALUE type — `m{}` for primitive values,
  * `m{}.field` for struct values — mirroring the `[]` array convention,
  * so a configured `{}` path rewrites map values element-wise
  * (`transform_values`; keys are never touched).
  */
object SchemaPaths {

  /** Flatten a schema to `[]`/`{}`-tokenised dotted paths
    * (ref: `utils.py:6-31`). Arrays of arrays yield `path[][]`. */
  def flattenSchema(schema: StructType): Seq[String] = {
    def flattenType(dt: DataType, prefix: String): Seq[String] = dt match {
      case ArrayType(elementType, _) =>
        val p = prefix + "[]"
        elementType match {
          case s: StructType => flattenStruct(s, p)
          case nested @ (_: ArrayType | _: MapType) => flattenType(nested, p)
          case _             => Seq(p)
        }
      case m: MapType =>
        // the whole-map leaf first (a bare config path targets the map
        // itself — back-compat), then the value paths
        val p = prefix + "{}"
        Seq(prefix) ++ (m.valueType match {
          case s: StructType => flattenStruct(s, p)
          case nested @ (_: ArrayType | _: MapType) => flattenType(nested, p)
          case _             => Seq(p)
        })
      case s: StructType => flattenStruct(s, prefix)
      case _             => Seq(prefix) // primitive leaf
    }
    def flattenStruct(s: StructType, prefix: String): Seq[String] =
      s.fields.toSeq.flatMap { f =>
        val name = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        f.dataType match {
          case nested @ (_: StructType | _: ArrayType | _: MapType) =>
            flattenType(nested, name)
          case _ => Seq(name)
        }
      }
    flattenStruct(schema, "")
  }

  /** Trim a dotted path to `depth` segments; `-1` drops the last segment.
    * Array tokens on kept segments are retained (ref: `utils.py:34-48`). */
  def limitDepth(field: String, depth: Int = -1): String = {
    val split = field.split('.')
    val d = if (depth == -1) split.length - 1 else depth
    split.take(d).mkString(".")
  }

  /** Trim `field` to the segment count of `like` (ref: `utils.py:45-46`). */
  def limitDepth(field: String, like: String): String =
    limitDepth(field, like.count(_ == '.') + 1)
}
