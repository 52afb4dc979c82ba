package graft

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{call_function, col, transform, transform_values}
import org.slf4j.LoggerFactory

/** Config-driven nested-field transformation engine — the parity core.
  *
  * Semantics contract: `/root/reference/src/config_driven_pyspark/
  * functioniser.py` (full behavioral spec in SURVEY.md §2.2). Given
  * `(flattened field path, Column function)` pairs, rewrites a DataFrame so
  * each function is applied to its (arbitrarily nested, arbitrarily
  * array-wrapped) target field, compiling everything into a SINGLE `select`
  * — one narrow Catalyst `Project`, no shuffle, streaming-safe, and fully
  * whole-stage-codegen'd because user functions are `Column` expression
  * builders rather than opaque UDFs.
  *
  * Behavior highlights (each pinned by a spec test):
  *   - paths are lowercased on entry; schema matching is case-insensitive;
  *     output preserves the DataFrame's original casing
  *     (ref: functioniser.py:36,139-140,229-233).
  *   - repeated `add` on one path composes in add-order: g2(g1(c))
  *     (ref: functioniser.py:50-52).
  *   - at a node, configured members apply before the node's own function
  *     (ref: functioniser.py:95-112).
  *   - a function configured on an array path always receives the ELEMENT
  *     (ref: functioniser.py:109-110).
  *   - a prefix path addresses a whole struct/array subtree
  *     (ref: functioniser.py:130-149).
  *   - unknown leaf → warn + create on parent; unknown parent → error;
  *     unknown function name → error at `add` time
  *     (ref: functioniser.py:44,164-183).
  *   - new roots are appended after existing columns, sorted
  *     (ref: functioniser.py:63-70).
  *
  * Documented divergences (strictly more capable; identical results on all
  * reference-expressible inputs — SURVEY.md §2.2-9/10):
  *   - doubly-nested arrays (`a[][]`) work: nodes carry the segment's
  *     container-token sequence and nest `transform`s, where the
  *     reference's single boolean fails analysis.
  *   - `MapType` (which crashes the reference): a bare path targets the
  *     whole map; a `{}`-token path (`m{}`, `m{}.field`) rewrites map
  *     VALUES element-wise via `transform_values`, the map analogue of
  *     the `[]` array convention. Keys are never rewritten.
  *   - all configured members of one array node are rewritten in ONE
  *     `transform` pass instead of one `transform` per member (the
  *     reference's N passes rebuild the struct N times and Catalyst does
  *     not merge them — verified SURVEY.md §4-4).
  */
class Functioniser {

  import Functioniser._

  private val customFunctions = mutable.Map.empty[String, Column => Column]

  /** Lowercased config path → composed function (insertion-ordered:
    * members are planned and processed in add order). */
  private[graft] var functions: mutable.LinkedHashMap[String, Column => Column] = _
  private[graft] var flatSchema: Seq[String] = _

  /** Test hook: warning messages emitted by plan construction. */
  private[graft] val recordedWarnings = mutable.Buffer.empty[String]
  /** Test hook: plan-walker invocation count (ref mechanics tests count
    * `_apply` calls: once per root + once per nested path segment). */
  private[graft] var planWalkCount = 0

  reset()

  /** Clear configured functions + cached schema for reuse with a new
    * DataFrame. Does NOT clear the custom-function registry
    * (ref: functioniser.py:29-32). */
  def reset(): Unit = {
    functions = mutable.LinkedHashMap.empty
    flatSchema = Seq.empty
  }

  /** Bind a function to a (possibly nested) field path. Fluent. */
  def add(field: String, fn: Column => Column): this.type = {
    val key = field.toLowerCase
    functions.get(key) match {
      case Some(existing) => functions.update(key, existing.andThen(fn))
      case None           => functions.update(key, fn)
    }
    this
  }

  /** Bind a constant: the column value replaces the field (element-wise if
    * the field is an array) (ref: functioniser.py:46-48). */
  def add(field: String, const: Column): this.type =
    add(field, (_: Column) => const)

  /** Bind by name: custom registry first, then Spark SQL builtins; unknown
    * name fails eagerly (ref: functioniser.py:38-44). */
  def add(field: String, functionName: String): this.type =
    add(field, resolveNamed(functionName))

  /** Register a custom by-name function; overrides builtins
    * (ref: functioniser.py:198-207). */
  def registerFunction(name: String, fn: Column => Column): Unit =
    customFunctions.update(name, fn)

  /** Register a constant-valued custom function. */
  def registerFunction(name: String, const: Column): Unit =
    customFunctions.update(name, (_: Column) => const)

  private def resolveNamed(name: String): Column => Column =
    customFunctions.getOrElse(
      name,
      if (builtinFunctionNames.contains(name)) { (c: Column) => call_function(name, c) }
      else throw new IllegalArgumentException(s"Function $name not found"))

  /** Apply the configured functions, emitting exactly one `select`
    * (ref: functioniser.py:58-84). */
  def apply(df: DataFrame): DataFrame = {
    flatSchema = SchemaPaths.flattenSchema(df.schema)
    val nodeMap = buildNodes()

    val existingRoots = df.columns.map(_.toLowerCase).toSet
    val newRoots = nodeMap.children.keys
      .filterNot(c => existingRoots.contains(c.toLowerCase)).toSeq.sorted
    val rootCols = df.columns.toSeq ++ newRoots

    // For a new root, `col(name)` is unresolvable — by contract the bound
    // function must ignore its input (new roots are constants or closures
    // over other columns), matching the reference's analysis-time error
    // when it does not (SURVEY.md §2.2-7).
    val selectCols = rootCols.map { rootCol =>
      applyNode(col(rootCol), nodeMap.iget(rootCol)).alias(rootCol)
    }
    df.select(selectCols: _*)
  }

  /** Recursive plan walker (ref: functioniser.py:86-128). Rewrites the
    * column holding `node`'s value: configured members first (one merged
    * `transform` pass per array level), then the node's own function. */
  private def applyNode(ctx: Column, node: Option[Node]): Column = {
    planWalkCount += 1
    node match {
      case None => ctx
      case Some(n) =>
        def rewriteElement(el0: Column): Column = {
          var el = el0
          n.children.foreach { case (memberKey, child) =>
            el = el.withField(
              memberKey,
              applyNode(el.getField(memberKey), Some(child)))
          }
          n.fn.foreach { f => el = f(el) }
          el
        }
        // fold container wrappers innermost-first so the leftmost token
        // (outermost container) is applied last
        var wrapped: Column => Column = rewriteElement
        n.wrappers.reverse.foreach {
          case ArrayWrap =>
            val inner = wrapped
            wrapped = (arr: Column) => transform(arr, inner)
          case MapWrap =>
            val inner = wrapped
            wrapped = (m: Column) =>
              transform_values(m, (_: Column, v: Column) => inner(v))
        }
        wrapped(ctx)
    }
  }

  /** Resolve a config path against the flat schema, segment-wise and
    * case-insensitive; prefix match addresses a subtree; result
    * depth-trimmed back to the input path (ref: functioniser.py:130-149).
    * `[]` tokens are schema-derived and ignored in matching (a bare
    * config path traverses arrays, as in the reference); `{}` tokens are
    * CONFIG-requested map-value targeting and must match the schema
    * segment exactly — a bare segment only matches the whole-map leaf,
    * and a `{}` segment only matches a value descent at that very
    * level (so `m{}.inner` and `m{}.inner{}` are distinct targets). */
  private[graft] def getFieldNameWithTokens(field: String): Option[String] = {
    val targetSegs = field.toLowerCase.split('.')
    flatSchema.find { f =>
      val fSegs = f.toLowerCase.split('.').map(_.replace("[]", ""))
      fSegs.length >= targetSegs.length &&
        fSegs.zip(targetSegs).forall { case (fs, ts) => fs == ts }
    }.map(t => SchemaPaths.limitDepth(t, field))
  }

  /** Build the plan tree: one node per struct level on the path from a
    * root to each configured leaf (ref: functioniser.py:152-196). */
  private[graft] def buildNodes(): Node = {
    val root = new Node("root")
    functions.foreach { case (field, function) =>
      val fieldWithTokens = getFieldNameWithTokens(field).getOrElse {
        val cut = field.lastIndexOf('.')
        // an unmatched {}-token leaf/root has nothing whose values it
        // could rewrite — transform_values cannot ignore its input the
        // way the new-root contract allows a constant to
        if (field.substring(cut + 1).contains("{}"))
          throw new IllegalArgumentException(
            s"Map-value path $field matches no schema path")
        val msg = s"Field $field not found in input schema. " +
          "Will attempt to create on parent."
        logger.warn(msg)
        recordedWarnings += msg
        if (cut < 0) field // new root
        else {
          val parent = getFieldNameWithTokens(field.substring(0, cut))
            .getOrElse(throw new IllegalArgumentException(
              s"Parent struct for $field not found in input schema"))
          s"$parent.${field.substring(cut + 1)}"
        }
      }
      var current = root
      fieldWithTokens.split('.').foreach { member =>
        val clean = member.replace("[]", "").replace("{}", "")
        val node = current.children.getOrElseUpdate(clean, new Node(member))
        // one physical column, one container interpretation: a whole-map
        // path and a value-wise path (or different {} nesting levels)
        // cannot share a plan node — reject instead of silently letting
        // one clobber the other
        if (node.wrappers != Node.parseWrappers(member))
          throw new IllegalArgumentException(
            s"Conflicting container targeting for '$clean' (e.g. both a " +
              "whole-map path and a {}-value path): configure one form, " +
              "composing functions on it as needed")
        current = node
      }
      current.fn = Some(function)
    }
    root
  }
}

object Functioniser {

  /** Build a runner from a (path → function-name) config — the map form
    * of the reference's YAML examples ("the config format is really up to
    * you", ref README.md:49: parse your YAML/JSON/properties to pairs and
    * hand them over; iteration order = add order = composition order). */
  def fromConfig(config: Iterable[(String, String)]): Functioniser = {
    val f = new Functioniser
    config.foreach { case (field, fnName) => f.add(field, fnName) }
    f
  }

  private val logger = LoggerFactory.getLogger(classOf[Functioniser])

  /** Container wrappers on a path segment, outermost first: `[]` = array
    * (rewrite element-wise via `transform`), `{}` = map values (rewrite
    * value-wise via `transform_values`; keys untouched). */
  private[graft] sealed trait Wrapper
  private[graft] case object ArrayWrap extends Wrapper
  private[graft] case object MapWrap extends Wrapper

  /** Plan IR node (ref: functioniser.py:210-233). `wrappers` records the
    * segment's container tokens in order (the reference's single
    * `is_array` boolean is the `a[][]` limitation we lift; `{}` extends
    * the same mechanism to map values). Children are insertion-ordered. */
  private[graft] final class Node(rawName: String) {
    val name: String = rawName.replace("[]", "").replace("{}", "")
    val wrappers: Seq[Wrapper] = Node.parseWrappers(rawName)
    var fn: Option[Column => Column] = None
    val children: mutable.LinkedHashMap[String, Node] =
      mutable.LinkedHashMap.empty
    /** Case-insensitive child lookup (ref: functioniser.py:229-233). */
    def iget(key: String): Option[Node] =
      children.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }
  }

  private[graft] object Node {
    def parseWrappers(rawName: String): Seq[Wrapper] =
      "\\[\\]|\\{\\}".r.findAllIn(rawName).map {
        case "[]" => ArrayWrap
        case _    => MapWrap
      }.toSeq
  }

  /** Builtin by-name surface = Catalyst's builtin FunctionRegistry (the
    * superset of the reference's 510 harvested pyspark names that are SQL
    * functions); resolution at plan time goes through
    * `functions.call_function` (SURVEY.md §7.3). */
  lazy val builtinFunctionNames: Set[String] =
    org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin
      .listFunction().map(_.funcName.toLowerCase).toSet
}
