package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Generative deep-nesting property: random document schemas (structs and
  * arrays to depth 3), random configured leaf paths, checked against an
  * INDEPENDENT oracle — a plain recursive JSON-tree rewrite on the driver
  * (json4s), sharing no code with the engine's Column compilation. */
class NestedPropertySpec extends AnyFunSuite {
  import SparkTestSession._

  private def forAll[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    Iterator.continually(gen.sample).flatten.take(n).foreach(body)

  // ---- schema-first generation (array elements share one shape, so JSON
  //      inference never type-unifies heterogeneous elements) ----

  private sealed trait STy
  private case object SStr extends STy
  private case object SNum extends STy
  private case class SStruct(fields: List[(String, STy)]) extends STy
  private case class SArr(el: STy) extends STy

  private def styGen(depth: Int): Gen[STy] =
    if (depth <= 0) Gen.oneOf(SStr, SNum)
    else Gen.frequency(
      3 -> Gen.oneOf(SStr, SNum),
      2 -> structSchemaGen(depth - 1),
      2 -> structSchemaGen(depth - 1).map(SArr(_)),
      1 -> Gen.oneOf(SStr, SNum).map(SArr(_)))

  private def structSchemaGen(depth: Int): Gen[SStruct] = for {
    n <- Gen.choose(1, 3)
    tys <- Gen.sequence[List[STy], STy](
      List.fill(n)(styGen(depth)))
  } yield SStruct(tys.zipWithIndex.map { case (t, i) => s"f$depth$i" -> t })

  private def instantiate(sty: STy): Gen[JValue] = sty match {
    case SStr => Gen.alphaLowerStr.map(s => JString(s.take(6)))
    case SNum => Gen.choose(1, 99).map(n => JInt(BigInt(n)))
    case SStruct(fields) =>
      Gen.sequence[List[JValue], JValue](fields.map(f => instantiate(f._2)))
        .map(vs => JObject(fields.map(_._1).zip(vs)))
    case SArr(el) => Gen.choose(1, 3).flatMap(n =>
      Gen.sequence[List[JValue], JValue](List.fill(n)(instantiate(el)))
        .map(JArray(_)))
  }

  private val docGen: Gen[JObject] = structSchemaGen(2)
    .flatMap(instantiate).map { v =>
      JObject(JField("id", JInt(1)) :: v.asInstanceOf[JObject].obj)
    }

  // ---- independent oracle: recursive JSON rewrite ----

  /** Apply `fn` at `path` below `v`, arrays elementwise — mirrors the
    * documented semantics, implemented from scratch on plain JSON. */
  private def rewrite(v: JValue, path: List[String],
                      fn: JValue => JValue): JValue = v match {
    case JArray(els) => JArray(els.map(rewrite(_, path, fn)))
    case _ if path.isEmpty => fn(v)
    case JObject(fields) => JObject(fields.map {
      case JField(n, fv) if n.equalsIgnoreCase(path.head) =>
        JField(n, rewrite(fv, path.tail, fn))
      case other => other
    })
    case other => other
  }

  private def upperJson(v: JValue): JValue = v match {
    case JString(s) => JString(s.toUpperCase)
    case other => other
  }

  /** Order-insensitive structural form (Spark alphabetizes inferred
    * schemas; generation order differs). */
  private def normalize(v: JValue): JValue = v match {
    case JObject(fields) =>
      JObject(fields.map { case JField(n, fv) => JField(n, normalize(fv)) }
        .sortBy(_._1))
    case JArray(els) => JArray(els.map(normalize))
    case other => other
  }

  private def stringLeafPaths(doc: JObject, schema: Seq[String]): Seq[String] =
    schema.map(_.replace("[]", "")).filter { p =>
      def walk(v: JValue, segs: List[String]): Option[JValue] = v match {
        case JArray(els) => els.headOption.flatMap(walk(_, segs))
        case JObject(fs) if segs.nonEmpty =>
          fs.find(_._1 == segs.head).flatMap(f => walk(f._2, segs.tail))
        case leaf if segs.isEmpty => Some(leaf)
        case _ => None
      }
      walk(doc, p.split('.').toList).exists(_.isInstanceOf[JString])
    }

  test("property: random nested schemas + random leaf paths match an " +
    "independent JSON-tree oracle") {
    runNestedProperty()
  }

  /** Exposed so the property can be re-run in bulk while hunting. */
  def runNestedProperty(): Unit = {
    var exercised = 0
    // only draw docs that actually have a string leaf to configure —
    // a count assertion over unconditioned draws is a coin-flip
    val exercisableDoc = docGen.suchThat(d =>
      hasStringLeaf(d.obj.filterNot(_._1 == "id").map(_._2)))
    forAll(exercisableDoc, 12) { doc =>
      val json = JsonMethods.compact(JsonMethods.render(JArray(List(doc))))
      val df = jsonDf(json)
      val picked = stringLeafPaths(doc, SchemaPaths.flattenSchema(df.schema))
        .take(2)
      if (picked.nonEmpty) {
        exercised += 1
        val runner = new Functioniser
        picked.foreach(p => runner.add(p, (c: Column) => upper(c)))
        val got = runner.apply(df).toJSON.collect().toSeq
          .map(s => normalize(JsonMethods.parse(s)))
        val expect = normalize(picked.foldLeft(doc: JValue) { (acc, p) =>
          rewrite(acc, p.split('.').toList, upperJson)
        })
        assert(got == Seq(expect),
          s"paths=$picked doc=${JsonMethods.compact(JsonMethods.render(doc))}")
      }
    }
    assert(exercised == 12, s"only $exercised corpora had string leaves")
  }

  private def hasStringLeaf(vs: Seq[JValue]): Boolean = vs.exists {
    case JString(_) => true
    case JObject(fields) => hasStringLeaf(fields.map(_._2))
    case JArray(els) => hasStringLeaf(els)
    case _ => false
  }
}
