package graft

import graft.functions.ArgotFlatten.flatten
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Flatten + suffix transform (O7) — the spec the reference delegates
  * to the external argot gem, pinned here by tests (SURVEY.md §7.3:
  * byte-parity with the gem is unprovable from the reference repo, so
  * the engine's flatten contract is defined and property-tested here).
  */
class FlattenSpec extends AnyFunSuite {

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  test("scalar types get Solr dynamic-field suffixes") {
    val m = flatten("""{"title":"abc","count":3,"score":1.5,"ok":true}""")
    assert(m == Map(
      "title_t" -> Seq("abc"),
      "count_i" -> Seq("3"),
      "score_f" -> Seq("1.5"),
      "ok_b" -> Seq("true")))
  }

  test("nested objects join keys with underscore") {
    val m = flatten("""{"a":{"b":{"c":"x"}}}""")
    assert(m == Map("a_b_c_t" -> Seq("x")))
  }

  test("arrays are multi-valued in document order, objects recurse") {
    val m = flatten("""{"tags":["x","y"],"authors":[{"name":"a"},{"name":"b"}]}""")
    assert(m("tags_t") == Seq("x", "y"))
    assert(m("authors_name_t") == Seq("a", "b"))
  }

  test("nulls dropped; invalid JSON and non-objects yield empty maps") {
    assert(flatten("""{"a":null}""") == Map.empty)
    assert(flatten("{not json") == Map.empty)
    assert(flatten("[1,2]") == Map.empty)
    assert(flatten(null) == Map.empty)
  }

  private val keyGen: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(5, Gen.alphaNumChar)
  } yield (h :: t).mkString
  private val flatObjGen: Gen[Map[String, String]] = for {
    n <- Gen.choose(0, 6)
    kvs <- Gen.listOfN(n, Gen.zip(keyGen, Gen.listOfN(8, Gen.alphaNumChar).map(_.mkString)))
  } yield kvs.toMap

  test("property: flat string objects round-trip (every value preserved under key_t)") {
    checkProp(Prop.forAll(flatObjGen) { obj =>
      val json = obj.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
      val flat = flatten(json)
      obj.forall { case (k, v) => flat.get(s"${k}_t").exists(_.contains(v)) }
    })
  }

  test("property: flatten never throws on arbitrary strings") {
    checkProp(Prop.forAll(Gen.asciiPrintableStr) { s => flatten(s); true })
  }
}
