package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Hand-traced vectors against the reference algorithm
  * (reference: util/Porter.kt). Each expectation was derived by walking the
  * reference code path for the input. */
class PorterSpec extends AnyFunSuite {
  private def s(w: String) = Porter.stripAffixes(w)

  test("plural step1") {
    assert(s("caresses") == "caress")
    assert(s("ponies") == "poni")
    assert(s("ties") == "ti") // ies → drop 2, stem shorter than 3 survives
    assert(s("caress") == "caress")
    assert(s("cats") == "cat")
  }

  test("eed / ed / ing") {
    assert(s("feed") == "feed")     // measure(stem "f") == 0
    assert(s("agreed") == "agre")   // eed → agree, step5 drops the e
    assert(s("plastered") == "plaster")
    assert(s("motoring") == "motor")
    assert(s("hopping") == "hop")   // undouble pp
    assert(s("falling") == "fall")  // 'l' excluded from undoubling
    assert(s("dying") == "dy")
  }

  test("y → i") {
    assert(s("happy") == "happi")
    assert(s("sky") == "sky") // stem "sk" has no vowel
  }

  test("step2/3/4 chains") {
    assert(s("relational") == "relat")
    assert(s("conditional") == "condition") // this variant keeps 'tion' (m(condi)=1)
    assert(s("generalization") == "gener")
    assert(s("universities") == "univers")
  }

  test("reference quirk: iser/isation → ize, alise → al") {
    // organiser: step2 iser→ize with stem "organ" (m=2>0)
    assert(s("organiser") == "organ") // …→ organize → step4 'ize' m(organ)=2>1 → organ
    assert(s("organisation") == "organ")
  }

  test("metric prefixes stripped first") {
    assert(s("kilograms") == "gram")
    assert(s("pseudosciences") == "scienc")
  }

  test("non-letters cleaned, case folded, short words untouched") {
    assert(s("Can't") == "cant" || s("Can't") == s("cant")) // clean drops apostrophe
    assert(s("ab") == "ab")   // length ≤ 2: no stripping at all
    assert(s("THE") == s("the"))
  }

  test("total on pathological inputs (divergence: reference throws)") {
    assert(s("kilo") == "")   // prefix == whole word
    assert(s("") == "")
  }

  test("not idempotent (double-stem quirk feeds tokenizeQuery)") {
    assert(s("universities") == "univers")
    assert(s(s("universities")) == "univ")
  }
}
