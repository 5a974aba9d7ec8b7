package graft.text

import org.scalatest.funsuite.AnyFunSuite

class TextPipelineSpec extends AnyFunSuite {

  test("stopwords: byte-scan drops the final un-newlined word 'z'") {
    assert(Stopwords.isStop("a"))
    assert(Stopwords.isStop("about"))
    assert(Stopwords.isStop("yours"))
    assert(!Stopwords.isStop("z")) // the quirk (HTMLParser.kt:22-30)
  }

  test("processText: letters lowercased, rest → space; query keeps quotes") {
    assert(TextPipeline.processText("Hello, World!", query = false) == "hello  world ")
    assert(TextPipeline.processText("\"Hi\" there4u", query = false) == " hi  there u")
    assert(TextPipeline.processText("\"Hi\"", query = true) == "\"hi\"")
  }

  test("tokenize: stopword test pre-stem, length>2 post-stem") {
    // "ties" stems to "ti" (len 2) → dropped; "the" is a stopword → dropped
    assert(TextPipeline.tokenize("the ties that bind") ==
      Vector(Porter.stripAffixes("that"), "bind").filter(_.length > 2) ||
      TextPipeline.tokenize("the ties that bind") == Vector("bind"))
    assert(!TextPipeline.tokenize("University ties").contains("ti"))
    assert(TextPipeline.tokenize("University researchers") ==
      Vector("univers", "research"))
  }

  test("tokenizeQuery: plain words → singleton groups") {
    assert(TextPipeline.tokenizeQuery("university networks") ==
      List(List("univers"), List("network")))
  }

  test("tokenizeQuery: quoted phrase stays one group, stemmed once") {
    assert(TextPipeline.tokenizeQuery("\"hong kong\" research") ==
      List(List("hong", "kong"), List("research")))
  }

  test("tokenizeQuery: token with two quotes is its own group") {
    assert(TextPipeline.tokenizeQuery("\"hello\" world") ==
      List(List("hello"), List("world")))
  }

  test("tokenizeQuery: unterminated phrase degrades with DOUBLE stemming") {
    // "universities → opens an unterminated phrase consuming the rest;
    // each word is stemmed at degrade time and again by the final pass:
    // stem(stem("universities")) = "univ" (not "univers")
    assert(TextPipeline.tokenizeQuery("\"universities hong") ==
      List(List("univ"), List("hong")))
  }

  test("tokenizeQuery: unterminated single-quoted last word stays single-stemmed") {
    // one-token unterminated phrase: group size == 1 → no degrade path
    assert(TextPipeline.tokenizeQuery("\"universities") == List(List("univers")))
  }

  test("tokenizeQuery: stopword-only groups dropped; stopwords pre-stem") {
    assert(TextPipeline.tokenizeQuery("the of and") == Nil)
    assert(TextPipeline.tokenizeQuery("\"the university\"") == List(List("univers")))
  }
}
