package graft.text

import scala.collection.mutable.ListBuffer

/** Document and query tokenization, matching the reference byte-for-byte
  * (reference: `src/main/kotlin/util/HTMLParser.kt:45-100`).
  *
  * Order of operations is load-bearing for exactness:
  *   - the stopword test runs on the RAW lowercased token,
  *   - Porter stemming runs after it,
  *   - the length>2 filter runs on the STEM (e.g. "ties" → stem "ti" → dropped).
  */
object TextPipeline {

  /** HTMLParser.kt:45-50: letters lowercased, everything else → ' ';
    * in query mode '"' survives. The reference's trailing `\s → " "` regex
    * replace is a no-op on this alphabet and is omitted. */
  def processText(s: String, query: Boolean): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (query && c == '"') sb.append('"')
      else if (c >= 'a' && c <= 'z') sb.append(c)
      else if (c >= 'A' && c <= 'Z') sb.append((c + 32).toChar)
      else sb.append(' ')
      i += 1
    }
    sb.toString
  }

  private def splitTokens(processed: String): Iterator[String] =
    processed.split(' ').iterator.filter(_.nonEmpty)

  /** Document tokenizer — HTMLParser.kt:89-100. */
  def tokenize(s: String): Vector[String] =
    splitTokens(processText(s, query = false))
      .filter(w => !Stopwords.isStop(w))
      .map(Porter.stripAffixes)
      .filter(_.length > 2)
      .toVector

  /** Query tokenizer with quoted phrases — HTMLParser.kt:52-87.
    *
    * Faithfully reproduced quirks:
    *   - a token holding ≥2 quotes is its own single-word group;
    *   - a token with one quote opens a phrase consuming tokens until the
    *     next quoted token;
    *   - an UNTERMINATED multi-word phrase degrades to independent
    *     single-word groups whose words are stemmed once at degrade time
    *     and then AGAIN by the final pass — the double-stem quirk (Porter
    *     is not idempotent for all inputs), with the stopword filter of the
    *     final pass applied to the once-stemmed form;
    *   - no length>2 filter on query tokens (unlike document tokens);
    *   - stopword-only and empty groups are dropped.
    */
  def tokenizeQuery(s: String): List[List[String]] = {
    val words = splitTokens(processText(s, query = true))
    val result = ListBuffer.empty[List[String]]
    while (words.hasNext) {
      val group = ListBuffer.empty[String]
      var word = words.next()
      if (word.count(_ == '"') > 1) {
        group += word.replace("\"", "")
      } else if (word.contains('"')) {
        var closed = false
        group += word.replace("\"", "")
        while (!closed && words.hasNext) {
          word = words.next()
          if (word.contains('"')) { group += word.replace("\"", ""); closed = true }
          else group += word
        }
        if (!closed && group.size > 1) {
          // degrade: each non-stopword becomes its own group, stemmed now
          // (and stemmed again below — HTMLParser.kt:75-81,86)
          group.foreach { w =>
            if (!Stopwords.isStop(w)) result += List(Porter.stripAffixes(w))
          }
          group.clear()
        }
      } else group += word
      result += group.toList
    }
    result.toList
      .map(g => g.filterNot(Stopwords.isStop).map(Porter.stripAffixes))
      .filter(_.nonEmpty)
  }
}
