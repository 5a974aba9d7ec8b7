package graft.text

/** Stopword set, loaded exactly the way the reference loads it
  * (reference: `src/main/kotlin/util/HTMLParser.kt:15-35`): the resource is
  * scanned byte by byte and a word is committed only when a '\n' byte is
  * seen. The file ends with "…\nz" — no trailing newline — so the final
  * word "z" is never committed and is NOT a stopword. This quirk is
  * load-bearing for term-space equality and must not be "fixed".
  */
object Stopwords {
  val all: Set[String] = {
    val in = getClass.getClassLoader.getResourceAsStream("stopwords.txt")
    require(in != null, "stopwords.txt resource missing")
    try {
      val out = Set.newBuilder[String]
      val sb = new java.lang.StringBuilder
      var b = in.read()
      while (b != -1) {
        if (b.toChar == '\n') { out += sb.toString; sb.setLength(0) }
        else sb.append(b.toChar)
        b = in.read()
      }
      // bytes after the last '\n' are intentionally dropped (the "z" quirk)
      out.result()
    } finally in.close()
  }

  def isStop(w: String): Boolean = all.contains(w)
}
