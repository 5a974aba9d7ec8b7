package graft.text

/** Porter stemmer, behaviorally identical to the reference engine's variant
  * (reference: `src/main/kotlin/util/Porter.kt`, itself a C→Java→Kotlin
  * lineage of the 1980 Porter algorithm carrying several nonstandard quirks).
  * This exact variant — not snowball, not the canonical Porter — defines the
  * engine's term space, so every quirk is preserved:
  *
  *   - metric prefixes (kilo…pseudo) are stripped before suffix steps
  *     (Porter.kt:355-370);
  *   - step2 maps `iser`/`isation` → `ize` and step3 maps `alise` → `al`
  *     (Porter.kt:222,229,262);
  *   - a suffix only counts when the word is STRICTLY longer than it
  *     (Porter.kt:29-46 `hasSuffix`);
  *   - the `y`-vowel rule: 'y' is a vowel iff the preceding char is not a
  *     plain vowel; at index 0 the previous char is taken to be 'a', so a
  *     leading 'y' is a consonant (Porter.kt:48-59,67-77);
  *   - `cvc` at length 3 tests the first char with prev '?', making a
  *     leading 'y' count as a vowel there (Porter.kt:124-128);
  *   - the reference's `str !== ""` identity comparisons (Porter.kt:396,399)
  *     are always true for computed strings, so suffix stripping runs for
  *     every cleaned word of length > 2.
  *
  * One deliberate divergence: the reference throws
  * StringIndexOutOfBoundsException when a metric prefix equals the whole
  * word (e.g. "kilo" → stripPrefixes → "" → step1 indexes [-1]). We make
  * each step total on empty input and return "" instead: at web scale the
  * stemmer must never throw. Fixture corpora avoid such words so golden
  * outputs are unaffected.
  */
object Porter {

  private def plainVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u'

  /** Porter.kt:48-59 — 'y' is a vowel only after a non-vowel. */
  private def vowel(ch: Char, prev: Char): Boolean =
    plainVowel(ch) || (ch == 'y' && !plainVowel(prev))

  /** vowel test at position i, prev='a' at index 0 (Porter.kt:67-77,101-109). */
  private def vowelAt(s: String, i: Int): Boolean =
    vowel(s.charAt(i), if (i > 0) s.charAt(i - 1) else 'a')

  /** the m() of Porter: number of VC sequences (Porter.kt:61-97). */
  private def measure(stem: String): Int = {
    val n = stem.length
    var i = 0
    var count = 0
    while (i < n) {
      while (i < n && !vowelAt(stem, i)) i += 1 // skip consonants
      i += 1                                    // past the vowel
      while (i < n && vowelAt(stem, i)) i += 1  // skip the vowel run
      if (i < n) { count += 1; i += 1 }         // consonant closes a VC
    }
    count
  }

  private def containsVowel(word: String): Boolean = {
    var i = 0
    while (i < word.length) {
      if (vowelAt(word, i)) return true
      i += 1
    }
    false
  }

  /** consonant-vowel-consonant ending, last char not w/x/y (Porter.kt:113-131). */
  private def cvc(s: String): Boolean = {
    val n = s.length
    if (n < 3) return false
    val last = s.charAt(n - 1)
    if (vowel(last, s.charAt(n - 2)) || last == 'w' || last == 'x' || last == 'y')
      return false
    if (!vowel(s.charAt(n - 2), s.charAt(n - 3))) return false
    if (n == 3) !vowel(s.charAt(0), '?') // quirk: '?' prev makes leading 'y' a vowel here
    else !vowel(s.charAt(n - 4), s.charAt(n - 3))
  }

  /** Porter.kt:29-46: suffix match requires word strictly longer than suffix;
    * yields the stem (word minus suffix). */
  private def stemOf(word: String, suffix: String): String =
    if (word.length > suffix.length && word.endsWith(suffix))
      word.substring(0, word.length - suffix.length)
    else null

  /** Porter.kt:133-211. */
  private def step1(in: String): String = {
    var w = in
    if (w.isEmpty) return w
    if (w.charAt(w.length - 1) == 's') {
      if (stemOf(w, "sses") != null || stemOf(w, "ies") != null)
        w = w.substring(0, w.length - 2)
      else if (w.length == 1)
        return "" // bare "s" (Porter.kt:145-148)
      else if (w.charAt(w.length - 2) != 's')
        w = w.substring(0, w.length - 1)
    }

    val eedStem = stemOf(w, "eed")
    if (eedStem != null) {
      if (measure(eedStem) > 0) w = w.substring(0, w.length - 1) // eed → ee
    } else {
      var st = stemOf(w, "ed")
      if (st == null) st = stemOf(w, "ing")
      if (st != null && containsVowel(st)) {
        w = st
        if (w.length == 1) return w // Porter.kt:173-174 skips the y-rule too
        if (stemOf(w, "at") != null || stemOf(w, "bl") != null || stemOf(w, "iz") != null)
          w += "e"
        else {
          val n = w.length
          val last = w.charAt(n - 1)
          if (last == w.charAt(n - 2) && last != 'l' && last != 's' && last != 'z')
            w = w.substring(0, n - 1) // undouble
          else if (measure(w) == 1 && cvc(w))
            w += "e"
        }
      }
    }

    val yStem = stemOf(w, "y")
    if (yStem != null && containsVowel(yStem)) w = yStem + "i"
    w
  }

  // Porter.kt:216-239 (order matters; first match with m(stem) > 0 wins)
  private val step2Table: Array[(String, String)] = Array(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "iser" -> "ize", "abli" -> "able", "alli" -> "al",
    "entli" -> "ent", "eli" -> "e", "ousli" -> "ous", "ization" -> "ize",
    "isation" -> "ize", "ation" -> "ate", "ator" -> "ate", "alism" -> "al",
    "iveness" -> "ive", "fulness" -> "ful", "ousness" -> "ous",
    "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

  // Porter.kt:258-267
  private val step3Table: Array[(String, String)] = Array(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "alise" -> "al",
    "iciti" -> "ic", "ical" -> "ic", "ful" -> "", "ness" -> "")

  // Porter.kt:283-305 (kept when m(stem) > 1, suffix dropped entirely)
  private val step4Table: Array[String] = Array(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "sion", "tion", "ou", "ism", "ate", "iti", "ous",
    "ive", "ize", "ise")

  private def mapTable(w: String, table: Array[(String, String)]): String = {
    var i = 0
    while (i < table.length) {
      val (suf, rep) = table(i)
      val st = stemOf(w, suf)
      if (st != null && measure(st) > 0) return st + rep
      i += 1
    }
    w
  }

  private def step4(w: String): String = {
    var i = 0
    while (i < step4Table.length) {
      val st = stemOf(w, step4Table(i))
      if (st != null && measure(st) > 1) return st
      i += 1
    }
    w
  }

  /** Porter.kt:321-353. */
  private def step5(in: String): String = {
    var w = in
    if (w.isEmpty) return w
    if (w.charAt(w.length - 1) == 'e') {
      val m = measure(w)
      if (m > 1) w = w.substring(0, w.length - 1)
      else if (m == 1) {
        val st = w.substring(0, w.length - 1)
        if (!cvc(st)) w = st
      }
    }
    if (w.length == 1) return w
    if (w.charAt(w.length - 1) == 'l' && w.charAt(w.length - 2) == 'l' && measure(w) > 1)
      w = w.substring(0, w.length - 1)
    w
  }

  // Porter.kt:355-370 — first matching metric prefix is removed.
  private val prefixes: Array[String] = Array(
    "kilo", "micro", "milli", "intra", "ultra", "mega", "nano", "pico", "pseudo")

  private def stripPrefixes(s: String): String = {
    var i = 0
    while (i < prefixes.length) {
      if (s.startsWith(prefixes(i))) return s.substring(prefixes(i).length)
      i += 1
    }
    s
  }

  private def stripSuffixes(in: String): String = {
    var w = step1(in)
    if (w.nonEmpty) w = step2Apply(w)
    if (w.nonEmpty) w = step3Apply(w)
    if (w.nonEmpty) w = step4(w)
    if (w.nonEmpty) w = step5(w)
    w
  }

  private def step2Apply(w: String): String = mapTable(w, step2Table)
  private def step3Apply(w: String): String = mapTable(w, step3Table)

  /** Porter.kt:16-27: keep only letters/digits. */
  private def clean(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isLetterOrDigit(c)) sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** Public entry point — Porter.kt:390-405. */
  def stripAffixes(str: String): String = {
    var w = clean(str.toLowerCase)
    if (w.length > 2) {
      w = stripPrefixes(w)
      w = stripSuffixes(w) // reference's `!== ""` guard is vacuously true
    }
    w
  }
}
