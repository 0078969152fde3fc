package graft.operators

/** The Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
  * stripping", Program 14(3), 1980) — the `english` analyzer's stemmer,
  * implemented from the published description (the ORIGINAL paper rule
  * set: step 2 maps ABLI→ABLE and has no LOGI/BLI departures).
  *
  * Why a pure driver-usable function: the analyzer contract demands the
  * SAME token stream in three spellings (Spark column, driver literal
  * twin, oracle) — the Spark side wraps this in a native Catalyst
  * expression ([[graft.functions.PorterStem]]) so stemming stays inside
  * whole-stage codegen, and the driver twin calls it directly, so MATCH
  * query terms stem exactly like the postings they probe. DuckDB cannot
  * stem, so the oracle-side spelling stops at the stop-word sublayer
  * (see [[Analyzer.duckTokens]]) and the stemmer itself is verified by
  * the driver-twin parity fuzz spec plus the published example
  * vocabulary (PorterStemSpec).
  *
  * The reference has no text analysis at all (its only string ops are
  * contains/regex, `/root/reference/src/query_conditions.rs:422-479`),
  * so the stemming contract is ours to define; Porter is the published
  * default Lucene's EnglishAnalyzer ships.
  *
  * Scope: lowercase ASCII words of length ≥ 3 (the analyzer lowercases
  * before stemming); anything else — digits, diacritics, short words —
  * passes through unchanged, the conservative posture (a wrong
  * pass-through keeps a term findable by its surface form; a wrong stem
  * would not).
  */
object Porter {

  def stem(w: String): String = {
    if (w.length <= 2) return w
    var ok = true
    var i = 0
    while (ok && i < w.length) {
      val c = w.charAt(i)
      if (c < 'a' || c > 'z') ok = false
      i += 1
    }
    if (!ok) return w
    var s = w
    s = step1a(s)
    s = step1b(s)
    s = step1c(s)
    s = step2(s)
    s = step3(s)
    s = step4(s)
    s = step5(s)
    s
  }

  /** A letter is a consonant unless it is a/e/i/o/u, or a `y` preceded
    * by a consonant (paper §2: TOY has consonant y, SYZYGY vowel ys). */
  private def isVowel(s: String, i: Int): Boolean = s.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowel(s, i - 1)
    case _ => false
  }

  /** The measure m of [C](VC)^m[V]: the count of VC alternations. */
  private def measure(s: String): Int = {
    var m = 0
    var i = 0
    val n = s.length
    while (i < n && !isVowel(s, i)) i += 1
    while (i < n) {
      while (i < n && isVowel(s, i)) i += 1
      if (i < n) {
        m += 1
        while (i < n && !isVowel(s, i)) i += 1
      }
    }
    m
  }

  /** *v* — the stem contains a vowel. */
  private def hasVowel(s: String): Boolean =
    (0 until s.length).exists(isVowel(s, _))

  /** *d — the stem ends with a double consonant. */
  private def endsDoubleC(s: String): Boolean =
    s.length >= 2 && s.charAt(s.length - 1) == s.charAt(s.length - 2) &&
      !isVowel(s, s.length - 1)

  /** *o — the stem ends consonant-vowel-consonant where the final
    * consonant is not w, x, or y. */
  private def endsCvc(s: String): Boolean = {
    val n = s.length
    n >= 3 && !isVowel(s, n - 3) && isVowel(s, n - 2) && !isVowel(s, n - 1) &&
      "wxy".indexOf(s.charAt(n - 1)) < 0
  }

  private def step1a(s: String): String =
    if (s.endsWith("sses")) s.dropRight(2)
    else if (s.endsWith("ies")) s.dropRight(2)
    else if (s.endsWith("ss")) s
    else if (s.endsWith("s")) s.dropRight(1)
    else s

  private def step1b(s: String): String = {
    if (s.endsWith("eed"))
      return if (measure(s.dropRight(3)) > 0) s.dropRight(1) else s
    val stripped =
      if (s.endsWith("ed") && hasVowel(s.dropRight(2))) Some(s.dropRight(2))
      else if (s.endsWith("ing") && hasVowel(s.dropRight(3))) Some(s.dropRight(3))
      else None
    stripped match {
      case None => s
      case Some(st) =>
        if (st.endsWith("at") || st.endsWith("bl") || st.endsWith("iz"))
          st + "e"
        else if (endsDoubleC(st) && "lsz".indexOf(st.charAt(st.length - 1)) < 0)
          st.dropRight(1)
        else if (measure(st) == 1 && endsCvc(st)) st + "e"
        else st
    }
  }

  private def step1c(s: String): String =
    if (s.endsWith("y") && hasVowel(s.dropRight(1))) s.dropRight(1) + "i"
    else s

  /** Longest matching suffix wins, THEN its condition gates (a failed
    * condition on the longest match does not fall through to shorter
    * ones — the paper's matching rule). `rules` must already be sorted
    * longest-suffix-first: this runs per token inside the scan-side
    * codegen'd path, so the sort happens once at class init, not per
    * call. */
  private def applyRules(s: String, minM: Int,
      rules: Seq[(String, String)]): String =
    rules.find { case (suf, _) => s.endsWith(suf) } match {
      case Some((suf, rep)) =>
        val st = s.dropRight(suf.length)
        if (measure(st) > minM - 1) st + rep else s
      case None => s
    }

  private val Step2Rules = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence",
    "anci" -> "ance", "izer" -> "ize", "abli" -> "able", "alli" -> "al",
    "entli" -> "ent", "eli" -> "e", "ousli" -> "ous", "ization" -> "ize",
    "ation" -> "ate", "ator" -> "ate", "alism" -> "al",
    "iveness" -> "ive", "fulness" -> "ful", "ousness" -> "ous",
    "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")
    .sortBy(-_._1.length)

  private val Step3Rules = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")
    .sortBy(-_._1.length)

  private def step2(s: String): String = applyRules(s, 1, Step2Rules)

  private def step3(s: String): String = applyRules(s, 1, Step3Rules)

  private val Step4Suffixes = Seq(
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent", "ion",
    "ism", "ate", "iti", "ous", "ive", "ize", "al", "er", "ic", "ou")
    .sortBy(-_.length)

  private def step4(s: String): String =
    Step4Suffixes.find(s.endsWith) match {
      case Some(suf) =>
        val st = s.dropRight(suf.length)
        if (suf == "ion") {
          if (measure(st) > 1 &&
              (st.endsWith("s") || st.endsWith("t"))) st
          else s
        } else if (measure(st) > 1) st
        else s
      case None => s
    }

  private def step5(s: String): String = {
    var t = s
    if (t.endsWith("e")) {
      val st = t.dropRight(1)
      val m = measure(st)
      if (m > 1 || (m == 1 && !endsCvc(st))) t = st
    }
    if (measure(t) > 1 && endsDoubleC(t) && t.endsWith("l")) t = t.dropRight(1)
    t
  }
}
