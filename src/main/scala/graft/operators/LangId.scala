package graft.operators

/** N-gram/stopword language identification (heuristic tier).
  *
  * Pure Scala scoring function intended for `mapPartitions`/typed maps —
  * profiles are tiny embedded stopword sets (public knowledge), matching
  * on lowercased whitespace tokens, with a script prior for non-Latin
  * alphabets. Deterministic; no external models (zero-egress sandbox).
  */
object LangId {

  private val profiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "in", "is", "that", "it", "for",
      "was", "with", "are", "this", "have", "not", "you", "his", "from"),
    "de" -> Set("der", "die", "und", "das", "ist", "nicht", "mit", "ein",
      "eine", "von", "den", "des", "dem", "sich", "auch", "auf"),
    "fr" -> Set("le", "la", "les", "des", "est", "dans", "que", "pour",
      "une", "qui", "pas", "sur", "avec", "par", "mais"),
    "es" -> Set("el", "la", "los", "las", "que", "por", "con", "una",
      "del", "para", "como", "más", "pero", "sus"))

  private val cyrillic = "[Ѐ-ӿ]".r

  /** Best-guess ISO code, or "unknown" when nothing scores. */
  def detect(text: String): String = {
    if (text == null || text.isEmpty) return "unknown"
    // script prior: Cyrillic share decides ru before token profiles
    val cyr = cyrillic.findAllMatchIn(text).length
    if (cyr * 2 > text.length) return "ru"
    val tokens = text.toLowerCase.split("[^\\p{L}']+").filter(_.nonEmpty)
    if (tokens.isEmpty) return "unknown"
    var best = "unknown"
    var bestHits = 0
    for ((lang, stop) <- profiles.toSeq.sortBy(_._1)) {
      val hits = tokens.count(stop.contains)
      if (hits > bestHits) { best = lang; bestHits = hits }
    }
    if (bestHits == 0) {
      if (cyr > 0) "ru"
      else "unknown"
    } else best
  }
}
