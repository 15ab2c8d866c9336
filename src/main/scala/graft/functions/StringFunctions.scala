package graft.functions

import org.apache.spark.sql.Column

/** Jaro / Jaro-Winkler string similarity, shared by the Catalyst
  * expression ([[org.apache.spark.sql.graftvec.JaroWinkler]]) and unit
  * tests. Algorithm per Winkler (1990), "String Comparator Metrics and
  * Enhanced Decision Rules in the Fellegi-Sunter Model of Record
  * Linkage"; edge-case conventions (empty → 0, window = max/2 - 1,
  * boost only above 0.7) pinned to DuckDB's implementation, which is
  * the cross-engine correctness oracle.
  */
object JaroWinklerImpl {

  /** Classic Jaro similarity in [0, 1]. */
  def jaro(s1: String, s2: String): Double = {
    val len1 = s1.length
    val len2 = s2.length
    if (len1 == 0 || len2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val window = math.max(math.max(len1, len2) / 2 - 1, 0)
    val m1 = new Array[Boolean](len1)
    val m2 = new Array[Boolean](len2)
    var matches = 0
    var i = 0
    while (i < len1) {
      val c = s1.charAt(i)
      var j = math.max(0, i - window)
      val hi = math.min(i + window, len2 - 1)
      var found = false
      while (!found && j <= hi) {
        if (!m2(j) && s2.charAt(j) == c) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // Transpositions: matched chars from each side, in order; every
    // positional disagreement counts once, halved.
    var t = 0
    var k = 0
    i = 0
    while (i < len1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / len1 + m / len2 + (m - t / 2) / m) / 3.0
  }

  /** Jaro-Winkler: prefix boost (scale 0.1, prefix capped at 4) applied
    * only when Jaro exceeds the classic 0.7 threshold. */
  def jaroWinkler(s1: String, s2: String): Double = {
    val j = jaro(s1, s2)
    if (j <= 0.7) return j
    var l = 0
    val max = math.min(4, math.min(s1.length, s2.length))
    while (l < max && s1.charAt(l) == s2.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }
}

/** Engine-facing string-similarity functions backed by native codegen'd
  * Catalyst expressions. */
object StringFunctions {
  /** Codegen'd Jaro-Winkler similarity of two string columns, matching
    * DuckDB `jaro_winkler_similarity` bit-for-bit on the per-row
    * double. */
  def jaroWinkler(a: Column, b: Column): Column =
    org.apache.spark.sql.graftvec.StringSimBridge.jaroWinkler(a, b)
}
