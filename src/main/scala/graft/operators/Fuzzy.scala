package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact edit-distance-1 similarity join via symmetric-delete blocking
  * (the SymSpell scheme, Garbe 2012 — itself the FastSS dictionary
  * method of Bocek et al. 2007): two strings are within Levenshtein
  * distance 1 IFF they share a member of their deletion neighborhoods
  * {s} ∪ { s minus one character }, so a plain equi-join on deletion
  * keys generates a candidate set with NO false negatives —
  *  - substitution at position i: both sides delete i → same string;
  *  - insertion/deletion: the longer side deletes the extra character
  *    → the shorter string, which is its own key.
  * Candidates are then VERIFIED with the real `levenshtein`, so the
  * output is exact and candidate-set independent (same contract as the
  * PPJoin prefix filter, Dedup.prefixFilterJoin).
  *
  * Scale shape: |s|+1 keys per row, one equi-shuffle on the key — never
  * a cross join. Record-linkage workloads (near-identical names, ids,
  * URLs) produce small key buckets; a pathological bucket (many strings
  * sharing one deletion) is quadratic only within that bucket, the
  * standard blocking trade-off.
  */
object Fuzzy {

  /** The deletion neighborhood of `c`: the string itself plus each
    * single-character deletion (distinct — repeated characters produce
    * duplicate deletions). Empty strings key only to themselves. */
  def deletionKeys(c: Column): Column =
    when(length(c) === 0, array(c)).otherwise(
      array_union(
        array(c),
        transform(sequence(lit(1), length(c)), i =>
          concat(c.substr(lit(1), i - lit(1)),
            c.substr(i + lit(1), length(c))))))

  /** All pairs of `df` rows whose `strCol` values are within Levenshtein
    * distance 1 (including equal strings), each pair once with
    * idCol_a < idCol_b: (id_a, id_b, name_a, name_b). */
  def editDistance1Pairs(df: DataFrame, idCol: String,
                         strCol: String): DataFrame = {
    // Alias first, explode in a second projection: referencing the
    // fresh alias inside the same SELECT would resolve as a lateral
    // column alias, which Generate cannot carry.
    val keyed = df.select(col(idCol).as("id"), col(strCol).as("s"))
      .select(col("id"), col("s"), explode(deletionKeys(col("s"))).as("dk"))
    keyed.as("a").join(keyed.as("b"),
        col("a.dk") === col("b.dk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.s").as("name_a"), col("b.s").as("name_b"))
      .distinct() // pairs sharing several deletion keys appear once
      .filter(levenshtein(col("name_a"), col("name_b")) <= 1)
  }
}
