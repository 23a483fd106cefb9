package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-table fuzzy entity matching (record linkage): link each row of
  * a DIRTY table (OCR'd registries, user-typed vendor names, crawl
  * variants) to its best CANONICAL counterpart under an exact edit-
  * distance bound, without ever forming the dirty x canon cross product.
  *
  * Blocking is a character-trigram inverted index over the CANONICAL
  * side with a document-frequency cap — the p07/p82 discipline: grams
  * shared by more than `maxGramDf` canonical rows are non-discriminative
  * (the "Customer#0" of every key) and generating their candidate lists
  * would funnel the index into hot keys, so they are dropped from
  * BLOCKING (never from the distance, which is exact on the full
  * strings). Candidates carry ids only; names join back after pair
  * dedup; the confirm is Spark's codegen'd `levenshtein`, and the best
  * match per dirty row is a composite-integer-key min_by — one
  * partial-aggregable pass, no window.
  *
  * Recall contract: a true match is found iff dirty and canon share at
  * least one sub-cap trigram. A single typo destroys at most 3 of a
  * string's grams, so misses need either near-total gram commonality
  * (cap the whole name space raises) or very short strings —
  * EntityMatchSpec gates the measured recall on the deterministic-typo
  * corpus.
  */
object EntityMatch {

  /** Best canonical match per dirty row: (dirtyId, matched id, dist).
    * Rows with no candidate within `maxDist` are absent (left-join the
    * result if a full report is needed).
    */
  def bestMatches(
      dirty: DataFrame, dirtyId: String, dirtyText: String,
      canon: DataFrame, canonId: String, canonText: String,
      maxDist: Int = 2, maxGramDf: Int = 50): DataFrame = {
    require(maxDist >= 0 && maxGramDf >= 1, "maxDist/maxGramDf out of range")

    def gramize(df: DataFrame, id: String, text: String): DataFrame =
      df.select(col(id).as("__id"), col(text).as("__t"))
        .filter(col("__t").isNotNull && length(col("__t")) >= 3)
        .select(col("__id"),
          explode(transform(sequence(lit(1), length(col("__t")) - 2),
            i => col("__t").substr(i, lit(3)))).as("__g"))
        .distinct()

    val canonGrams = gramize(canon, canonId, canonText)
    // discriminative grams only: df over CANONICAL ids, capped
    val keptGrams = canonGrams.groupBy(col("__g"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxGramDf)
      .select(col("__g"))
    val index = canonGrams.join(keptGrams, Seq("__g"))
      .select(col("__g"), col("__id").as("__cid"))
    val probes = gramize(dirty, dirtyId, dirtyText)
      .select(col("__g"), col("__id").as("__did"))
    val cand = probes.join(index, Seq("__g"))
      .select(col("__did"), col("__cid")).distinct()

    val confirmed = cand
      .join(dirty.select(col(dirtyId).as("__did"),
        col(dirtyText).as("__dt")), Seq("__did"))
      .join(canon.select(col(canonId).as("__cid"),
        col(canonText).as("__ct")), Seq("__cid"))
      .withColumn("__dist", levenshtein(col("__dt"), col("__ct")))
      .filter(col("__dist") <= maxDist)
    // struct ordering key makes the per-dirty argmin unique and safe
    // for ANY id range: Spark orders structs lexicographically, so
    // (dist, canonical id) needs no arithmetic stride — the round-6
    // form dist*10^15 + cid silently corrupted the order (and could
    // overflow Long) once canonical ids reached the stride
    val key = struct(col("__dist"), col("__cid"))
    confirmed.groupBy(col("__did").as(dirtyId))
      .agg(min_by(col("__cid"), key).as("matched_id"),
        min_by(col("__dist"), key).as("dist"))
  }

  /** High-recall variant: SYMMETRIC-DELETE blocking (the SymSpell
    * family, public algorithm). Both sides index every single-character
    * deletion variant of each string (plus the string itself); two
    * strings within edit distance 1 — substitution, insertion OR
    * deletion — always share a variant, so blocking recall for
    * single-typo matches is 100% BY CONSTRUCTION, where trigram
    * blocking degrades on templated keyspaces (a substituted tail digit
    * destroys every gram that covered it — EntityMatchSpec measures
    * ~75% there). Cost: the index is (len+1) variants per row vs ~len
    * trigrams — same order — and the variant strings are longer keys.
    * Distances beyond 1 still confirm exactly (maxDist applies) but
    * carry no recall guarantee without 2-deletion variants (len^2/2 per
    * row — the documented trade-off). Same DF-cap discipline as the
    * trigram path; candidates are ids-only; confirm and argmin
    * identical.
    */
  def bestMatchesSymDelete(
      dirty: DataFrame, dirtyId: String, dirtyText: String,
      canon: DataFrame, canonId: String, canonText: String,
      maxDist: Int = 2, maxKeyDf: Int = 50): DataFrame = {
    require(maxDist >= 0 && maxKeyDf >= 1, "maxDist/maxKeyDf out of range")

    // the string itself + every 1-deletion variant, distinct per id
    def variants(df: DataFrame, id: String, text: String): DataFrame =
      df.select(col(id).as("__id"), col(text).as("__t"))
        .filter(col("__t").isNotNull && length(col("__t")) >= 2)
        .select(col("__id"),
          explode(concat(array(col("__t")),
            transform(sequence(lit(1), length(col("__t"))),
              i => concat(
                col("__t").substr(lit(1), i - 1),
                col("__t").substr(i + 1, length(col("__t")))))))
            .as("__k"))
        .distinct()

    val canonVars = variants(canon, canonId, canonText)
    val keptKeys = canonVars.groupBy(col("__k"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxKeyDf)
      .select(col("__k"))
    val index = canonVars.join(keptKeys, Seq("__k"))
      .select(col("__k"), col("__id").as("__cid"))
    val cand = variants(dirty, dirtyId, dirtyText)
      .select(col("__k"), col("__id").as("__did"))
      .join(index, Seq("__k"))
      .select(col("__did"), col("__cid")).distinct()

    val confirmed = cand
      .join(dirty.select(col(dirtyId).as("__did"),
        col(dirtyText).as("__dt")), Seq("__did"))
      .join(canon.select(col(canonId).as("__cid"),
        col(canonText).as("__ct")), Seq("__cid"))
      .withColumn("__dist", levenshtein(col("__dt"), col("__ct")))
      .filter(col("__dist") <= maxDist)
    val key = struct(col("__dist"), col("__cid")) // same contract as bestMatches
    confirmed.groupBy(col("__did").as(dirtyId))
      .agg(min_by(col("__cid"), key).as("matched_id"),
        min_by(col("__dist"), key).as("dist"))
  }
}
