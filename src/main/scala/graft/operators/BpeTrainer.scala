package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning over a corpus — the tokenizer-
  * TRAINING pass (Sennrich et al.'s algorithm), distributed: learn the
  * `numMerges` most frequent adjacent symbol pairs, greedily, each round
  * conditioned on the merges before it.
  *
  * Scale shape (the same discipline as connectedComponents): the corpus
  * collapses to its word DICTIONARY (word, freq) in one aggregation up
  * front — BPE statistics depend only on word frequencies, so the
  * per-round state is dictionary-sized, never corpus-sized. Each round
  * is one distributed pair-count aggregation (explode adjacent symbol
  * pairs weighted by word freq), ONE collected row (the argmax pair,
  * deterministic tie-break: count desc, then pair lexicographic), and a
  * map-side fold applying the merge greedily left-to-right. The
  * dictionary is localCheckpoint'ed per round so plan lineage stays
  * flat across rounds (CC's loop discipline).
  *
  * No DuckDB oracle is possible (the algorithm is inherently iterative
  * — each round's counts depend on the previous merge), so the query
  * entry is rows-only checked and the algorithm is golden-tested in
  * ScalaTest against hand-computed merges (BpeTrainerSpec).
  */
object BpeTrainer {

  /** Learned merge table: (rank, left, right, merged, n) — rank is the
    * merge order (0-based), n the weighted pair count that won the round.
    */
  def learnMerges(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      minPairCount: Long = 2L): DataFrame = {
    require(numMerges >= 1, "numMerges must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._

    // corpus -> word dictionary; symbols start as single characters
    var dict = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").agg(count(lit(1)).as("freq"))
      .select(split($"w", "").as("syms"), $"freq")
      .localCheckpoint(true)

    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      // weighted counts of adjacent symbol pairs across the dictionary
      val best = dict
        .select($"freq", explode(
          zip_with(slice($"syms", lit(1), size($"syms") - 1),
            slice($"syms", lit(2), size($"syms") - 1),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy($"p.l", $"p.r").agg(sum($"freq").as("n"))
        .orderBy($"n".desc, $"l", $"r")
        .limit(1)
        .collect()
      best.headOption.map(r => (r.getString(0), r.getString(1), r.getLong(2))) match {
        case Some((l, rr, n)) if n >= minPairCount =>
          val merged = l + rr
          merges += ((rank, l, rr, merged, n))
          // greedy left-to-right merge as a fold: replace a trailing `l`
          // with `merged` when the next symbol is `rr`. The fold's
          // growing accumulator makes overlapping applications behave
          // exactly like the sequential scan ("aaa" + (a,a) -> [aa, a]).
          val applied = aggregate($"syms",
            array().cast("array<string>"),
            (acc, s) => when(
              size(acc) > 0 && element_at(acc, -1) === lit(l) && s === lit(rr),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
              .otherwise(concat(acc, array(s))))
          val next = dict.select(applied.as("syms"), $"freq").localCheckpoint(true)
          dict = next
          rank += 1
        case _ => done = true // no pair left above the floor
      }
    }
    merges.result().toDF("rank", "left", "right", "merged", "n")
  }

  /** Tokenize text with a learned merge table (inference side): apply
    * the merges in rank order to each word's character sequence. Useful
    * for vocabulary-coverage checks; heavy tokenization belongs in the
    * serving stack, not the analytics engine.
    */
  def applyMerges(
      df: DataFrame,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val word = df.select(col("*"), explode(split(col(textCol), " ")).as("__w"))
      .filter(length($"__w") > 0)
    val tokenized = merges.foldLeft(split($"__w", "").as("__syms") : org.apache.spark.sql.Column) {
      case (syms, (l, r)) =>
        aggregate(syms, array().cast("array<string>"),
          (acc, s) => when(
            size(acc) > 0 && element_at(acc, -1) === lit(l) && s === lit(r),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
            .otherwise(concat(acc, array(s))))
    }
    word.select(col("*"), tokenized.as("bpe_tokens")).drop("__w")
  }
}
