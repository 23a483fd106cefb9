package graft.operators

import graft.functions.IntLog.ilog2f
import graft.functions.UnigramFunctions.unigram_estep
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The unigram-LM EM re-estimation round's model-fit step, shared by
  * p130 (per-piece report) and p137 (per-source fertility shift):
  * E-step expected piece counts over the distinct-word dictionary
  * (exact-integer forward-backward — [[graft.functions.UnigramEStep]]),
  * M-step re-quantized integer costs via the square-and-extract log2.
  * The returned vocabulary is a PLAN-TIME literal (codebook-bounded
  * driver traffic, the p122/fittedKmeans model-artifact discipline);
  * pieces with zero soft mass are dropped.
  */
object UnigramEm {

  /** Corpus soft counts per piece: Σ_words cnt · eppm(word, piece),
    * E-stepped over `words` (a (word, cnt) dictionary frame; callers
    * persist it when they reuse it for a second pass).
    */
  def softCounts(words: DataFrame, lattice: Seq[(String, Long)],
      lenCap: Int): Map[String, Long] =
    words.filter(length(col("word")) <= lenCap)
      .select(col("cnt"),
        explode(unigram_estep(col("word"), lattice, lenCap)).as("pe"))
      .select(col("pe.piece").as("piece"),
        (col("cnt") * col("pe.eppm")).as("contrib"))
      .groupBy(col("piece")).agg(sum(col("contrib")).as("e_fix"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Round-2 E-step lattice weights from round-1 soft counts: each
    * surviving piece's LINEAR probability E_p/T re-quantized to the
    * 8-bit scale the oracle's HUGEINT ladders can carry —
    * W2 = max(1, E·256 DIV T), the documented ~1/256 resolution floor
    * on rare pieces — then length-homogenized (V2 = W2 · 256^(len−1),
    * the [[graft.functions.UnigramEStep]] construction). Zero-mass
    * pieces drop (they matched no coverable word, so they cannot
    * matter in round 2 either).
    */
  def lattice2(seedVocab: Seq[(String, Int)],
      soft: Map[String, Long]): Seq[(String, Long)] = {
    // BigInt multiply: ef reaches ~corpus_tokens · 10^6, so ef · 256
    // wraps a Long silently around 10^10 tokens while the oracle's
    // HUGEINT survives — the quotient (≤ 256) is Long-safe, the
    // PRODUCT is not. Same discipline as the share-ppm numerators.
    val total = soft.values.map(BigInt(_)).sum.max(BigInt(1))
    seedVocab.flatMap { case (p, _) =>
      soft.get(p).filter(_ > 0L).map { ef =>
        val w2 = (BigInt(ef) * 256 / total).toLong.max(1L)
        // homogenization length in CODE POINTS — the E-step's length
        // unit (see UnigramEStep's unit contract); identical on the
        // BMP vocabularies every current caller uses
        p -> (w2 * (1L << (8 * (p.codePointCount(0, p.length) - 1))))
      }
    }
  }

  /** One full EM round's output vocabulary:
    * cost2 = max(1, (lg(ΣE) − lg(E_p)) · 100 / 2^16) over the soft
    * counts, in the seed vocabulary's piece order, zero-mass pieces
    * dropped. Empty iff no word ≤ lenCap is coverable.
    */
  def fitVocab2(seedVocab: Seq[(String, Int)],
      soft: Map[String, Long]): Seq[(String, Int)] = {
    val total = soft.values.sum
    seedVocab.flatMap { case (p, _) =>
      soft.get(p).filter(_ > 0L).map { ef =>
        p -> math.max(1L,
          ((ilog2f(total) - ilog2f(ef)) * 100L) / 65536L).toInt
      }
    }
  }
}
