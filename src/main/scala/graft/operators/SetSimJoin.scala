package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT set-similarity self-join above a Jaccard threshold via prefix
  * filtering (the AllPairs/PPJoin family — Bayardo et al. WWW'07,
  * Xiao et al. WWW'08, both public): every pair with
  * J(A,B) = |A∩B| / |A∪B| >= t is returned, with NO approximation —
  * the complement of the approximate paths (Dedup.minhashLsh trades
  * recall for speed, Dedup.ngramJaccardPairs drops candidates through
  * its hot-shingle DF cap; this trades a provably-safe prune for
  * exactness).
  *
  * The prune: order the universe of tokens by ascending document
  * frequency (rarest first — the (df, token) pair itself is the sort
  * key, so no global rank assignment pass is needed). If J(A,B) >= t
  * then |A∩B| >= ceil(t*|A|), so A and B MUST share a token within the
  * first p = |A| - ceil(t*|A|) + 1 tokens of A's rarity-sorted list
  * (if every shared token sat past the prefix, the intersection could
  * not reach that bound). Candidates therefore come from an equi-join
  * on PREFIX tokens only — and prefixes are the RAREST tokens, so
  * candidate volume is Σ df_prefix² instead of Σ df²: the hot-token
  * quadratic blowup of a naive shared-token join never forms.
  *
  * 100 TB shape: token df is a plain shuffled groupBy (the dictionary
  * is never collected or broadcast); the one per-doc sorted array
  * (doc-bounded) is built ONCE, only its prefix is exploded, and full
  * token arrays never ride a join — verification counts |A∩B|
  * distributively by joining the deduplicated candidate pairs back to
  * the flat (id, token) frame on (id, token) keys; a length filter
  * (t*|B| <= |A| <= |B|/t) prunes at candidate time with pure integer
  * arithmetic. Threshold is the rational num/den so both engines
  * compare exactly (no float boundary).
  */
object SetSimJoin {

  /** All pairs (id_a < id_b) with Jaccard(toks_a, toks_b) >= num/den.
    *
    * @param docs (id BIGINT, toks array<string> DISTINCT tokens)
    * @param num  threshold numerator;  with den, a rational in (0, 1]
    * @param den  threshold denominator
    * @return id_a, id_b, inter, size_a, size_b, jaccard_ppm
    *         (ppm floored — both engines' non-negative integer division)
    */
  def jaccardJoin(docs: DataFrame, num: Int, den: Int): DataFrame = {
    require(num >= 1 && num <= den, s"threshold must be in (0,1]: $num/$den")
    val spark = docs.sparkSession
    import spark.implicits._

    val tok = docs.select($"id", explode($"toks").as("tok"))
    val df = tok.groupBy($"tok").agg(count(lit(1)).as("df"))
    // rarity-sorted prefix per doc, built once; sort key (df, tok) is a
    // global total order without ever materializing a rank. Prefix
    // length p = n - ceil(num*n/den) + 1, ceil in integer arithmetic.
    val pref = tok.join(df, "tok")
      .groupBy($"id")
      .agg(sort_array(collect_list(struct($"df", $"tok"))).as("ranked"))
      .select($"id", size($"ranked").as("n"),
        explode(slice(transform($"ranked", x => x("tok")), lit(1),
          size($"ranked")
            - expr(s"(size(ranked) * $num + ${den - 1}) DIV $den")
            + 1)).as("ptok"))

    val a = pref.as("a"); val b = pref.as("b")
    val cand = a.join(b,
        $"a.ptok" === $"b.ptok" && $"a.id" < $"b.id" &&
          // length filter: J >= t forces t <= |A|/|B| <= 1/t
          $"a.n" * num <= $"b.n" * den && $"b.n" * num <= $"a.n" * den)
      .select($"a.id".as("id_a"), $"b.id".as("id_b"),
        $"a.n".as("size_a"), $"b.n".as("size_b"))
      .distinct()

    // exact |A∩B| for the surviving pairs, counted distributively from
    // the flat token frame — no token array ever rides a join
    val ta = tok.select($"id".as("id_a"), $"tok")
    val tb = tok.select($"id".as("id_b"), $"tok")
    cand.join(ta, "id_a").join(tb, Seq("id_b", "tok"))
      .groupBy($"id_a", $"id_b")
      .agg(first($"size_a").as("size_a"), first($"size_b").as("size_b"),
        count(lit(1)).as("inter"))
      .filter($"inter" * den >= ($"size_a" + $"size_b" - $"inter") * num)
      .select($"id_a", $"id_b", $"inter",
        $"size_a".cast("long").as("size_a"),
        $"size_b".cast("long").as("size_b"),
        expr("inter * 1000000 DIV (size_a + size_b - inter)")
          .as("jaccard_ppm"))
  }
}
