package graft.functions

/** Shared deterministic mixers. splitmix64 (Steele et al., public
  * constants) seeds every derived-randomness surface in the library —
  * MinHash coefficients ([[graft.operators.Dedup]]) and LSH hyperplane
  * weights ([[graft.operators.Similarity]]) — from ONE implementation,
  * so the two operators' reproducible-seeding claims cannot drift.
  */
object Hashing {
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
