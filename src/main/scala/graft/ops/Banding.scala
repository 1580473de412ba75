package graft.ops

/** Plan-build-time capacity guard for every banded-LSH join in the
  * engine (the Hamming banding cores in [[Multimodal]], the SimHash
  * banding in [[Dedup]], and the MinHash band rows).
  *
  * The hot-bucket occupancy cap that protects a banded self-join from
  * C(n,2) fan-out is a SKEW guard: it assumes over-full buckets are
  * boilerplate clusters, rare against the corpus. That assumption has
  * a hard arithmetic boundary — once the corpus outgrows
  * `cap · |key space|`, AVERAGE band-bucket occupancy exceeds the
  * cap, every bucket trips the guard, and the join silently trends
  * toward empty (the round-15/16 "band-key cliff"). A diagnostic
  * column (`hot_buckets`) reports the suppression but cannot stop a
  * pipeline from shipping an empty answer.
  *
  * This guard converts that silent cliff into a NAMED, fail-fast
  * error at plan-build time: each banding core counts its (already
  * checkpointed) input once and refuses to build a plan whose
  * expected occupancy exceeds the cap. The fix it names is the one
  * the engine already ships — wider hashes (the 4×32-bit keyings) or
  * corpus sharding — rather than letting the hot cap suppress
  * wholesale.
  */
object Banding {

  /** Fail by name when `nRows` hashes over `bands` bands of
    * `keySpaceLog2`-bit keys would push average bucket occupancy past
    * `cap`. Key spaces of 2^48 or wider cannot be exceeded by any
    * Long-countable corpus (cap ≥ 1 ⇒ bound ≥ 2^48 ≫ 9·10^18 rows is
    * false only below 48 when cap is tiny — the explicit check keeps
    * the arithmetic overflow-free either way).
    */
  def requireCapacity(nRows: Long, keySpaceLog2: Int, cap: Long,
      site: String): Unit = {
    if (keySpaceLog2 < 48) {
      val bound = cap << keySpaceLog2
      require(nRows <= bound,
        s"$site: $nRows rows over a 2^$keySpaceLog2 band-key space " +
          s"exceeds the hot-bucket capacity bound $bound (cap $cap per " +
          s"bucket): average occupancy would exceed the cap and the " +
          s"hot-bucket guard would suppress pairs WHOLESALE, not just " +
          s"skew. Widen the band keys (the 128-bit/4×32 hash variants) " +
          s"or shard the corpus before banding.")
    }
  }
}
