package graft.operators

/** Scale-adaptive bucket count for the persisted additive logs (MinHash
  * bands, BM25 postings, LM/NB count logs, span windows, min-id logs,
  * near-dup edges, graph adjacency).
  *
  * Why adaptive (r15 optimization round, guide §6 "small files hurt
  * twice"): every bucketed save previously wrote a FIXED 64 partition
  * directories regardless of data size. At gate scale that is 64
  * near-empty files per log whose create/commit cost dominates the
  * write — measured 2.4–3.4 s for a 20k-row bucketed write at 64
  * buckets vs 0.4–0.9 s at 4–16 on this host — and the bench pays it
  * dozens of times across the index builds. At 100 TB a fixed 64 is
  * wrong in the other direction: per-bucket files grow unboundedly and
  * appends fan into huge partitions.
  *
  * Sizing: one bucket per [[TargetRowsPerBucket]] rows, clamped to
  * [[MinBuckets]] (keeps every layout genuinely multi-bucket, so
  * bucket-pruned readers and per-bucket compaction stay exercised at
  * every scale) and [[MaxBuckets]] (bounds the files an append wave
  * creates and the directories a listing pays for; beyond the ceiling
  * file SIZE grows instead, which parquet handles well). The count is
  * resolved once at BUILD time and persisted in each index's meta —
  * appends and pruned reads always follow the stored value, so the
  * writer/reader bucket contract is untouched. Callers with measured
  * layouts (the 500k vector decade uses 512) pass an explicit count.
  */
object LogBuckets {

  /** Sentinel default: resolve from the data's row count at build time. */
  val Adaptive = 0

  val MinBuckets = 4
  val MaxBuckets = 512
  val TargetRowsPerBucket = 250000L

  /** `requested` > 0 is honored verbatim; [[Adaptive]] sizes from
    * `nRows` (a row count of, or a cheap proxy for, the log's data). */
  def resolve(requested: Int, nRows: => Long): Int =
    if (requested > 0) requested else adaptive(nRows)

  def adaptive(nRows: Long): Int =
    math.max(MinBuckets.toLong, math.min(MaxBuckets.toLong,
      (math.max(nRows, 0L) + TargetRowsPerBucket - 1) / TargetRowsPerBucket)).toInt
}
