package graft

/** Shuffle/spill scratch location for the runner mains (Bench, Verify,
  * Profile, Plans).
  *
  * Default: the JVM tmpdir — the pre-r19 behavior, reinstated by the r20
  * A/B. r19 pointed this at `/dev/shm` on the theory that RAM-backed
  * tmpfs must beat a disk for re-creatable shuffle/spill bytes; the r20
  * measurement (two 3-sweep envelopes at `local[32]`, sf0.1, same session
  * design, min per query) says otherwise: min-composite 288.0 s on /tmp
  * vs 309.7 s on /dev/shm over the 297-query registry, with ~15 queries
  * 0.5-1.0 s faster on /tmp and only 3 marginally faster on shm. At 32
  * concurrent writer threads, tmpfs wins nothing (the disk path is
  * page-cache-buffered anyway — shuffle files this small never hit the
  * device before they are read back) and pays extra: tmpfs pages are
  * charged against the same memory the executor threads allocate from,
  * and every write contends on shmem accounting. The r19 verdict flagged
  * exactly this ("memory-backed scratch competing with 32 executor
  * threads is a classic local-mode trap") — confirmed.
  *
  * Parameterised, never hard-coded: `SPARK_GRAFT_LOCAL_DIR` overrides (a
  * cluster points it at its NVMe scratch array exactly like
  * `SPARK_LOCAL_DIRS`; a host whose measurements differ can point it back
  * at /dev/shm). */
object Scratch {
  def localDir: String = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR",
    System.getProperty("java.io.tmpdir"))
}
