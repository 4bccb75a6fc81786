package graft

/** Shuffle/spill scratch location for the runner mains (Bench, Verify,
  * Profile, Plans).
  *
  * Everything under `spark.local.dir` is RE-CREATABLE BY CONSTRUCTION —
  * shuffle map output is recomputed from lineage on loss, spill files die
  * with the task — so the right medium is the fastest ephemeral one the
  * host offers, not the durable root volume (optimization guide §2.1: most
  * of a shuffle's wall cost is the downstream fetch/IO path; §9 assumes
  * "fast local disks"). On hosts with a usable tmpfs (`/dev/shm`) that is
  * measured worth ~20-30 % on the iteration-heavy graph/PCA families at
  * bench scale, where per-round node-sized shuffles pay file open/mmap
  * syscalls out of proportion to their bytes.
  *
  * Parameterised, never hard-coded: `SPARK_GRAFT_LOCAL_DIR` overrides
  * (a cluster points it at its NVMe scratch array exactly like
  * `SPARK_LOCAL_DIRS`); hosts without a writable /dev/shm fall back to the
  * JVM tmpdir, which is the previous behavior. */
object Scratch {
  def localDir: String = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) {
      val d = new java.io.File(shm, "spark-graft-local")
      d.mkdirs()
      d.getAbsolutePath
    } else System.getProperty("java.io.tmpdir")
  })
}
