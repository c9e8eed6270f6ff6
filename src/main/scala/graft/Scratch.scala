package graft

import java.nio.file.{Files, Path, Paths}

/** Scratch space for TRANSIENT-BY-CONTRACT artifacts: staged stream
  * source dirs, per-query temp checkpoints, per-batch partial dirs,
  * JVM-lifetime stream stores. None of these survives the JVM by
  * design (the durable stores live in [[StoreCatalog]]; replay specs
  * pass their own explicit checkpointLocation), so they belong on the
  * fastest non-durable storage the platform has — this box's /tmp is
  * disk-backed ext4, and the offset-log/commit fsyncs alone put a
  * measured ~100 ms/micro-batch floor under every streaming twin
  * (StreamFloorProbe, r13). tmpfs when present, java.io.tmpdir
  * otherwise; `SPARK_GRAFT_SCRATCH_DIR` overrides for deployments
  * (a production stream points its checkpoints at durable storage
  * EXPLICITLY — that contract is untouched, this is only the default
  * for artifacts that were already temp). The root is deleted on JVM
  * exit. */
object Scratch {
  lazy val root: Path = {
    val base = sys.env.get("SPARK_GRAFT_SCRATCH_DIR")
      .map(Paths.get(_))
      .orElse {
        val shm = Paths.get("/dev/shm")
        if (Files.isDirectory(shm) && Files.isWritable(shm)) Some(shm)
        else None
      }
      .getOrElse(Paths.get(System.getProperty("java.io.tmpdir")))
    val dir = Files.createTempDirectory(base, "graft_scratch_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(dir)))
    dir
  }

  /** A fresh scratch directory under [[root]]. */
  def dir(prefix: String): Path = Files.createTempDirectory(root, prefix)

  private def deleteRec(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).forEach(c => deleteRec(c))
    try Files.deleteIfExists(p) catch { case _: Exception => () }
  }
}
