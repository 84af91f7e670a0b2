package graft.queries

/** Lifecycle for the harness's tmpdir layouts (bucketed tables, keeper
  * stores, partitioned fact copies, oracle dumps).
  *
  * Every reusable layout is keyed by the owning JVM's pid (see
  * [[QuerySpec.jvmScopedKey]]) so concurrent Bench/Verify JVMs never race —
  * but that scheme leaks: each JVM writes fresh `graft_*_<pid>` dirs and
  * nothing ever removed them (ADVICE round 5), so tmpdir grew without bound
  * across sessions. Two mechanisms close the leak:
  *
  *   1. a JVM shutdown hook deletes every dir registered through [[scoped]]
  *      when this JVM exits normally;
  *   2. the first [[scoped]] call sweeps `graft_*` dirs whose trailing
  *      `_<pid>` names a process that no longer exists — covering JVMs that
  *      crashed before their hook ran (and `nanoTime`-keyed leftovers from
  *      older rounds, which parse as absurd pids and are equally dead).
  *
  * Dirs without a numeric suffix (the shared `graft_pcap_v2` corpus, which
  * is byte-complete-checked and deliberately reused across JVMs) are never
  * touched by the sweep.
  */
object TmpDirs {
  private val root = new java.io.File(sys.props("java.io.tmpdir"))
  private val selfPid = ProcessHandle.current().pid()
  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val installed = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** The dir `name` under java.io.tmpdir, registered for deletion at JVM
    * exit. Callers create/write it as before; only the lifecycle is
    * centralized here. */
  def scoped(name: String): java.io.File = {
    ensureHook()
    val dir = new java.io.File(root, name)
    registered.add(dir.getAbsolutePath)
    dir
  }

  /** A pid-keyed dir that must OUTLIVE this JVM: oracle dumps are read by
    * the driver's DuckDB pass after the Verify JVM has exited, so they
    * cannot ride the shutdown hook. They are reclaimed instead by the
    * dead-pid sweep of whichever graft JVM starts next (by then the
    * driver's compare has long finished). */
  def persistent(name: String): java.io.File = {
    ensureHook()
    new java.io.File(root, name)
  }

  private def ensureHook(): Unit =
    if (installed.compareAndSet(false, true)) {
      sweepStale()
      Runtime.getRuntime.addShutdownHook(new Thread(
        () => registered.forEach(p => deleteRec(new java.io.File(p))),
        "graft-tmpdir-cleanup"))
    }

  private def deleteRec(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRec)
    f.delete(): Unit
  }

  /** Dead-pid dirs younger than this are left alone: a persistent oracle
    * dump (graft_pcap_dump_*, graft_mldump_*, …) is read by the driver's
    * DuckDB pass AFTER its producing JVM exits, so a second graft JVM
    * launching in that window would otherwise reclaim it before the
    * compare runs (round-6 ADVICE). One hour comfortably outlives any
    * verify→compare gap while still reclaiming prior sessions' leaks. */
  private val SweepMinAgeMs = 60L * 60 * 1000

  private def sweepStale(): Unit = {
    val kids = root.listFiles()
    if (kids == null) return
    val now = System.currentTimeMillis()
    kids.foreach { f =>
      val n = f.getName
      if (f.isDirectory && n.startsWith("graft_") &&
          now - f.lastModified() > SweepMinAgeMs) {
        n.substring(n.lastIndexOf('_') + 1).toLongOption.foreach { pid =>
          val h = ProcessHandle.of(pid)
          val alive = pid == selfPid || (h.isPresent && h.get().isAlive)
          if (!alive) deleteRec(f)
        }
      }
    }
  }
}
