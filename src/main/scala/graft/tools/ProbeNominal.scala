package graft.tools

/** Dev diagnostic: measure the [[graft.Probes]] nominals on this host
  * (3 reps each, idle machine expected) — the numbers behind the
  * committed lines in `Probes` and docs/SCALE.md. Run after a
  * quiet-wait; a busy host prints inflated values by design. */
object ProbeNominal {
  def main(args: Array[String]): Unit = {
    val sfDirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/root/testdata/sf0.01")
    val streamTmp =
      if (java.nio.file.Files.isWritable(java.nio.file.Paths.get("/dev/shm")))
        "/dev/shm" else System.getProperty("java.io.tmpdir")
    printf("quiet_wait_s=%.1f loadavg=%.2f cpus=%d%n",
      graft.Probes.quietWait(), graft.Probes.loadavg(),
      Runtime.getRuntime.availableProcessors())
    for (i <- 1 to 3) {
      printf("rep %d: calib=%.3f calib_par=%.3f io(%s)=%.3f%n",
        i, graft.Probes.calib(), graft.Probes.calibPar(), streamTmp,
        graft.Probes.io(streamTmp))
      sfDirs.foreach { sf =>
        printf("  data(%s, %d targets)=%.3f%n", sf,
          graft.Probes.dataTargets(sf).size,
          graft.Probes.data(graft.Probes.dataTargets(sf)))
      }
    }
  }
}
