package graft

import java.nio.file.{Files, Path, Paths}

/** The environmental probes behind the bench's `comparable` stamp and
  * DrainGate's adjudication (r19: factored out of `Bench` so the gate
  * can adjudicate an over-budget drain with the same instruments the
  * graded artifact stamps — r18's judge-side gate flip on
  * q_stream_join needed manual archaeology precisely because the gate
  * carried no probes).
  *
  * Four instruments, each an absolute yardstick (identical work every
  * invocation, so its time moves only with the host condition it
  * watches), each with a committed nominal and a discard line:
  *
  *  - [[calib]] — single-thread spin kernel (450M xorshift64* mix
  *    iterations, ~0.96 s nominal). Moves with effective SINGLE-core
  *    throughput: catches whole-host throttling / cgroup caps.
  *  - [[calibPar]] — the r19 parallel sibling (r18 verdict #4): N =
  *    availableProcessors threads, the SAME 450M-iteration kernel
  *    each, timed as one join. On an idle host every thread gets a
  *    hardware thread and the wall time tracks the single-thread
  *    nominal; under partial CPU co-load the threads contend for the
  *    remaining cores and the wall time inflates by ~N/(N-used) —
  *    the contention class that cost 32-way Spark stages ~35% in
  *    BENCH_r18 while the single-thread probe read 0.84-0.88 s
  *    (nominal): one spin thread always finds a free core; 32 cannot.
  *  - [[io]] — 32 x 256 KiB write+fsync on the stream-checkpoint
  *    volume (~ms on tmpfs, 0.1-0.3 s idle disk): drain-side I/O
  *    contention (the r15 bimodality class).
  *  - [[data]] — 256 x 1 MiB O_DIRECT reads scattered across the
  *    LARGEST parquets of the sf dir (page-cache-bypassing): foreign
  *    I/O on the data device (the r16 blind spot). r19 (r18 ADVICE):
  *    reads rotate across the top-8 files AND across each file's
  *    aligned blocks — the old single-file form re-read one ~1 MiB
  *    region 256 times at small sfs, which host-side virtio caching
  *    can serve without touching the device.
  *
  * Thresholds live here as the single source of truth for Bench,
  * DrainGate, and StampReplay. Nominals are recorded in docs/SCALE.md.
  */
object Probes {
  /** Single-thread spin: > 1.25 s (1.3x the 0.96 s nominal) means
    * whole-host throttling — docs/SCALE.md r12 record. */
  val CalibLine = 1.25
  /** Parallel spin: measured min-of-2 nominal 0.98-1.16 s on the
    * reference host (32 physical cores, no SMT — all threads run at
    * the single-thread rate when the machine is idle). Line = 1.3x
    * the measured 1.16 s ceiling, same convention as calib — r19
    * measurement in docs/SCALE.md. A 16-thread foreign spin inflates
    * this to ~2x while leaving single-thread calib at nominal. */
  val CalibParLine = 1.5
  /** Stream-volume write+fsync: > 0.5 s = contended checkpoint
    * volume (tmpfs ~ms, idle disk 0.1-0.3 s). */
  val IoLine = 0.5
  /** Data-volume O_DIRECT read: > 0.5 s = foreign I/O on the data
    * device (idle 0.13-0.2 s measured r16-r19). */
  val DataLine = 0.5

  def loadavg(): Double =
    try Files.readString(Paths.get("/proc/loadavg")).split("\\s+")(0).toDouble
    catch { case _: Exception => -1.0 }

  /** Poll loadavg until it decays under `line` (bounded) — the
    * self-heal that keeps back-to-back JVMs' EWMA decay out of the
    * measurement window. Returns the seconds waited. */
  def quietWait(maxS: Int = 300, line: Double = 1.2): Double = {
    val t0 = System.nanoTime()
    while (loadavg() > line && (System.nanoTime() - t0) / 1e9 < maxS)
      Thread.sleep(5000)
    (System.nanoTime() - t0) / 1e9
  }

  // sink defeats dead-code elimination of the spin kernels
  private val sink = new java.util.concurrent.atomic.AtomicLong()

  private def spin(n: Long): Long = {
    var x = 0x9E3779B97F4A7C15L; var acc = 0L; var i = 0L
    while (i < n) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; acc += x; i += 1 }
    acc
  }

  def calib(): Double = {
    sink.addAndGet(spin(25000000L)) // JIT warm, untimed
    val t0 = System.nanoTime()
    sink.addAndGet(spin(450000000L)) // published: not eliminable
    (System.nanoTime() - t0) / 1e9
  }

  def calibPar(): Double = {
    val n = Runtime.getRuntime.availableProcessors()
    def spinAll(iters: Long): Unit = {
      val ts = (0 until n).map { _ =>
        val t = new Thread(() => { sink.addAndGet(spin(iters)); () })
        t.setDaemon(true); t.start(); t
      }
      ts.foreach(_.join())
    }
    spinAll(25000000L) // JIT + thread-start warm, untimed
    def onePass(): Double = {
      val t0 = System.nanoTime()
      spinAll(450000000L) // fixed work PER THREAD — wall time inflates
      // with core contention, not with thread count
      (System.nanoTime() - t0) / 1e9
    }
    // min-of-2: with one thread per hardware thread the wall time
    // rides on SMT pairing / scheduler placement luck (single-pass
    // spread 1.5-2.1 s measured idle on the reference host); a
    // transient bad placement hits one pass, a real CPU co-load slows
    // both — the same estimator logic as the graded min-of-2
    math.min(onePass(), onePass())
  }

  /** Fixed write+force pattern on `dir` (the stream-tmp volume).
    * Best-effort: an unwritable volume stamps -1 (unknown). */
  def io(dir: String): Double =
    try {
      val f = Files.createTempFile(Paths.get(dir), "graft_ioprobe_", ".bin")
      val buf = java.nio.ByteBuffer.allocate(262144)
      while (buf.hasRemaining) buf.put((buf.position() * 31 + 7).toByte)
      val ch = java.nio.channels.FileChannel.open(f,
        java.nio.file.StandardOpenOption.WRITE)
      val t0 = System.nanoTime()
      try {
        var i = 0
        while (i < 32) { buf.rewind(); ch.write(buf); ch.force(false); i += 1 }
      } finally ch.close()
      val dt = (System.nanoTime() - t0) / 1e9
      Files.deleteIfExists(f)
      dt
    } catch { case _: Exception => -1.0 }

  /** The data probe's scatter set: the (up to 8) parquets of the sf
    * dir that hold at least one full 1 MiB chunk — full-chunk reads
    * keep the probe bandwidth-dominated (256 tiny latency-bound reads
    * measured 0.34-0.38 s idle at sf0.1, eating the 0.5 s line's
    * margin). Only when NO file reaches 1 MiB (sf0.01's largest is
    * just under) fall back to the top-8 by size and rotate across
    * their aligned blocks. Size-desc, name tiebreak, for determinism. */
  def dataTargets(sfDir: String): Seq[Path] =
    try {
      val s = Files.list(Paths.get(sfDir))
      try {
        import scala.jdk.CollectionConverters._
        val bySize = s.iterator().asScala
          .filter(_.toString.endsWith(".parquet"))
          .toSeq.sortBy(p => (-Files.size(p), p.getFileName.toString))
        val big = bySize.filter(Files.size(_) >= 1048576)
        (if (big.nonEmpty) big else bySize).take(8)
      } finally s.close()
    } catch { case _: Exception => Seq.empty }

  /** 256 x 1 MiB O_DIRECT reads rotated across `targets` (round-
    * robin) and across each file's 4 KiB-aligned blocks, so repeated
    * invocations touch distinct device blocks even when every file is
    * under 1 MiB (r18 ADVICE: the single-file small-sf path re-read
    * one region, which host-side caching can serve). O_DIRECT demands
    * BOTH the position and the REQUEST length block-aligned — always
    * request the aligned full chunk (a request crossing EOF legally
    * returns the short tail) and stop once pos reaches EOF: a read at
    * the unaligned post-tail position is EINVAL, not EOF (the r18
    * small-file trap). Best-effort: no O_DIRECT support or no
    * readable target stamps -1 (unknown). */
  def data(targets: Seq[Path]): Double = {
    if (targets.isEmpty) return -1.0
    try {
      val chunk = 1048576
      val buf = java.nio.ByteBuffer.allocateDirect(chunk + 8192)
        .alignedSlice(4096)
      val opened = targets.map { t =>
        (java.nio.channels.FileChannel.open(t,
          java.nio.file.StandardOpenOption.READ,
          com.sun.nio.file.ExtendedOpenOption.DIRECT), Files.size(t))
      }
      def onePass(): Double = {
        val t0 = System.nanoTime()
        var i = 0L
        while (i < 256) {
          val (ch, size) = opened((i % opened.size).toInt)
          val k = i / opened.size // per-file iteration counter
          val maxOff = math.max(0L, size - chunk)
          val off =
            if (maxOff > 0) ((k * 2654435761L) % maxOff) & ~4095L
            else {
              // small file: rotate across its aligned blocks (stride 7
              // is coprime to most block counts — non-sequential walk)
              val blocks = math.max(1L, (size & ~4095L) / 4096)
              ((k * 7) % blocks) * 4096
            }
          buf.clear(); buf.limit(chunk)
          var pos = off
          while (buf.hasRemaining && pos < size) {
            val n = ch.read(buf, pos)
            if (n < 0) buf.limit(buf.position()) else pos += n
          }
          i += 1
        }
        (System.nanoTime() - t0) / 1e9
      }
      // min-of-2: the first-ever touch of these blocks on a freshly
      // booted host pays real device latency that has nothing to do
      // with co-load (measured 1.16 s cold vs 0.34 s warm at sf0.1);
      // a foreign writer owning the device slows BOTH passes (the
      // r16 dd measurement: >1 s sustained under 4 writers)
      val dt = try math.min(onePass(), onePass())
               finally opened.foreach(_._1.close())
      dt
    } catch { case _: Exception => -1.0 }
  }
}
