package graft

/** The ONE definition of the regime canaries (review finding: Bench and
  * the measurement probes each carried a copy, and a drifted buffer
  * size or aggregation would silently make their readings
  * non-comparable — the exact cross-artifact comparison the canaries
  * exist for). Both return the median of 3, or the -1.0 sentinel on
  * failure (a disk-full regime — exactly what the I/O canary probes —
  * must not abort the suite it is annotating).
  *
  * I/O: write 8 MiB + force() to a temp file on java.io.tmpdir — the
  * DISK-backed volume on this host, intentionally NOT Fs.ephemeralDir:
  * the canary probes the host's writeback regime, not the engine's
  * (now tmpfs-backed) scratch path. Quiet hosts read ~0.01-0.05 s; a
  * busy-writeback regime reads 10-100×.
  *
  * CPU: a fixed 20M-iteration FNV mixing loop (~15-40 ms nominal); a
  * contended/throttled host reads a multiple. The sink comparison
  * keeps JIT from eliding the loop. */
object Canary {
  def io(): Double = try {
    val buf = java.nio.ByteBuffer.allocate(1 << 23)
    val times = (1 to 3).map { _ =>
      val f = java.io.File.createTempFile("graft_canary_", ".bin")
      try {
        val t0 = System.nanoTime()
        val ch = java.nio.channels.FileChannel.open(f.toPath,
          java.nio.file.StandardOpenOption.WRITE)
        try { buf.rewind(); ch.write(buf); ch.force(true) }
        finally ch.close()
        (System.nanoTime() - t0) / 1e9
      } finally f.delete()
    }
    times.sorted.apply(1)
  } catch { case _: Throwable => -1.0 }

  def cpu(): Double = try {
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      var h = 1469598103934665603L
      var i = 0
      while (i < 20000000) { h = (h ^ i) * 1099511628211L; i += 1 }
      if (h == 42L) System.err.println("") // unreachable; defeats DCE
      (System.nanoTime() - t0) / 1e9
    }
    times.sorted.apply(1)
  } catch { case _: Throwable => -1.0 }
}
