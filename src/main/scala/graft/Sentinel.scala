package graft

/** Environment-health probes shared by Bench and Verify (VERDICT r4
  * items 3/6): fixed workloads whose cost is a machine constant on a
  * quiet box, so any inflation in an artifact self-identifies as
  * external contention rather than a code regression.
  *
  *  - [[spinSeconds]]: 400M dependent multiply-adds on ONE thread
  *    (~0.5 s quiet) — CPU contention probe.
  *  - [[diskSeconds]]: write 128 MB in 1 MB chunks + fsync + read-back
  *    on the temp filesystem the stage artifacts / checkpoints use —
  *    I/O probe. r4's bench showed a 16× dedup-stage-build blow-up with
  *    a CLEAN cpu sentinel; only an I/O probe can tell that story.
  */
object Sentinel {

  private def spin(iters: Long): Long = {
    var x = 0x9E3779B97F4A7C15L; var i = 0L
    while (i < iters) { x = x * 6364136223846793005L + 1442695040888963407L; i += 1 }
    x
  }

  def spinSeconds(): Double = {
    val warm = spin(10L * 1000 * 1000)
    val t0 = System.nanoTime()
    val sink = spin(400L * 1000 * 1000)
    val dt = (System.nanoTime() - t0) / 1e9
    if (warm == 42L || sink == 42L) println("") // defeat DCE
    dt
  }

  def diskSeconds(mb: Int = 128): Double = {
    import java.nio.channels.FileChannel
    import java.nio.file.StandardOpenOption._
    val path = java.nio.file.Files.createTempFile("graft_disk_probe_", ".bin")
    val buf = new Array[Byte](1 << 20)
    var i = 0
    while (i < buf.length) { buf(i) = (i * 31 + 7).toByte; i += 1 }
    val t0 = System.nanoTime()
    val wch = FileChannel.open(path, WRITE, TRUNCATE_EXISTING)
    try {
      var k = 0
      while (k < mb) { wch.write(java.nio.ByteBuffer.wrap(buf)); k += 1 }
      wch.force(true) // fsync — the part that feels a saturated device
    } finally wch.close()
    val rch = FileChannel.open(path, READ)
    try {
      val rbuf = java.nio.ByteBuffer.allocate(1 << 20)
      var n = rch.read(rbuf)
      while (n >= 0) { rbuf.clear(); n = rch.read(rbuf) }
    } finally rch.close()
    val dt = (System.nanoTime() - t0) / 1e9
    java.nio.file.Files.deleteIfExists(path)
    dt
  }
}
