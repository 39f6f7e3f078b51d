package graft.tools

/** Scratch micro-benchmark isolating the 32-thread scaling of
  * MessageDigest.getInstance-per-call (what Catalyst's `md5` does via
  * commons-codec) vs a thread-local digest. Explains/validates the
  * suite-wide c32 contention finding. Usage: runMain graft.tools.Md5Bench
  */
object Md5Bench {
  def main(args: Array[String]): Unit = {
    val iters = 200000
    val payload = "Customer#000012345 some text".getBytes("UTF-8")
    def run(threads: Int, perCall: Boolean): Double = {
      val tl = ThreadLocal.withInitial[java.security.MessageDigest](
        () => java.security.MessageDigest.getInstance("MD5"))
      val t0 = System.nanoTime()
      val ts = (1 to threads).map { _ =>
        new Thread(() => {
          var i = 0
          var acc = 0
          while (i < iters) {
            val d =
              if (perCall) java.security.MessageDigest.getInstance("MD5")
              else { val x = tl.get(); x.reset(); x }
            acc += d.digest(payload)(0)
            i += 1
          }
          if (acc == 42) println("")
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    for (perCall <- Seq(true, false); threads <- Seq(1, 8, 32)) {
      val s = run(threads, perCall)
      println(f"perCall=$perCall%-5s threads=$threads%2d  ${s}%6.2f s  " +
        f"(${iters * threads / s / 1e6}%.1f M digests/s)")
    }
  }
}
