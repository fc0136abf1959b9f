package graft.tools

/** Memory-bandwidth scaling control: N threads each stream-copy + sum a
  * private buffer far larger than LLC. No allocation in the loop, no shared
  * data — the ONLY shared resource is the memory controller. The 2→8-core
  * efficiency of this probe is the single-box bandwidth ceiling; extraction
  * sits between this and the pure-CPU control (0.93), bounding how much of
  * the extraction gap is the box's memory system rather than the engine. */
object MemBandwidthProbe {
  def main(args: Array[String]): Unit = {
    val nThreads = args(0).toInt
    val mb = if (args.length > 1) args(1).toInt else 256
    val passes = if (args.length > 2) args(2).toInt else 8

    def runOnce(): Double = {
      val barrier = new java.util.concurrent.CyclicBarrier(nThreads + 1)
      val threads = (0 until nThreads).map { _ =>
        new Thread(() => {
          val n = mb * 1024 * 128 // longs
          val src = new Array[Long](n)
          val dst = new Array[Long](n)
          var i = 0
          while (i < n) { src(i) = i; i += 1 }
          barrier.await()
          var p = 0
          var sink = 0L
          while (p < passes) {
            System.arraycopy(src, 0, dst, 0, n)
            var j = 0
            while (j < n) { sink += dst(j); j += 8 } // touch every cache line
            p += 1
          }
          if (sink == 42) println("") // keep sink alive
          barrier.await()
        })
      }
      threads.foreach(_.start())
      barrier.await() // all buffers initialized
      val t0 = System.nanoTime()
      barrier.await() // all passes done
      threads.foreach(_.join())
      val secs = (System.nanoTime() - t0) / 1e9
      // bytes moved per pass: read src + write dst + read dst = 3 * buffer
      nThreads.toDouble * passes * 3 * mb / 1024.0 / secs // GB/s
    }

    runOnce() // warm
    val best = (1 to 3).map(_ => runOnce()).max
    println(f"threads=$nThreads aggregate=${best}%.1f GB/s")
  }
}
