package graft.tools

import graft.core._
import graft.fixtures.TranscriptGen

/** Raw-thread scaling probe: gen+extract with plain Java threads, no Spark —
  * isolates JVM/code contention from Spark-layer effects. */
object ThreadProbe {
  def main(args: Array[String]): Unit = {
    val nThreads = args(0).toInt
    val nConvs = if (args.length > 1) args(1).toLong else 20000L
    val ctx = ModuleParser.defaultContext(TranscriptGen.allEntityIds)

    def runOnce(): (Long, Double) = {
      val counter = new java.util.concurrent.atomic.AtomicLong()
      val turnCount = new java.util.concurrent.atomic.AtomicLong()
      val t0 = System.nanoTime()
      val threads = (0 until nThreads).map { t =>
        new Thread(() => {
          var c = t.toLong
          var local = 0L
          var turns = 0L
          val scratch = new Tokenizer.Scratch // one per thread
          while (c < nConvs) {
            val n = TranscriptGen.turnsPerConv(nConvs, c)
            var i = 0
            while (i < n) {
              val turn = TranscriptGen.turn(TranscriptGen.DefaultSeed, nConvs, c, i)
              local += Extractor.extract(turn.conv_id, turn.turn_idx, turn.text,
                ctx, scratch).modules.size
              turns += 1
              i += 1
            }
            c += nThreads
          }
          counter.addAndGet(local); turnCount.addAndGet(turns)
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      (turnCount.get, (System.nanoTime() - t0) / 1e9)
    }
    runOnce() // warmup
    val runs = (1 to 5).map(_ => runOnce())
    val turns = runs.head._1
    val secs = runs.map(_._2).min // min-of-5: robust to CPU-steal episodes
    println(f"threads=$nThreads turns=$turns secs=$secs%.2f tput=${turns / secs}%.0f turns/s")
  }
}
