package graft.tools

import graft.core._
import graft.fixtures.TranscriptGen

/** Single-thread allocation-per-turn probe (ThreadMXBean allocated bytes):
  * the scaling bottleneck on one box is memory-system pressure, so the
  * allocation diet is measured directly, per pipeline stage. */
object AllocProbe {
  def main(args: Array[String]): Unit = {
    val nConvs = if (args.nonEmpty) args(0).toInt else 3000
    val ctx = ModuleParser.defaultContext(TranscriptGen.allEntityIds)
    val turns = TranscriptGen.corpus(TranscriptGen.DefaultSeed, nConvs).toArray
    println(s"turns: ${turns.length}")

    val mx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    val tid = Thread.currentThread().getId

    def measure(label: String)(f: => Unit): Unit = {
      f // warm
      System.gc()
      val a0 = mx.getThreadAllocatedBytes(tid)
      val t0 = System.nanoTime()
      f
      val secs = (System.nanoTime() - t0) / 1e9
      val bytes = mx.getThreadAllocatedBytes(tid) - a0
      println(f"$label: ${bytes.toDouble / turns.length}%.0f B/turn, " +
        f"${turns.length / secs}%.0f turns/s (1 thread)")
    }

    val scratch = new Tokenizer.Scratch
    measure("extract (shared scratch)") {
      turns.foreach(t => Extractor.extract(t.conv_id, t.turn_idx, t.text, ctx, scratch))
    }
    measure("blockTreeInto (flat, hot path)") {
      turns.foreach(t => Blocker.blockTreeInto(t.text, scratch))
    }
    measure("blockTree (object form)") {
      turns.foreach(t => Blocker.blockTree(t.text, scratch))
    }
    measure("splitBlocks only") {
      turns.foreach(t => Blocker.splitBlocks(t.text, scratch))
    }
    // tokenize + parse over the content rows only
    val contentRows: Array[(String, Int, Int)] = turns.flatMap { t =>
      Blocker.blockTree(t.text, scratch).collect {
        case cb if cb.block.kind == BlockKind.Content =>
          cb.raw.lineBounds.map(lb =>
            (t.text, Blocker.lineStart(lb), Blocker.lineEnd(lb)))
      }.flatten
    }
    println(s"content rows: ${contentRows.length}")
    measure("tokenizeRow only") {
      contentRows.foreach { case (text, lo, hi) =>
        Tokenizer.tokenizeRow(text, lo, hi, lo, scratch)
      }
    }
    measure("tokenize+parse (Either API)") {
      contentRows.foreach { case (text, lo, hi) =>
        Tokenizer.tokenizeRow(text, lo, hi, lo, scratch)
          .foreach(s => ModuleParser.parseModule(s.ordinal, s.str, ctx))
      }
    }
    // decomposition of the hot path: where do the bytes go?
    measure("fillRow only (0-alloc tokenize)") {
      contentRows.foreach { case (text, lo, hi) =>
        Tokenizer.fillRow(text, lo, hi, lo, scratch)
      }
    }
    measure("fillRow + moduleStr (output strings only)") {
      contentRows.foreach { case (text, lo, hi) =>
        val rowLen = Tokenizer.fillRow(text, lo, hi, lo, scratch)
        val n = Tokenizer.moduleCount(rowLen)
        var m = 0
        while (m < n) { Tokenizer.moduleStr(scratch, m, rowLen); m += 1 }
      }
    }
    // volume calibration: modules / zones / failures per turn
    locally {
      var nMod = 0L; var nOk = 0L; var nFail = 0L; var nZones = 0L
      var zoneChars = 0L
      contentRows.foreach { case (text, lo, hi) =>
        val rowLen = Tokenizer.fillRow(text, lo, hi, lo, scratch)
        val n = Tokenizer.moduleCount(rowLen)
        var m = 0
        while (m < n) {
          val str = Tokenizer.moduleStr(scratch, m, rowLen)
          nMod += 1
          if (ModuleParser.parseModuleInto(m, str, ctx, scratch.parse)) {
            nOk += 1
            nZones += scratch.parse.zones.length
            scratch.parse.zones.foreach(z => if (z != null) zoneChars += z.length)
          } else nFail += 1
          m += 1
        }
      }
      println(f"volume: ${nMod.toDouble / turns.length}%.2f modules/turn, " +
        f"ok=${nOk.toDouble / turns.length}%.2f fail=${nFail.toDouble / turns.length}%.2f " +
        f"zones/turn=${nZones.toDouble / turns.length}%.2f zoneChars/turn=${zoneChars.toDouble / turns.length}%.1f")
    }
    // the REAL hot loop shape: fillRow + parseModuleInto, no wrappers
    measure("tokenize+parse (hot path)") {
      contentRows.foreach { case (text, lo, hi) =>
        val rowLen = Tokenizer.fillRow(text, lo, hi, lo, scratch)
        val n = Tokenizer.moduleCount(rowLen)
        var m = 0
        while (m < n) {
          val str = Tokenizer.moduleStr(scratch, m, rowLen)
          ModuleParser.parseModuleInto(m, str, ctx, scratch.parse)
          m += 1
        }
      }
    }
    // decomposition of the remaining extract cost
    measure("canonicalize only") {
      turns.foreach(t => Normalizer.canonicalize(t.text))
    }
    val headerStrs = turns.flatMap { t =>
      Blocker.blockTree(t.text, scratch).collect {
        case cb if cb.block.kind == BlockKind.Header => Blocker.headerText(cb)
      }
    }
    println(s"headers: ${headerStrs.length}")
    measure("header parse only") {
      headerStrs.foreach(EntityParser.parse)
    }
    measure("prose assembly only (flat tree)") {
      turns.foreach { t =>
        val nb = Blocker.blockTreeInto(t.text, scratch)
        var sb: java.lang.StringBuilder = null
        var bi = 0
        while (bi < nb) {
          if (scratch.bKind(bi) == Blocker.KindProse) {
            if (sb == null) sb = new java.lang.StringBuilder(
              scratch.bEnd(bi) - scratch.bStart(bi))
            else sb.append("\n\n")
            sb.append(t.text, scratch.bStart(bi), scratch.bEnd(bi))
          }
          bi += 1
        }
        if (sb != null) sb.toString
      }
    }
  }
}
