package graft.tools

import graft.core._
import graft.fixtures.TranscriptGen

/** Single-thread micro-profile of the per-turn pipeline stages. */
object MicroProbe {
  def main(args: Array[String]): Unit = {
    val nConvs = 2000
    val ctx = ModuleParser.defaultContext(TranscriptGen.allEntityIds)
    def time(label: String, reps: Int)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      var i = 0
      while (i < reps) { f; i += 1 }
      println(f"$label: ${(System.nanoTime() - t0) / 1e6 / reps}%.1f ms/rep")
    }
    // pre-generate
    val turns = TranscriptGen.corpus(TranscriptGen.DefaultSeed, nConvs).toArray
    println(s"turns: ${turns.length}")
    time("generate all", 3) {
      var c = 0L
      while (c < nConvs) { TranscriptGen.conversation(TranscriptGen.DefaultSeed, nConvs, c).foreach(t => ()); c += 1 }
    }
    time("extract all", 3) { turns.foreach(t => Extractor.extractTurn(t, ctx)) }
    time("blocker only", 3) { turns.foreach(t => Blocker.blockTree(t.text)) }
    time("blocker split only", 3) { turns.foreach(t => Blocker.splitBlocks(t.text)) }
    // tokenizer over content-ish lines
    val lines = turns.flatMap(t => t.text.split('\n')).filter(_.count(_ != ' ') >= 3)
    println(s"lines: ${lines.length}")
    time("tokenizer rowString+slice", 3) {
      lines.foreach { l => Tokenizer.sliceRow(Tokenizer.rowString(l, 0)) }
    }
    val mods = turns.flatMap { t =>
      Extractor.extractTurn(t, ctx).modules.map(_.module_str)
    }
    println(s"modules: ${mods.length}")
    time("moduleParser only", 3) { mods.foreach(m => ModuleParser.parseModule(0, m, ctx)) }
  }
}
