package graft.tools

import graft.core._
import graft.fixtures.TranscriptGen

/** Canonical serialization of an extraction result set — the golden-fixture
  * format (FIXTURES.md §3). One line per module / entity / error / clean turn,
  * sorted by the total key order, newline-escaped: byte-identical across
  * runs and parallelism levels iff the extraction is deterministic. */
object Golden {

  val GoldenConvs = 8

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\n", "\\n").replace("|", "\\p")

  def serialize(exs: Seq[(Turn, TurnExtraction)]): String = {
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    exs.foreach { case (_, ex) =>
      ex.modules.foreach { m =>
        lines += List("M", m.conv_id, m.turn_idx, m.block_ordinal, m.row_ordinal,
          m.module_ordinal, m.module_type,
          m.zones.map(esc).mkString(","), esc(m.module_str),
          m.span_start, m.span_end).mkString("|")
      }
      ex.entities.foreach { e =>
        lines += List("E", e.num_id, e.text_id, esc(e.name), e.kind, esc(e.info)).mkString("|")
      }
      ex.errors.foreach { e =>
        lines += List("X", e.conv_id, e.turn_idx, e.block_ordinal, e.row_ordinal,
          e.module_ordinal, e.code, e.zone_catalog, esc(e.zone_str), esc(e.raw)).mkString("|")
      }
      val c = ex.clean
      if (c.clean_text.nonEmpty) {
        lines += List("C", c.conv_id, c.turn_idx, esc(c.clean_text),
          c.spans.map(s => s"${s.start}:${s.end}").mkString(","),
          c.n_blocks_total, c.n_blocks_kept).mkString("|")
      }
    }
    lines.sorted.mkString("\n") + "\n"
  }

  /** The fixed golden corpus: driver-side single-threaded extraction — the
    * differential oracle (SURVEY §5.2). */
  def goldenCorpus(): Seq[(Turn, TurnExtraction)] = {
    val ctx = ModuleParser.defaultContext(TranscriptGen.allEntityIds)
    TranscriptGen.corpus(TranscriptGen.DefaultSeed, GoldenConvs)
      .map(t => (t, Extractor.extractTurn(t, ctx)))
  }
}

/** One-shot generator: writes the committed golden file. */
object GenGolden {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "src/test/resources/golden_extract.txt"
    val content = Golden.serialize(Golden.goldenCorpus())
    val p = java.nio.file.Paths.get(out)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, content)
    println(s"wrote ${content.linesIterator.size} lines to $out")
  }
}
