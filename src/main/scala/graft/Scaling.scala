package graft

import java.nio.file.{Files, Paths}

/** North-rule scaling evidence (BASELINE.json: throughput scaling efficiency
  * ≥ 0.8 from N to 4N executors). No real cluster exists in this sandbox, so
  * per the driver protocol the same job runs at two parallelism levels on the
  * identical fixed corpus; efficiency = (throughput_4N / throughput_N) / 4.
  *
  * Each level runs in its OWN JVM pinned with `taskset -c` so the JVM (GC,
  * JIT, Spark local threads) sees exactly N cores — otherwise the N-core run
  * borrows the idle 3N cores for GC and inflates the baseline. Drive it:
  *
  *   taskset -c 0-7  sbt "runMain graft.ScalingRun 8  /tmp/s8.json  100000"
  *   taskset -c 0-31 sbt "runMain graft.ScalingRun 32 /tmp/s32.json 100000"
  *   sbt "runMain graft.ScalingReport /tmp/s8.json /tmp/s32.json"
  */
object ScalingRun {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val out = args(1)
    val nConvs = if (args.length > 2) args(2).toLong else 100000L
    val corpus = if (args.length > 3) args(3) else "/tmp/graft_scaling_corpus.parquet"
    val spark = Bench.session(cpus.toString)
    spark.sparkContext.setLogLevel("ERROR")
    try {
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(corpus, "_SUCCESS"))) {
        println(s"[scaling] materializing corpus ($nConvs convs) -> $corpus")
        graft.pipeline.ExtractPipeline.writeTranscripts(spark, nConvs, corpus, 256)
      }
      val w = Bench.extractionThroughputOn(spark, corpus) // warm-up
      println(s"[scaling] warmup: ${w._1} turns in ${w._2} s")
      val runs = (1 to 5).map { i =>
        val r = Bench.extractionThroughputOn(spark, corpus)
        println(s"[scaling] run $i (full): ${r._1} turns in ${r._2} s")
        r
      }
      val lightRuns = (1 to 5).map { i =>
        val r = Bench.extractionThroughputLightOn(spark, corpus)
        println(s"[scaling] run $i (light): ${r._1} turns in ${r._2} s")
        r
      }
      val turns = runs.head._1
      val best = runs.map(_._2).min
      val bestLight = lightRuns.map(_._2).min
      Files.writeString(Paths.get(out),
        s"""{"cpus":$cpus,"turns":$turns,"secs":$best,"secsLight":$bestLight}""")
      println(s"[scaling] cpus=$cpus turns=$turns best=$best s light=$bestLight s")
    } finally spark.stop()
  }
}

object ScalingReport {
  private val Num = """"(\w+)":([0-9.]+)""".r
  private def parse(path: String): Map[String, Double] =
    Num.findAllMatchIn(Files.readString(Paths.get(path)))
      .map(m => m.group(1) -> m.group(2).toDouble).toMap

  def main(args: Array[String]): Unit = {
    val lo = parse(args(0))
    val hi = parse(args(1))
    require(lo("turns") == hi("turns"), "corpus must be identical at both levels")
    val turns = lo("turns").toLong
    val (cLo, cHi) = (lo("cpus").toInt, hi("cpus").toInt)
    val (tLo, tHi) = (turns / lo("secs"), turns / hi("secs"))
    val efficiency = (tHi / tLo) / (cHi.toDouble / cLo)
    val (tLoL, tHiL) = (turns / lo("secsLight"), turns / hi("secsLight"))
    val efficiencyLight = (tHiL / tLoL) / (cHi.toDouble / cLo)

    val md =
      f"""# BENCH/BASELINE — measured scaling evidence
         |
         |North rule: throughput scaling efficiency >= 0.8 from N to 4N
         |executors. Sandbox protocol (no real cluster): the same extraction
         |job on the identical fixed corpus ($turns turns incl. one
         |mega-conversation), each parallelism level in its own JVM pinned to
         |exactly that many physical cores via `taskset -c`.
         |
         || config | turns | wall (s) full | turns/sec full | wall (s) compute | turns/sec compute |
         ||---|---|---|---|---|---|
         || local[$cLo], $cLo cores  | $turns | ${lo("secs")}%.2f | $tLo%.0f | ${lo("secsLight")}%.2f | $tLoL%.0f |
         || local[$cHi], $cHi cores | $turns | ${hi("secs")}%.2f | $tHi%.0f | ${hi("secsLight")}%.2f | $tHiL%.0f |
         |
         |**Scaling efficiency (N=$cLo → 4N=$cHi)**:
         |full pipeline (scan → extract → materialize every module row):
         |$efficiency%.3f; compute-bound (scan → extract → per-partition
         |reduce): $efficiencyLight%.3f (target ≥ 0.8)
         |
         |Notes:
         |- The measured job = deterministic transcript generation (the scan
         |  stand-in) + full per-turn extraction + module count; shuffle-free,
         |  so scaling is bounded by split balance and memory bandwidth.
         |- Mega-conversation generation is chunk-interleaved across tasks
         |  (ExtractPipeline.transcripts), so no single task carries a whole
         |  skewed conversation.
         |""".stripMargin

    Files.createDirectories(Paths.get("BENCH"))
    Files.writeString(Paths.get("BENCH/BASELINE.md"), md)
    println(md)
  }
}
