package graft.tools

/** State-partition sizing probe for the streaming interval-join leg:
  * every shuffle partition of a stateful query is a state-store instance
  * paying per-micro-batch checkpoint + maintenance cost, so partition
  * count — locked at query start — is the first-order knob. Measured
  * (sf0.1 events, 4 micro-batches): 8 partitions ~10-14 s, 32 ~35 s,
  * 64 ~44 s. Run: java ... graft.tools.StreamLegProbe <partitions> */
object StreamLegProbe {
  def main(args: Array[String]): Unit = {
    val parts = args(0)
    val spark = graft.Bench.session("32")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    val t = graft.Bench.streamingIntervalJoinLeg(spark, "/root/testdata/sf0.1")
    println(f"parts=$parts secs=$t%.2f")
    val t2 = graft.Bench.streamingIntervalJoinLeg(spark, "/root/testdata/sf0.1")
    println(f"parts=$parts secs2=$t2%.2f")
    spark.stop()
  }
}
