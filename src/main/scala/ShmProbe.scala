import org.apache.spark.sql.SparkSession
object ShmProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val s = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft/spark-local")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.Dedup.pipeline(s, graft.sources.TranscriptGen.df(s, 5000L), graft.DedupConfig()).count()
    val t0 = System.nanoTime()
    graft.Dedup.pipeline(s, s.read.parquet("/dev/shm/graft/graft-bench-transcripts-300000"), graft.DedupConfig()).count()
    println(f"SHM_PIPE_SEC=${(System.nanoTime()-t0)/1e9}%.3f cores=$cores")
    s.stop()
  }
}
