package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: dump a single `SparkEntry.queries` entry + its oracle SQL
  * for targeted local validation (`runMain graft.tools.DumpOne <name> <sfDir> <outDir>`).
  */
object DumpOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, out) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(name)(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$out/$name")
    graft.SparkEntry.oracleSql.get(name).foreach(sql =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$out/oracle.sql"), sql))
    spark.stop()
  }
}
