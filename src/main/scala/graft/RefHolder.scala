package graft

/** Dev-tool scratch slot so timing blocks can expose a DataFrame without
  * re-evaluating it (see graft.tools.ScaleProbe / Bench phases mode).
  */
object RefHolder { var df: org.apache.spark.sql.DataFrame = _ }
