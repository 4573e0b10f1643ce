package graft

import graft.sources.TranscriptGen
import org.apache.spark.sql.SparkSession

/** Benchmark harness. Prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...,
  *  "flagship_runs":[...], "turns_per_sec":..., "scaling":{"n":2,"t_n_sec":...,"t_4n_sec":...,
  *  "efficiency":..., "control":{...}, "weak":{...}, "phases":{...}}}
  *
  * The scaling section evidences the north rule's two-cluster-size
  * criterion in this sandbox two ways, both recorded in one artifact:
  *   - STRONG (headline): the same flagship pipeline on the same
  *     deterministic input at local[N] vs local[4N] (stand-in for N vs 4N
  *     executors), efficiency = T_N / (4 · T_4N);
  *   - WEAK (`scaling.weak`): N cores on D convs vs 4N cores on 4D convs —
  *     the Gustafson shape a growing cluster actually runs (data scales
  *     with executors, per-executor partition sizes constant),
  *     efficiency = T_N(D) / T_4N(4D).
  * The 1→4 control pair and the per-width phase breakdowns are recorded in
  * the same artifact so the headline number is attributable without
  * external notes.
  *
  * Memory protocol (the round-3 bench was OOM-killed with zero recorded
  * numbers; everything below exists so that cannot recur):
  *   - scratch (tmpfs) is wiped at startup — stale corpora are resident RAM;
  *   - the OUTER JVM heap is capped at 24g and lazily committed
  *     (build.sbt); child JVMs pre-touch their fixed 3g/core heaps but
  *     run one at a time, largest committing 24g;
  *   - a pre-flight MemAvailable check degrades (smaller scaling corpus)
  *     instead of dying;
  *   - scaling corpora are deleted as soon as their phase completes.
  */
object Bench {

  /** tmpfs scratch when available: shuffle files and the bench input live
    * in RAM, standing in for cluster-local NVMe — this sandbox's virtual
    * disk has multi-second latency swings that would otherwise dominate
    * the measurement. Overridable via SPARK_GRAFT_SCRATCH (and passed to
    * child JVMs) for hosts without tmpfs headroom.
    */
  private val scratchRoot: String = sys.env.getOrElse("SPARK_GRAFT_SCRATCH",
    if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm"))) "/dev/shm/graft-bench"
    else "/tmp/graft-bench")

  private def deleteRecursively(path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
      finally walk.close() // the stream holds directory handles until closed
    }
  }

  /** Host MemAvailable in GiB (what the OOM killer actually cares about —
    * includes reclaimable page cache, excludes tmpfs-resident pages).
    */
  private def memAvailableGb: Long = {
    try {
      val line = java.nio.file.Files.readAllLines(java.nio.file.Paths.get("/proc/meminfo"))
        .stream().filter(_.startsWith("MemAvailable:")).findFirst()
      if (line.isPresent) line.get.replaceAll("[^0-9]", "").toLong / (1024L * 1024L) else Long.MaxValue
    } catch { case _: Exception => Long.MaxValue }
  }

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      // 4 shuffle partitions per core: band buckets and conv groups are
      // skewed, and at exactly 1 partition/core one hot partition idles the
      // rest of the width for its whole tail (AQE coalesces small ones back)
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      // assembly's collect_list is an ObjectHashAggregate; the default
      // sort-based fallback kicks in at 128 keys/partition, turning the
      // whole turn shuffle into a sort. The measured bound: 600k convs /
      // (4 partitions/core × 2 cores) ≈ 75k groups per partition at the
      // narrowest width — 1M clears that 13× while still capping how many
      // buffering groups a pathological input could pin in memory (the
      // round-3 setting of 10M was one of the OOM contributors).
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", s"$scratchRoot/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Bench input tables are written with this many files. The generator's
    * natural output is one file per generating core (a 2-core child wrote
    * the 300k-conv corpus as 2×352 MB files), which starves the scan stage
    * at every width — the measured signatures phase scaled 1.3× from 2→8
    * cores purely from scan granularity. A real transcripts table has many
    * files/row-groups; 64 ≈ 11 MB files at 300k convs restores that shape.
    */
  private val inputFiles = 64

  private def inputDir(nConvs: Long): String = s"$scratchRoot/transcripts-$nConvs-p$inputFiles"

  private def writeInput(spark: SparkSession, nConvs: Long): String = {
    val dir = inputDir(nConvs)
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/_SUCCESS")))
      TranscriptGen.df(spark, nConvs).repartition(inputFiles).write.mode("overwrite").parquet(dir)
    dir
  }

  /** Exercise codegen/JIT/page-fault/session init paths at volume so
    * timings measure the work, not first-use warmup (first-touch page
    * zeroing in this microVM costs whole cores of kernel time).
    */
  private def warmup(spark: SparkSession): Unit =
    Dedup.pipeline(spark, TranscriptGen.df(spark, 5000L), DedupConfig()).count(): Unit

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def time(f: => Unit): Double = timed(f)._2

  /** JDK 17 module opens Spark needs (same list as build.sbt / the public
    * org.apache.spark.launcher.JavaModuleOptions defaults).
    */
  private val addOpens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** Run the flagship pipeline in a child JVM restricted to `cores`,
    * returning the child's stdout (timings are parsed from it; warmup
    * excluded).
    */
  private def childJvmOutput(cores: Int, nConvs: Long, phases: Boolean): String = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    // memory scales with cores (3g/core): an N-core "cluster" has N×
    // per-core memory, exactly like fixed-size executors × N — a fixed heap
    // would give the small cluster 4× the memory-per-core and its GC (also
    // sized by ActiveProcessorCount) a pathological heap-to-thread ratio.
    // Children DO pre-touch their (fixed) heap: in this microVM, lazily
    // zeroing fresh heap pages mid-run costs whole cores of kernel time —
    // measured wide-width runs degraded 100 s → 170-200 s when round 4
    // briefly made child heaps lazy. Pre-touch is safe HERE because the
    // round-3 OOM came from the ~90 GiB pre-touched OUTER JVM stacking on
    // everything else; that heap is now capped at 24g and lazy, children
    // run one at a time, and the largest child commits 24g (8 cores × 3g)
    // — peak residency stays under ~45 GiB of the 125 GiB host.
    val heapGb = 3 * cores
    val cmd = Seq(javaBin, s"-XX:ActiveProcessorCount=$cores",
      s"-Xmx${heapGb}g", s"-Xms${heapGb}g", "-XX:+AlwaysPreTouch",
      "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC") ++
      addOpens ++ Seq("-cp", System.getProperty("java.class.path"),
      "graft.Bench", "--pipeline-run", cores.toString, nConvs.toString)
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_GRAFT_SCRATCH", scratchRoot)
    if (phases) pb.environment().put("SPARK_GRAFT_PHASES", "1")
    else pb.environment().remove("SPARK_GRAFT_PHASES")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    proc.waitFor()
    out
  }

  private def pipelineInChildJvm(cores: Int, nConvs: Long): Double = {
    val out = childJvmOutput(cores, nConvs, phases = false)
    out.linesIterator.collectFirst { case l if l.startsWith("PIPE_SEC=") => l.stripPrefix("PIPE_SEC=").toDouble }
      .getOrElse(sys.error(s"child JVM produced no timing; output tail: ${out.takeRight(500)}"))
  }

  /** One per-phase breakdown run; returns the JSON object the child printed
    * ({"sig":…,"map":…,"rep":…,"cand":…,"ver":…,"cc":…}) so the recorded bench
    * artifact attributes the efficiency number by stage.
    */
  private def phasesInChildJvm(cores: Int, nConvs: Long): String = {
    val out = childJvmOutput(cores, nConvs, phases = true)
    out.linesIterator.collectFirst { case l if l.startsWith("PHASES_JSON=") => l.stripPrefix("PHASES_JSON=") }
      .getOrElse(sys.error(s"child JVM produced no phase timing; output tail: ${out.takeRight(500)}"))
  }

  def main(args: Array[String]): Unit = {
    if (args.length >= 3 && args(0) == "--pipeline-run") {
      val cores = args(1).toInt
      val nConvs = args(2).toLong
      val s = session(cores)
      warmup(s)
      if (sys.env.contains("SPARK_GRAFT_PHASES")) {
        import org.apache.spark.sql.functions.col
        val cfg = DedupConfig()
        // same parquet input as the timed runs, so phase times decompose
        // the same measurement
        val input = s.read.parquet(writeInput(s, nConvs))
        val (sigs, tSig) = timed(Dedup.signatures(s, Dedup.documents(input), cfg).localCheckpoint(true))
        val (groups, tMap) = timed(Dedup.repGroups(sigs).localCheckpoint(true))
        val reps = groups.select(col("rep").as("conv_id"))
        val (repBands, tRep) = timed(groups.select(col("rep").as("conv_id"), col("bands")).localCheckpoint(true))
        // candver split in two so the scaling artifact attributes the
        // band-join/hit-count shuffle separately from the payload joins +
        // exact-Jaccard kernel (the pipeline runs them fused; the cut point
        // here is the same localCheckpoint verify() takes internally)
        val (cand, tCand) = timed(Dedup.candidates(repBands, cfg).localCheckpoint(true))
        val (ver, tVer) = timed(Dedup.verify(cand, sigs, cfg).localCheckpoint(true))
        val tCC = time { graft.operators.ConnectedComponents.assign(reps, ver).count(): Unit }
        System.err.println(f"PHASES cores=$cores sig=$tSig%.2f map=$tMap%.2f rep=$tRep%.2f cand=$tCand%.2f ver=$tVer%.2f cc=$tCC%.2f")
        println(f"""PHASES_JSON={"sig":$tSig%.2f,"map":$tMap%.2f,"rep":$tRep%.2f,"cand":$tCand%.2f,"ver":$tVer%.2f,"cc":$tCC%.2f}""")
        println(f"PIPE_SEC=${tSig + tMap + tRep + tCand + tVer + tCC}%.3f")
      } else {
        // materialize the input as parquet first (untimed): the engine's
        // contract is reading a transcripts *table*, and a parquet scan
        // gives Catalyst honest size stats; generation is a bench artifact
        val input = s.read.parquet(writeInput(s, nConvs))
        val t = time { Dedup.pipeline(s, input, DedupConfig()).count(); () }
        println(f"PIPE_SEC=$t%.3f")
      }
      s.stop()
      return
    }
    val benchT0 = System.nanoTime() // wall budget counts from bench start
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "100000").toLong
    val cfg = DedupConfig()

    // ---- scratch hygiene + pre-flight memory check ----
    // Stale corpora on tmpfs are RESIDENT RAM (8.7 GiB of them sat in
    // /dev/shm when the round-3 bench was killed); start from zero.
    deleteRecursively(scratchRoot)
    // Degrade instead of dying: the scaling phase peaks at (wide child heap
    // = 3g × 4N) + corpus + shuffle on tmpfs + this JVM. With the default
    // N=2 that budget is ~40 GiB; if the host can't offer comfortable
    // headroom, halve the scaling corpus (the measurement stays valid —
    // the artifact records the convs actually used).
    val availGb = memAvailableGb
    val requestedScaleConvs = sys.env.getOrElse("SPARK_GRAFT_SCALE_CONVS", "600000").toLong
    val scaleConvs = if (availGb >= 64) requestedScaleConvs else requestedScaleConvs / 2
    if (scaleConvs != requestedScaleConvs)
      System.err.println(s"[bench] pre-flight: MemAvailable=${availGb}g < 64g — scaling corpus degraded to $scaleConvs convs")

    // ---- phase 1: per-query timings at local[cpus] ----
    var spark = session(cpus)
    warmup(spark)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t = time {
        try { fn(spark, sfDir).count(); () } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
      }
      name -> t
    }

    spark.stop()

    // ---- flagship pipeline throughput (turns/sec), fresh session,
    //      reading the transcripts from a parquet table (the input contract)
    spark = session(cpus)
    warmup(spark)
    val flagDir = writeInput(spark, nConvs)
    val nTurns = spark.read.parquet(flagDir).count()
    // best-of-2, plus a third run gated on spread: the host's co-tenant
    // noise epochs last minutes, so BOTH of two ~25 s observations can land
    // inside one bad epoch (r04 recorded [101.0, 47.7] — 2.1× spread — while
    // its own scaling stage ran the same pipeline over 6× the convs in
    // 74.5 s). When the two runs disagree by >30% the measurement is
    // epoch-dominated and a third ~30 s observation is cheap insurance; all
    // observations land in the artifact (flagship_runs).
    val tFlagRuns = scala.collection.mutable.ArrayBuffer.empty[Double]
    def flagRun(): Unit =
      tFlagRuns += time { Dedup.pipeline(spark, spark.read.parquet(flagDir), cfg).count(); () }
    flagRun(); flagRun()
    if (tFlagRuns.max / tFlagRuns.min > 1.3) flagRun()
    val tFlag = tFlagRuns.min
    // pre-generate the scaling corpora at full width (untimed) — generating
    // them inside the first 2-core child would cost minutes of serial wall.
    // The quarter corpus feeds the weak-scaling stage (N cores on D vs 4N
    // cores on 4D); it shares nothing with the flagship corpus unless the
    // smoke config collapses the sizes.
    writeInput(spark, scaleConvs)
    val weakConvs = scaleConvs / 4
    writeInput(spark, weakConvs)
    spark.stop()
    // tmpfs pages back before the scaling children start (unless a smoke
    // config makes the flagship corpus coincide with a scaling one — the
    // weak guard matters whenever nConvs == scaleConvs/4)
    if (flagDir != inputDir(scaleConvs) && flagDir != inputDir(weakConvs))
      deleteRecursively(flagDir)

    // ---- phase 2: scaling local[N] vs local[4N] on identical input ----
    // N is chosen so 4N sits inside the host's linear-throughput envelope:
    // this VM advertises 32 CPUs but aggregate throughput from 8→32 workers
    // only grows ~2× even for embarrassingly parallel work (SMT/host quota),
    // so 8→32 cannot evidence *algorithmic* scaling. 2→8 measured ≥0.95
    // efficiency on pure-CPU work — headroom is real there.
    //
    // Each width runs in its own child JVM with -XX:ActiveProcessorCount=N,
    // so GC/netty/fork-join thread pools are sized for N cores — the honest
    // stand-in for an N-core cluster (in-process local[2] would still borrow
    // all 32 cores' GC threads).
    // The scaling corpus is larger than the flagship one so per-job driver
    // overheads (planning, AQE, CC) amortize and the measurement reflects
    // the data-proportional work.
    val n = math.min(2, cpus)
    // best-of-N per width: this host shows ±50% run-to-run noise from
    // outside contention; the minimum is the closest observable to the
    // machine's true capability at each width. All observations are
    // recorded in the output (t_n_runs / t_4n_runs) — the best-of is not
    // hiding the distribution.
    val maxReps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "3").toInt
    // ---- wall-clock budget (priority-ordered protocol) ----
    // Epochs of host co-tenant stealing can triple a wide-width run
    // (observed 207 s vs 519 s for the identical job minutes apart), so a
    // fixed-shape protocol has unbounded wall. Instead each optional stage
    // runs only if its measured-cost estimate fits the remaining budget,
    // in value order: 1 scaling rep (mandatory) → more reps → per-phase
    // breakdowns → 1→4 control pair → wide-width top-up samples. Skipped
    // stages are recorded in the artifact, so a short artifact is explicit
    // about why. Default 2400 s: the longest recorded harness run that
    // succeeded took 44:12 INCLUDING JVM/sbt startup, so a 45-min internal
    // budget would sit exactly at the harness's proven ceiling — 40 min
    // leaves startup + result-parsing headroom and costs only top-ups.
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "2400").toDouble
    def elapsedSec: Double = (System.nanoTime() - benchT0) / 1e9
    def remaining: Double = budgetSec - elapsedSec
    val skipped = scala.collection.mutable.ArrayBuffer.empty[String]
    // widths are INTERLEAVED (2,8,8,2,8,8,…): the host's noise comes in
    // multi-minute epochs, and a block of same-width runs can land
    // entirely inside a bad epoch, skewing the min-ratio; interleaving
    // gives both widths the same epoch exposure. The wide width gets TWO
    // runs per rep: it needs 4× as many free host cores, so co-tenant
    // stealing hits it far more often (observed 4N spreads of ±50% vs
    // ±10% at N) — the extra samples tighten its min estimate, and every
    // observation is recorded below, so the asymmetry is visible.
    val tNRuns = scala.collection.mutable.ArrayBuffer.empty[Double]
    val t4NRuns = scala.collection.mutable.ArrayBuffer.empty[Double]
    def runRep(): Double = time {
      tNRuns += pipelineInChildJvm(n, scaleConvs)
      t4NRuns += pipelineInChildJvm(4 * n, scaleConvs)
      t4NRuns += pipelineInChildJvm(4 * n, scaleConvs)
    }
    var repCost = runRep() // rep 1 is mandatory: the headline needs one pair
    // reserve estimates for the downstream stages (phases ≈ one run per
    // width; control ≈ 1-core ≈ 2.1× the 2-core min + 4-core ≈ wide min)
    def phasesEst: Double = 1.2 * (tNRuns.min + t4NRuns.min)
    def controlEst: Double = 2.1 * tNRuns.min + 1.3 * t4NRuns.min
    // WEAK scaling (Gustafson): N cores on D convs vs 4N cores on 4D convs —
    // the shape a growing cluster actually runs (data scales with executors;
    // per-executor partition sizes stay constant). The 4N-on-4D measurement
    // IS the strong pair's wide width (same job, same corpus), so this stage
    // costs only narrow runs on the quarter corpus. Ideal weak scaling has
    // T_N(D) = T_4N(4D); efficiency = T_N(D) / T_4N(4D).
    // Runs IMMEDIATELY after the mandatory rep, with its numerator
    // REPLICATED (two runs), before any optional stage can drain the
    // budget: r04 spent the budget on extra strong reps and recorded a
    // single-shot weak numerator of 0.704 — the exact min-of-1-vs-min-of-2
    // bias BASELINE.md documents — where a second ~50 s run was all it
    // needed. A weak run costs ~1/8th of a strong rep.
    def weakEst: Double = 0.4 * tNRuns.min + 10
    val tWeakRuns = scala.collection.mutable.ArrayBuffer.empty[Double]
    // three up-front runs (~55 s each): the weak efficiency sits near its
    // 0.8 target (rehearsals: 0.844 at 4 runs, 0.797 at 2) and its narrow
    // min tightens ~14% between 2 and 4 samples — cheap insurance the
    // budget gate pays for by trimming lower-priority stages
    while (tWeakRuns.length < 3 && remaining > weakEst + 10)
      tWeakRuns += pipelineInChildJvm(n, weakConvs)
    if (tWeakRuns.isEmpty) skipped += "weak"
    else if (tWeakRuns.length == 1) skipped += "weak_single_run"
    // Replicate the STRONG numerator too, before any optional stage: the
    // r05 rehearsal recorded efficiency 1.353 off a single 312 s narrow run
    // (reps_capped_at_1 + a top-up rotation whose remaining budget only fit
    // the cheap wide/weak series) — the same single-shot-numerator bias the
    // weak stage was reordered for, now on the headline pair. One narrow
    // run costs ~310 s vs ~460 s for a full rep; the wide side already has
    // two runs from the mandatory rep.
    while (tNRuns.length < 2 && remaining > 1.3 * tNRuns.min + 10)
      tNRuns += pipelineInChildJvm(n, scaleConvs)
    if (tNRuns.length == 1) skipped += "strong_narrow_single_run"
    var reps = 1
    while (reps < maxReps && remaining > repCost + phasesEst + controlEst) {
      repCost = (repCost + runRep()) / 2 // smoothed
      reps += 1
    }
    if (reps < maxReps) skipped += s"reps_capped_at_$reps"
    // per-phase breakdown at both widths (one extra run each) so the
    // efficiency number is attributable from the recorded artifact alone
    val phasesJson: String =
      if (remaining > phasesEst + controlEst) {
        val pN = phasesInChildJvm(n, scaleConvs)
        val p4N = phasesInChildJvm(4 * n, scaleConvs)
        s"""{"n":$pN,"n4":$p4N}"""
      } else { skipped += "phases"; "null" }
    // 1→4 control pair on the SAME corpus: the narrow width of the strict
    // 2→8 pair shares one memory controller across 2 cores, so part of the
    // measured sub-linearity is the host's bandwidth ceiling rather than
    // the pipeline; the 1→4 pair (one run each — it is a control, not the
    // headline) brackets that effect in-artifact.
    val controlJson: String =
      if (remaining > controlEst) {
        val tC1 = pipelineInChildJvm(1, scaleConvs)
        val tC4 = pipelineInChildJvm(4, scaleConvs)
        f"""{"n":1,"n4":4,"t_n_sec":$tC1%.2f,"t_4n_sec":$tC4%.2f,"efficiency":${tC1 / (4.0 * tC4)}%.3f}"""
      } else { skipped += "control"; "null" }
    // leftover-budget top-ups: every reported number is a MINIMUM, so the
    // weakest estimator is simply the series with the fewest samples — top
    // up whichever of the three (narrow strong, wide strong, weak narrow)
    // has fewest, regardless of where the current efficiency stands. Every
    // observation lands in t_n_runs/t_4n_runs/weak.t_n_runs, so the
    // sampling is fully visible. (The weak series joining the rotation
    // matters for fairness: run 6 recorded a single-shot weak numerator
    // against a min-of-4 denominator.)
    var topUps = 0
    var cont = true
    while (cont && topUps < 8) {
      val series: Seq[(Int, Double, () => Unit)] = Seq(
        (tNRuns.length, 1.3 * tNRuns.min, () => { tNRuns += pipelineInChildJvm(n, scaleConvs); () }),
        (t4NRuns.length, 1.5 * t4NRuns.min, () => { t4NRuns += pipelineInChildJvm(4 * n, scaleConvs); () })
      ) ++ (if (tWeakRuns.nonEmpty)
              Seq((tWeakRuns.length, 1.3 * tWeakRuns.min, () => { tWeakRuns += pipelineInChildJvm(n, weakConvs); () }))
            else Seq.empty)
      // fewest-samples first, but fall back to the cheapest series that
      // still fits: when the least-sampled series (often a wide strong run)
      // no longer fits the remaining budget, a weak-width run (~1/6 the
      // cost) frequently still does — exiting early left budget unused
      val fitting = series.sortBy(_._1).find { case (_, est, _) => remaining > est }
      fitting match {
        case Some((_, _, run)) => run(); topUps += 1
        case None              => cont = false
      }
    }
    deleteRecursively(inputDir(weakConvs))
    val tN = tNRuns.min
    val t4N = t4NRuns.min
    val efficiency = tN / (4.0 * t4N)
    // rendered against the FINAL wide-width min (top-ups after the weak
    // stage may have improved it; every t_4n observation is the same job
    // on the same corpus, so the min is the right denominator)
    val weakJson: String =
      if (tWeakRuns.nonEmpty) {
        val t = tWeakRuns.min
        val runs = tWeakRuns.map(x => f"$x%.2f").mkString("[", ",", "]")
        f"""{"n":$n,"n4":${4 * n},"convs_n":$weakConvs,"convs_4n":$scaleConvs,"t_n_runs":$runs,"t_n_sec":$t%.2f,"t_4n_sec":$t4N%.2f,"efficiency":${t / t4N}%.3f}"""
      } else "null"
    deleteRecursively(inputDir(scaleConvs))

    val qs = (results :+ ("flagship_pipeline" -> tFlag))
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.2f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum + tFlag
    val turnsPerSec = nTurns / tFlag
    val nRunsJson = tNRuns.map(t => f"$t%.2f").mkString("[", ",", "]")
    val n4RunsJson = t4NRuns.map(t => f"$t%.2f").mkString("[", ",", "]")
    val skippedJson = skipped.map("\"" + _ + "\"").mkString("[", ",", "]")
    val flagRunsJson = tFlagRuns.map(t => f"$t%.2f").mkString("[", ",", "]")
    println(
      f"""{"metric":"total","value":$total%.2f,"unit":"sec","queries":$qs,"sf":"$sfDir","bench_convs":$nConvs,"bench_turns":$nTurns,"flagship_runs":$flagRunsJson,"turns_per_sec":$turnsPerSec%.1f,"scaling":{"n":$n,"n4":${4 * n},"convs":$scaleConvs,"mem_available_gb":$availGb,"budget_sec":$budgetSec%.0f,"elapsed_sec":$elapsedSec%.1f,"skipped":$skippedJson,"t_n_runs":$nRunsJson,"t_4n_runs":$n4RunsJson,"t_n_sec":$tN%.2f,"t_4n_sec":$t4N%.2f,"efficiency":$efficiency%.3f,"control":$controlJson,"weak":$weakJson,"phases":$phasesJson}}""")
  }
}
