package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.ext.GraftExtensions)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh_").toString)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // always use the sort-based shuffle writer, never bypass-merge
      // (r11, guide §2.2): bypass-merge opens one file PER REDUCER per
      // map task and NIO-merges them — at local[32] that is 32×32 file
      // creates + mmap/munmap copies + a serialized commit per shuffle,
      // measured as task time 7× CPU time (threads blocked in
      // FileOutputStream.open0 / FileChannelImpl.map0 / the metadata
      // commit lock) across the whole suite. Production shuffles have
      // R > 200 where bypass never engages, so this also makes local
      // runs exercise the at-scale writer path. Env-overridable.
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS_MERGE", "1"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // tz-naive driver parquet reads as an instant, not TIMESTAMP_NTZ
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // deterministic run order; SPARK_GRAFT_ONLY=q03,q14 restricts (debug)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
    // warmup dir: the smallest scale factor (fall back to sfDir). The
    // generated code is identical across scale factors (plans differ only
    // in file paths), so an untimed run at sf0.001 right before each
    // timed run compiles that query's whole-stage-codegen functions and
    // JITs its hot paths; the timed run then measures steady-state
    // execution, not compiler work. Interleaved per query (not one big
    // warmup pass) because the codegen class cache holds ~100 entries —
    // warming all 40 queries up front would evict the early ones again.
    // sf0.01 preferred over sf0.001: the warmup must run the hot loops
    // enough iterations for C2 to compile them, and 100x-smaller data
    // leaves them interpreted (measured: q01 timed run 7.5s after an
    // sf0.001 warmup vs ~3s steady state)
    val warmDir = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.001")
      .find(d => new java.io.File(d).isDirectory)
      .getOrElse(sfDir)
    // timed runs per query: min-of-N absorbs box contention and codegen
    // cache eviction across a long multi-query run (one slow outlier run
    // otherwise inflates a query 8-15x vs an isolated re-run of the same
    // plan). min (not mean/median) because noise is strictly additive.
    val timedRuns = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt.max(1)
    val results = selected.map { case (name, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"WARMUP FAIL $name: $e") }
      // noop sink: fully executes every output column (count() would let
      // Catalyst prune per-row expression work away), writes nothing.
      val elapsed =
        try {
          val times = (1 to timedRuns).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          times.min
        } catch {
          case e: Throwable =>
            // negative sentinel keeps the failure visible in BENCH output
            // instead of silently counting a partial run as a real time
            System.err.println(s"BENCH FAIL $name: $e")
            -1.0
        }
      // settle the JVM between queries so one query's garbage doesn't
      // charge a GC pause to the next query's timed run
      System.gc()
      name -> elapsed
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failed queries carry the -1 sentinel in `queries`; exclude them from
    // the headline total rather than letting them subtract from it
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    // trailing compact summary: the main line can be thousands of chars and
    // tail-captured logs have truncated away its leading "total" field
    // before — repeat the gate numbers in a short final line that any tail
    // capture keeps
    val failed = results.filter(_._2 < 0).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    println(s"""{"bench_total_s":$total,"n_queries":${results.size},"runs_per_query":$timedRuns,"failed":$failed}""")
    spark.stop()
  }
}
