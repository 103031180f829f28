package graft

/** Driver-run benchmark. Two harness modes (GRAFT_BENCH_MODE):
  *
  *   - `batched` (DEFAULT — the driver-gate mode): K queries per
  *     forked JVM, each query timed twice in sequence (Probe2 hygiene:
  *     min-of-two absorbs a predecessor's tail work), then any row
  *     whose warm time exceeds 1.35× its committed-baseline row is
  *     re-proved in a FRESH single-query JVM and that fresh number
  *     replaces the headline (the in-batch first/reprobe/baseline all
  *     land under `reprobed`, so contamination is visible, not hidden).
  *     Rationale: at round 10 the fork-per-query sweep took 59:29 for
  *     207 queries — ~85% of wall was per-fork JVM+Spark startup — and
  *     round 11's driver gate timed out (rc=124, no data). Batching
  *     amortizes the startup ~K× and the baseline-gated fresh-fork
  *     reprobe restores fork-per-query trust exactly where a number
  *     looks off.
  *   - `full` (the committed-baseline mode, BENCH.full.r<N>.json): one
  *     FRESH JVM per query, cold then warm — the round-3 finding
  *     stands (a shared JVM taxed shuffle-heavy neighbors up to 3.6×),
  *     so cross-round per-row baselines keep coming from this mode.
  *
  * The parent holds NO SparkSession; children inherit the flags sbt
  * injected into this JVM and report marker lines the parent
  * aggregates. The aggregate JSON is BOTH printed (driver contract:
  * one JSON line on stdout) and written to BENCH.out.json —
  * BENCH_r03.json was lost to stdout truncation; a file artifact
  * can't be. The artifact is rewritten after every fork so an
  * externally killed run still leaves a parseable `"partial":true`
  * file instead of nothing.
  */
object Bench {

  /** Timing sink: aggregate a 64-bit hash of EVERY output column.
    * A bare count() lets the optimizer prune unreferenced columns, so
    * for projection-only queries (fingerprints, token arrays) the
    * timed plan would skip the very expressions being benched; hashing
    * the full output struct makes every column load-bearing while
    * still collecting just one row. (Typed mapPartitions paths were
    * already prune-proof — this equalizes the declarative ones.)
    */
  def materialize(df: org.apache.spark.sql.DataFrame): Unit = {
    import org.apache.spark.sql.functions._
    // bit_xor, not sum: hash values span the full 64-bit range, so an
    // ANSI-mode sum overflows; xor folds losslessly and can't.
    df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
      .agg(expr("bit_xor(h)")).collect()
    ()
  }

  /** JVM flags to propagate into children: the JDK17 add-opens set,
    * system properties, and the heap cap — exactly what build.sbt put
    * on THIS JVM.
    */
  private def inheritedJvmArgs: Seq[String] = {
    val in = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments
    val b = Seq.newBuilder[String]
    var expectValue = false
    in.forEach { a =>
      if (expectValue) { b += a; expectValue = false }
      else if (a == "--add-opens" || a == "--add-exports") { b += a; expectValue = true }
      else if (a.startsWith("--add-opens=") || a.startsWith("-D") ||
        a.startsWith("-Xmx") || a.startsWith("-Xms")) b += a
    }
    b.result()
  }

  /** This JVM's classpath (sbt run sets it to classes + all deps). */
  private def classpath: String = System.getProperty("java.class.path")

  private def javaBin: String =
    java.nio.file.Paths.get(System.getProperty("java.home"), "bin", "java").toString

  /** Fork one child for `name`; returns (cold, warm) or None on
    * failure/timeout. Child stderr is inherited (Spark logs stay
    * visible); stdout is scanned for the BENCHONE marker line.
    */
  private def runOne(name: String, sfDir: String, cpus: String,
                     timeoutSec: Long): Option[(Double, Double)] = {
    val cmd = (Seq(javaBin) ++ inheritedJvmArgs ++
      Seq("-cp", classpath, "graft.BenchOne", name, sfDir, cpus)).toArray
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    val p = pb.start()
    val outReader = new Thread {
      var marker: Option[String] = None
      override def run(): Unit = {
        val br = new java.io.BufferedReader(
          new java.io.InputStreamReader(p.getInputStream))
        var line = br.readLine()
        while (line != null) {
          if (line.startsWith("BENCHONE ")) marker = Some(line.stripPrefix("BENCHONE "))
          line = br.readLine()
        }
      }
    }
    outReader.start()
    val finished = p.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) {
      System.err.println(s"[bench] $name TIMED OUT after ${timeoutSec}s — killing child")
      p.destroyForcibly()
      p.waitFor()
    }
    outReader.join(10000)
    if (!finished || p.exitValue() != 0) {
      System.err.println(s"[bench] $name FAILED (exit=${if (finished) p.exitValue() else "timeout"})")
      None
    } else outReader.marker.flatMap { m =>
      m.split(" ") match {
        case Array(cold, warm) => Some((cold.toDouble, warm.toDouble))
        case _ => System.err.println(s"[bench] $name bad marker: $m"); None
      }
    }
  }

  /** Fork ONE child for a whole batch of queries ([[BenchBatch]]);
    * returns whatever per-query `BENCHQ` markers the child managed to
    * print — on a child crash/timeout the queries measured BEFORE the
    * death are kept and the rest are simply absent (the caller
    * re-proves absentees in fresh single-query forks). A per-query
    * failure inside the child is an explicit `FAIL` marker, also
    * treated as absent here so it gets its fresh-fork retry.
    */
  private def runBatch(batch: Seq[String], sfDir: String, cpus: String,
                       timeoutSec: Long): Map[String, (Double, Double)] = {
    val cmd = (Seq(javaBin) ++ inheritedJvmArgs ++
      Seq("-cp", classpath, "graft.BenchBatch", sfDir, cpus) ++ batch).toArray
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    val p = pb.start()
    val acc = scala.collection.mutable.Map.empty[String, (Double, Double)]
    val outReader = new Thread {
      override def run(): Unit = {
        val br = new java.io.BufferedReader(
          new java.io.InputStreamReader(p.getInputStream))
        var line = br.readLine()
        while (line != null) {
          if (line.startsWith("BENCHQ ")) {
            // guard the parse: one malformed marker (stdout interleaving
            // on a dying child) must not kill this thread and drop every
            // LATER marker from a healthy batch
            try line.stripPrefix("BENCHQ ").split(" ") match {
              case Array(n, r1, r2) if r1 != "FAIL" =>
                acc.synchronized { acc(n) = (r1.toDouble, r2.toDouble) }
              case other =>
                System.err.println(s"[bench] batch marker: ${other.mkString(" ")}")
            } catch {
              case e: NumberFormatException =>
                System.err.println(s"[bench] bad batch marker '$line': $e")
            }
          }
          line = br.readLine()
        }
      }
    }
    outReader.start()
    // the batch budget is per-query × batch size: a hang anywhere
    // inside still gets killed, but a legitimately slow tail query
    // isn't charged the whole batch's budget
    val finished = p.waitFor(timeoutSec * batch.length,
      java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) {
      System.err.println(s"[bench] batch [${batch.head}..${batch.last}] TIMED OUT — killing child")
      p.destroyForcibly()
      p.waitFor()
    }
    outReader.join(10000)
    if (finished && p.exitValue() != 0)
      System.err.println(s"[bench] batch [${batch.head}..${batch.last}] exit=${p.exitValue()}")
    acc.synchronized { acc.toMap }
  }

  /** Fixed-work single-thread spin (~0.4e9 LCG steps): a pure-CPU
    * yardstick immune to plan changes, so two artifacts from different
    * machines (or a loaded one — see the 2.6×-inflated r5 driver run)
    * can be normalized by their spin ratio before comparing query rows.
    */
  private def cpuSpinSec(): Double = {
    val t0 = System.nanoTime()
    var x = 1234567891011L
    var i = 0
    while (i < 400000000) { x = x * 6364136223846793005L + 1442695040888963407L; i += 1 }
    if (x == 42) System.err.println("") // keep the loop observable
    (System.nanoTime() - t0) / 1e9
  }

  private def loadAvg(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

  /** Per-query warm baseline from the newest committed full-bench
    * artifact (`BENCH.full.r<N>.json`, or GRAFT_BENCH_BASELINE):
    * the reference the auto-reprobe pass (round-10 verdict item 7)
    * measures blips against. Absent/unparseable → no reprobes.
    * SF-gated: a baseline recorded at a different `sf` than this run's
    * is no baseline at all — comparing an sf1 run against sf0.1 rows
    * would re-fork the whole suite as "blips" (or never fire).
    */
  private def baselineWarm(sfDir: String): Map[String, Double] = {
    val file = sys.env.get("GRAFT_BENCH_BASELINE").orElse {
      val re = """BENCH\.full\.r(\d+)\.json""".r
      Option(new java.io.File(".").listFiles()).toSeq.flatten
        .flatMap(f => f.getName match {
          case re(n) => Some((n.toInt, f.getPath))
          case _ => None
        })
        .sortBy(_._1).lastOption.map(_._2)
    }
    file.flatMap { f =>
      try {
        val text = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(f)), "UTF-8")
        // the artifact is this harness's own output: the warm map is the
        // object right after "queries": — cut it out and regex the pairs
        // whitespace-tolerant: a hand-merged artifact (python json.dump
        // default separators) writes `"sf": "..."` — the r13 batched run
        // silently lost its whole baseline to the strict form
        val sfRe = """"sf"\s*:\s*"([^"]*)"""".r
        // normalized-path comparison: a trailing slash or relative
        // spelling must not silently disable the reprobe pass
        def norm(p: String) = java.nio.file.Paths.get(p)
          .toAbsolutePath.normalize.toString
        val sameSf = sfRe.findFirstMatchIn(text)
          .exists(m => norm(m.group(1)) == norm(sfDir))
        if (!sameSf) System.err.println(
          s"[bench] baseline $f recorded a different sf than $sfDir — no reprobes")
        // anchor must be whitespace-tolerant like the pairs: a strict
        // "queries":{ missed python-json.dump artifacts entirely (the
        // r13 run-1 incident), and a silent None here disarms BOTH
        // reprobe classes — so log the parse failure loudly too
        val anchor = """"queries"\s*:\s*\{""".r.findFirstMatchIn(text)
        if (anchor.isEmpty) System.err.println(
          s"[bench] baseline $f has no parseable queries map — no reprobes")
        val bodyEnd = anchor.map(a => text.indexOf("}", a.end)).getOrElse(-1)
        if (anchor.nonEmpty && bodyEnd < 0) System.err.println(
          s"[bench] baseline $f queries map is unterminated (truncated " +
            "artifact?) — no reprobes")
        if (anchor.isEmpty || bodyEnd < 0 || !sameSf) None
        else {
          val start = anchor.get.end
          val body = text.substring(start, bodyEnd)
          val pair = """"([a-z0-9_]+)"\s*:\s*(-?[0-9.eE+-]+)""".r
          Some(pair.findAllMatchIn(body)
            .map(m => m.group(1) -> m.group(2).toDouble)
            .filter(_._2 > 0) // -1 = failed row, not a baseline
            .toMap)
        }
      } catch { case _: Throwable => None }
    }.getOrElse(Map.empty)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_TIMEOUT_SEC", "600").toLong
    val mode = sys.env.getOrElse("GRAFT_BENCH_MODE", "batched")
    val batchK = sys.env.getOrElse("GRAFT_BENCH_BATCH", "8").toInt
    val harness = if (mode == "full") "fork-per-query" else s"batched-fork-k$batchK"
    // name order: stable run-to-run and round-to-round for diffing;
    // an explicit arg list narrows the run (local iteration)
    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    def jnum(v: Option[Double]): String = v.map(_.toString).getOrElse("-1")
    def jmap(kv: Seq[(String, Option[Double])]): String =
      kv.map { case (k, v) => "\"" + k + "\":" + jnum(v) }.mkString("{", ",", "}")
    // Host-health fields: spin is a fixed pure-CPU workload (cross-
    // machine normalizer), loadavg snapshots bracket the sweep; the
    // calibration_query row (svm_solver_pin — a closed-form solver
    // trace, no IO, no shuffle) cannot regress from plan changes, so a
    // shifted value there means machine, not code.
    val spinStart = cpuSpinSec()
    val loadStart = loadAvg()
    lazy val spinEnd = cpuSpinSec() // once, at the first complete artifact write
    def toJson(results: Seq[(String, Option[(Double, Double)])], partial: Boolean,
               reprobed: Seq[(String, Double, Double, Double)] = Nil): String = {
      val failed = results.collect { case (n, None) => "\"" + n + "\"" }
      val total = results.flatMap(_._2.map(_._2)).sum
      val qs = jmap(results.map { case (n, r) => n -> r.map(_._2) })
      val cold = jmap(results.map { case (n, r) => n -> r.map(_._1) })
      val part = if (partial) s""","partial":true,"remaining":${names.length - results.length}""" else ""
      val repro = if (reprobed.isEmpty) "" else reprobed.map {
        case (n, first, again, base) =>
          f""""$n":{"first":$first%.4f,"reprobe":$again%.4f,"baseline":$base%.4f}"""
      }.mkString(""","reprobed":{""", ",", "}")
      val calib = f""","calibration":{"cpu_spin_sec_start":$spinStart%.4f,""" +
        (if (partial) "" else f""""cpu_spin_sec_end":$spinEnd%.4f,""") +
        f""""loadavg_start":$loadStart%.2f,"loadavg_end":${loadAvg()}%.2f,""" +
        """"calibration_query":"svm_solver_pin"}"""
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_cold":$cold,"failed":[${failed.mkString(",")}],"sf":"$sfDir","harness":"$harness"$calib$part$repro}"""
    }
    val outFile = java.nio.file.Paths.get("BENCH.out.json").toAbsolutePath
    // Rewrite the artifact after EVERY fork so an externally killed run
    // still leaves a parseable file (marked "partial") instead of nothing.
    val acc = Seq.newBuilder[(String, Option[(Double, Double)])]
    var done = 0
    def flush(): Unit = java.nio.file.Files.write(outFile,
      toJson(acc.result(), partial = done < names.length).getBytes("UTF-8"))
    if (mode == "full") {
      names.foreach { name =>
        val r = runOne(name, sfDir, cpus, timeoutSec)
        r.foreach { case (c, w) => System.err.println(f"[bench] $name cold=$c%.2f warm=$w%.2f") }
        acc += (name -> r)
        done += 1
        flush()
      }
    } else {
      names.grouped(batchK).foreach { batch =>
        val got = runBatch(batch, sfDir, cpus, timeoutSec)
        // absentees (child died before reaching them, or in-child FAIL
        // marker): one fresh single-query fork each — a deterministic
        // failure fails again and lands in `failed`; a batch casualty
        // (OOM'd neighbor, killed fork) still gets its number
        batch.foreach { name =>
          val r = got.get(name).orElse {
            System.err.println(s"[bench] $name missing from batch — fresh-fork retry")
            runOne(name, sfDir, cpus, timeoutSec)
          }
          r.foreach { case (c, w) => System.err.println(f"[bench] $name r1=$c%.2f warm=$w%.2f") }
          acc += (name -> r)
          done += 1
        }
        flush()
      }
    }
    // Auto-reprobe pass (round-10 verdict item 7): any row whose warm
    // time exceeds 1.35× its committed-baseline row gets ONE fresh-JVM
    // re-run at the END of the suite (the machine has gone quiet by
    // then if the blip was load noise) — both numbers land in the
    // artifact so judges can separate host noise from regressions
    // without a manual re-probe cycle. Rows without a baseline (new
    // queries) reprobe too, but only in `batched` mode — in `full`
    // mode their in-suite numbers already ARE fresh-fork numbers. In
    // `full` mode the headline `queries` map
    // keeps the original in-suite numbers (they ARE fresh-fork
    // numbers); in `batched` mode a successful reprobe REPLACES the
    // headline row — the fresh fork is the trustworthy measurement and
    // the in-batch number was possibly neighbor-taxed — with the
    // first/reprobe/baseline triple preserved under `reprobed` as
    // provenance.
    val base = baselineWarm(sfDir)
    val results = acc.result()
    // Two reprobe classes (round-12 verdict #1 / ADVICE): rows above
    // 1.35× their committed baseline (possible contamination OR real
    // regression — the fresh fork arbitrates), and rows with NO
    // baseline at all (new queries), whose first published number
    // would otherwise be an in-batch, possibly neighbor-warmed figure
    // with no fork-per-query trust behind it. Baseline-less rows carry
    // baseline = -1 in the artifact's `reprobed` block. The second
    // class only fires in BATCHED mode (full-mode numbers are already
    // fresh-fork) and only when a baseline file parsed at all — with
    // no baseline EVERY row is "new" and re-forking the whole suite
    // defeats the batching.
    val blips = results.collect {
      case (n, Some((_, warm))) if base.get(n).exists(b => warm > 1.35 * b) =>
        (n, warm, base(n))
      case (n, Some((_, warm)))
        if mode != "full" && base.nonEmpty && !base.contains(n) =>
        (n, warm, -1.0)
    }
    val reprobed = blips.map { case (n, first, b) =>
      System.err.println(f"[bench] reprobe $n: first=$first%.2f vs baseline=$b%.2f")
      // a blip whose re-probe itself fails must stay VISIBLE in the
      // artifact (reprobe = -1), not silently vanish — that is exactly
      // the flaky/regressing row the pass exists to expose
      val again = runOne(n, sfDir, cpus, timeoutSec).map(_._2).getOrElse(-1.0)
      (n, first, again, b)
    }
    val finalResults =
      if (mode == "full") results
      else {
        // the fresh fork REPLACES the headline in either direction —
        // keeping a faster in-batch number would publish a value the
        // trusted fork-per-query harness cannot reproduce (and hide a
        // real regression behind shared-JVM warmth)
        val fresh = reprobed.collect {
          case (n, _, again, _) if again > 0 => n -> again
        }.toMap
        results.map {
          case (n, Some((c, _))) if fresh.contains(n) => (n, Some((c, fresh(n))))
          case other => other
        }
      }
    val json = toJson(finalResults, partial = false, reprobed)
    java.nio.file.Files.write(outFile, json.getBytes("UTF-8"))
    System.err.println(s"[bench] wrote $outFile")
    println(json)
    // Round-12 verdict #1: the driver keeps only a 2,000-byte stdout
    // tail, and the full line above is ~6 KB — so BENCH_r{10,11,12}
    // .json all carried `parsed: null`. Emit a SECOND, compact summary
    // line LAST (headline total, failure list, slowest five, pointer
    // to the complete file artifact) that stays well under the tail
    // window, so the driver-side artifact finally parses. Failure
    // names are capped at 10 to keep the bound even in a disaster run.
    val warmRows = finalResults.collect { case (n, Some((_, w))) => (n, w) }
    val slowest = warmRows.sortBy(-_._2).take(5)
      .map { case (n, w) => f""""$n":$w%.2f""" }.mkString("{", ",", "}")
    val failedNames = finalResults.collect { case (n, None) => n }
    val failShown = failedNames.take(10).map("\"" + _ + "\"").mkString(",")
    val totalWarm = warmRows.map(_._2).sum
    println(
      f"""{"metric":"total","value":$totalWarm%.2f,"unit":"sec","n":${finalResults.size},"failed_n":${failedNames.size},"failed":[$failShown],"slowest":$slowest,"reprobed_n":${reprobed.size},"sf":"$sfDir","harness":"$harness","full_artifact":"BENCH.out.json"}""")
  }
}

/** Child of [[Bench]]: runs ONE query in a fresh JVM — cold then warm —
  * and prints `BENCHONE <cold> <warm>` on stdout. The untimed warmup
  * covers session/executor init and first-job codegen so the cold
  * number measures the query, not the JVM.
  */
object BenchOne {
  /** The benched session + its untimed warmup (executor init, first-job
    * codegen, one parquet open) — shared by both child harnesses so a
    * batched number and a fresh-fork number differ only by neighbors,
    * never by session config.
    */
  def warmSession(sfDir: String, cpus: String): org.apache.spark.sql.SparkSession = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // NTZ event timestamps cast to TIMESTAMP under the session zone:
      // pin UTC so benched plans compute the same values Verify does.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10).count()
    spark
  }

  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, cpus) = args
    val spark = warmSession(sfDir, cpus)
    val fn = SparkEntry.queries(name)
    def once(): Double = {
      val t0 = System.nanoTime()
      Bench.materialize(fn(spark, sfDir))
      (System.nanoTime() - t0) / 1e9
    }
    val cold = once()
    val warm = math.min(cold, once())
    println(f"BENCHONE $cold%.4f $warm%.4f")
    spark.stop()
  }
}

/** Child of [[Bench]]'s batched mode: ONE warm session, each named
  * query timed twice in sequence (warm = min of the two — the second
  * round absorbs a predecessor's spilled/GC tail), one `BENCHQ` marker
  * per query printed AS IT COMPLETES so a mid-batch death loses only
  * the unreached queries. A per-query exception prints a FAIL marker
  * and the batch continues — one broken query must not charge its
  * neighbors a fresh-fork retry.
  */
object BenchBatch {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = args(1)
    val spark = BenchOne.warmSession(sfDir, cpus)
    args.drop(2).foreach { name =>
      spark.catalog.clearCache() // no cross-query cache leakage
      try {
        def once(): Double = {
          val t0 = System.nanoTime()
          Bench.materialize(SparkEntry.queries(name)(spark, sfDir))
          (System.nanoTime() - t0) / 1e9
        }
        val r1 = once()
        val r2 = once()
        println(f"BENCHQ $name $r1%.4f ${math.min(r1, r2)}%.4f")
      } catch {
        case e: Throwable =>
          System.err.println(s"[benchbatch] $name failed: $e")
          println(s"BENCHQ $name FAIL FAIL")
      }
    }
    spark.stop()
  }
}
