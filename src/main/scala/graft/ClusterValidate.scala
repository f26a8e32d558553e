package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.{GraftSession, ResultDigest}
import graft.queries.QueryCorpus
import java.nio.file.{Files, Paths}

/** Multi-JVM execution validation (dev/validation main, committed artifact
  * `CLUSTER_r<round>.json`): runs the full query corpus TWICE — once under the
  * usual `local[n]` (single JVM), once under `local-cluster[2,16,4096]`
  * (a real standalone master + workers that FORK separate executor JVMs,
  * with the application jar shipped via `spark.jars`, real task/closure
  * serialization, real BlockManager broadcast/shuffle transfer) — and
  * compares per-query [[ResultDigest]]s.
  *
  * `local[n]` structurally cannot catch: a closure capturing a
  * non-serializable driver object (same-JVM reference sharing hides it), a
  * Hadoop `Configuration` used executor-side without
  * `SerializableConfiguration`, codegen/expression classes missing from the
  * executor classpath, or driver-only filesystem assumptions. This main
  * exists to execute exactly those seams. The JVM boundary is PROVEN, not
  * assumed: a 64-partition probe job collects distinct executor JVM PIDs
  * and the record asserts none equals the driver PID.
  *
  * Beyond the corpus, three cluster-sensitive extras run in both modes:
  *   - `x_arrow_shard_roundtrip`: [[graft.io.ArrowIpc.writeStreamSharded]]
  *     (executor-side `FileSystem.create` + task-commit rename + driver
  *     existence re-check) → `readStreamSharded` (one shard = one task);
  *   - `x_pagerank_smj_forced`: the distributed SMJ PageRank loop with both
  *     small-graph admissions zeroed, so the per-round join/agg pipeline
  *     shuffles across executor JVMs even at validation scale;
  *   - `x_spread_barrier`: [[graft.ops.Scale.spreadForCompute]] +
  *     [[graft.functions.OptBarrier]] fencing, exercising the custom
  *     barrier expression through executor-side codegen.
  *
  * Usage: `sbt "runMain graft.ClusterValidate [sfDir] [outJson]"`, env
  * `GRAFT_CLUSTER_MASTER` (default `local-cluster[2,16,4096]`),
  * `GRAFT_CLUSTER_QUERIES` (comma prefix filter, default all).
  */
object ClusterValidate {

  /** Per-phase outcome: digest + wall seconds, or the failure line. */
  private final case class Outcome(digest: Option[ResultDigest.Digest],
      secs: Double, err: Option[String])

  private def extras: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "x_arrow_shard_roundtrip" -> { (s: SparkSession, dir: String) =>
      import org.apache.spark.sql.functions._
      val docs = GraftSession.table(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
      val tag = s.sparkContext.master.replaceAll("""[^A-Za-z0-9]+""", "_")
      val feed = s"file:${sys.props("java.io.tmpdir")}/graft_cluster_arrow_$tag"
      graft.io.ArrowIpc.writeStreamSharded(docs, feed, numShards = 8,
        shardBy = Seq("doc_id"))
      graft.io.ArrowIpc.readStreamSharded(s, feed)
    },
    "x_pagerank_smj_forced" -> { (s: SparkSession, dir: String) =>
      import org.apache.spark.sql.functions._
      val e = GraftSession.table(s, dir, "lineitem")
        .select(concat(lit("o"), col("l_orderkey")).as("src"),
          concat(lit("p"), col("l_partkey")).as("dst"))
      // both admissions zeroed -> the web-scale SMJ loop tier, even here
      graft.ops.Graph.pageRank(e, "src", "dst", iterations = 3,
        broadcastNodeLimit = 0L, smallGraphMaxBytes = 0L)
    },
    "x_spread_barrier" -> { (s: SparkSession, dir: String) =>
      import org.apache.spark.sql.functions._
      val d = graft.ops.Scale.spreadForCompute(
        GraftSession.table(s, dir, "documents"), fence = Seq("text"))
      d.groupBy(col("lang")).agg(count(lit(1)).as("docs"),
        sum(length(col("text"))).as("chars"))
    })

  private def runAll(spark: SparkSession, sfDir: String, phase: String,
      qs: Seq[(String, (SparkSession, String) => DataFrame)]): Map[String, Outcome] =
    qs.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val out = try {
        val d = ResultDigest.digest(fn(spark, sfDir))
        Outcome(Some(d), (System.nanoTime() - t0) / 1e9, None)
      } catch {
        case e: Throwable =>
          val line = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.next().take(300)
          Outcome(None, (System.nanoTime() - t0) / 1e9, Some(line))
      }
      println(f"[cluster] $phase%-8s $name%-28s ${out.secs}%7.2fs " +
        out.err.map("FAIL " + _).getOrElse(s"rows=${out.digest.get.rows}"))
      name -> out
    }.toMap

  private def jq(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outPath = if (args.length > 1) args(1) else "CLUSTER_r18.json"
    val master = sys.env.getOrElse("GRAFT_CLUSTER_MASTER", "local-cluster[2,16,4096]")
    val keep: String => Boolean = sys.env.get("GRAFT_CLUSTER_QUERIES") match {
      case Some(f) if f.nonEmpty =>
        val ps = f.split(',').map(_.trim).filter(_.nonEmpty)
        name => ps.exists(name.startsWith)
      case _ => _ => true
    }
    val qs = (QueryCorpus.queries.toSeq ++ extras).sortBy(_._1)
      .filter(kv => keep(kv._1))

    // local-cluster workers fork executor JVMs through the Spark launcher,
    // which (a) resolves the jars dir from SPARK_HOME and (b) resolves the
    // Scala suffix from SPARK_SCALA_VERSION — a release distribution has no
    // launcher/target build dir to infer it from, and a worker forked
    // inside sbt never ran load-spark-env.sh. Either unset means every
    // executor dies at fork ("Cannot find any build directories") and the
    // master removes the app after 10 retries — the r17/r18 failure mode
    // that left CLUSTER_r17.json unwritten. Fail loud and early instead:
    // SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13.
    if (master.startsWith("local-cluster") || master.startsWith("spark://")) {
      require(sys.env.contains("SPARK_HOME") || sys.props.contains("spark.test.home"),
        s"master=$master forks executor JVMs: set SPARK_HOME to the Spark " +
          "distribution root (e.g. SPARK_HOME=/opt/spark) so the launcher " +
          "can locate the jars dir")
      require(sys.env.contains("SPARK_SCALA_VERSION"),
        s"master=$master forks executor JVMs: set SPARK_SCALA_VERSION " +
          "(e.g. 2.13) — a release distro has no launcher/target dir for " +
          "the launcher to infer it from")
    }

    val tLocal0 = System.nanoTime()
    val local = GraftSession.local(32)
    val ref = runAll(local, sfDir, "local", qs)
    local.stop()
    val wallLocal = (System.nanoTime() - tLocal0) / 1e9

    val jar = {
      val dir = Paths.get("target/scala-2.13")
      val found = Files.list(dir).filter(_.toString.endsWith(".jar")).toList
      require(!found.isEmpty, "run `sbt package` first — executors need the jar")
      found.get(0).toAbsolutePath.toString
    }
    val driverPid = ProcessHandle.current().pid()
    val tClus0 = System.nanoTime()
    val spark = GraftSession.multiJvm(master, 32, Seq(jar))
    val pids = spark.sparkContext.parallelize(1 to 256, 64)
      .map(_ => ProcessHandle.current().pid()).distinct().collect().sorted.toSeq
    println(s"[cluster] driver pid=$driverPid executor pids=${pids.mkString(",")}")
    val clus = runAll(spark, sfDir, "cluster", qs)
    spark.stop()
    val wallClus = (System.nanoTime() - tClus0) / 1e9

    val names = qs.map(_._1)
    def matched(n: String): Boolean = (ref(n), clus(n)) match {
      case (Outcome(Some(a), _, None), Outcome(Some(b), _, None)) => a.matches(b)
      case _ => false
    }
    val mismatches = names.filter(n => !matched(n) && ref(n).err.isEmpty && clus(n).err.isEmpty)
    val errored = names.filter(n => ref(n).err.nonEmpty || clus(n).err.nonEmpty)
    val ok = names.count(matched)
    val multiJvmProven = pids.nonEmpty && !pids.contains(driverPid)

    val perQuery = names.map { n =>
      val (r, c) = (ref(n), clus(n))
      val fields = Seq(
        Some(s""""match": ${matched(n)}"""),
        r.digest.map(d => s""""rows": ${d.rows}"""),
        Some(f""""local_s": ${r.secs}%.3f"""),
        Some(f""""cluster_s": ${c.secs}%.3f"""),
        r.err.map(e => s""""err_local": ${jq(e)}"""),
        c.err.map(e => s""""err_cluster": ${jq(e)}""")).flatten
      s"${jq(n)}: {${fields.mkString(", ")}}"
    }.mkString(",\n    ")

    val json =
      s"""{
  "metric": "multi_jvm_validation",
  "round": 18,
  "master": ${jq(master)},
  "sf": ${jq(sfDir)},
  "driver_pid": $driverPid,
  "executor_pids": [${pids.mkString(", ")}],
  "multi_jvm_proven": $multiJvmProven,
  "queries_total": ${names.size},
  "matched": $ok,
  "mismatched": [${mismatches.map(jq).mkString(", ")}],
  "errored": [${errored.map(jq).mkString(", ")}],
  "wall_local_s": ${f"$wallLocal%.1f"},
  "wall_cluster_s": ${f"$wallClus%.1f"},
  "note": "digest = order-independent xxhash64 fold (count + xor + wraparound sum), doubles canonicalized at 6 significant digits (see ResultDigest scaladoc); corpus queries + 3 cluster-sensitive extras, each run under local[32] then under a forked-executor local-cluster, same box",
  "queries": {
    $perQuery
  }
}
"""
    Files.writeString(Paths.get(outPath), json)
    println(s"[cluster] $ok/${names.size} matched; mismatched=${mismatches.size} " +
      s"errored=${errored.size} multi_jvm_proven=$multiJvmProven -> $outPath")
  }
}
