package graft.tools

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** QUERIES.md generator — the registry index that keeps reviews (and
  * users) oriented now that the registry spans a dozen files: one row
  * per registered query with its family, defining file:line, oracle
  * kind, and the latest bench median from BENCH_FULL.json.
  *
  * Everything derives from the registry + the source tree + the
  * checked-in bench JSON, so the doc cannot drift silently:
  * QueriesDocSpec regenerates the row set and asserts the checked-in
  * file matches. Regenerate with:
  *
  *   sbt "runMain graft.tools.QueriesDoc"
  */
object QueriesDoc {

  /** (file, line) of each `Q("name"` definition under the queries dir. */
  def definitionSites(root: String = "src/main/scala/graft/queries")
      : Map[String, String] = {
    val defs = scala.collection.mutable.Map.empty[String, String]
    Files.list(Paths.get(root)).iterator().asScala
      .filter(_.toString.endsWith(".scala")).foreach { p =>
        Files.readAllLines(p).asScala.zipWithIndex.foreach {
          case (line, i) =>
            val m = """Q\("([a-z0-9_]+)"""".r.findFirstMatchIn(line)
            m.foreach(mm =>
              defs(mm.group(1)) = s"${p.getFileName}:${i + 1}")
        }
      }
    defs.toMap
  }

  /** Bench medians from BENCH_FULL.json (absent → "—"). */
  def benchMedians(path: String = "BENCH_FULL.json"): Map[String, String] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) Map.empty
    else {
      val txt = Files.readString(p)
      val qs = """"queries":\{([^}]*)\}""".r.findFirstMatchIn(txt)
        .map(_.group(1)).getOrElse("")
      """"([a-z0-9_]+)":([0-9.]+)""".r.findAllMatchIn(qs)
        .map(m => m.group(1) -> s"${m.group(2)} s").toMap
    }
  }

  /** Per-family 100 TB posture in one line — the audit summary the
    * round-8 verdict asked for, distilled from the scale-shape comments
    * in each family's source (where the full argument + the decade
    * measurements in BASELINE.md live). */
  val familyScaleShape: Map[String, String] = Map(
    "TickQueries" -> ("narrow normalize maps + symbol/day-keyed window " +
      "aggs; bars shuffle once on the (symbol, bucket) key"),
    "RelationalQueries" -> ("TPC-H shapes: dim sides broadcast, fact " +
      "joins equality-shuffled on their keys, AQE handles skew"),
    "TextQueries" -> ("per-row-pure narrow maps (token/quality/PII/" +
      "tokenizer apply); BPE fit collects only the vocab-capped word " +
      "table — the merge list IS the model"),
    "CorpusQueries" -> ("deterministic md5-fill samplers, bounded " +
      "explodes (≤5×), three-level hierarchical prefix sum for packing " +
      "— no corpus-sized single-task stage"),
    "DedupQueries" -> ("every pair-producer goes through a banded/" +
      "blocked index with df/band hot-key caps — never all-pairs; " +
      "clusters via distributed min-label propagation"),
    "RetrievalQueries" -> ("token-sharded postings ⋈ broadcast query " +
      "probes; incremental df updates touch only the batch vocabulary"),
    "ClassifierQueries" -> ("models are vocab×classes / dim+1 bounded " +
      "tables, broadcast for scoring; training is epochs × one " +
      "distributed agg"),
    "SimilarityQueries" -> ("IVF/LSH/PQ candidate-block joins with " +
      "hot-cell caps; centroids/LUTs are plan constants; brute arms " +
      "are labeled EVAL BASELINE, dropped at scale"),
    "PipelineQueries" -> ("one cached scan fans into QC branches; " +
      "warehouse/catalog writes are one-shuffle partitionBy jobs"),
    "ExtraQueries" -> ("scalar-broadcast analytics + sketch rollups; " +
      "register/grid-bounded state, mergeable across shards"),
    "AnalyticsQueries" -> ("CMS/HLL/KMV sketches: counter-grid-bounded " +
      "state, associative merges; exact eval arms staged and labeled " +
      "for drop at scale"),
    "SourceQueries" -> ("zip/CSV ingest streams partition-local; " +
      "reconcile joins broadcast the official (dimension) side"),
    "BehaviorQueries" -> ("user-keyed session/funnel windows — state " +
      "bounded per key; streaming twins share the batch oracles"),
    "LinkageQueries" -> ("blocked candidate joins (first-char/name " +
      "keys) — the all-pairs arm exists only as an eval baseline"),
    "GraphQueries" -> ("Pregel-as-joins: edge list sharded by node " +
      "key, rank rounds are equality join + bounded agg with decimal " +
      "fixed-point early stop"),
    "WebQueries" -> ("codegen'd per-row URL canonicalization; all " +
      "stats/quotas keyed by domain — windows see |domain| rows, emit " +
      "≤ quota"))

  /** The full markdown document. */
  def render(): String = {
    val sites = definitionSites()
    val bench = benchMedians()
    val sb = new StringBuilder
    val total = graft.SparkEntry.registry.size
    sb ++= "# QUERIES — registry index (generated)\n\n"
    sb ++= s"One row per registered query ($total total). Regenerate with\n"
    sb ++= "`sbt \"runMain graft.tools.QueriesDoc\"` — QueriesDocSpec fails if\n"
    sb ++= "this file and the registry drift. Bench column = sf0.1 median from\n"
    sb ++= "the checked-in BENCH_FULL.json at generation time. Each family\n"
    sb ++= "carries its one-line 100 TB scale shape; the full arguments live\n"
    sb ++= "as scale-shape comments at the definition sites and as decade\n"
    sb ++= "(10×) measurements in BASELINE.md.\n"
    graft.SparkEntry.families.foreach { case (family, qs) =>
      sb ++= s"\n## $family (${qs.size})\n\n"
      familyScaleShape.get(family).foreach { shape =>
        sb ++= s"*Scale shape:* $shape.\n\n"
      }
      sb ++= "| query | oracle | defined at | bench sf0.1 |\n"
      sb ++= "|---|---|---|---|\n"
      qs.foreach { q =>
        val oracle = if (q.oracle.isDefined) "SQL hash" else "rows-only"
        val site = sites.getOrElse(q.name, "?")
        val b = bench.getOrElse(q.name, "—")
        sb ++= s"| ${q.name} | $oracle | $site | $b |\n"
      }
    }
    sb.result()
  }

  def main(args: Array[String]): Unit = {
    Files.writeString(Paths.get("QUERIES.md"), render())
    println(s"[queriesdoc] wrote QUERIES.md (${graft.SparkEntry.registry.size} queries)")
  }
}
