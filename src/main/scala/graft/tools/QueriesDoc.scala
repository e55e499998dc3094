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
    sb ++= "the checked-in BENCH_FULL.json at generation time.\n"
    graft.SparkEntry.families.foreach { case (family, qs) =>
      sb ++= s"\n## $family (${qs.size})\n\n"
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
