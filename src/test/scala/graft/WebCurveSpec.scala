package graft

import graft.ops.UrlOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** URL canonicalization invariants + the NB filter threshold curve's
  * monotone structure.
  */
class WebCurveSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("canonical urls carry no fragments, tracking params, or host case") {
    val rows = SparkEntry.queries("url_canonicalize")(spark, sf).collect()
    assert(rows.length > 10)
    rows.foreach { r =>
      val c = r.getAs[String]("canon_url")
      assert(!c.contains("#"), s"fragment survived: $c")
      assert(!c.contains("utm_"), s"tracking param survived: $c")
      assert(!c.contains("gclid"), s"tracking param survived: $c")
      val host = c.replaceFirst("^[a-z]+://", "").takeWhile(ch =>
        ch != '/' && ch != '?')
      assert(host == host.toLowerCase, s"host case survived: $c")
      assert(c.startsWith("http://") || c.startsWith("https://"))
      // an emptied query string must drop its '?'
      assert(!c.endsWith("?"), s"dangling '?': $c")
    }
  }

  test("canonicalization is idempotent and port rules are scheme-aware") {
    val canon = SparkEntry.queries("url_canonicalize")(spark, sf)
    val twice = canon
      .select(col("doc_id"), col("canon_url"),
        UrlOps.canonicalize(col("canon_url")).as("canon2"))
      .filter(col("canon_url") =!= col("canon2"))
      .collect()
    assert(twice.isEmpty,
      s"not idempotent: ${twice.headOption.map(_.mkString(" | "))}")
    val all = canon.collect().map(_.getAs[String]("canon_url"))
    // https default :443 stripped everywhere...
    assert(!all.exists(u => u.startsWith("https://") && u.contains(":443")),
      "default https port survived")
    // ...but http://host:443 is NOT default and must survive
    // (doc_id % 15 == 0 pairs the HTTP scheme with the :443 port)
    assert(all.exists(u => u.startsWith("http://") && u.contains(":443")),
      "non-default :443 on http was wrongly stripped")
    // non-default :8080 kept
    assert(all.exists(_.contains(":8080")), "non-default port stripped")
  }

  test("domain quota sampler caps every domain at min(quota, |domain|)") {
    val sample = SparkEntry.queries("domain_quota_sample")(spark, sf)
      .groupBy(col("domain")).agg(count(lit(1)).as("n"),
        max(col("samp_rank")).as("maxr")).collect()
    val full = SparkEntry.queries("domain_stats")(spark, sf)
      .select(col("domain"), col("n_docs")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sample.foreach { r =>
      val (d, n, maxr) = (r.getString(0), r.getLong(1), r.getInt(2))
      assert(n <= 10 && maxr.toLong == n, s"$d: n=$n maxr=$maxr")
      assert(n == math.min(10L, full(d)), s"$d under-filled: $n of ${full(d)}")
    }
  }

  test("dedup threshold curve: pairs/docs non-increasing, mean jaccard non-decreasing") {
    val curve = SparkEntry.queries("dedup_threshold_curve")(spark, sf)
      .collect()
    assert(curve.length == 7)
    val np = curve.map(_.getAs[Long]("n_pairs"))
    assert(np.zip(np.tail).forall { case (a, b) => a >= b },
      s"n_pairs not monotone: ${np.mkString(",")}")
    val nd = curve.map(_.getAs[Long]("n_docs"))
    assert(nd.zip(nd.tail).forall { case (a, b) => a >= b },
      s"n_docs not monotone: ${nd.mkString(",")}")
    // raising the cut can only remove the LOWEST-jaccard pairs, so the
    // survivors' mean never decreases (on arms that keep any pairs)
    val mj = curve.flatMap(r => Option(r.getAs[java.lang.Double]("mean_jaccard"))
      .map(_.doubleValue))
    assert(mj.zip(mj.tail).forall { case (a, b) => a <= b },
      s"mean_jaccard not monotone: ${mj.mkString(",")}")
  }

  test("quality threshold curve: docs and tokens kept are non-increasing in the gate") {
    val curve = SparkEntry.queries("quality_threshold_curve")(spark, sf)
      .collect()
    assert(curve.length == 6)
    val nd = curve.map(_.getAs[Long]("n_docs"))
    assert(nd.zip(nd.tail).forall { case (a, b) => a >= b },
      s"n_docs not monotone: ${nd.mkString(",")}")
    val nt = curve.map(_.getAs[Long]("n_tokens"))
    assert(nt.zip(nt.tail).forall { case (a, b) => a >= b },
      s"n_tokens not monotone: ${nt.mkString(",")}")
    assert(nd.head > nd.last, "the gate never moved on this fixture")
    // fractions agree with counts
    curve.foreach { r =>
      assert(r.getAs[Double]("doc_frac") <= 1.0 &&
        r.getAs[Double]("token_frac") <= 1.0)
    }
  }

  test("nb threshold curve: selection and recall are non-increasing in the threshold") {
    val curve = SparkEntry.queries("nb_filter_threshold_curve")(spark, sf)
      .collect()
    assert(curve.length == 7)
    val sel = curve.map(_.getAs[Long]("n_selected"))
    assert(sel.zip(sel.tail).forall { case (a, b) => a >= b },
      s"n_selected not monotone: ${sel.mkString(",")}")
    val rec = curve.map(_.getAs[Double]("recall"))
    assert(rec.zip(rec.tail).forall { case (a, b) => a >= b },
      s"recall not monotone: ${rec.mkString(",")}")
    // the knob actually moves on this fixture
    assert(sel.head > sel.last, "all arms selected the same set")
  }
}
