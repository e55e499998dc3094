package graft.queries

import graft.functions.Hashing
import graft.ops.TextOps

/** Shared DuckDB SQL fragments that mirror the Spark-side operators.
  * One source of truth: constants (token pattern, stopword lists, affine
  * coefficients) come from the same Scala objects the Spark plans use.
  */
object OracleFrags {

  /** Whitespace tokens of `text` (trimmed). */
  val toks = "regexp_split_to_array(trim(text), '\\s+')"

  /** Distinct word k-shingles of a token list expression. */
  def shingles(toksExpr: String, k: Int): String =
    s"""CASE WHEN len($toksExpr) >= $k THEN
       |list_distinct(list_transform(range(1, len($toksExpr) - ${k - 1} + 1),
       |  i -> array_to_string(($toksExpr)[i:i+${k - 1}], ' ')))
       |ELSE [] END""".stripMargin.replace("\n", " ")

  /** Occurrence count of tokens from a fixed word list. */
  def stopwordHits(toksExpr: String, words: Seq[String]): String = {
    val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter($toksExpr, t -> list_contains($lst, t)))"
  }

  /** L2-normalized corpus — mirrors ops.SimilarityOps.normalizedCorpus
    * (norm computed once per row, same fold order). */
  val normCorpus: String =
    """SELECT vec_id, list_transform(embedding, x -> x::DOUBLE / nrm) AS n_emb
      |FROM (SELECT vec_id, embedding,
      |  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
      |  FROM embeddings)""".stripMargin.replace("\n", " ")

  /** Dot product of two pre-normalized double lists, rounded to 6
    * decimals — mirrors ops.SimilarityOps.dotCosine. */
  def dotCosine(a: String, b: String, dim: Int = 64): String =
    s"round(list_sum(list_transform(range(1, ${dim + 1}), i -> ($a)[i] * ($b)[i])), 6)"

  /** 31-bit md5-based hash — mirrors functions.Hashing.h31. */
  def h31(expr: String): String = Hashing.sqlH31(expr)

  /** MinHash signature columns sig_0..sig_{n-1} as SELECT items over the
    * hashed inverted-index relation (column `h` = 31-bit base hash). */
  def minhashAggs(nHashes: Int): String =
    Hashing.affineCoeffs(nHashes).zipWithIndex.map { case ((a, b), i) =>
      s"min(${Hashing.sqlAffine("h", a, b)}) AS sig_$i"
    }.mkString(", ")

  /** The (doc_id, shingle) inverted index over documents. */
  def docShingles(k: Int): String =
    s"""SELECT doc_id, unnest(${shingles(toks, k)}) AS shingle
       |FROM documents""".stripMargin.replace("\n", " ")

  /** Hash-keyed inverted index — mirrors ops.DedupOps.docShingleHashes
    * (sh_h = 60-bit md5 hash, h = 31-bit fold for minhash). */
  def docShingleHashes(k: Int): String =
    s"""SELECT doc_id, ${Hashing.sqlMd5Long("shingle")} AS sh_h,
       |${h31("shingle")} AS h FROM (${docShingles(k)})"""
      .stripMargin.replace("\n", " ")

  /** Language scores + CASE-chain argmax — mirrors ops.TextOps.langId. */
  def langScores: String =
    TextOps.StopwordSets.map { case (l, ws) =>
      s"${stopwordHits("toks", ws)} AS score_$l"
    }.mkString(", ")

  def langCase: String = {
    val langs = TextOps.StopwordSets.map(_._1)
    val whens = langs.dropRight(1).map { l =>
      val cond = langs.filter(_ != l)
        .map(o => s"score_$l >= score_$o").mkString(" AND ")
      s"WHEN $cond THEN '$l'"
    }.mkString(" ")
    s"CASE $whens ELSE '${langs.last}' END"
  }
}
