package graft.analytics

import org.apache.spark.sql.functions._
import graft.{GraftFunctions, GraftQuery, Tables}

/** The `spark.sql` textual surface (oracle note: the poly_hash oracle
  * folds per-character ascii() codepoints, equal to the engine's UTF-8
  * byte fold only for ASCII corpora — which the testdata is; the engine
  * itself is well-defined on arbitrary UTF-8, see ExtSpec's golden test): temp views + SQL text + the engine's
  * native functions registered into the session FunctionRegistry
  * ([[graft.GraftExtensions]]) — the same codegen'd expressions reachable
  * from SQL as from the Column API.
  */
object SqlSurface {

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q42_sql_interface",
      (spark, dir) => {
        GraftFunctions.registerAll(spark)
        val t = new Tables(spark, dir)
        t.documents.createOrReplaceTempView("documents_v")
        spark.sql("""
          SELECT doc_id,
                 poly_hash(text) AS poly_hash,
                 size(hashed_shingles(text, 3)) AS n_shingles
          FROM documents_v
          ORDER BY doc_id""")
      },
      Some("""
        WITH words AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
        SELECT doc_id,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(1, length(text) + 1),
                   i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT))),
                 (a, b) -> (a * 31 + b) % 1000000007) AS poly_hash,
               CAST(len(CASE WHEN len(w) >= 3
                 THEN list_distinct(list_transform(generate_series(1, len(w)-2),
                   i -> concat(w[i], ' ', w[i+1], ' ', w[i+2])))
                 ELSE [array_to_string(w, ' ')] END) AS INT) AS n_shingles
        FROM words
        ORDER BY doc_id"""))
  )
}
