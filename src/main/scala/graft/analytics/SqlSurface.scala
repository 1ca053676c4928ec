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
        ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q49: correlated scalar subquery — customers above their own
    // nation's average balance. Catalyst decorrelates this into an
    // aggregate + join; the textual form exercises that rewrite path
    // (the DataFrame twin would hand-write the join).
    GraftQuery(
      "q49_correlated_subquery",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        t.customer.createOrReplaceTempView("customer_v")
        spark.sql("""
          SELECT c_custkey,
                 c_nationkey,
                 CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal
          FROM customer_v c
          WHERE CAST(c_acctbal AS DECIMAL(12,2)) >
                (SELECT AVG(CAST(c2.c_acctbal AS DECIMAL(12,2)))
                 FROM customer_v c2
                 WHERE c2.c_nationkey = c.c_nationkey)
          ORDER BY c_custkey""")
      },
      Some("""
        SELECT c_custkey, c_nationkey,
               CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal
        FROM customer c
        WHERE CAST(c_acctbal AS DECIMAL(12,2)) >
              (SELECT AVG(CAST(c2.c_acctbal AS DECIMAL(12,2)))
               FROM customer c2
               WHERE c2.c_nationkey = c.c_nationkey)
        ORDER BY c_custkey""")),

    // ------------------------------------------------------------------
    // q50: multiset set operations — INTERSECT ALL / EXCEPT ALL keep
    // duplicate multiplicities (q09 covers the DISTINCT variants).
    GraftQuery(
      "q50_set_ops_all",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        val highValue = t.orders
          .filter(col("o_totalprice") > 150000).select(col("o_custkey"))
        val urgent = t.orders
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey"))
        val i = highValue.intersectAll(urgent).withColumn("op", lit("intersect_all"))
        val e = highValue.exceptAll(urgent).withColumn("op", lit("except_all"))
        i.union(e)
          .groupBy(col("op"), col("o_custkey").as("custkey"))
          .agg(count(lit(1)).as("multiplicity"))
          .orderBy(col("op"), col("custkey"))
      },
      Some("""
        WITH hv AS (SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000),
             ur AS (SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        SELECT op, custkey, COUNT(*) AS multiplicity FROM (
          SELECT 'intersect_all' AS op, custkey FROM (SELECT custkey FROM hv INTERSECT ALL SELECT custkey FROM ur)
          UNION ALL
          SELECT 'except_all' AS op, custkey FROM (SELECT custkey FROM hv EXCEPT ALL SELECT custkey FROM ur))
        GROUP BY op, custkey
        ORDER BY op, custkey""")),

    // ------------------------------------------------------------------
    // q62: subquery-predicate + lateral breadth — EXISTS and NOT IN
    // predicates (decorrelated into semi/anti joins by Catalyst) feeding
    // a correlated LATERAL top-2-per-nation subquery (DecorrelateInnerQuery
    // turns the correlated sort+limit into a partitioned window). The
    // oracle runs the same text modulo dialect.
    GraftQuery(
      "q62_exists_in_lateral",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        t.nation.createOrReplaceTempView("nation_v")
        t.customer.createOrReplaceTempView("customer_v")
        t.orders.createOrReplaceTempView("orders_v")
        spark.sql("""
          SELECT n.n_name, top.c_custkey, top.acctbal
          FROM nation_v n,
               LATERAL (
                 SELECT c.c_custkey,
                        CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal
                 FROM customer_v c
                 WHERE c.c_nationkey = n.n_nationkey
                   AND EXISTS (SELECT 1 FROM orders_v o
                               WHERE o.o_custkey = c.c_custkey)
                   AND c.c_custkey NOT IN
                       (SELECT o_custkey FROM orders_v
                        WHERE o_orderpriority = '5-LOW')
                 ORDER BY CAST(c.c_acctbal AS DECIMAL(12,2)) DESC, c.c_custkey
                 LIMIT 2) AS top
          ORDER BY n.n_name, top.acctbal DESC, top.c_custkey""")
      },
      Some("""
        SELECT n.n_name, top.c_custkey, top.acctbal
        FROM nation n,
             LATERAL (
               SELECT c.c_custkey,
                      CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal
               FROM customer c
               WHERE c.c_nationkey = n.n_nationkey
                 AND EXISTS (SELECT 1 FROM orders o
                             WHERE o.o_custkey = c.c_custkey)
                 AND c.c_custkey NOT IN
                     (SELECT o_custkey FROM orders
                      WHERE o_orderpriority = '5-LOW')
               ORDER BY CAST(c.c_acctbal AS DECIMAL(12,2)) DESC, c.c_custkey
               LIMIT 2) AS top
        ORDER BY n.n_name, top.acctbal DESC, top.c_custkey""")),

    // ------------------------------------------------------------------
    // q71: recursive CTE (Spark 4's WITH RECURSIVE, UNION ALL form) —
    // each customer's ancestor chain in the implicit binary-tree
    // hierarchy custkey → floor(custkey/2). The recursion is a tree
    // walk (one parent per node), so UNION ALL terminates without the
    // (unsupported) UNION-distinct fixpoint; the same text runs in
    // DuckDB. Complements the iterative DataFrame CC operators
    // (q44/q52): graph reachability declared in SQL, executed by the
    // engine's recursion machinery.
    GraftQuery(
      "q71_recursive_cte",
      (spark, dir) => {
        val t = new Tables(spark, dir)
        t.customer.createOrReplaceTempView("customer_v")
        spark.sql("""
          WITH RECURSIVE anc(custkey, node, depth) AS (
            SELECT c_custkey, c_custkey, CAST(0 AS INT) FROM customer_v
            UNION ALL
            SELECT custkey, CAST(floor(node / 2.0) AS BIGINT), depth + 1
            FROM anc WHERE node > 1)
          SELECT custkey, MAX(depth) AS chain_len,
                 CAST(COUNT(*) AS BIGINT) AS n_nodes
          FROM anc GROUP BY custkey ORDER BY custkey""")
      },
      Some("""
        WITH RECURSIVE anc(custkey, node, depth) AS (
          SELECT c_custkey, c_custkey, CAST(0 AS INT) FROM customer
          UNION ALL
          SELECT custkey, CAST(floor(node / 2.0) AS BIGINT), depth + 1
          FROM anc WHERE node > 1)
        SELECT custkey, MAX(depth) AS chain_len,
               CAST(COUNT(*) AS BIGINT) AS n_nodes
        FROM anc GROUP BY custkey ORDER BY custkey"""))
  )
}
