package graft.core

/** ANSI/DuckDB SQL re-derivation of [[Namespace.inodes]] — prepended as a
  * CTE to every `q_ns_*` oracle query so the driver's DuckDB check recomputes
  * the identical namespace from the same parquet tables.
  *
  * Must stay in lock-step with [[Namespace]]; `tools/check_oracle.py`
  * verifies the match locally before the driver does.
  */
object NamespaceSql {

  /** `WITH`-clause body defining `inodes` (and helper CTEs). Append query
    * text after it, e.g. `s"$cte SELECT ... FROM inodes ..."`. */
  val cte: String = """
WITH cust AS (
  SELECT c_custkey,
         lower(r_name) AS rdir,
         lower(n_name) AS ndir,
         'user_' || CAST(c_custkey % 20 AS varchar) AS owner,
         'grp_' || lower(n_name) AS grp
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
), ordcust AS (
  SELECT o_orderkey, rdir, ndir, owner, grp
  FROM orders JOIN cust ON o_custkey = c_custkey
), fbase AS (
  SELECT '/' || rdir || '/' || ndir || '/' || owner || '/order_' || CAST(o_orderkey AS varchar) AS dir,
         'part_' || CAST(l_partkey AS varchar) || '_' || CAST(l_linenumber AS varchar) AS name,
         owner, grp,
         CAST(floor(l_extendedprice * 100) AS bigint) AS size,
         (1 + l_linenumber % 3) AS repl,
         CAST(floor(epoch(l_shipdate)) AS bigint) AS mtime_sec
  FROM lineitem JOIN ordcust ON l_orderkey = o_orderkey
), files AS (
  SELECT dir || '/' || name AS path, name, 'F' AS ftype, owner, grp,
         '0644' AS perm, size,
         size * repl AS csize, repl,
         CAST(ceil(size / 65536.0) AS bigint) AS blocks,
         mtime_sec, 5 AS depth
  FROM fbase
), dirs AS (
  SELECT DISTINCT
         '/' || rdir || '/' || ndir || '/' || owner || '/order_' || CAST(o_orderkey AS varchar) AS path,
         'order_' || CAST(o_orderkey AS varchar) AS name, 'D' AS ftype, owner, grp,
         '0755' AS perm, CAST(0 AS bigint) AS size, CAST(0 AS bigint) AS csize,
         0 AS repl, CAST(0 AS bigint) AS blocks, CAST(0 AS bigint) AS mtime_sec, 4 AS depth
  FROM ordcust
  UNION ALL
  SELECT DISTINCT '/' || rdir || '/' || ndir || '/' || owner, owner, 'D', owner, grp,
         '0755', CAST(0 AS bigint), CAST(0 AS bigint), 0, CAST(0 AS bigint), CAST(0 AS bigint), 3
  FROM cust
  UNION ALL
  SELECT DISTINCT '/' || rdir || '/' || ndir, ndir, 'D', 'hdfs', 'hadoop',
         '0755', CAST(0 AS bigint), CAST(0 AS bigint), 0, CAST(0 AS bigint), CAST(0 AS bigint), 2
  FROM cust
  UNION ALL
  SELECT DISTINCT '/' || rdir, rdir, 'D', 'hdfs', 'hadoop',
         '0755', CAST(0 AS bigint), CAST(0 AS bigint), 0, CAST(0 AS bigint), CAST(0 AS bigint), 1
  FROM cust
  UNION ALL
  SELECT '/', '', 'D', 'hdfs', 'hadoop',
         '0755', CAST(0 AS bigint), CAST(0 AS bigint), 0, CAST(0 AS bigint), CAST(0 AS bigint), 0
), symlinks AS (
  SELECT '/' || rdir || '/' || ndir || '/' || owner || '/link_' || CAST(c_custkey AS varchar) AS path,
         'link_' || CAST(c_custkey AS varchar) AS name, 'S' AS ftype, owner, grp,
         '0777' AS perm, CAST(0 AS bigint) AS size, CAST(0 AS bigint) AS csize,
         0 AS repl, CAST(0 AS bigint) AS blocks, CAST(0 AS bigint) AS mtime_sec, 4 AS depth
  FROM cust WHERE c_custkey % 50 = 0
), inodes AS (
  SELECT * FROM files
  UNION ALL SELECT * FROM dirs
  UNION ALL SELECT * FROM symlinks
)
"""
}
