"""DuckDB-runnable SQL twins for the declared queries.

One entry per key in ``plans.queries.QUERIES``. Same alias for every
computed column (the compare sorts columns by name); types are kept
aligned (counts → BIGINT, date parts → BIGINT, money → DECIMAL(18,2),
rounded floats → DOUBLE, day grains → DATE).
"""

from __future__ import annotations

ORACLES: dict[str, str] = {
    "q03_partition_day_filter": """
        SELECT l_orderkey, l_linenumber,
               l_extendedprice AS ep
        FROM lineitem WHERE date_trunc('day', l_shipdate) = DATE '1995-06-17'
        ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST
    """,
    "q04_computed_projection": """
        SELECT o_orderkey, ROUND(o_totalprice / 1024, 2) AS price_kb,
               CAST(year(o_orderdate) AS BIGINT) AS y,
               CAST(month(o_orderdate) AS BIGINT) AS m,
               CAST(day(o_orderdate) AS BIGINT) AS d
        FROM orders ORDER BY o_orderkey NULLS FIRST LIMIT 500
    """,
    "q09_theta_change_join": """
        SELECT l.l_orderkey, l.l_linenumber
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_extendedprice > o.o_totalprice * 0.5
        ORDER BY l.l_orderkey NULLS FIRST, l.l_linenumber NULLS FIRST
    """,
    "q10_anti_join": """
        SELECT c.c_custkey FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
        ORDER BY c.c_custkey NULLS FIRST
    """,
    "q12_correlated_scalar_count": """
        SELECT o.o_orderkey,
               (SELECT COUNT(*) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) AS n_lines
        FROM orders o ORDER BY o.o_orderkey NULLS FIRST LIMIT 2000
    """,
    "q13_single_key_agg": """
        SELECT c_mktsegment, COUNT(*) AS total
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment NULLS FIRST
    """,
    "q15_conditional_agg": """
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
               CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
               ROUND(AVG(l_quantity), 2) AS avg_qty, MAX(l_shipdate) AS last_ship
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag NULLS FIRST
    """,
    "q16_daily_rollup": """
        SELECT CAST(date_trunc('day', ts) AS DATE) AS d, COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1 ORDER BY d NULLS FIRST
    """,
    # r15 optimization round: restored from RETIRED_ORACLES (the
    # optimization driver forbids query removals; see plans/queries.py).
    "q17_scalar_agg_gate": """
        SELECT COUNT(*) AS n FROM orders
        WHERE o_orderstatus = 'O' AND o_totalprice > 100000
    """,
    "q18_latest_per_key": """
        SELECT user_id, event_id FROM (
          SELECT user_id, event_id,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) t WHERE rn = 1
        ORDER BY user_id NULLS FIRST
    """,
    "q19_topk": """
        SELECT event_id, user_id, event_type FROM events
        ORDER BY ts DESC, event_id DESC LIMIT 5
    """,
    "q20_string_functions": """
        SELECT p_partkey, lower(trim(substring(p_name, 1, 10))) AS s,
               replace(p_type, ' ', '_') AS t,
               concat(p_brand, ':', p_type) AS b
        FROM part ORDER BY p_partkey NULLS FIRST LIMIT 1000
    """,
    "q21_union_all": """
        SELECT s, k FROM (
          SELECT 'hi' AS s, o_orderkey AS k FROM orders WHERE o_totalprice >= 150000
          UNION ALL
          SELECT 'lo' AS s, o_orderkey AS k FROM orders WHERE o_totalprice < 1000
        ) u ORDER BY s NULLS FIRST, k NULLS FIRST
    """,
    "q22_except": """
        SELECT c_custkey FROM customer WHERE c_acctbal > 0
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_totalprice > 400000
        ORDER BY c_custkey NULLS FIRST
    """,
    "q23_intersect": """
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        INTERSECT
        SELECT o_custkey FROM orders
        ORDER BY c_custkey NULLS FIRST
    """,
    "q24_regex_extract": """
        SELECT p_partkey,
               CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS INTEGER) AS brand_num
        FROM part WHERE regexp_extract(p_brand, '([0-9]+)', 1) <> ''
        ORDER BY p_partkey NULLS FIRST
    """,
    "q25_relative_date": """
        SELECT o_orderkey, o_orderdate,
               CASE WHEN o_orderpriority = '1-URGENT' THEN o_orderdate - INTERVAL 1 DAY
                    WHEN o_orderpriority = '2-HIGH'   THEN o_orderdate - INTERVAL 7 DAY
                    ELSE o_orderdate END AS adj_date
        FROM orders ORDER BY o_orderkey NULLS FIRST LIMIT 1000
    """,
    "q27_props_extract": """
        SELECT event_id, regexp_extract(props, '"([A-Za-z_]+)"', 1) AS first_key
        FROM events ORDER BY event_id NULLS FIRST LIMIT 1000
    """,
    "q28_tumbling_daily_window": """
        SELECT CAST(date_trunc('day', ts) AS DATE) AS w, event_type, COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
        FROM events GROUP BY 1, 2
        ORDER BY w NULLS FIRST, event_type NULLS FIRST
    """,
    "q29_session_gap": """
        SELECT user_id, COUNT(*) AS n_sessions FROM (
          SELECT user_id,
                 CASE WHEN prev_ts IS NULL OR ts >= prev_ts + INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_s
          FROM (SELECT user_id, ts,
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
                FROM events) a ) b
        WHERE new_s = 1 GROUP BY user_id ORDER BY user_id NULLS FIRST
    """,
    "q30_keyed_upsert": """
        SELECT user_id, event_type, value FROM (
          SELECT user_id, event_type, ROUND(value, 2) AS value,
                 ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) t WHERE rn = 1
        ORDER BY user_id NULLS FIRST, event_type NULLS FIRST
    """,
    "q31_duplicate_detection": """
        SELECT source, COUNT(*) AS n FROM documents
        GROUP BY source HAVING COUNT(*) > 1 ORDER BY source NULLS FIRST
    """,
    "q32_text_stats": """
        SELECT lang, COUNT(*) AS n_docs, ROUND(AVG(n_chars), 2) AS avg_len
        FROM documents WHERE n_chars >= 10
        GROUP BY lang ORDER BY lang NULLS FIRST
    """,
}


# DuckDB twins for the retired-registry queries (see
# queries.RETIRED_QUERIES): exercised every suite run by
# tests/test_retired_oracles.py instead of the driver rotation.
RETIRED_ORACLES: dict[str, str] = {
    "q01_scan_filter_sort": """
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice AS price
        FROM orders WHERE o_orderstatus = 'F'
        ORDER BY o_orderkey NULLS FIRST LIMIT 1000
    """,
    "q02_project_rename": """
        SELECT n_nationkey AS nation_sk, lower(n_name) AS nation_name, n_regionkey
        FROM nation ORDER BY nation_sk NULLS FIRST
    """,
    "q06_validity_filter": """
        SELECT c_custkey FROM customer
        WHERE c_name IS NOT NULL AND c_name <> '' AND c_acctbal > 0
        ORDER BY c_custkey NULLS FIRST
    """,
    "q05_like_prefix": """
        SELECT p_partkey, p_brand FROM part WHERE p_brand LIKE 'Brand#1%'
        ORDER BY p_partkey NULLS FIRST
    """,
    "q07_inner_equijoin": """
        SELECT o.o_orderkey, c.c_custkey, c.c_mktsegment
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
        ORDER BY o.o_orderkey NULLS FIRST, c.c_custkey NULLS FIRST LIMIT 2000
    """,
    "q08_broadcast_dim_chain": """
        SELECT c.c_custkey, n.n_name, r.r_name
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                        JOIN region r ON n.n_regionkey = r.r_regionkey
        ORDER BY c.c_custkey NULLS FIRST LIMIT 2000
    """,
    "q11_semi_join": """
        SELECT p.p_partkey FROM part p
        WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
        ORDER BY p.p_partkey NULLS FIRST LIMIT 2000
    """,
    "q14_grouping_sets": """
        SELECT c_mktsegment, c_nationkey, COUNT(*) AS total
        FROM customer GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST, total NULLS FIRST
    """,
    "q26_md5_fingerprint": """
        SELECT doc_id, md5(text) AS h FROM documents
        ORDER BY doc_id NULLS FIRST LIMIT 500
    """,
}
