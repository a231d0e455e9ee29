"""DuckDB SQL twins for plans/q_relational.py (pure string data).

Split out so the plan module stays under the 2,000-line readability
budget (VERDICT r3 #8); each constant is the ANSI-SQL oracle twin of
the same-named query function in q_relational.py — keep the pair in
sync when editing either side."""

from __future__ import annotations

_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
       COUNT(*) AS count_order,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

_TOP_CUST_SQL = """
WITH rev AS (
  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_orders
  FROM orders GROUP BY o_custkey
), j AS (
  SELECT c_custkey, c_name, c_mktsegment, revenue, n_orders,
         ROW_NUMBER() OVER (ORDER BY revenue DESC, c_custkey) AS rk
  FROM rev JOIN customer ON o_custkey = c_custkey
)
SELECT * FROM j WHERE rk <= 20
"""

_NATION_REV_SQL = """
SELECT r_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""

_ANTI_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE c_custkey NOT IN (
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
GROUP BY c_mktsegment
"""

_SEMI_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01'
)
GROUP BY o_orderpriority
"""

_RANK_SQL = """
SELECT n_name, rk, c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal
FROM (
  SELECT n_name, c_custkey, c_name, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS rk
  FROM customer JOIN nation ON c_nationkey = n_nationkey
) WHERE rk <= 3
"""

_ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""

_EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT)
             / (COUNT(*) * 1000000.0), 6) AS avg_value,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_value
FROM events GROUP BY 1, 2
"""

_EVENTS_JSON_SQL = """
SELECT event_type,
       ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       COUNT(*) AS n_events
FROM events GROUP BY event_type
"""

_SESSIONS_SQL = """
WITH g AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT user_id, ts, value,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM g
)
SELECT user_id, session_seq, COUNT(*) AS n_events,
       max(floor(epoch(ts))::BIGINT) - min(floor(epoch(ts))::BIGINT) AS duration_sec,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS session_value
FROM s GROUP BY user_id, session_seq
"""

_MIN_COST_SQL = """
SELECT n_name, s_suppkey, s_name, ROUND(s_acctbal, 2) AS acctbal
FROM supplier s
JOIN nation ON s_nationkey = n_nationkey
WHERE s_acctbal = (
  SELECT MIN(s2.s_acctbal) FROM supplier s2 WHERE s2.s_nationkey = s.s_nationkey
)
"""

_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
"""

_Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.09
  AND l_quantity < 24
"""

_Q20_SQL = """
WITH per_supp AS (
  SELECT l_suppkey, SUM(CAST(l_quantity AS BIGINT)) AS qty
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
  WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY 1
), totals AS (
  SELECT SUM(qty) AS grand, COUNT(*) AS n_supp FROM per_supp
)
SELECT s.s_suppkey, s.s_name, CAST(ps.qty AS BIGINT) AS promo_qty
FROM per_supp ps CROSS JOIN totals t
JOIN supplier s ON s.s_suppkey = ps.l_suppkey
WHERE ps.qty * t.n_supp * 2 > t.grand * 3
"""

_VARIANT_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       MAX(k) AS max_k,
       CAST(SUM(CASE WHEN k >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
FROM (
  SELECT event_type, CAST(json_extract(props, '$.k') AS INTEGER) AS k
  FROM events
)
GROUP BY event_type
"""

_USER_SCD2_SQL = """
WITH e AS (
  SELECT event_id, user_id, event_type, ts,
         CAST(floor(epoch(ts)) AS BIGINT) AS ep,
         lag(event_type) OVER w AS prev_state
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), c AS (
  -- NOTE: order by the full-precision ts (not floored ep) — events
  -- carry microseconds, and the Spark side's windows order by ts
  SELECT user_id, event_type, ep AS ep_from,
         ROW_NUMBER() OVER w AS run_no,
         lead(ep) OVER w AS ep_to
  FROM e
  WHERE prev_state IS NULL OR prev_state <> event_type
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_type,
       COUNT(*) AS n_runs,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CASE WHEN ep_to IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
       CAST(SUM(COALESCE(ep_to - ep_from, 0)) AS BIGINT) AS closed_dwell_sec,
       CAST(SUM(('0x' || substr(md5(
           CAST(user_id AS VARCHAR) || '|' || event_type || '|'
             || CAST(run_no AS VARCHAR) || '|'
             || CAST(ep_from AS VARCHAR) || '|'
             || COALESCE(CAST(ep_to AS VARCHAR), 'open')
       ), 1, 12))::BIGINT) AS BIGINT) AS runs_fp_sum
FROM c
GROUP BY event_type
"""

_Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
            AS DOUBLE) AS revenue,
       ROUND(MAX(c_acctbal), 2) AS c_acctbal
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

_TRANSITIONS_SQL = """
WITH p AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS from_state,
         event_type AS to_state
  FROM events
), m AS (
  SELECT from_state, to_state, COUNT(*) AS n
  FROM p WHERE from_state IS NOT NULL
  GROUP BY from_state, to_state
)
SELECT from_state, to_state, n,
       CAST(n * 1000000 // SUM(n) OVER (PARTITION BY from_state) AS BIGINT)
         AS p_q6,
       CAST(SUM(n) OVER (PARTITION BY from_state) AS BIGINT) AS row_total
FROM m
"""

_Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(rev) AS DOUBLE) AS revenue, COUNT(*) AS n_items
FROM (
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) AS rev
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
    AND ns.n_name <> nc.n_name
)
GROUP BY 1, 2, 3
"""

_Q8_SQL = """
WITH sold AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, ns.n_name AS supp_nation,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
              * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
              * 10000 AS BIGINT) AS rev_q4
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey AND p_type = 'PROMO'
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  JOIN region   ON nc.n_regionkey = r_regionkey AND r_name = 'ASIA'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  GROUP BY 1, 2
)
SELECT o_year, supp_nation, rev_q4,
       CAST(rev_q4 * 1000000 // SUM(rev_q4) OVER (PARTITION BY o_year) AS BIGINT)
         AS share_ppm
FROM sold
"""

_Q9_SQL = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
            AS DOUBLE) AS sum_profit,
       COUNT(*) AS n_items
FROM lineitem
JOIN part     ON l_partkey = p_partkey AND contains(p_name, 'widget')
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
GROUP BY 1, 2
"""

_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
"""

_Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
              * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
              * 10000 AS BIGINT) AS total_revenue_q4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, total_revenue_q4
FROM revenue JOIN supplier ON supplier_no = s_suppkey
WHERE total_revenue_q4 = (SELECT MAX(total_revenue_q4) FROM revenue)
"""

_Q17_SQL = """
WITH brand_li AS (
  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#13'
), stats AS (
  SELECT l_partkey AS pk, SUM(q) AS sum_q, COUNT(*) AS n_q
  FROM brand_li GROUP BY 1
)
SELECT total_price_cents, n_small,
       total_price_cents // 7 AS avg_yearly_cents
FROM (
  SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS total_price_cents,
         COUNT(*) AS n_small
  FROM brand_li JOIN stats ON l_partkey = pk
  WHERE 5 * q * n_q < sum_q
)
"""

_Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
            * 10000 AS BIGINT) AS revenue_e4,
       COUNT(*) AS n_items,
       CAST(SUM(CASE WHEN b1 THEN 1 ELSE 0 END) AS BIGINT) AS n_branch1,
       CAST(SUM(CASE WHEN b2 THEN 1 ELSE 0 END) AS BIGINT) AS n_branch2,
       CAST(SUM(CASE WHEN b3 THEN 1 ELSE 0 END) AS BIGINT) AS n_branch3
FROM (
  SELECT l_extendedprice, l_discount,
         (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 5
            AND CAST(l_quantity AS BIGINT) BETWEEN 1 AND 11)  AS b1,
         (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 10
            AND CAST(l_quantity AS BIGINT) BETWEEN 10 AND 20) AS b2,
         (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 15
            AND CAST(l_quantity AS BIGINT) BETWEEN 20 AND 30) AS b3
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
WHERE b1 OR b2 OR b3
"""

_Q22_SQL = """
WITH pos AS (
  SELECT c_custkey, CAST(c_custkey % 7 AS BIGINT) AS band,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents
  FROM customer
  WHERE CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) > 0
), stats AS (
  SELECT SUM(bal_cents) AS sum_cents, COUNT(*) AS n_pos FROM pos
)
SELECT band, COUNT(*) AS numcust,
       CAST(SUM(bal_cents) AS BIGINT) AS totacctbal_cents
FROM pos, stats
WHERE bal_cents * n_pos > sum_cents
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY band
"""

_Q16_SQL = """
WITH ps AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
)
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#9'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""

_Q21_SQL = """
WITH li AS (
  SELECT DISTINCT l_orderkey, l_suppkey, l_returnflag FROM lineitem
), l1 AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM li JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R' AND o_orderstatus = 'F'
)
SELECT s_suppkey, s_name, COUNT(*) AS numwait
FROM l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY 1, 2
"""

_INTERPOLATE_SQL = """
WITH hourly AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT)
           // COUNT(*) AS avg_q6
  FROM events GROUP BY 1, 2
), spine AS (
  SELECT event_type, unnest(range(MIN(hr), MAX(hr) + 1)) AS hour_epoch
  FROM hourly GROUP BY event_type
), g AS (
  SELECT s.event_type, s.hour_epoch, h.avg_q6
  FROM spine s LEFT JOIN hourly h
    ON s.event_type = h.event_type AND s.hour_epoch = h.hr
), w AS (
  SELECT *,
    last_value(avg_q6 IGNORE NULLS) OVER
      (PARTITION BY event_type ORDER BY hour_epoch
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    last_value(CASE WHEN avg_q6 IS NOT NULL THEN hour_epoch END IGNORE NULLS) OVER
      (PARTITION BY event_type ORDER BY hour_epoch
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
    first_value(avg_q6 IGNORE NULLS) OVER
      (PARTITION BY event_type ORDER BY hour_epoch
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN avg_q6 IS NOT NULL THEN hour_epoch END IGNORE NULLS) OVER
      (PARTITION BY event_type ORDER BY hour_epoch
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
  FROM g
)
SELECT event_type, hour_epoch,
       CAST(CASE
         WHEN avg_q6 IS NOT NULL THEN avg_q6
         WHEN pv IS NULL THEN nv
         WHEN nv IS NULL THEN pv
         ELSE (pv * (nt - hour_epoch) + nv * (hour_epoch - pt)) // (nt - pt)
       END AS BIGINT) AS value_q6,
       CASE
         WHEN avg_q6 IS NOT NULL THEN 'obs'
         WHEN pv IS NULL OR nv IS NULL THEN 'edge'
         ELSE 'interp'
       END AS src
FROM w
"""

_OUT_OF_ORDER_SQL = """
WITH e AS (
  SELECT user_id, event_id, event_type,
         md5(CAST(event_id AS VARCHAR)) AS arrival,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events
), l AS (
  SELECT *,
         MAX(sec) OVER (PARTITION BY user_id ORDER BY arrival
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS max_seen
  FROM e
)
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN max_seen IS NOT NULL AND sec < max_seen
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_out_of_order,
       MAX(CASE WHEN sec < max_seen THEN max_seen - sec END)
         AS max_backward_sec
FROM l GROUP BY event_type
"""

_PERCENT_RANK_SQL = """
WITH levels AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT event_type, cents, n_events,
       CASE WHEN COUNT(*) OVER (PARTITION BY event_type) = 1 THEN 0
            ELSE (rank() OVER (PARTITION BY event_type ORDER BY cents) - 1)
                 * 1000000 // (COUNT(*) OVER (PARTITION BY event_type) - 1)
       END AS pr_ppm
FROM levels
"""

_PIT_STATE_SQL = """
WITH ev AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         ts
  FROM events
), runs AS (
  SELECT user_id AS i_user, event_type AS state, sec AS ep_from,
         lead(sec) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ep_to
  FROM (
    SELECT *,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_state
    FROM ev
  )
  WHERE prev_state IS NULL OR prev_state <> event_type
)
SELECT e.event_type, r.state, COUNT(*) AS n_events
FROM ev e JOIN runs r
  ON e.user_id = r.i_user
 AND r.ep_from <= e.sec
 AND (r.ep_to IS NULL OR e.sec < r.ep_to)
GROUP BY 1, 2
"""

_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(CASE WHEN o_orderstatus IS NOT NULL THEN 1
                 WHEN o_orderpriority IS NOT NULL THEN 2
                 ELSE 3 END AS BIGINT) AS gid,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
         AS total_cents
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""

_UNPIVOT_SQL = """
WITH w AS (
  SELECT l_orderkey,
         CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS quantity,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS extendedprice,
         CAST(CAST(l_discount AS DECIMAL(5,2)) * 100 AS BIGINT) AS discount
  FROM lineitem
), long AS (
  UNPIVOT w ON quantity, extendedprice, discount
  INTO NAME measure VALUE v_cents
)
SELECT measure, COUNT(*) AS n,
       CAST(SUM(v_cents) AS BIGINT) AS sum_cents,
       MIN(v_cents) AS min_cents, MAX(v_cents) AS max_cents
FROM long GROUP BY measure
"""

_INTEGRITY_SQL = """
SELECT 'lineitem_orphans' AS check_name, COUNT(*) AS n_violations
FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
UNION ALL
SELECT 'orders_childless', COUNT(*)
FROM orders WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
UNION ALL
SELECT 'orders_ghost_customer', COUNT(*)
FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
"""

_PRICE_NTILE_SQL = """
WITH p AS (
  SELECT p_partkey,
         CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM part
), b AS (
  SELECT cents, ntile(10) OVER (ORDER BY cents, p_partkey) AS decile FROM p
)
SELECT decile, COUNT(*) AS n_parts,
       MIN(cents) AS min_cents, MAX(cents) AS max_cents,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM b GROUP BY decile
"""

_GAPFILL_SQL = """
WITH counts AS (
  -- floor(), not `// 3600` + CAST: DuckDB's // on DOUBLE is plain
  -- division and the BIGINT cast ROUNDS, shifting boundary rows up an hour
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr, COUNT(*) AS n_obs
  FROM events GROUP BY 1, 2
), spine AS (
  SELECT event_type, unnest(range(MIN(hr), MAX(hr) + 1)) AS hour_epoch
  FROM counts GROUP BY event_type
)
SELECT s.event_type, s.hour_epoch,
       COALESCE(c.n_obs, 0) AS n
FROM spine s LEFT JOIN counts c
  ON s.event_type = c.event_type AND s.hour_epoch = c.hr
"""
