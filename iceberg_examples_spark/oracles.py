"""DuckDB oracle SQL for every declared query.

Each entry recomputes the matching ``queries()`` result in ANSI SQL on the
same inputs (testdata views for pure queries; inline VALUES for the
reference-scenario fixtures). Aliases match the Spark side exactly — the
driver sorts columns by name before hashing.

Floating-point discipline: any aggregate over doubles goes through the same
scaled-integer formulation as the Spark side (functions/exact.py), so both
engines do exact BIGINT accumulation and one identical trailing double op.
"""

from __future__ import annotations

from iceberg_examples_spark.functions.exact import money_avg_sql, money_sum_sql
from iceberg_examples_spark.oracles_ext import EXT_ORACLES

ORACLES: dict[str, str] = {}
ORACLES.update(EXT_ORACLES)

# ---- pure relational ----------------------------------------------------

ORACLES["scan_full"] = "SELECT * FROM nation"

ORACLES["project_literals"] = """
SELECT CAST(3 AS BIGINT) AS customer_id,
       'customer_c-insert(with merge sql)' AS name,
       'lastname-3-insert(with merge sql)' AS lastname
"""

ORACLES["filter_conj"] = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE l_returnflag = 'R' AND l_linestatus = 'F'
"""

ORACLES["join_inner"] = """
SELECT o_orderkey, o_custkey, c_name, o_totalprice, o_orderstatus
FROM orders
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
"""

ORACLES["union_all"] = """
SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS side FROM customer
UNION ALL
SELECT s_name AS name, s_acctbal AS acctbal, 'supplier' AS side FROM supplier
"""

ORACLES["sort_multi"] = """
SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
FROM orders
ORDER BY o_custkey, o_orderkey
"""

ORACLES["topk"] = """
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 25
"""

ORACLES["agg_sum_by_key"] = f"""
SELECT l_returnflag, l_linestatus,
       {money_sum_sql('l_quantity', scale=100)} AS sum_qty,
       {money_sum_sql('l_extendedprice', scale=100)} AS sum_base_price,
       {money_sum_sql('l_extendedprice * (1 - l_discount)', scale=10000)} AS sum_disc_price,
       {money_avg_sql('l_discount', scale=100)} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

ORACLES["agg_count_distinct"] = """
SELECT o_orderstatus,
       count(DISTINCT o_custkey) AS n_customers,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
"""

ORACLES["tpch_q6"] = f"""
SELECT {money_sum_sql('l_extendedprice * l_discount', scale=10000)} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""

ORACLES["tpch_q3"] = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       {money_sum_sql('l_extendedprice * (1 - l_discount)', scale=10000)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""

ORACLES["tpch_q5"] = f"""
SELECT n_name,
       {money_sum_sql('l_extendedprice * (1 - l_discount)', scale=10000)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
GROUP BY n_name
"""

ORACLES["json_infer"] = """
SELECT CAST(1122 AS BIGINT) AS age, 'User-1' AS name
UNION ALL SELECT 1130, 'User-2'
UNION ALL SELECT 1119, 'User-3'
"""

# ---- reference mutation scenarios --------------------------------------
# Fixture literals cited in operators/reference_scenarios.py; the SQL
# recomputes each final state with generic merge algebra (LEFT JOIN for the
# update path + NOT EXISTS for the insert path).

ORACLES["merge_upsert"] = """
WITH t(customer_id, name, lastname) AS (
  VALUES (1, 'customer_a', 'lastname-1'),
         (2, 'customer_b', 'lastname-2')
), s(customer_id, name, lastname) AS (
  VALUES (3, 'customer_c-insert(with merge sql)', 'lastname-3-insert(with merge sql)'),
         (2, 'customer_b-updated(with merge sql)', 'lastname-2-updated(with merge sql)')
), final AS (
  SELECT t.customer_id,
         CASE WHEN s.customer_id IS NOT NULL THEN s.name ELSE t.name END AS name,
         CASE WHEN s.customer_id IS NOT NULL THEN s.lastname ELSE t.lastname END AS lastname
  FROM t LEFT JOIN s ON t.customer_id = s.customer_id
  UNION ALL
  SELECT s.* FROM s
  WHERE NOT EXISTS (SELECT 1 FROM t WHERE t.customer_id = s.customer_id)
)
SELECT CAST(customer_id AS BIGINT) AS customer_id, name, lastname FROM final
"""

ORACLES["merge_star"] = """
WITH after1(customer_id, name, lastname) AS (
  VALUES (1, 'customer_a', 'lastname-1'),
         (2, 'customer_b-updated(with merge sql)', 'lastname-2-updated(with merge sql)'),
         (3, 'customer_c-insert(with merge sql)', 'lastname-3-insert(with merge sql)')
), m2(customer_id, name, lastname, email) AS (
  VALUES (4, 'customer_c-insert(with merge *)', 'lastname-3-insert(with merge *)', 'a@b.com'),
         (5, 'customer_b-updated(with merge *)', 'lastname-2-updated(with merge *)', 'b@c.com')
), after2 AS (  -- merge2 pre-evolution: email column ignored, rows insert
  SELECT t.customer_id,
         CASE WHEN s.customer_id IS NOT NULL THEN s.name ELSE t.name END AS name,
         CASE WHEN s.customer_id IS NOT NULL THEN s.lastname ELSE t.lastname END AS lastname
  FROM after1 t LEFT JOIN m2 s ON t.customer_id = s.customer_id
  UNION ALL
  SELECT s.customer_id, s.name, s.lastname FROM m2 s
  WHERE NOT EXISTS (SELECT 1 FROM after1 t WHERE t.customer_id = s.customer_id)
), after3 AS (  -- ALTER TABLE ADD COLUMN email (null-backfilled)
  SELECT customer_id, name, lastname, CAST(NULL AS VARCHAR) AS email FROM after2
), after4 AS (  -- merge2 again: rows 4,5 matched, email populated
  SELECT t.customer_id,
         CASE WHEN s.customer_id IS NOT NULL THEN s.name ELSE t.name END AS name,
         CASE WHEN s.customer_id IS NOT NULL THEN s.lastname ELSE t.lastname END AS lastname,
         CASE WHEN s.customer_id IS NOT NULL THEN s.email ELSE t.email END AS email
  FROM after3 t LEFT JOIN m2 s ON t.customer_id = s.customer_id
  UNION ALL
  SELECT s.customer_id, s.name, s.lastname, s.email FROM m2 s
  WHERE NOT EXISTS (SELECT 1 FROM after3 t WHERE t.customer_id = s.customer_id)
), m3(customer_id, name, email) AS (
  VALUES (6, 'customer_c-insert(with merge *)', 'a@b.com'),
         (7, 'customer_b-updated(with merge *)', 'b@c.com')
), final AS (  -- merge3: source missing lastname → null-filled on insert
  SELECT t.customer_id,
         CASE WHEN s.customer_id IS NOT NULL THEN s.name ELSE t.name END AS name,
         t.lastname,
         CASE WHEN s.customer_id IS NOT NULL THEN s.email ELSE t.email END AS email
  FROM after4 t LEFT JOIN m3 s ON t.customer_id = s.customer_id
  UNION ALL
  SELECT s.customer_id, s.name, CAST(NULL AS VARCHAR), s.email FROM m3 s
  WHERE NOT EXISTS (SELECT 1 FROM after4 t WHERE t.customer_id = s.customer_id)
)
SELECT CAST(customer_id AS BIGINT) AS customer_id, name, lastname, email FROM final
"""

ORACLES["merge_cdc"] = """
WITH t(customer_id, name, record_change_timestamp) AS (
  VALUES (1, 'customer_a', 1), (2, 'customer_b', 1), (3, 'customer_b', 2)
), s(customer_id, name, record_change_timestamp) AS (
  VALUES (1, 'customer_c-insert(with merge sql)', 1),
         (2, 'customer_b-updated(with merge sql)', 2),
         (3, 'customer_b-updated(with merge sql)', 2)
), final AS (
  SELECT t.customer_id,
         CASE WHEN s.customer_id IS NOT NULL
                   AND t.record_change_timestamp < s.record_change_timestamp
              THEN s.name ELSE t.name END AS name,
         CASE WHEN s.customer_id IS NOT NULL
                   AND t.record_change_timestamp < s.record_change_timestamp
              THEN s.record_change_timestamp
              ELSE t.record_change_timestamp END AS record_change_timestamp
  FROM t LEFT JOIN s ON t.customer_id = s.customer_id
  UNION ALL
  SELECT s.* FROM s
  WHERE NOT EXISTS (SELECT 1 FROM t WHERE t.customer_id = s.customer_id)
)
SELECT CAST(customer_id AS BIGINT) AS customer_id, name,
       CAST(record_change_timestamp AS INTEGER) AS record_change_timestamp
FROM final
"""

ORACLES["scd2_final"] = """
WITH dim(customer_id, name, curr, effective_date, end_date) AS (
  VALUES (1, 'customer_a-V1', false, DATE '2020-01-01', DATE '2020-01-12'),
         (1, 'customer_a-V2', true,  DATE '2020-01-12', DATE '9999-12-31'),
         (2, 'customer_b-V1', true,  DATE '2020-01-01', DATE '9999-12-31')
), stg(customer_id, name, effective_date) AS (
  VALUES (1, 'customer_a-V3', DATE '2020-02-15'),
         (2, 'customer_b-V2', DATE '2020-02-15'),
         (3, 'customer_c-V1', DATE '2020-02-15')
), src AS (
  SELECT customer_id, name, effective_date, DATE '9999-12-31' AS end_date FROM stg
  UNION ALL
  SELECT t.customer_id, t.name, t.effective_date, s.effective_date
  FROM stg s JOIN dim t ON s.customer_id = t.customer_id AND t.curr
), final AS (
  SELECT t.customer_id, t.name,
         CASE WHEN s.customer_id IS NOT NULL THEN false ELSE t.curr END AS curr,
         t.effective_date,
         CASE WHEN s.customer_id IS NOT NULL THEN s.end_date ELSE t.end_date END AS end_date
  FROM dim t LEFT JOIN src s
    ON t.customer_id = s.customer_id AND t.effective_date = s.effective_date
  UNION ALL
  SELECT s.customer_id, s.name, true, s.effective_date, s.end_date
  FROM src s
  WHERE NOT EXISTS (SELECT 1 FROM dim t
                    WHERE t.customer_id = s.customer_id
                      AND t.effective_date = s.effective_date)
)
SELECT CAST(customer_id AS BIGINT) AS customer_id, name,
       curr AS "current", effective_date, end_date
FROM final
"""

ORACLES["delete_pred"] = """
WITH seed(customer_id, name, lastname) AS (
  VALUES (1, 'customer_a-V1', 'ln1'),
         (1, 'customer_a-V2', 'ln2'),
         (1, 'customer_a-V3', 'ln3'),
         (1, 'customer_a-V3', 'ln4'),
         (2, 'customer_b-V1', 'ln5')
)
SELECT CAST(customer_id AS BIGINT) AS customer_id, name, lastname
FROM seed
WHERE NOT (customer_id = 1 AND name = 'customer_a-V3')
"""

ORACLES["schema_evolution"] = """
SELECT CAST(customer_id AS BIGINT) AS customer_id, name,
       CAST(NULL AS VARCHAR) AS email
FROM (VALUES (1, 'customer_a'), (2, 'customer_b')) AS t(customer_id, name)
"""

ORACLES["upsert_by_key"] = """
WITH base(age, name) AS (
  VALUES (10, 'spark sql-insert'),
         (1122, 'User-1'), (1130, 'User-2'), (1119, 'User-3'),
         (29, 'JavaAPI User-a'), (43, 'JavaAPI User-b')
), changes(age, name) AS (
  VALUES (129, 'JavaAPI User-a'), (123, 'JavaAPI User-b')
), final AS (
  SELECT * FROM base b
  WHERE NOT EXISTS (SELECT 1 FROM changes c WHERE c.name = b.name)
  UNION ALL
  SELECT * FROM changes
)
SELECT CAST(age AS BIGINT) AS age, name FROM final
"""
