"""Generate the Tier B extension fixtures (FIXTURES.md §3) from a driver
scale directory: partsupp plus the missing lineitem/orders/part/supplier/
customer columns, all deterministic pure-key arithmetic (no RNG state).

Used by tests to verify the full-TPC-H Tier B queries before the driver
ships extended fixtures; writes ONLY to the given destination directory
(never to /root/testdata).

    python tools/gen_tier_b.py /root/testdata/sf0.001 /tmp/tierb
"""

from __future__ import annotations

import sys

import duckdb

CONTAINERS = "'SM CASE','SM BOX','MED BOX','MED BAG','LG CASE','LG BOX','JUMBO PACK','WRAP JAR'"
SHIPMODES = "'MAIL','SHIP','AIR','AIR REG','TRUCK','RAIL','FOB'"
INSTRUCTS = "'DELIVER IN PERSON','COLLECT COD','NONE','TAKE BACK RETURN'"


def generate(src: str, dst: str) -> None:
    con = duckdb.connect()
    q = lambda sql: con.execute(sql)  # noqa: E731

    q(f"CREATE VIEW part_src AS SELECT * FROM '{src}/part.parquet'")
    q(f"CREATE VIEW supplier_src AS SELECT * FROM '{src}/supplier.parquet'")
    q(f"CREATE VIEW lineitem_src AS SELECT * FROM '{src}/lineitem.parquet'")
    q(f"CREATE VIEW orders_src AS SELECT * FROM '{src}/orders.parquet'")
    q(f"CREATE VIEW customer_src AS SELECT * FROM '{src}/customer.parquet'")
    n_supp = con.execute("SELECT COUNT(*) FROM supplier_src").fetchone()[0]

    # partsupp: 4 suppliers per part, key-arithmetic assignment
    q(
        f"""
COPY (
  SELECT p_partkey AS ps_partkey,
         (p_partkey * 7 + i.i * 13) % {n_supp} AS ps_suppkey,
         CAST((p_partkey * 37 + i.i * 101) % 9999 + 1 AS INTEGER) AS ps_availqty,
         ROUND(((p_partkey * 53 + i.i * 211) % 99900) / 100.0 + 1.0, 2) AS ps_supplycost,
         'ps comment ' || CAST((p_partkey + i.i) % 7 AS VARCHAR) AS ps_comment
  FROM part_src, (SELECT UNNEST(generate_series(0, 3)) AS i) i
) TO '{dst}/partsupp.parquet' (FORMAT PARQUET)
"""
    )
    q(
        f"""
COPY (
  SELECT *,
         l_shipdate + INTERVAL ((l_orderkey * 3 + l_linenumber * 11) % 60 - 20) DAY AS l_commitdate,
         l_shipdate + INTERVAL ((l_orderkey * 5 + l_linenumber * 7) % 30 + 1) DAY AS l_receiptdate,
         [{INSTRUCTS}][(l_orderkey + l_linenumber) % 4 + 1] AS l_shipinstruct,
         [{SHIPMODES}][(l_orderkey * 3 + l_linenumber) % 7 + 1] AS l_shipmode,
         'li comment ' || CAST(l_linenumber AS VARCHAR) AS l_comment
  FROM lineitem_src
) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)
"""
    )
    q(
        f"""
COPY (
  SELECT *,
         'Clerk#' || CAST(o_orderkey % 1000 AS VARCHAR) AS o_clerk,
         CAST(0 AS INTEGER) AS o_shippriority,
         CASE WHEN o_orderkey % 11 = 0 THEN 'blah special packages requests blah'
              ELSE 'ordinary comment ' || CAST(o_orderkey % 5 AS VARCHAR) END AS o_comment
  FROM orders_src
) TO '{dst}/orders.parquet' (FORMAT PARQUET)
"""
    )
    q(
        f"""
COPY (
  SELECT *,
         'Manufacturer#' || CAST(p_partkey % 5 + 1 AS VARCHAR) AS p_mfgr,
         [{CONTAINERS}][p_partkey % 8 + 1] AS p_container,
         'part comment ' || CAST(p_partkey % 3 AS VARCHAR) AS p_comment
  FROM part_src
) TO '{dst}/part.parquet' (FORMAT PARQUET)
"""
    )
    q(
        f"""
COPY (
  SELECT *,
         'addr ' || CAST(s_suppkey AS VARCHAR) AS s_address,
         CAST(s_nationkey + 10 AS VARCHAR) || '-555-' || CAST(1000 + s_suppkey % 9000 AS VARCHAR) AS s_phone,
         CASE WHEN s_suppkey % 13 = 0 THEN 'blah Customer stuff Complaints blah'
              ELSE 'supplier comment ' || CAST(s_suppkey % 4 AS VARCHAR) END AS s_comment
  FROM supplier_src
) TO '{dst}/supplier.parquet' (FORMAT PARQUET)
"""
    )
    q(
        f"""
COPY (
  SELECT *,
         'caddr ' || CAST(c_custkey AS VARCHAR) AS c_address,
         CAST(c_nationkey + 10 AS VARCHAR) || '-555-' || CAST(1000 + c_custkey % 9000 AS VARCHAR) AS c_phone,
         'customer comment ' || CAST(c_custkey % 6 AS VARCHAR) AS c_comment
  FROM customer_src
) TO '{dst}/customer.parquet' (FORMAT PARQUET)
"""
    )
    # unchanged tables copied through for a self-contained directory
    for t in ("region", "nation", "events", "documents", "embeddings"):
        q(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    con.close()


if __name__ == "__main__":
    import pathlib

    src, dst = sys.argv[1], sys.argv[2]
    pathlib.Path(dst).mkdir(parents=True, exist_ok=True)
    generate(src, dst)
    print(f"tier-b fixtures written to {dst}")
