"""hll_distinct_census: the Spark plan's HLL spec re-derived in pure
Python from the paper must equal the registered DuckDB twin row for
row on the fixture (triple implementation: Spark == DuckDB == this).
The Spark == DuckDB leg is the driver gate / test_queries_oracle; this
pins the SHARED spec against an independent reading of it."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pandas as pd

from tests.conftest import SF001


def _py_hll(values: list[str], p: int) -> dict:
    m = 1 << p
    w = 60 - p
    regs: dict[int, int] = {}
    for v in values:
        h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        reg, rest = h % m, h // m
        rho = (w + 1) if rest == 0 else (w + 1 - rest.bit_length())
        regs[reg] = max(regs.get(reg, 0), rho)
    scale = 62 - p
    sum_q = sum(1 << (scale - mx) for mx in regs.values())
    sum_q += (m - len(regs)) * (1 << scale)
    alpha = 0.697 if p == 5 else 0.7213 / (1.0 + 1.079 / 256.0)
    e_raw = alpha * float(m) * float(m) * math.pow(2.0, scale) / sum_q
    zeros = m - len(regs)
    if e_raw <= 2.5 * m and zeros > 0:
        e = m * math.log(m / zeros)
    else:
        e = e_raw
    return {
        "n_regs_hit": len(regs),
        "n_zero_regs": zeros,
        "hll_sum_q": sum_q,
        "est_micro": math.floor(e * 1e6),
    }


def test_python_reference_equals_duckdb_twin():
    from text_extraction_evaluation_spark.plans.q_relational import (
        HLL_PS,
        _HLL_SQL,
    )

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF001}/events.parquet')"
    )
    got = con.sql(_HLL_SQL).df()
    ev = pd.read_parquet(f"{SF001}/events.parquet")
    for (et, p), row in got.set_index(["event_type", "p"]).iterrows():
        users = [
            str(u) for u in ev.loc[ev["event_type"] == et, "user_id"]
        ]
        want = _py_hll(users, int(p))
        assert int(row["n_exact"]) == len(set(users))
        for k, v in want.items():
            assert int(row[k]) == v, (et, p, k)
    assert set(got["p"]) == set(HLL_PS)


def test_estimate_within_theoretical_error():
    """1.04/sqrt(m) is the published standard error; allow 3 sigma."""
    ev = pd.read_parquet(f"{SF001}/events.parquet")
    users = [str(u) for u in ev["user_id"].unique()]
    for p in (5, 8):
        est = _py_hll(users, p)["est_micro"] / 1e6
        rel = abs(est - len(users)) / len(users)
        assert rel <= 3 * 1.04 / math.sqrt(1 << p), (p, rel)
