"""Planted-input cross-engine tests for the Gopher-rule filter and PII
redaction. The documents corpus contains little/no PII or bullet
structure, so the contract parity run alone would pass vacuously —
these cases force every pattern to actually match on both engines."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from tia_data_pipeline_spark.functions.text import (
    gopher_rules,
    gopher_rules_sql,
    redact_pii,
    redact_pii_sql,
)

_PII_CASES = [
    (0, "contact me at alice.smith+work@example.co.uk or bob@test.io today"),
    (1, "server at 192.168.1.254 and 10.0.0.1 replied"),
    (2, "call +1-800-555-0199 or +44 20 7946 0958 now"),
    (3, "email a@b.com from 127.0.0.1 phone +62-21-555-7777"),
    (4, "no pii here, just text with dots... and 12.5 percent"),
    (5, ""),
]

_GOPHER_CASES = [
    (0, " ".join(f"word{i}" for i in range(60))),  # keep: 60 mid-length words
    (1, "short doc"),  # drop: too few words
    (2, " ".join(["a"] * 80)),  # drop: mean word length 1
    (3, "\n".join(f"- bullet {i} " + " ".join(["pad"] * 9) for i in range(12))),  # bullets
    (4, "\n".join(("line " + " ".join(["w"] * 9) + " ...") for i in range(12))),  # ellipsis
    (5, " ".join(["word### #"] * 60)),  # symbol-heavy
    (6, ""),
]


def _duck(cases, select_sql):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", cases)
    return {r[0]: tuple(r[1:]) for r in con.sql(select_sql).fetchall()}


def test_pii_redaction_matches_duckdb_and_actually_redacts(spark):
    df = spark.createDataFrame(_PII_CASES, "i int, s string")
    redacted, counts = redact_pii(F.col("s"))
    got = {
        r["i"]: (r["red"], r["ne"], r["nip"], r["nph"])
        for r in df.select(
            "i",
            redacted.alias("red"),
            counts["n_emails"].alias("ne"),
            counts["n_ips"].alias("nip"),
            counts["n_phones"].alias("nph"),
        ).collect()
    }
    red_sql, cnt_sql = redact_pii_sql("s")
    duck = _duck(
        _PII_CASES,
        f"SELECT i, {red_sql}, {cnt_sql['n_emails']}, {cnt_sql['n_ips']}, "
        f"{cnt_sql['n_phones']} FROM t",
    )
    assert got == duck
    # the patterns really fired
    assert got[0][1] == 2 and "<EMAIL>" in got[0][0] and "alice" not in got[0][0]
    assert got[1][2] == 2 and "<IP>" in got[1][0]
    assert got[2][3] >= 2 and "<PHONE>" in got[2][0]
    assert got[4] == (_PII_CASES[4][1], 0, 0, 0)  # untouched text passes through


def test_gopher_rules_match_duckdb_and_each_rule_fires(spark):
    df = spark.createDataFrame(_GOPHER_CASES, "i int, s string")
    metrics, keep = gopher_rules(F.col("s"))
    got = {
        r["i"]: (r["nw"], r["mwl"], r["sym"], r["bul"], r["ell"], r["keep"])
        for r in df.select(
            "i",
            metrics["n_words"].alias("nw"),
            metrics["mean_word_len"].alias("mwl"),
            metrics["symbol_ratio"].alias("sym"),
            metrics["bullet_frac"].alias("bul"),
            metrics["ellipsis_frac"].alias("ell"),
            keep.alias("keep"),
        ).collect()
    }
    m_sql, keep_sql = gopher_rules_sql("s")
    duck = _duck(
        _GOPHER_CASES,
        f"SELECT i, {m_sql['n_words']}, {m_sql['mean_word_len']}, "
        f"{m_sql['symbol_ratio']}, {m_sql['bullet_frac']}, {m_sql['ellipsis_frac']}, "
        f"{keep_sql} FROM t",
    )
    assert got == duck
    assert got[0][5] is True  # healthy doc kept
    assert got[1][5] is False and got[1][0] == 2  # min-words rule
    assert got[2][5] is False  # mean-word-length rule
    assert got[3][3] == 1.0 and got[3][5] is False  # bullet rule
    assert got[4][4] == 1.0 and got[4][5] is False  # ellipsis rule
    assert got[5][5] is False and got[5][2] > 0.1  # symbol rule
