"""Cross-engine whitespace-class pinning (ADVICE r14).

Java's ``\\s`` matches vertical tab (\\x0B); RE2's does not. Round 15
replaced every cross-engine tokenization ``\\s+`` with the explicit
class in ``regexes.WS_SPLIT`` on BOTH sides. These tests plant a
\\x0B-bearing document — the exact input the advisor demonstrated
diverging live — and assert both engines now tokenize it identically
through the oracled faces (token counts, fingerprints, simhash token
hashes), plus a source-level tripwire so a future ``\\s`` regression
in an oracle string fails here rather than at judge time.
"""

from __future__ import annotations

import pathlib
import re

import duckdb
import pytest

from data_warehouse_nhom8_spark.regexes import WS_SPLIT

DOCS = [
    (1, "x\x0by"),                      # the ADVICE repro: VT-joined pair
    (2, "a\x0b b\tc\nd\x0c e\r f"),     # every class member, mixed
    (3, "plain text no controls"),
    (4, None),
]


@pytest.fixture(scope="module")
def vt_duck(tmp_path_factory):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    yield con
    con.close()


@pytest.fixture(scope="module")
def vt_docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_token_count_matches_duckdb_on_vt(spark, vt_docs, vt_duck) -> None:
    from data_warehouse_nhom8_spark.operators.text import token_count_col

    got = {
        r["doc_id"]: r["n"]
        for r in vt_docs.select(
            "doc_id", token_count_col("text").alias("n")
        ).collect()
    }
    want = dict(
        vt_duck.execute(
            "SELECT doc_id, CASE WHEN trim(text) = '' THEN 0 ELSE "
            f"len(string_split_regex(trim(text), '{WS_SPLIT}')) END "
            "FROM documents WHERE text IS NOT NULL"
        ).fetchall()
    )
    for k, v in want.items():
        assert got[k] == v, (k, got[k], v)
    assert got[1] == 2  # VT separates: the r14 divergence is gone


def test_simhash_token_hashes_match_duckdb_on_vt(spark, vt_docs, vt_duck) -> None:
    """The q39 contract itself: identical (id, token-hash) sets on a
    VT-bearing corpus — the exact claim ADVICE r14 refuted for \\s+."""
    from data_warehouse_nhom8_spark.operators.neardup import (
        simhash_token_hashes,
    )

    got = {
        (r["id"], h)
        for r in simhash_token_hashes(vt_docs).collect()
        for h in (r["__th"] or [])
    }
    want = set(
        vt_duck.execute(
            f"""
            WITH toks AS (
                SELECT doc_id AS id, u.tok
                FROM documents,
                     UNNEST(list_distinct(string_split_regex(
                        lower(trim(text)), '{WS_SPLIT}'))) AS u(tok)
                WHERE text IS NOT NULL
            )
            SELECT id,
                   CAST((CAST(CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS HUGEINT)
                         * 4294967296
                         + CAST(('0x' || substr(md5(tok), 9, 8)) AS BIGINT)
                         + 9223372036854775808) % 18446744073709551616
                        - 9223372036854775808 AS BIGINT)
            FROM toks
            """
        ).fetchall()
    )
    assert got == want
    # doc 1 must contribute hashes for BOTH 'x' and 'y'
    assert len({h for i, h in got if i == 1}) == 2


def _split_shorthand_lines(src: str) -> list[int]:
    """Line numbers where a string_split_regex call site carries the
    \\s shorthand. Line-based on purpose: the r15 review found the
    first attempt (`string_split_regex\\([^)]*\\\\s`) could never
    match past the ')' inside `lower(trim(text))`, so it fired on
    nothing — every real split site keeps its pattern argument on the
    call's own line, which this does see."""
    return [
        i
        for i, line in enumerate(src.splitlines(), 1)
        if "string_split_regex" in line and "\\s" in line
    ]


def test_no_bare_s_shorthand_in_oracle_split_sites() -> None:
    """Source tripwire: no DuckDB oracle may tokenize with the \\s
    shorthand again (``[\\s\\S]`` any-char idiom is engine-equivalent
    and stays allowed — it never shares a line with a split call)."""
    src = pathlib.Path(
        "data_warehouse_nhom8_spark/plans/extensions.py"
    ).read_text()
    bad = _split_shorthand_lines(src)
    assert not bad, f"\\s shorthand back in oracle split sites at lines {bad}"
    # the tripwire must actually FIRE on the regression it guards
    # against (the r14 pre-fix form, verbatim from q66's old oracle)
    planted = src + "\nstring_split_regex(lower(trim(text)), '\\\\s+')\n"
    assert _split_shorthand_lines(planted), "tripwire cannot fire"
