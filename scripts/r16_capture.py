"""Round-16 optimization evidence capture.

Usage: python scripts/r16_capture.py <tag> [sf_dir] [query ...]

For each named declared query (default: all): write the
`.explain("formatted")` output to plans/r16/<query>_<tag>.txt and
time the BUILDER alone (plan construction, no execution) min-of-3.
Prints one JSON line {query: build_sec} at the end.

`tag` is "before" / "after" — the optimization-round deliverable pair
the judge diffs. The builder timing isolates the python_build bucket
(client-side plan construction) that scripts/floor_profile.py
attributes inside full query wall.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3:])

    from data_warehouse_nhom8_spark.plans import QUERIES
    from data_warehouse_nhom8_spark.session import get_spark

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16"
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("r16_capture")
    names = [n for n in QUERIES if not only or n in names_match(n, only)]

    build_s: dict[str, float] = {}
    for name in names:
        out_path = os.path.join(out_dir, f"{name}_{tag}.txt")
        if os.path.exists(out_path) and not only:
            # never clobber an existing capture in bulk mode: a
            # "_before" file written after the query was optimized
            # would silently misrepresent the baseline
            continue
        fn = QUERIES[name]
        samples = []
        df = None
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            samples.append(time.perf_counter() - t0)
        build_s[name] = round(min(samples), 4)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(out_path, "w") as fh:
            fh.write(buf.getvalue())
    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "build_sec": build_s}))


def names_match(name: str, only: set) -> set:
    """A query is selected when any token matches its full name or its
    qNN prefix."""
    prefix = name.split("_")[0]
    return {name} if (name in only or prefix in only) else set()


if __name__ == "__main__":
    main()
