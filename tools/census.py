#!/usr/bin/env python
"""Regenerate README.md's registry-census numbers from the registry itself.

The README advertises three counts — registered queries, oracled queries,
and golden plan fingerprints — which drifted twice in past rounds when new
queries landed without a doc touch. This tool rewrites the numbers in place;
tests/test_census.py fails the suite whenever README and registry disagree,
so the census can never silently rot. Run after registering queries:

    python tools/census.py
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from flink_1_12_0_src_spark.queries import load_all  # noqa: E402


def census() -> dict[str, int]:
    reg = load_all()
    return {
        "registered": len(reg),
        "oracled": sum(1 for q in reg.values() if q.oracle is not None),
        "bench": sum(1 for q in reg.values() if "bench" in q.tags),
        "goldens": len(json.loads((ROOT / "tests" / "plan_goldens.json").read_text())),
    }


def apply(text: str, c: dict[str, int]) -> str:
    text = re.sub(r"\d+ registered queries", f"{c['registered']} registered queries", text)
    text = re.sub(r"\d+/\d+ oracled", f"{c['oracled']}/{c['registered']} oracled", text)
    text = re.sub(
        r"\d+ golden plan fingerprints", f"{c['goldens']} golden plan fingerprints", text
    )
    text = re.sub(r"\d+-query headline set", f"{c['bench']}-query headline set", text)
    text = re.sub(r"\d+-query oracle gate", f"{c['oracled']}-query oracle gate", text)
    return text


def main() -> None:
    c = census()
    readme = ROOT / "README.md"
    old = readme.read_text()
    new = apply(old, c)
    readme.write_text(new)
    print(f"census: {c}" + (" (README updated)" if new != old else " (README already current)"))


if __name__ == "__main__":
    main()
