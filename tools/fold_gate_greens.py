#!/usr/bin/env python
"""Fold a round's CORRECTNESS_r{N}.json into the gate-ordering frozensets.

Prints the `_R0N_DRIVER_GREEN` frozenset literal (hash-green rows) and the
red rows that should become the next round's `_R0N_FIXED_FIRST` once their
fixes land — paste into flink_1_12_0_src_spark/queries/__init__.py and set
`_DRIVER_GREEN` to the union. Keeping this mechanical means every round's
50-slot gate window is spent on never-driver-tested queries first.

Usage: python tools/fold_gate_greens.py CORRECTNESS_r04.json
"""

from __future__ import annotations

import json
import sys
import textwrap


def main() -> None:
    path = sys.argv[1]
    rnd = "".join(c for c in path if c.isdigit()) or "N"
    d = json.load(open(path))
    greens = sorted(
        n
        for n, v in d.items()
        if v.get("hash_match") or (v.get("err") is None and "hash_match" not in v)
    )
    reds = sorted(n for n, v in d.items() if not v.get("hash_match", True))
    errs = sorted(n for n, v in d.items() if v.get("err"))
    names = ", ".join(f'"{n}"' for n in greens)
    body = textwrap.fill(names, width=76, initial_indent=" " * 8, subsequent_indent=" " * 8)
    print(f"# {len(greens)} green / {len(reds)} red / {len(errs)} errored in {path}")
    print(f"_R{int(rnd):02d}_DRIVER_GREEN = frozenset(")
    print("    {")
    print(body)
    print("    }")
    print(")")
    if reds:
        print(f"# red (fix, then put in the next round's _FIXED_FIRST): {reds}")
    if errs:
        print(f"# errored: {errs}")


if __name__ == "__main__":
    main()
