"""Property-based CEP NFA verification (hypothesis): for strict-contiguity
patterns without time bounds, MATCH_RECOGNIZE over a symbol sequence is
exactly regular-expression matching over the concatenated symbol string —
greedy quantifiers with backtracking, and AFTER MATCH SKIP PAST LAST ROW is
``re.finditer``'s non-overlapping leftmost scan. Two independent engines
(our NFA vs CPython's sre) must agree on every match span.

This is the reference's agg-function-table test style (SURVEY §5.5) applied
to the hardest operator family (§2.9).
"""

from __future__ import annotations

import re

import pandas as pd
from hypothesis import given, settings, strategies as st

from flink_1_12_0_src_spark.operators.cep import Pattern, _scan_matches

# pattern library: (name, Pattern builder, equivalent regex)
def _pat_abc():
    return (
        Pattern.begin("x").where(lambda p: p.t == "a")
        .next("y").where(lambda p: p.t == "b")
        .next("z").where(lambda p: p.t == "c")
    ), "abc"


def _pat_ab_plus():
    return (
        Pattern.begin("x").where(lambda p: p.t == "a")
        .next("y").where(lambda p: p.t == "b").one_or_more()
    ), "ab+"


def _pat_a_plus_c():
    return (
        Pattern.begin("x").where(lambda p: p.t == "a").one_or_more()
        .next("z").where(lambda p: p.t == "c")
    ), "a+c"


def _pat_ab_opt_c():
    return (
        Pattern.begin("x").where(lambda p: p.t == "a")
        .next("y").where(lambda p: p.t == "b").optional()
        .next("z").where(lambda p: p.t == "c")
    ), "ab?c"


def _pat_a_range_b():
    return (
        Pattern.begin("x").where(lambda p: p.t == "a").times(2, 4)
        .next("y").where(lambda p: p.t == "b")
    ), "a{2,4}b"


def _pat_a_exact():
    return (
        Pattern.begin("x").where(lambda p: p.t == "a").times(3)
    ), "a{3}"


PATTERNS = [_pat_abc, _pat_ab_plus, _pat_a_plus_c, _pat_ab_opt_c, _pat_a_range_b, _pat_a_exact]


@settings(max_examples=300, deadline=None)
@given(
    seq=st.text(alphabet="abc", min_size=0, max_size=24),
    pat_idx=st.integers(min_value=0, max_value=len(PATTERNS) - 1),
)
def test_nfa_matches_regex_spans(seq: str, pat_idx: int):
    pattern, rx = PATTERNS[pat_idx]()
    pdf = pd.DataFrame({"pos": range(len(seq)), "t": list(seq)})
    _, matches = _scan_matches(pdf, pattern, order_by=["pos"], time_col=None)
    nfa_spans = [(start, end + 1) for _b, start, end in matches]
    re_spans = [m.span() for m in re.finditer(rx, seq)]
    assert nfa_spans == re_spans, f"seq={seq!r} rx={rx}"


@settings(max_examples=200, deadline=None)
@given(seq=st.text(alphabet="ab", min_size=0, max_size=20))
def test_nfa_skip_to_next_row_is_overlapping_regex(seq: str):
    # SKIP TO NEXT ROW = all matches starting at distinct positions =
    # lookahead-captured overlapping regex matches
    pattern, rx = _pat_ab_plus()
    pdf = pd.DataFrame({"pos": range(len(seq)), "t": list(seq)})
    _, matches = _scan_matches(
        pdf, pattern, order_by=["pos"], time_col=None, after_match="next_row"
    )
    nfa_spans = [(start, end + 1) for _b, start, end in matches]
    re_spans = [
        (m.start(), m.start() + len(m.group(1)))
        for m in re.finditer(f"(?=({rx}))", seq)
    ]
    assert nfa_spans == re_spans, f"seq={seq!r}"


@settings(max_examples=200, deadline=None)
@given(seq=st.text(alphabet="abc", min_size=0, max_size=16))
def test_followed_by_any_enumerates_all_alternatives(seq: str):
    """followedByAny (Pattern.followedByAny:214): A followedByAny B over a
    symbol sequence must produce exactly every (a-position, later b-position)
    pair — the closed-form alternative set, independently enumerable."""
    from flink_1_12_0_src_spark.operators.cep import _scan_matches_all

    pattern = (
        Pattern.begin("x").where(lambda p: p.t == "a")
        .followed_by_any("y").where(lambda p: p.t == "b")
    )
    pdf = pd.DataFrame({"pos": range(len(seq)), "t": list(seq)})
    _, matches = _scan_matches_all(pdf, pattern, order_by=["pos"], time_col=None)
    got = sorted((b["x"][0], b["y"][0]) for b, _s, _e in matches)
    expected = sorted(
        (i, j)
        for i, ci in enumerate(seq)
        if ci == "a"
        for j, cj in enumerate(seq)
        if cj == "b" and j > i
    )
    assert got == expected, f"seq={seq!r}"


@settings(max_examples=150, deadline=None)
@given(seq=st.text(alphabet="ab", min_size=0, max_size=10))
def test_allow_combinations_enumerates_subsets(seq: str):
    """allowCombinations (Pattern.allowCombinations:471): A+ allowCombinations
    binds, for every start position p, every order-preserving combination of
    later a-rows that includes p."""
    from itertools import combinations

    from flink_1_12_0_src_spark.operators.cep import _scan_matches_all

    pattern = (
        Pattern.begin("x").where(lambda p: p.t == "a")
        .one_or_more().allow_combinations()
    )
    pdf = pd.DataFrame({"pos": range(len(seq)), "t": list(seq)})
    _, matches = _scan_matches_all(pdf, pattern, order_by=["pos"], time_col=None)
    got = sorted(tuple(b["x"]) for b, _s, _e in matches)
    a_pos = [i for i, c in enumerate(seq) if c == "a"]
    expected = sorted(
        (p, *combo)
        for idx, p in enumerate(a_pos)
        for r in range(len(a_pos) - idx)
        for combo in combinations(a_pos[idx + 1 :], r)
    )
    assert got == expected, f"seq={seq!r}"


def _pat_ab_lazy_plus():
    return (
        Pattern.begin("x").where(lambda p: p.t == "a")
        .next("y").where(lambda p: p.t == "b").one_or_more().reluctant()
        .next("z").where(lambda p: p.t == "c")
    ), "ab+?c"


def _pat_a_lazy_range():
    return (
        Pattern.begin("x").where(lambda p: p.t == "a").times(2, 4).reluctant()
        .next("y").where(lambda p: p.t == "b")
    ), "a{2,4}?b"


def _pat_ab_lazy_opt():
    return (
        Pattern.begin("x").where(lambda p: p.t == "a")
        .next("y").where(lambda p: p.t == "b").optional().reluctant()
        .next("z").where(lambda p: p.t == "b")
    ), "ab??b"


LAZY_PATTERNS = [_pat_ab_lazy_plus, _pat_a_lazy_range, _pat_ab_lazy_opt]


@settings(max_examples=250, deadline=None)
@given(
    seq=st.text(alphabet="abc", min_size=0, max_size=24),
    pat_idx=st.integers(min_value=0, max_value=len(LAZY_PATTERNS) - 1),
)
def test_nfa_reluctant_matches_lazy_regex(seq: str, pat_idx: int):
    """Reluctant quantifiers (MATCH_RECOGNIZE +?/{n,m}?/?? — the inverse of
    Pattern.greedy, Pattern.java:426) bind shortest-first, exactly regex
    lazy quantifier semantics — pinned against CPython's sre."""
    pattern, rx = LAZY_PATTERNS[pat_idx]()
    pdf = pd.DataFrame({"pos": range(len(seq)), "t": list(seq)})
    _, matches = _scan_matches(pdf, pattern, order_by=["pos"], time_col=None)
    nfa_spans = [(start, end + 1) for _b, start, end in matches]
    re_spans = [m.span() for m in re.finditer(rx, seq)]
    assert nfa_spans == re_spans, f"seq={seq!r} rx={rx}"


def _reference_skip_to_scan(seq: str, rx: str, group_spans, mode: str):
    """Independent reference for AFTER MATCH SKIP TO FIRST/LAST <var>
    (AfterMatchSkipStrategy.java:46,56): find the leftmost regex match from
    the scan position, emit it, then resume AT the first/last row the
    tracked group bound. Pure-regex engine — shares no code with the NFA."""
    out, i = [], 0
    while i <= len(seq):
        m = re.compile(rx).search(seq, i)
        if not m:
            break
        lo, hi = group_spans(m)
        out.append(m.span())
        nxt = lo if mode == "to_first" else hi - 1
        if nxt <= m.start():
            raise ValueError("no progress")
        i = nxt
    return out


@settings(max_examples=250, deadline=None)
@given(seq=st.text(alphabet="abc", min_size=0, max_size=24))
def test_nfa_skip_to_last_var_matches_reference(seq: str):
    """SKIP TO LAST y over A B+: resume at the last b of the match — chained
    matches may share that row with the next match's leading context."""
    pattern, rx = _pat_ab_plus()
    pdf = pd.DataFrame({"pos": range(len(seq)), "t": list(seq)})
    _, matches = _scan_matches(
        pdf, pattern, order_by=["pos"], time_col=None, after_match="to_last:y"
    )
    nfa_spans = [(start, end + 1) for _b, start, end in matches]
    ref = _reference_skip_to_scan(
        seq, "a(b+)", lambda m: m.span(1), "to_last"
    )
    assert nfa_spans == ref, f"seq={seq!r}"


@settings(max_examples=250, deadline=None)
@given(seq=st.text(alphabet="abc", min_size=0, max_size=24))
def test_nfa_skip_to_first_var_matches_reference(seq: str):
    pattern, rx = _pat_ab_plus()
    pdf = pd.DataFrame({"pos": range(len(seq)), "t": list(seq)})
    _, matches = _scan_matches(
        pdf, pattern, order_by=["pos"], time_col=None, after_match="to_first:y"
    )
    nfa_spans = [(start, end + 1) for _b, start, end in matches]
    ref = _reference_skip_to_scan(
        seq, "a(b+)", lambda m: m.span(1), "to_first"
    )
    assert nfa_spans == ref, f"seq={seq!r}"


def test_nfa_skip_to_first_of_leading_var_raises():
    """SKIP TO FIRST x where x starts the match would loop forever — Flink
    raises; so do we."""
    import pytest

    pattern, _ = _pat_ab_plus()
    pdf = pd.DataFrame({"pos": range(4), "t": list("abab")})
    with pytest.raises(ValueError, match="infinite loop"):
        _scan_matches(
            pdf, pattern, order_by=["pos"], time_col=None, after_match="to_first:x"
        )


@settings(max_examples=250, deadline=None)
@given(vals=st.lists(st.integers(min_value=0, max_value=5), min_size=0, max_size=20))
def test_cross_variable_last_binding(vals: list[int]):
    """DEFINE B AS B.v > LAST(A.v) (the MatchRecognizeITCase cross-variable
    idiom) via where_binding: A binds one row, B+ binds the following run of
    rows strictly greater than A's value — reference = direct python scan."""
    pattern = (
        Pattern.begin("A")
        .next("B")
        .where_binding(
            lambda pdf, b: pdf["v"] > (pdf["v"].iloc[b["A"][-1]] if b.get("A") else float("inf"))
        )
        .one_or_more()
    )
    pdf = pd.DataFrame({"pos": range(len(vals)), "v": vals})
    _, matches = _scan_matches(pdf, pattern, order_by=["pos"], time_col=None)
    got = [(s, e + 1) for _b, s, e in matches]
    # reference scan: greedy, skip past last row
    ref, i = [], 0
    while i < len(vals) - 1:
        if vals[i + 1] > vals[i]:
            j = i + 1
            while j + 1 < len(vals) and vals[j + 1] > vals[i]:
                j += 1
            ref.append((i, j + 1))
            i = j + 1
        else:
            i += 1
    assert got == ref, f"vals={vals!r}"


def _vshape_pattern():
    from flink_1_12_0_src_spark.plans.matchrec import parse_match_recognize

    return parse_match_recognize(
        """
        MATCH_RECOGNIZE (
          PARTITION BY k
          ORDER BY pos
          MEASURES COUNT(DOWN.v) AS d, COUNT(UP.v) AS u
          AFTER MATCH SKIP {skip}
          PATTERN (STRT DOWN+ UP+)
          DEFINE DOWN AS DOWN.v < PREV(DOWN.v), UP AS UP.v > PREV(UP.v)
        )
        """.replace("{skip}", "TO NEXT ROW")
    )["pattern"]


def _runs(vals):
    """Run-length reference: maximal descents/ascents with dir ∈ {-1,0,1}."""
    dirs = [0] + [
        -1 if b < a else (1 if b > a else 0) for a, b in zip(vals, vals[1:])
    ]
    return dirs


@settings(max_examples=400, deadline=None)
@given(vals=st.lists(st.integers(min_value=0, max_value=4), min_size=0, max_size=18))
def test_vshape_prev_matches_runlength_reference(vals):
    """The V-shape NFA under SKIP TO NEXT ROW must equal the run-length
    encoding the SQL oracle uses: one match per STRT position s where the
    descent run containing s+1 is immediately followed by an ascent step,
    DOWN binding the run suffix and UP the full following ascent run."""
    pattern = _vshape_pattern()
    pdf = pd.DataFrame({"pos": range(len(vals)), "v": [float(x) for x in vals]})
    _, matches = _scan_matches(
        pdf, pattern, order_by=["pos"], time_col=None, after_match="next_row"
    )
    got = sorted((s, len(b["DOWN"]), len(b["UP"])) for b, s, _e in matches)

    dirs = _runs(vals)
    expected = []
    n = len(vals)
    for s in range(n):
        if s + 1 >= n or dirs[s + 1] != -1:
            continue
        t = s + 1
        while t + 1 < n and dirs[t + 1] == -1:
            t += 1
        if t + 1 >= n or dirs[t + 1] != 1:
            continue
        u = t + 1
        while u + 1 < n and dirs[u + 1] == 1:
            u += 1
        expected.append((s, t - s, u - t))
    assert got == sorted(expected), f"vals={vals!r}"


# -- running-aggregate DEFINE (SQL:2016 RUNNING semantics) -------------------


def _reference_agg_scan(vals: list[int], bound: int, max_run: int):
    """Independent reference for PATTERN (A{1,max_run} B) with
    A AS AVG(A.v) < bound, B AS B.v >= bound, SKIP PAST LAST ROW: simulate
    the greedy scan directly on the list."""
    out = []
    i, n = 0, len(vals)
    while i < n:
        # greedy extension: append while the running average stays < bound
        run = 0
        s = 0
        while i + run < n and run < max_run:
            if (s + vals[i + run]) / (run + 1) >= bound:
                break
            s += vals[i + run]
            run += 1
        # backtrack: longest L whose next row is a valid B
        matched = False
        for L in range(run, 0, -1):
            j = i + L
            if j < n and vals[j] >= bound:
                out.append((i, L, vals[j]))
                i = j + 1
                matched = True
                break
        if not matched:
            i += 1
    return out


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=99), min_size=0, max_size=40))
def test_running_aggregate_define_matches_reference(vals: list[int]):
    bound, max_run = 50, 3
    pat = (
        Pattern.begin("A")
        .where_running(
            lambda pdf, bd, prefix, cand, b=bound: float(
                pdf["v"].iloc[prefix + [cand]].sum()
            )
            / (len(prefix) + 1)
            < b
        )
        .times(1, max_run)
        .next("B")
        .where(lambda p, b=bound: p.v >= b)
    )
    pdf = pd.DataFrame({"rn": range(len(vals)), "v": vals})
    _, matches = _scan_matches(pdf, pat, ["rn"], None, "past_last")
    got = [
        (bindings["A"][0], len(bindings["A"]), vals[bindings["B"][0]])
        for bindings, _s, _e in matches
    ]
    assert got == _reference_agg_scan(vals, bound, max_run)


def test_any_scan_cap_override_reaches_scan(spark):
    """The per-call cap override must actually change enumerate-all results
    (a cap of 1 truncates the alternatives the default cap keeps)."""
    import warnings

    from flink_1_12_0_src_spark.operators.cep import Pattern, match_recognize

    rows = [(1, i, "a" if i == 0 else "b") for i in range(6)]
    df = spark.createDataFrame(rows, "k bigint, pos bigint, t string")
    pat = (
        Pattern.begin("A").where(lambda p: p.t == "a")
        .followed_by_any("B").where(lambda p: p.t == "b")
    )
    kwargs = dict(
        partition_by=["k"], order_by=["pos"], pattern=pat,
        measures={"b_pos": ("B", "first", "pos")},
        output_schema="k bigint, match_seq long, b_pos bigint",
    )
    full = match_recognize(df, **kwargs).count()
    assert full == 5  # every b is an alternative
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        capped = match_recognize(df, relaxed_cap=1, **kwargs).count()
    assert capped == 1
