"""Fuzzy ladder behavior (mod.rs:2713-2729) + F1 on the dirty fixture."""

from __future__ import annotations

from datetime import date

import pytest

from name_matcher_spark.fixtures.persons import make_dirty
from name_matcher_spark.operators.fuzzy_join import match_fuzzy
from name_matcher_spark.operators.prepare import prepare_persons

SCHEMA = "id long, uuid string, first_name string, middle_name string, last_name string, birthdate date, hh_id string"


def _prep(spark, rows, include_middle):
    return prepare_persons(spark.createDataFrame(rows, SCHEMA), include_middle)


def test_jon_john_matches(spark):
    bd = date(1990, 1, 1)
    t1 = _prep(spark, [(1, "u", "Jon", None, "Smith", bd, None)], False)
    t2 = _prep(spark, [(2, "v", "John", None, "Smith", bd, None)], False)
    rows = match_fuzzy(t1, t2, include_middle=False).collect()
    assert len(rows) == 1
    assert rows[0].confidence > 0.85


def test_direct_match_score_100(spark):
    bd = date(1990, 1, 1)
    t1 = _prep(spark, [(1, "u", "Ann", None, "Lee", bd, None)], False)
    t2 = _prep(spark, [(2, "v", "Ann", None, "Lee", bd, None)], False)
    rows = match_fuzzy(t1, t2, include_middle=False).collect()
    assert len(rows) == 1
    assert rows[0].match_case == "DIRECT MATCH"
    assert rows[0].score == 100.0


def test_birthdate_gate(spark):
    t1 = _prep(spark, [(1, "u", "Ann", None, "Lee", date(1990, 1, 1), None)], False)
    t2 = _prep(spark, [(2, "v", "Ann", None, "Lee", date(1991, 1, 1), None)], False)
    assert match_fuzzy(t1, t2, include_middle=False).count() == 0


def test_unrelated_names_no_match(spark):
    bd = date(1990, 1, 1)
    t1 = _prep(spark, [(1, "u", "Xavier", None, "Quintana", bd, None)], False)
    t2 = _prep(spark, [(2, "v", "Maria", None, "Brown", bd, None)], False)
    # birthdate blocking would pair them; the ladder must reject.
    assert match_fuzzy(t1, t2, include_middle=False, blocking="birthdate").count() == 0


def test_cascade_no_double_emit(spark):
    """A probe matched by the exact block must not also emit from the
    fallback branches (mod.rs:1086-1095 sequential cascade)."""
    bd = date(1990, 1, 1)
    t1 = _prep(spark, [(1, "u", "John", None, "Li", bd, None)], False)
    # Build side: one exact-block row and one row that would be reachable
    # only via the '?' fallback (no alphabetic first name).
    t2 = _prep(
        spark,
        [
            (2, "v", "John", None, "Li", bd, None),
            (3, "w", "...", None, "Li", bd, None),
        ],
        False,
    )
    rows = match_fuzzy(t1, t2, include_middle=False).collect()
    assert {(r.id_1, r.id_2) for r in rows} == {(1, 2)}


def test_hot_block_cap_bounds_candidates(spark):
    """A synthetic hot block (one birthdate+initials+soundex bucket)
    must be refined by the default cap: the block key is extended with
    soundex4(first) on both sides, bounding per-block pair counts
    without losing same-phonetic-first recall."""
    from name_matcher_spark.operators.fuzzy_join import candidates_bkey_cascade

    bd = date(1985, 3, 3)
    probe = _prep(spark, [(1, "u", "John", None, "Smith", bd, None)], False)
    # 2000 build rows in ONE block (same year/initials/soundex(last)):
    # half John (soundex J500, same as probe), half James (J520).
    build = _prep(
        spark,
        [
            (1000 + i, "v", "John" if i % 2 == 0 else "James", None, "Smith", bd, None)
            for i in range(2000)
        ],
        False,
    )
    uncapped = candidates_bkey_cascade(probe, build, None).count()
    capped = candidates_bkey_cascade(probe, build, 500).count()
    assert uncapped == 2000
    assert capped == 1000  # only the same-phonetic-first half remains
    # and the e2e default (cap on) still recalls the true matches
    out = match_fuzzy(probe, build, include_middle=False, max_block_rows=500)
    ids = {r.id_2 for r in out.collect()}
    assert ids == {1000 + i for i in range(2000) if i % 2 == 0}


def test_birthdate_pileup_cap_bounds_candidates(spark):
    """Placeholder-date pileups must not go quadratic under plain
    birthdate blocking: build-side dates over the cap get the join key
    extended with sx_last on BOTH sides, cold dates keep the bare key
    (candidate set provably unchanged), and true same-soundex pairs on
    the piled date still come through the full ladder."""
    from name_matcher_spark.operators.fuzzy_join import candidates_birthdate

    placeholder = date(1900, 1, 1)  # the classic dirty-registry default
    clean = date(1955, 4, 4)
    lasts = ["Smith", "Jones", "Garcia", "Klein", "Okafor", "Silva"]
    probe = [
        (i, "u", f"F{i}", None, lasts[i % 6], placeholder, None)
        for i in range(600)
    ]
    build = [
        (10_000 + i, "v", f"G{i}", None, lasts[i % 6], placeholder, None)
        for i in range(600)
    ]
    # one TRUE pair on the piled date, in its own soundex bucket
    probe.append((600, "u", "Maria", None, "Nakamura", placeholder, None))
    build.append((10_600, "v", "Maria", None, "Nakamura", placeholder, None))
    # a cold date (under the cap) and null birthdates (always dropped)
    probe += [(9_000 + j, "u", "Ann", None, "Lee", clean, None) for j in range(3)]
    build += [(19_000 + j, "v", "Ann", None, "Lee", clean, None) for j in range(3)]
    probe.append((9_100, "u", "Bob", None, "Null", None, None))
    build.append((19_100, "v", "Bob", None, "Null", None, None))
    pa = _prep(spark, probe, False)
    pb = _prep(spark, build, False)

    uncapped = candidates_birthdate(pa, pb).count()
    capped = candidates_birthdate(pa, pb, max_block_rows=100).count()
    assert uncapped == 601 * 601 + 9  # piled date quadratic + cold date
    # hot date split into its 7 soundex4(last) buckets (6x100x100 + the
    # 1x1 Nakamura bucket); the cold date's 3x3 is untouched
    assert capped == 6 * 100 * 100 + 1 + 9
    # recall through the e2e path with the cap engaged
    out = match_fuzzy(
        pa, pb, include_middle=False, blocking="birthdate", max_block_rows=100
    )
    assert {(r.id_1, r.id_2) for r in out.collect()} >= {(600, 10_600)}


def _oracle_pairs(a_pd, b_pd, include_middle):
    """Pure-Python mirror of the reference pipeline: normalize_text on
    fields, birthdate-gated candidates, exact ladder semantics. Returns
    {(id_a, id_b): score}."""
    from collections import defaultdict

    from name_matcher_spark.functions.fuzzy import fuzzy_compare_py
    from name_matcher_spark.functions.normalize import strip_diacritics_lower_trim

    def norm_row(r):
        return (
            r.id,
            strip_diacritics_lower_trim(r.first_name),
            strip_diacritics_lower_trim(r.middle_name),
            strip_diacritics_lower_trim(r.last_name),
            r.birthdate,
        )

    by_date = defaultdict(list)
    for r in b_pd.itertuples():
        by_date[r.birthdate].append(norm_row(r))
    out = {}
    for r in a_pd.itertuples():
        rid, f1_, m1, l1, bd = norm_row(r)
        for (rid2, f2, m2, l2, _) in by_date.get(bd, ()):
            res = fuzzy_compare_py(f1_, m1, l1, f2, m2, l2, include_middle)
            if res is not None:
                out[(rid, rid2)] = res[0]
    return out


@pytest.mark.parametrize("include_middle", [False, True])
def test_parity_f1_vs_reference_oracle(spark, include_middle):
    """Parity gate (BASELINE.json): the Spark pipeline's matched pairs
    at the export threshold must equal a pure-Python mirror of the
    reference's in-memory semantics — pairwise F1 >= 0.99."""
    a_pd, b_pd, _ = make_dirty(1500)
    a = prepare_persons(spark.createDataFrame(a_pd), include_middle)
    b = prepare_persons(spark.createDataFrame(b_pd), include_middle)

    got = match_fuzzy(a, b, include_middle=include_middle, blocking="birthdate").toPandas()
    predicted = {(r.id_1, r.id_2) for r in got.itertuples() if r.confidence >= 0.95}

    oracle = _oracle_pairs(a_pd, b_pd, include_middle)
    actual = {k for k, score in oracle.items() if score / 100.0 >= 0.95}

    tp = len(predicted & actual)
    precision = tp / len(predicted) if predicted else 1.0
    recall = tp / len(actual) if actual else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    assert f1 >= 0.99, (
        f"F1={f1:.4f} precision={precision:.4f} recall={recall:.4f} "
        f"only_spark={sorted(predicted - actual)[:5]} "
        f"only_oracle={sorted(actual - predicted)[:5]}"
    )
    # Scores must agree numerically, too (same kernels, same ladder).
    for r in got.itertuples():
        if (r.id_1, r.id_2) in oracle:
            assert abs(r.score - oracle[(r.id_1, r.id_2)]) < 1e-9


def test_provenance_recall_exact_variants(spark):
    """Every exact-copy overlap pair must be recalled as DIRECT MATCH;
    typo'd pairs score per the ladder (most land below the 0.95 export
    threshold when the metaphone vote is lost — reference behavior)."""
    a_pd, b_pd, labeled = make_dirty(1500)
    a = prepare_persons(spark.createDataFrame(a_pd), include_middle=False)
    b = prepare_persons(spark.createDataFrame(b_pd), include_middle=False)
    got = match_fuzzy(a, b, include_middle=False).toPandas()
    predicted = {(r.id_1, r.id_2) for r in got.itertuples()}
    # variant describes the B side only; restrict the A side to base
    # records (ids 1..unique_count) so the pair is truly identical.
    unique_count = int(1500 * 0.7)
    exact_truth = {
        (r.id_a, r.id_b)
        for r in labeled.itertuples()
        if r.variant == "exact" and r.id_a <= unique_count
    }
    missing = exact_truth - predicted
    assert not missing, f"missed exact pairs: {sorted(missing)[:10]}"


def test_dateless_records_do_not_block_match_each_other(spark):
    """block_key must NULL-propagate on a missing birthdate: dateless
    records can never pass the birthdate gate, so they must not
    block-match every other dateless record (quadratic candidate
    pileup BEFORE the gate)."""
    from name_matcher_spark.operators.fuzzy_join import (
        candidates_bkey_cascade,
    )

    rows1 = [(i, "u", "Ann", None, "Lee", None, None) for i in range(5)]
    rows2 = [(100 + i, "v", "Ann", None, "Lee", None, None) for i in range(5)]
    t1, t2 = _prep(spark, rows1, False), _prep(spark, rows2, False)
    assert candidates_bkey_cascade(t1, t2).count() == 0


def test_hot_block_refinement_keeps_accented_first_names(spark):
    """The hot-block key extension must phoneticize the NORMALIZED
    first name: raw-name soundex splits 'Ángel' vs 'Angel' into
    different refined blocks and silently loses the pair."""
    bd = date(1985, 3, 3)
    probe = _prep(spark, [(1, "u", "Ángel", None, "Smith", bd, None)], False)
    build = _prep(
        spark,
        [(1000 + i, "v", "Angel" if i == 0 else "James", None, "Smith", bd, None)
         for i in range(40)],
        False,
    )
    out = match_fuzzy(probe, build, include_middle=False, max_block_rows=10)
    assert 1000 in {r.id_2 for r in out.collect()}


def test_fallback_branch_pileup_is_capped(spark):
    """Branch 2 (the '?'-first-initial fallback) joins on a coarser key
    than branch 1 and must carry its own skew cap: an oversized
    (year, li, sx) build pileup is excluded rather than multiplied
    against every fall-through probe."""
    from name_matcher_spark.operators.fuzzy_join import (
        candidates_bkey_cascade,
    )

    bd = date(1900, 1, 1)
    # probes that miss branch 1 (no '?' build row shares their block_key)
    probes = _prep(
        spark, [(i, "u", "Zed", None, "Smith", bd, None) for i in range(3)], False
    )
    # 200 build rows with non-alphabetic first names: branch-2 pileup
    pile = _prep(
        spark,
        [(1000 + i, "v", "...", None, "Smith", bd, None) for i in range(200)],
        False,
    )
    uncapped = candidates_bkey_cascade(probes, pile, None).count()
    capped = candidates_bkey_cascade(probes, pile, 50).count()
    assert uncapped == 600  # 3 probes x 200 pile rows
    assert capped == 0  # the degenerate fallback group is excluded
    # clean data: cap detects nothing, candidate set identical
    clean = _prep(
        spark,
        [(2000 + i, "v", "...", None, "Smith", bd, None) for i in range(10)],
        False,
    )
    assert (
        candidates_bkey_cascade(probes, clean, 50).count()
        == candidates_bkey_cascade(probes, clean, None).count()
        == 30
    )
