"""Blocking-quality evaluation: recall/reduction metrics per strategy
over the labeled dirty fixture (typo'd variants make recall < 1 and
strategy ordering meaningful)."""

from __future__ import annotations

from name_matcher_spark.fixtures.persons import make_dirty
from name_matcher_spark.operators.blocking_eval import blocking_quality
from name_matcher_spark.operators.prepare import prepare_persons


def test_blocking_quality_orderings(spark):
    a_pd, b_pd, labeled = make_dirty(1500, seed=23)
    pa = prepare_persons(spark.createDataFrame(a_pd), include_middle=False)
    pb = prepare_persons(spark.createDataFrame(b_pd), include_middle=False)
    truth = spark.createDataFrame(
        labeled.rename(columns={"id_a": "id_1", "id_b": "id_2"})[["id_1", "id_2"]]
    )
    rows = {
        r.strategy: r
        for r in blocking_quality(
            pa, pb, truth,
            strategies=("birthdate", "year_initials", "bkey_exact", "token_prefix"),
        ).collect()
    }
    assert set(rows) == {"birthdate", "year_initials", "bkey_exact", "token_prefix"}
    for r in rows.values():
        assert r.n_candidates > 0
        assert 0.0 < r.reduction < 1.0
        assert 0.0 <= r.recall <= 1.0
        assert r.n_covered <= r.n_truth
    # birthdate blocking is the loosest (any shared birthdate) -> most
    # candidates; the composite bkey is the tightest.
    assert rows["birthdate"].n_candidates >= rows["year_initials"].n_candidates
    assert rows["year_initials"].n_candidates >= rows["bkey_exact"].n_candidates
    assert rows["bkey_exact"].reduction >= rows["birthdate"].reduction
    # tighter blocking can only lose recall
    assert rows["birthdate"].recall >= rows["bkey_exact"].recall
    # the typo'd fixture makes exact-key blocking lossy
    assert rows["bkey_exact"].recall < 1.0
    # token-prefix (year + 2-char last + 1-char first prefixes) sits
    # between initials and the full phonetic key on tightness
    assert rows["token_prefix"].n_candidates <= rows["year_initials"].n_candidates
    assert rows["token_prefix"].recall <= rows["year_initials"].recall


def test_token_prefix_null_birthdate_never_blocks(spark):
    """A NULL birthdate must null the whole token_prefix key: records
    with no date may not block-match each other on name prefixes alone
    (the DuckDB oracle's year() equi-join drops NULLs, so Spark must
    too — concat_ws would have silently skipped the NULL)."""
    import pandas as pd

    rows = pd.DataFrame(
        {
            "id": [1, 2, 3],
            "uuid": ["u1", "u2", "u3"],
            "first_name": ["Liam", "Lior", "Liam"],
            "middle_name": [None, None, None],
            "last_name": ["Lloyd", "Lloyd", "Lloyd"],
            "birthdate": pd.Series(
                [None, None, pd.Timestamp("1980-02-03")], dtype="object"
            ),
            "hh_id": [None, None, None],
        }
    )
    p = prepare_persons(spark.createDataFrame(rows), include_middle=False)
    truth = spark.createDataFrame(pd.DataFrame({"id_1": [1], "id_2": [2]}))
    out = {
        r.strategy: r
        for r in blocking_quality(p, p, truth, strategies=("token_prefix",)).collect()
    }
    # Only the dated row can self-pair; the two NULL-birthdate rows
    # (same 'Ll|l' name prefix) must produce no candidates.
    assert out["token_prefix"].n_candidates == 1
    assert out["token_prefix"].n_covered == 0
