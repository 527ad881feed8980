"""Text-analysis and similarity-search operator semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from name_matcher_spark.operators.multimodal import (
    decode_image_batch,
    extract_media_features,
)
from name_matcher_spark.operators.simsearch import cosine_topk, lsh_cosine_topk
from name_matcher_spark.operators.text import (
    lang_id,
    quality_metrics,
    token_count,
)


def test_lang_id(spark):
    d = spark.createDataFrame(
        [
            (1, "the cat and the dog went to the market with a ball"),
            (2, "el perro y el gato es una historia que es muy buena"),
            (3, "der hund und die katze ist nicht ein problem"),
            (4, "xyzzy plugh"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.detected_lang for r in lang_id(d).collect()}
    assert got == {1: "en", 2: "es", 3: "de", 4: "und"}


def test_lang_id_scripts(spark):
    """Script vote beats stopwords; kana beats Han-majority; one quoted
    CJK char below the 5% threshold does NOT flip an English doc."""
    d = spark.createDataFrame(
        [
            (1, "これはテストのためのかなだけの文です"),  # kana-only -> ja
            (2, "日本国憲法第九条の規定により戦争を放棄する"),  # Han-majority + kana -> still ja
            (3, "你好世界这是一个中文文档没有假名"),  # Han only -> zh
            (4, "한국어 문서입니다 한글만 있습니다"),  # ko
            (5, "Это русский текст для проверки кириллицы"),  # ru
            (6, "هذا نص عربي للاختبار"),  # ar
            (7, "यह हिंदी में एक परीक्षण दस्तावेज है"),  # hi
            (8, "Αυτό είναι ένα ελληνικό κείμενο δοκιμής"),  # el
            # one Han char in a long English sentence: threshold holds
            (9, "The quick brown fox and the lazy dog went to the market 中"),
            # script chars present in a SHORT doc: script wins over 'the'
            (10, "the 漢字"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.detected_lang, r.lang_score) for r in lang_id(d).collect()}
    langs = {k: v[0] for k, v in got.items()}
    assert langs == {
        1: "ja", 2: "ja", 3: "zh", 4: "ko", 5: "ru",
        6: "ar", 7: "hi", 8: "el", 9: "en", 10: "zh",
    }
    assert got[2][1] > 0  # score = kana count, not Han count
    assert got[9][1] >= 2  # stopword hits ('the' x2 + 'and')


def test_quality_metrics(spark):
    d = spark.createDataFrame([(1, "Hello, world! The end.")], "doc_id long, text string")
    r = quality_metrics(d).collect()[0]
    assert r.n_chars == 22
    assert r.n_tokens == 4
    assert r.punct_ratio > 0
    assert r.upper_ratio == pytest.approx(round(2 / 22, 4))
    assert r.stopword_ratio == pytest.approx(0.25)  # "the" / 4 tokens


def test_repetition_metrics(spark):
    from name_matcher_spark.operators.text import repetition_metrics

    d = spark.createDataFrame(
        [
            (1, "alpha beta\nalpha beta\ngamma delta"),
            (2, "one two one two one two one two one two"),
            (3, "unique words only here nothing repeats at all"),
            (4, "x"),
            (5, ""),
            (6, "Line One\nline one\nLINE ONE"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_metrics(d).collect()}
    # 3 non-empty lines, "alpha beta" repeats once -> 1 - 2/3
    assert rows[1].n_lines == 3
    assert rows[1].dup_line_frac == pytest.approx(round(1 - 2 / 3, 4))
    # total 2-gram loop: "one two" x5 over 10 tokens -> capped 1.0;
    # every 5-gram repeats -> capped 1.0
    assert rows[2].top_2gram_frac == 1.0
    assert rows[2].dup_5gram_frac == 1.0
    # no repetition: dup fractions 0; top_2gram still counts the most
    # frequent 2-gram (count 1 -> 2/8 tokens), per the paper's
    # definition — thresholds are applied above ~0.2, not at 0
    assert rows[3].dup_line_frac == 0.0
    assert rows[3].top_2gram_frac == pytest.approx(0.25)
    assert rows[3].dup_5gram_frac == 0.0
    # single token: no grams, zeroed via the left-join path
    assert rows[4].n_tokens == 1
    assert rows[4].top_2gram_frac == 0.0
    # empty text: all-zero row, not a crash / NULL
    assert rows[5].n_lines == 0 and rows[5].n_tokens == 0
    assert rows[5].dup_line_frac == 0.0
    # line dedup is case-SENSITIVE; token grams are lowercased
    assert rows[6].dup_line_frac == 0.0
    assert rows[6].top_2gram_frac == 1.0


def test_token_count_edges(spark):
    d = spark.createDataFrame([("",), ("  ",), ("a b  c",)], "t string")
    got = [r[0] for r in d.select(token_count(F.col("t"))).collect()]
    assert got == [0, 0, 3]


def test_cosine_topk_exact(spark):
    vecs = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, [0.0, 1.0]),
        (4, [0.7, 0.7]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") == 1)
    got = [(r.corpus_id, r.rank) for r in cosine_topk(df, q, k=3).orderBy("rank").collect()]
    assert got == [(2, 1), (4, 2), (3, 3)]


def test_lsh_recall_on_near_duplicates(spark):
    import random

    random.seed(5)
    base = [random.uniform(-1, 1) for _ in range(64)]
    near = [x + random.uniform(-0.01, 0.01) for x in base]
    rows = [(1, base), (2, near)] + [
        (i, [random.uniform(-1, 1) for _ in range(64)]) for i in range(3, 120)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") == 1)
    got = lsh_cosine_topk(df, q, dim=64, k=3).collect()
    assert any(r.corpus_id == 2 and r.rank == 1 for r in got)


def test_ivf_recall_on_near_duplicates(spark):
    """A near-duplicate of the query lands in the same inverted list
    and is ranked first; the plan stays JVM-only."""
    import random

    from name_matcher_spark.operators.simsearch import ivf_cosine_topk

    random.seed(7)
    base = [random.uniform(-1, 1) for _ in range(64)]
    near = [x + random.uniform(-0.01, 0.01) for x in base]
    rows = [(1, base), (2, near)] + [
        (i, [random.uniform(-1, 1) for _ in range(64)]) for i in range(3, 120)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") == 1)
    got = ivf_cosine_topk(df, q, centroid_stride=11, nprobe=3, k=3)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    rows_out = got.collect()
    assert any(r.corpus_id == 2 and r.rank == 1 for r in rows_out)


def test_multimodal_stub(spark):
    import pandas as pd

    with pytest.raises(NotImplementedError):
        decode_image_batch(pd.Series([b"x"]), fake=False)

    d = spark.createDataFrame(
        [(1, b"hello", "image/png"), (2, None, "image/png")],
        "media_id long, content binary, mime string",
    )
    rows = {r.media_id: r for r in extract_media_features(d, fake=True).collect()}
    assert rows[1].n_bytes == 5
    assert len(rows[1].feature) == 8
    assert rows[2].n_bytes == 0
    assert rows[1].digest != rows[2].digest


def test_text_filter_pipeline_verdicts(spark):
    from name_matcher_spark.operators.text import text_filter_pipeline

    docs = spark.createDataFrame(
        [
            (1, "way too short"),
            (2, " ".join(["click here"] * 15)),  # passes length, fails repetition
            (3, "the quick brown fox and the lazy dog went to market with "
                "a basket of fresh bread and some cheese for the picnic"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in text_filter_pipeline(docs).collect()}
    assert not rows[1].pass_len and not rows[1].keep
    assert rows[2].pass_len and not rows[2].pass_rep and not rows[2].keep
    assert rows[3].keep and rows[3].pass_len and rows[3].pass_rep and rows[3].pass_lang


def test_redact_pii(spark):
    from name_matcher_spark.operators.text import redact_pii

    docs = spark.createDataFrame(
        [
            (1, "mail bob@x.io and alice@y.org now"),
            (2, "host 10.0.0.1 dialed +44 20 7946 0958"),
            (3, None),
            (4, "clean text only"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in redact_pii(docs).collect()}
    assert rows[1].n_email == 2
    assert rows[1].redacted_text == "mail |||EMAIL||| and |||EMAIL||| now"
    assert rows[2].n_ipv4 == 1 and rows[2].n_phone == 1
    assert "10.0.0.1" not in rows[2].redacted_text
    assert "7946" not in rows[2].redacted_text
    assert rows[3].redacted_text == "" and rows[3].n_email == 0
    assert rows[4].redacted_text == "clean text only"


def test_cosine_topk_excludes_zero_vectors(spark):
    """A zero/empty embedding (padding / failed-encode artifact) must
    be excluded, not DIVIDE_BY_ZERO the job under ANSI."""
    rows = [
        (1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 0.0]), (4, [0.5, 0.5]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = cosine_topk(emb, emb.filter("vec_id = 1"), k=3).collect()
    ids = {r.corpus_id for r in out}
    assert 3 not in ids and {2, 4} <= ids
    # zero vector as a QUERY yields no rows rather than a crash
    assert cosine_topk(emb, emb.filter("vec_id = 3"), k=3).count() == 0


def test_hyperplane_signatures_rejects_wrong_dim(spark):
    import pytest as _pytest

    from name_matcher_spark.operators.simsearch import hyperplane_signatures

    emb = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(Exception, match="length != dim"):
        hyperplane_signatures(emb, "vec_id", "embedding", dim=64).collect()


def test_token_count_null_text_is_zero(spark):
    from name_matcher_spark.operators.text import quality_metrics

    docs = spark.createDataFrame(
        [(1, None), (2, "two words")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in quality_metrics(docs).collect()}
    assert got[1].n_tokens == 0
    assert got[2].n_tokens == 2


def test_langid_barrier_matches_inline_reference(spark):
    """The r06 barrier formulation (counts materialized once behind a
    Generate, vote over attributes) must be bit-identical to the
    original inline CASE-chain formulation on edge docs: empty/NULL
    text, threshold-straddling script fractions, marker/script
    conflicts, and tie-order cases."""
    from name_matcher_spark.operators.text import (
        LANG_MARKERS,
        SCRIPT_CLASSES,
        SCRIPT_MIN_FRACTION_DEN,
        _marker_hits,
    )

    def inline_reference(docs, id_col="doc_id", text_col="text"):
        t = F.col(text_col)
        n_nonws = F.length(F.regexp_replace(t, "\\s+", ""))
        script = {
            lang: F.regexp_count(t, F.lit(pat)) for lang, pat in SCRIPT_CLASSES
        }
        eligible = {
            lang: (c > 0) & (c * SCRIPT_MIN_FRACTION_DEN >= n_nonws)
            for lang, c in script.items()
        }
        hits = {
            lang: _marker_hits(t, words) for lang, words in LANG_MARKERS.items()
        }
        best_lang, best_score = F.lit("und"), F.lit(0)
        for lang in LANG_MARKERS:
            is_better = hits[lang] > best_score
            best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
            best_score = F.when(is_better, hits[lang]).otherwise(best_score)
        s_lang, s_score = F.lit(None).cast("string"), F.lit(0)
        for lang, _pat in SCRIPT_CLASSES[1:]:
            is_better = eligible[lang] & (script[lang] > s_score)
            s_lang = F.when(is_better, F.lit(lang)).otherwise(s_lang)
            s_score = F.when(is_better, script[lang]).otherwise(s_score)
        final_lang = (
            F.when(eligible["ja"], F.lit("ja"))
            .when(s_lang.isNotNull(), s_lang)
            .otherwise(best_lang)
        )
        final_score = (
            F.when(eligible["ja"], script["ja"])
            .when(s_lang.isNotNull(), s_score)
            .otherwise(best_score)
        )
        return docs.select(
            F.col(id_col),
            final_lang.alias("detected_lang"),
            final_score.cast("long").alias("lang_score"),
        )

    rows = [
        (1, "the cat and the dog went to the market"),
        (2, "el perro y el gato es una historia que es muy buena"),
        (3, ""),
        (4, None),
        (5, "これはテストのためのかなだけの文です"),
        (6, "日本国憲法第九条の規定により戦争を放棄する"),
        (7, "The quick brown fox and the lazy dog went to the market 中"),
        (8, "the 漢字"),
        (9, "   \n\t  "),
        (10, "Αυτό είναι ελληνικό the and of to is that with κείμενο"),
        # exactly at the 1/20 threshold: 1 Han char, 20 non-ws chars
        (11, "abcdefghij abcdefghi 中"),
        # just below: 1 Han char, 21 non-ws chars
        (12, "abcdefghij abcdefghij 中"),
        (13, "le la les est une dans pour el la los"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = lang_id(d)
    ref = inline_reference(d)
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0


def test_lang_id_zero_shuffle(spark):
    """lang_id is a pure per-row operator: no Exchange in its plan."""
    d = spark.createDataFrame([(1, "the cat and the dog")], "doc_id long, text string")
    plan = lang_id(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
