"""Text-analysis operator tests."""

from __future__ import annotations

import pytest

from orestes_spark.operators import text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat and the dog sat in a house of cards"),
        (2, "der hund und die katze ist nicht das problem"),
        (3, "le chat et les chiens est la maison des amis"),
        (4, "el gato y los perros es una casa de cartas"),
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_lang_id(docs):
    got = {r["doc_id"]: r["pred_lang"] for r in text.lang_id(docs, "doc_id", "text").collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "es"}


def test_token_count(docs):
    got = {r["doc_id"]: r["n_tokens"] for r in text.token_count(docs, "doc_id", "text").collect()}
    assert got[1] == 11 and got[2] == 9


def test_quality_scores(docs):
    rows = {r["doc_id"]: r for r in text.quality_scores(docs, "doc_id", "text").collect()}
    r1 = rows[1]
    # "the" x2, "and", "a", "in", "of" → 6 stopwords of 11 tokens
    assert r1["stopword_ratio"] == pytest.approx(round(6 / 11, 6))
    assert r1["avg_token_len"] == pytest.approx(3.0)


def test_bpe_ish_token_count(spark):
    d = spark.createDataFrame(
        [(1, "don't panic, agent 007!"), (2, "plain words only here")],
        "doc_id LONG, text STRING",
    )
    rows = {r["doc_id"]: r for r in text.bpe_ish_token_count(d, "doc_id", "text").collect()}
    # don | ' | t | panic | , | agent | 007 | !  → 8 BPE-ish tokens
    assert rows[1]["n_ws_tokens"] == 4 and rows[1]["n_bpe_tokens"] == 8
    assert rows[2]["n_ws_tokens"] == 4 and rows[2]["n_bpe_tokens"] == 4


def test_repetition_metrics(spark):
    d = spark.createDataFrame(
        [
            (1, "buy now buy now buy now buy now"),   # bigram "buy now" dominates
            (2, "all words here are fully distinct"),
            (3, "solo"),                               # < 2 tokens → no row
        ],
        "doc_id LONG, text STRING",
    )
    rows = {r["doc_id"]: r for r in text.repetition_metrics(d, "doc_id", "text").collect()}
    assert 3 not in rows
    assert rows[1]["n_bigrams"] == 7 and rows[1]["top_bigram_frac"] == pytest.approx(4 / 7)
    assert rows[2]["top_bigram_frac"] == pytest.approx(1 / 5)


def test_pii_scrub_matches_duckdb_dialect(spark):
    """Dialect guard: Java regex (Spark) and RE2 (DuckDB) must agree on
    the PII patterns — counts and the scrubbed text byte for byte."""
    import duckdb

    rows = [
        (1, "contact me at alice.smith+spam@example.co.uk or bob@x.io today"),
        (2, "call +1 (555) 123-4567 or 020 7946 0958 now"),
        (3, "no pii in this one at all"),
    ]
    d = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r["doc_id"]: r for r in text.pii_scrub(d, "doc_id", "text").collect()}
    assert got[1]["n_emails"] == 2 and got[1]["n_phones"] == 0
    assert got[2]["n_phones"] >= 1 and got[2]["n_emails"] == 0
    assert got[3]["n_emails"] == 0 and got[3]["n_phones"] == 0

    con = duckdb.connect()
    for doc_id, txt in rows:
        n_em, n_ph, md = con.execute(
            f"""SELECT len(regexp_extract_all(?, '{text.EMAIL_PATTERN}')),
                       len(regexp_extract_all(?, '{text.PHONE_PATTERN}')),
                       md5(regexp_replace(regexp_replace(?, '{text.EMAIL_PATTERN}', '<EMAIL>', 'g'),
                                          '{text.PHONE_PATTERN}', '<PHONE>', 'g'))""",
            [txt, txt, txt],
        ).fetchone()
        assert got[doc_id]["n_emails"] == n_em
        assert got[doc_id]["n_phones"] == n_ph
        assert got[doc_id]["clean_md5"] == md


def test_fingerprints_whitespace_invariant(spark):
    a = spark.createDataFrame(
        [(1, "hello world foo bar baz"), (2, "hello   world\tfoo bar baz")],
        "doc_id LONG, text STRING",
    )
    rows = text.fingerprints(a, "doc_id", "text").collect()
    fps = {r["doc_id"]: (r["fingerprint"], r["shingle_fingerprint"]) for r in rows}
    assert fps[1] == fps[2]


def test_rarity_scores_separate_common_from_rare(spark):
    from orestes_spark.operators import text

    rows = [(1, "common words here"), (2, "common words here"), (3, "common words here"),
            (4, "zyx qwv unique")]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r["doc_id"]: r for r in text.rarity_scores(df, "doc_id", "text").collect()}
    # docs 1-3 share every token (df=3 each); doc 4 is all-unique (df=1)
    assert out[1]["avg_token_df"] == 3.0
    assert out[4]["avg_token_df"] == 1.0
    assert out[4]["n_distinct"] == 3


def test_top_terms_prefers_distinctive_repeated_tokens(spark):
    from orestes_spark.operators import text

    rows = [
        (1, "shared shared shared special special special special"),
        (2, "shared filler words"),
        (3, "shared filler words"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = text.top_terms(df, "doc_id", "text", k=1).collect()
    top = {r["doc_id"]: r["tok"] for r in out}
    # 'special' is doc-1-only (df=1) and repeated → beats 'shared' (df=3)
    assert top[1] == "special"
    assert all(r["rn"] == 1 for r in out)


def test_rag_chunks_offsets_overlap_and_dedup_hash(spark):
    from orestes_spark.operators import text

    doc = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, doc), (2, doc)], "doc_id LONG, text STRING")
    out = sorted(
        (r["doc_id"], r["chunk_idx"], r["start_token"], r["n_tokens"], r["chunk_md5"])
        for r in text.rag_chunks(df, "doc_id", "text", window=4, stride=3).collect()
    )
    per_doc = [(c, s, n) for (d, c, s, n, _) in out if d == 1]
    assert per_doc == [(0, 0, 4), (1, 3, 4), (2, 6, 4), (3, 9, 1)]
    # identical source docs produce identical chunk hashes (cross-doc
    # chunk dedup on chunk_md5 is exact)
    h1 = [h for (d, _, _, _, h) in out if d == 1]
    h2 = [h for (d, _, _, _, h) in out if d == 2]
    assert h1 == h2 and len(set(h1)) == 4


def test_bigram_rarity_model(spark):
    """bigram_rarity vs a hand-computed corpus: doc A re-uses the
    common 'the cat' transition, doc B is all singleton bigrams, a
    one-token doc scores NULL."""
    from orestes_spark.operators.text import bigram_rarity

    rows = [
        (1, "the cat sat the cat ran the cat"),  # 'the cat' x3 (common)
        (2, "zq qz unique gibberish xray"),      # 4 singleton bigrams
        (3, "solo"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r["doc_id"]: (r["n_bigrams"], r["rare_ratio"])
           for r in bigram_rarity(df, "doc_id", "text", rare_max=2).collect()}
    # doc 1 bigrams: (the,cat)x3 (cat,sat)(sat,the)(cat,ran)(ran,the) = 7
    # rare (count<=2): all but the 3 'the cat' -> 4/7
    assert got[1] == (7, round(4 / 7, 6))
    assert got[2] == (4, 1.0)
    assert got[3] == (None, None)


def test_cap_per_group(spark):
    """cap_per_group keeps exactly n best-ordered rows per group."""
    from pyspark.sql import functions as F

    from orestes_spark.operators.sampling import cap_per_group

    rows = [(f"d{g}{i}", f"g{g}", i * 10) for g in range(3) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id STRING, source STRING, n_chars LONG")
    got = cap_per_group(df, "source", [F.col("n_chars").desc(), F.col("doc_id")], 2)
    rows_out = got.collect()
    assert len(rows_out) == 6  # 3 groups x cap 2
    per = {}
    for r in rows_out:
        per.setdefault(r["source"], []).append(r["n_chars"])
    assert all(sorted(v, reverse=True) == [40, 30] for v in per.values())
    import pytest

    with pytest.raises(ValueError, match=">= 1"):
        cap_per_group(df, "source", [F.col("n_chars")], 0)


def test_token_entropy_known_values(spark):
    """H = 0 for a one-token doc, ln(k) for k equally-frequent types,
    and the deterministic series tracks libm to ~1e-9 at display
    precision; mixed-frequency doc checked against the closed form."""
    import math

    from orestes_spark.operators.text import token_entropy

    docs = spark.createDataFrame(
        [
            (1, "a a a a"),                  # one type: H = 0
            (2, "a b c d"),                  # uniform over 4: H = ln(4)
            (3, "a a b"),                    # H = ln(3) - (2 ln 2)/3
        ],
        "doc_id LONG, text STRING",
    )
    rows = {r["doc_id"]: r for r in token_entropy(docs, "doc_id", "text").collect()}
    assert rows[1]["n_tokens"] == 4 and rows[1]["n_types"] == 1
    assert rows[1]["entropy"] == 0.0
    assert abs(rows[2]["entropy"] - round(math.log(4), 6)) <= 1e-6
    expect3 = math.log(3) - (2 * math.log(2)) / 3
    assert abs(rows[3]["entropy"] - round(expect3, 6)) <= 1e-6


def test_gopher_rules_named_verdicts(spark):
    """Each rule trips on its planted violation and names itself; a
    clean doc keeps with an empty failed_rules CSV."""
    from orestes_spark.operators.text import gopher_rules

    docs = spark.createDataFrame(
        [
            (1, "this corpus document looks perfectly ordinary and readable to the filter today"),
            (2, "too short"),                                   # word_count
            (3, " ".join(["ab"] * 12)),                          # mean_word_len (low)
            (4, " ".join(["#!"] * 3 + ["normal"] * 9)),          # symbol_ratio (25%)
            (5, " ".join(["123"] * 5 + ["words"] * 7)),          # alpha_frac (58%)
            (6, "x" * 40 + " " + " ".join(["fine"] * 11)),       # max_word_len
        ],
        "doc_id LONG, text STRING",
    )
    rows = {r["doc_id"]: r for r in gopher_rules(docs, "doc_id", "text").collect()}
    assert rows[1]["keep"] is True and rows[1]["failed_rules"] == ""
    assert rows[2]["keep"] is False and "word_count" in rows[2]["failed_rules"]
    assert "mean_word_len" in rows[3]["failed_rules"]
    assert "symbol_ratio" in rows[4]["failed_rules"]
    assert "alpha_frac" in rows[5]["failed_rules"]
    assert "max_word_len" in rows[6]["failed_rules"]
    assert rows[6]["n_rules_failed"] >= 1


def test_quality_model_separates_planted_labels(spark):
    """The DCLM-style trained scorer: train NB log-odds on a labeled
    seed of clean-prose vs spam-gibberish docs, then score HELD-OUT
    docs of both kinds — the model must separate them (positive
    log-odds for prose-like, negative for spam-like) purely from
    hashed token distributions."""
    from orestes_spark.operators.text import quality_model_scores

    prose = "the quick study found that careful reading of the report improves results and the team agreed"
    spam = "buy cheap pills viagra casino winner click here free money jackpot xxx lottery prize claim now"
    docs = spark.createDataFrame(
        # seed: ids 0-5 labeled; held-out: ids 10-13 unlabeled
        [
            (0, prose), (1, prose + " again today"), (2, "members read the careful report and the study"),
            (3, spam), (4, spam + " bonus bonus"), (5, "casino jackpot winner free pills click claim xxx"),
            (10, "the careful team report and the study results"),   # held-out good
            (11, "reading the report improves the team results"),    # held-out good
            (12, "free casino pills jackpot click winner money"),    # held-out spam
            (13, "xxx lottery prize claim cheap viagra bonus"),      # held-out spam
        ],
        "doc_id LONG, text STRING",
    )
    labels = spark.createDataFrame(
        [(0, True), (1, True), (2, True), (3, False), (4, False), (5, False)],
        "doc_id LONG, label BOOLEAN",
    )
    rows = {
        r["doc_id"]: r
        for r in quality_model_scores(docs, labels, "doc_id", "text").collect()
    }
    assert set(rows) == {0, 1, 2, 3, 4, 5, 10, 11, 12, 13}
    for good in (10, 11):
        assert rows[good]["keep"] is True and rows[good]["nb_logodds"] > 0
    for bad in (12, 13):
        assert rows[bad]["keep"] is False and rows[bad]["nb_logodds"] < 0
    # seed docs classify consistently with their own labels too
    assert rows[0]["nb_logodds"] > 0 > rows[3]["nb_logodds"]


def test_quality_model_artifact_self_describes_and_validates(spark):
    """The model artifact pins its featurization (nb/bg/salt) and the
    prior; scoring with a mixed-config frame raises; a one-class seed
    raises at train time."""
    import pytest

    from orestes_spark.operators.text import (
        score_quality_model,
        train_quality_model,
    )

    docs = spark.createDataFrame(
        [(0, "good clean text"), (1, "bad spam text")],
        "doc_id LONG, text STRING",
    )
    labels = spark.createDataFrame(
        [(0, True), (1, False)], "doc_id LONG, label BOOLEAN"
    )
    m = train_quality_model(docs, labels, "doc_id", "text", buckets=64)
    assert m.count() == 64
    meta = m.select("nb", "bg", "salt").distinct().collect()
    assert len(meta) == 1 and meta[0]["nb"] == 64 and meta[0]["salt"] == "qm"
    # a persisted-then-reloaded model scores identically (artifact is
    # plain columns, no driver state)
    scored = {r["doc_id"]: r["nb_logodds"] for r in score_quality_model(docs, m, "doc_id", "text").collect()}
    assert scored[0] > 0 > scored[1]
    mixed = m.union(
        train_quality_model(docs, labels, "doc_id", "text", buckets=64, salt="other")
    )
    with pytest.raises(ValueError, match="featurization"):
        score_quality_model(docs, mixed, "doc_id", "text")
    with pytest.raises(ValueError, match="BOTH classes"):
        train_quality_model(
            docs, labels.where("label"), "doc_id", "text", buckets=64
        )


def test_train_bpe_planted_merges(spark):
    """Classic planted case: with 'low' x5, 'lower' x2, 'lowest' x2
    the first merges must be (l,o) then (lo,w) — 'low' appears in
    every word — and segmentation applies them greedily left-to-right.
    Also pins the run behavior: merging (a,a) on 'aaaa' yields
    [aa, a, a] under the shared replace semantics (scan continues past
    each replacement), the documented cross-engine rule."""
    from orestes_spark.operators.text import bpe_segment_counts, train_bpe

    docs = spark.createDataFrame(
        [(i, "low") for i in range(5)]
        + [(10, "lower"), (11, "lower"), (20, "lowest"), (21, "lowest")],
        "doc_id LONG, text STRING",
    )
    m = train_bpe(docs, "doc_id", "text", num_merges=2)
    got = [(r["rank"], r["left"], r["right"], r["merged"]) for r in m.orderBy("rank").collect()]
    assert got == [(0, "l", "o", "lo"), (1, "lo", "w", "low")]
    counts = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_segment_counts(docs, m, "doc_id", "text").collect()
    }
    assert counts[0] == (1, 1)       # low -> [low]
    assert counts[10] == (1, 3)      # lower -> [low, e, r]
    assert counts[20] == (1, 4)      # lowest -> [low, e, s, t]

    runs = spark.createDataFrame([(1, "aaaa aaaa")], "doc_id LONG, text STRING")
    m2 = train_bpe(runs, "doc_id", "text", num_merges=1)
    assert [(r["left"], r["right"]) for r in m2.collect()] == [("a", "a")]
    c2 = bpe_segment_counts(runs, m2, "doc_id", "text").collect()[0]
    assert (c2["n_words"], c2["n_bpe_tokens"]) == (2, 6)  # [aa,a,a] per word

    import pytest

    with pytest.raises(ValueError, match="corpus exhausted"):
        train_bpe(
            spark.createDataFrame([(1, "x y")], "doc_id LONG, text STRING"),
            "doc_id", "text", num_merges=1,
        )


def test_quality_model_scores_are_total_over_input(spark):
    """Review round-10: a doc with NO feature rows (NULL text) must
    still get a verdict — prior-only, the Naive-Bayes zero-evidence
    answer — instead of silently vanishing and bypassing any gate
    built on the scores. Empty-string docs score normally (one empty
    token)."""
    from orestes_spark.operators.text import quality_model_scores

    docs = spark.createDataFrame(
        [(0, "good clean prose text"), (1, "bad spam junk text"),
         (2, None), (3, "")],
        "doc_id LONG, text STRING",
    )
    labels = spark.createDataFrame(
        [(0, True), (1, False)], "doc_id LONG, label BOOLEAN"
    )
    rows = {
        r["doc_id"]: r
        for r in quality_model_scores(docs, labels, "doc_id", "text", buckets=64).collect()
    }
    assert set(rows) == {0, 1, 2, 3}  # TOTAL: all four docs verdict'd
    assert rows[2]["n_tokens"] == 0
    # prior-only: equal seed class counts -> prior log-odds 0 -> keep
    assert rows[2]["nb_logodds"] == 0.0 and rows[2]["keep"] is True
    assert rows[3]["n_tokens"] == 1  # the empty token still hashes


def test_bigram_lm_separates_fluent_from_noise(spark):
    """A doc made of the target's bigrams scores a lower avg_nll than
    a doc of never-seen tokens (all OOV->OOV fallback floor)."""
    from orestes_spark.operators.text import bigram_lm_nll

    target = spark.createDataFrame(
        [(i, "the cat sat on the mat and the cat ran") for i in range(5)],
        "doc_id LONG, text STRING",
    )
    docs = spark.createDataFrame(
        [
            (100, "the cat sat on the mat"),       # target-like
            (101, "zzz qqq www uuu vvv kkk"),       # pure OOV noise
            (102, "solo"),                           # 1 token: no bigrams
        ],
        "doc_id LONG, text STRING",
    )
    rows = {r["doc_id"]: r for r in bigram_lm_nll(docs, target, "doc_id", "text", vocab_size=16).collect()}
    assert set(rows) == {100, 101}  # <2-token doc has no row
    assert rows[100]["n_bigrams"] == 5 and rows[101]["n_bigrams"] == 5
    assert rows[100]["avg_nll"] < rows[101]["avg_nll"]
    # OOV->OOV bigrams all hit the same fallback: ln(1/(ctx(0)+V+1));
    # ctx(0)=0 here because every target token is in-vocab
    import math
    expected = round(-round(math.log(1 / 17) * 1e9) / 1e9, 6)
    assert abs(rows[101]["avg_nll"] - expected) < 2e-6


def test_bigram_lm_observed_pair_probability(spark):
    """Exact probability check: one training doc 'a b a b' gives
    ctx(a)=2 with cnt(a,b)=2 -> p(b|a)=(2+1)/(2+V+1)."""
    import math

    from orestes_spark.operators.text import bigram_lm_nll

    target = spark.createDataFrame([(0, "a b a b a")], "doc_id LONG, text STRING")
    docs = spark.createDataFrame([(1, "a b")], "doc_id LONG, text STRING")
    row = bigram_lm_nll(docs, target, "doc_id", "text", vocab_size=4).collect()[0]
    # vocab: a (3 occurrences, id 1), b (2, id 2); cnt(a,b)=2 and
    # ctx(a) = 2 (bigrams whose PREVIOUS token is a) -> p(b|a)=3/7
    p = (2 + 1) / (2 + 5)
    nano = round(math.log(p) * 1e9)
    assert row["n_bigrams"] == 1
    assert row["avg_nll"] == round(-nano / 1e9, 6) or abs(row["avg_nll"] + nano / 1e9) < 2e-6


def test_quality_model_eval_separation_and_degradation(spark):
    """Round-11 (VERDICT r10 #9): quality_model_eval reports the
    confusion matrix + precision/recall/accuracy of the trained gate
    on its labeled fixtures; planted-label degradation — training on
    FLIPPED labels inverts the verdicts and the report shows it."""
    from orestes_spark.operators import text

    good = "the quick brown fox jumps over the lazy dog near the river bank"
    junk = "zzkw qqfj xxvp glorp wibble frobnitz quux blarg snarf"
    rows = [(i, good + f" variant {i}", True) for i in range(10)] + [
        (100 + i, junk + f" noise {i}", False) for i in range(10)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id LONG, text STRING"
    )
    labels = spark.createDataFrame(
        [(i, lab) for i, _, lab in rows], "doc_id LONG, label BOOLEAN"
    )
    model = text.train_quality_model(docs, labels, "doc_id", "text")
    rep = text.quality_model_eval(docs, labels, model, "doc_id", "text").collect()[0]
    assert rep["n_labeled"] == 20
    assert rep["tp"] + rep["fp"] + rep["fn"] + rep["tn"] == 20
    assert rep["precision"] >= 0.9 and rep["recall"] >= 0.9
    assert rep["accuracy"] >= 0.9

    from pyspark.sql import functions as F

    flipped = labels.select("doc_id", (~F.col("label")).alias("label"))
    bad_model = text.train_quality_model(docs, flipped, "doc_id", "text")
    bad = text.quality_model_eval(
        docs, labels, bad_model, "doc_id", "text"
    ).collect()[0]
    assert bad["accuracy"] <= 0.1  # verdicts inverted — the report catches it


def test_pii_classes_counts_and_luhn_split(spark):
    rows = [
        (1, "pay 4111111111111111 or 4111111111111112 today"),
        (2, "mail me at a.b+c@example.org and 10.0.0.1 ssn 123-45-6789"),
        (3, "call +1 (415) 555-0199 now"),
        (4, "no pii here at all"),
    ]
    d = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r["doc_id"]: r for r in text.pii_classes(d, "doc_id", "text").collect()}
    # 4111111111111111 is Luhn-valid, ...12 is not; both match the format.
    assert got[1]["n_cards"] == 2 and got[1]["n_luhn"] == 1
    assert got[2]["n_emails"] == 1 and got[2]["n_ipv4"] == 1 and got[2]["n_ssn"] == 1
    assert got[3]["n_phones"] == 1
    assert not got[4]["any_pii"]
    assert got[1]["any_pii"] and got[2]["any_pii"] and got[3]["any_pii"]


def _luhn_valid(pan: str) -> bool:
    total = 0
    for i, ch in enumerate(reversed(pan)):
        d = int(ch)
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def test_plant_pii_block_closed_form(spark):
    ids = [24, 12, 15, 21, 11]  # %8=0 invalid card, %4-not-%8 valid card, ssn, ip, none
    d = spark.createDataFrame([(i, "base text") for i in ids], "doc_id LONG, text STRING")
    got = {r["doc_id"]: r["text"] for r in text.plant_pii_block(d, "doc_id", "text").collect()}
    assert got[11] == "base text"
    assert "user24@example.com" in got[24]  # 24 % 3 == 0
    assert "ssn 000-00-0015" in got[15]
    assert "host 22." in got[21]  # 21 % 254 + 1
    import re

    for i in (24, 12):
        (pan,) = re.findall(r"card ([0-9]{16})", got[i])
        assert _luhn_valid(pan) == (i % 8 != 0)
    # detection over the planted block agrees with the plant schedule
    det = {
        r["doc_id"]: r
        for r in text.pii_classes(
            text.plant_pii_block(d, "doc_id", "text"), "doc_id", "text"
        ).collect()
    }
    assert det[24]["n_cards"] == 1 and det[24]["n_luhn"] == 0
    assert det[12]["n_cards"] == 1 and det[12]["n_luhn"] == 1
    assert det[15]["n_ssn"] == 1 and det[21]["n_ipv4"] == 1
    assert not det[11]["any_pii"]


def test_pii_luhn_validator_matches_python_reference(spark):
    """Hypothesis sweep: the Column-expression Luhn validator agrees
    with the textbook Python implementation on arbitrary 16-digit
    strings (the dialect-shared contract _luhn_sum / luhn_sum_sql is
    generated from)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    collected: list[str] = []

    @settings(
        max_examples=30, deadline=None, suppress_health_check=list(HealthCheck)
    )
    @given(st.text(alphabet="0123456789", min_size=16, max_size=16))
    def gather(pan):
        collected.append(pan)

    gather()
    pans = sorted(set(collected) | {"4111111111111111", "0000000000000000"})
    d = spark.createDataFrame(
        [(i, f"card {p}") for i, p in enumerate(pans)], "doc_id LONG, text STRING"
    )
    got = {
        r["doc_id"]: r["n_luhn"]
        for r in text.pii_classes(d, "doc_id", "text").collect()
    }
    for i, p in enumerate(pans):
        assert got[i] == (1 if _luhn_valid(p) else 0), p
