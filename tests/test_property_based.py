"""Hypothesis property tests: the custom operators against pure-Python
models on generated inputs — catches edge shapes the fixture tables never
produce (empty sides, all-ties, null keys, adversarial timestamps)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# hypothesis model-checking suites: minutes of generated examples per
# test. `slow` tier — the core tier's example coverage lives in the
# fixture-driven unit tests for the same operators.
pytestmark = pytest.mark.slow

from pyspark.sql import functions as F

from glue_job_to_write_structured_data_on_s3_full_code_spark.operators import (
    FallbackTier,
    fallback_join,
    time_range_pairs,
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

keys = st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))
facts_st = st.lists(
    st.tuples(st.integers(0, 50), keys), min_size=0, max_size=12, unique_by=lambda t: t[0]
)
dims_st = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.sampled_from(["p", "q", "r"]),
        st.integers(0, 20),
    ),
    min_size=0,
    max_size=10,
)


def _model_fallback(facts, dims):
    dims = sorted(set(dims))
    out = {}
    remaining = list(facts)
    for tier_name, pred in (("strict", lambda d: d[2] >= 10), ("loose", lambda d: True)):
        nxt = []
        for fid, k in remaining:
            cands = [d for d in dims if k is not None and d[0] == k and pred(d)]
            if cands:
                best = max(cands, key=lambda d: (d[2], d[1]))
                out[fid] = (best[1], tier_name, best[2])
            else:
                nxt.append((fid, k))
        remaining = nxt
    for fid, _k in remaining:
        out[fid] = ("DEFAULT", "default", -1)
    return out


@given(facts=facts_st, dims=dims_st)
@settings(**_SETTINGS)
def test_fallback_join_matches_model(spark, facts, dims):
    if not facts:
        return
    fact = spark.createDataFrame(facts, "fid long, k string")
    dim = spark.createDataFrame(dims, "dk string, dval string, prio long")
    tiers = [
        FallbackTier(
            condition=lambda f, d: f["k"] == d["dk"],
            dim_filter=F.col("prio") >= 10,
            name="strict",
        ),
        FallbackTier(condition=lambda f, d: f["k"] == d["dk"], name="loose"),
    ]
    got = {
        r.fid: (r.dval, r.matched_tier, r.prio)
        for r in fallback_join(
            fact,
            dim,
            tiers,
            order_cols=[F.col("prio").desc(), F.col("dval").desc()],
            defaults={
                "dk": F.lit("NA"),
                "dval": F.lit("DEFAULT"),
                "prio": F.lit(-1).cast("long"),
            },
            matched_probe="dval",
            tier_col="matched_tier",
        ).collect()
    }
    assert got == _model_fallback(facts, dims)


events_st = st.lists(
    st.tuples(
        st.integers(0, 40),  # event id
        st.sampled_from([1, 2]),  # user
        st.integers(0, 1000),  # epoch seconds
    ),
    min_size=0,
    max_size=14,
    unique_by=lambda t: t[0],
)


def _model_pairs(rows, window_sec):
    out = set()
    for i, (ia, ua, ta) in enumerate(rows):
        for ib, ub, tb in rows:
            if ua == ub and ia < ib and abs(tb - ta) <= window_sec:
                out.add((ua, ia, ib, float(tb - ta)))
    return out


@given(rows=events_st, window=st.sampled_from([1, 7, 100]))
@settings(**_SETTINGS)
def test_time_range_pairs_matches_bruteforce(spark, rows, window):
    if not rows:
        return
    df = spark.createDataFrame(rows, "event_id long, user_id long, sec long").select(
        "event_id", "user_id", F.col("sec").cast("timestamp").alias("ts")
    )
    got = {
        (r.user_id, r.id_a, r.id_b, r.dt_sec)
        for r in time_range_pairs(
            df, key="user_id", ts_col="ts", id_col="event_id", window_sec=window
        ).collect()
    }
    assert got == _model_pairs(rows, window)


texts_st = st.lists(
    st.text(alphabet="ab cd", min_size=0, max_size=24),
    min_size=0,
    max_size=10,
)


@given(texts=texts_st)
@settings(**_SETTINGS)
def test_jaccard_strategies_agree_on_generated_docs(spark, texts):
    """All three physical Jaccard strategies are the same operator: equal
    pair sets on arbitrary (including empty/whitespace/duplicate) docs."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.dedup import (
        jaccard_similar_pairs,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)) or [(0, "x")], "doc_id long, text string"
    )
    results = [
        sorted(
            map(
                tuple,
                jaccard_similar_pairs(
                    docs, "text", "doc_id", threshold=0.4, strategy=s
                ).collect(),
            )
        )
        for s in ("postings", "bitset", "arrow")
    ]
    assert results[0] == results[1] == results[2]


merge_rows_st = st.lists(
    st.tuples(st.integers(0, 8), st.sampled_from(["x", "y", "z"])),
    min_size=0,
    max_size=8,
    unique_by=lambda t: t[0],
)


@given(target=merge_rows_st, source=merge_rows_st)
@settings(**_SETTINGS)
def test_merge_upsert_matches_dict_semantics(spark, target, source):
    """merge_upsert is dict.update(): source wins on key collision, both
    sides' unique keys survive, and the result is idempotent."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.merge import (
        merge_upsert,
    )

    t = spark.createDataFrame(target or [(99, "t")], "k long, v string")
    s = spark.createDataFrame(source or [(98, "s")], "k long, v string")
    merged = merge_upsert(t, s, ["k"])
    got = {r.k: r.v for r in merged.collect()}
    model = dict(target or [(99, "t")])
    model.update(dict(source or [(98, "s")]))
    assert got == model
    again = {r.k: r.v for r in merge_upsert(merged, s, ["k"]).collect()}
    assert again == model


def test_minhash_coeffs_are_overflow_safe_and_distinct():
    """The md5 Carter-Wegman family is the correctness keystone of the
    MinHash oracle: every (a, b, c) must keep a·u + b·v + c under 2^63
    for u, v < M (no silent wrap in Spark, no overflow error in DuckDB),
    a and b must be odd and nonzero mod M, and the tuples must be
    pairwise distinct so the num_hashes family members are independent
    hash functions, not repeats."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.dedup import (
        MINHASH_MOD,
        minhash_coeffs,
    )

    coeffs = minhash_coeffs(64)
    assert len(set(coeffs)) == 64
    umax = MINHASH_MOD - 1
    for a, b, c in coeffs:
        assert 0 < a < MINHASH_MOD and a % 2 == 1
        assert 0 < b < MINHASH_MOD and b % 2 == 1
        assert 0 <= c < MINHASH_MOD
        # the engine computes (a·u) % M + (b·v) % M + c before the final
        # mod: worst-case intermediate is 2·(M-1) + (M-1) — far below
        # 2^63, and each product a·u < M² < 2^62
        assert a * umax < 2**62 and b * umax < 2**62
        assert (MINHASH_MOD - 1) * 3 < 2**63


def test_minhash_cw_family_spreads_and_is_deterministic():
    """Python replay of the engine/oracle hash family over real shingle
    strings: deterministic across calls, and the 16 family members
    disagree with each other (no accidental constant or duplicated
    function over a realistic input set)."""
    import hashlib

    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.dedup import (
        MINHASH_MOD,
        minhash_coeffs,
    )

    M = MINHASH_MOD
    shingles = [f"tok{i} tok{i+1} tok{i+2}" for i in range(200)]

    def uv(s: str) -> tuple[int, int]:
        h = hashlib.md5(s.encode()).hexdigest()
        return int(h[0:15], 16) % M, int(h[15:30], 16) % M

    coeffs = minhash_coeffs(16)
    tables = [
        [((a * u) % M + (b * v) % M + c) % M for (u, v) in map(uv, shingles)]
        for (a, b, c) in coeffs
    ]
    for t in tables:
        assert len(set(t)) > 150  # spreads: few collisions over 200 inputs
    for i in range(16):
        for j in range(i + 1, 16):
            assert tables[i] != tables[j]


texts_st = st.lists(
    st.text(alphabet="ab c1", min_size=0, max_size=24), min_size=1, max_size=6
)


@given(texts=texts_st)
@settings(**_SETTINGS)
def test_hashed_embedding_is_bag_of_words_linear(spark, texts):
    """The feature-hashing embedder (plans/rag.py) is linear in the token
    bag: emb(concat(a, b)) == emb(a) + emb(b) elementwise, and every dim
    is bounded by the token count. This is the property that lets partial
    aggregation (map-side combine) compute it distributively at 100 TB."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.rag import (
        _DIM,
        _embed,
    )
    from glue_job_to_write_structured_data_on_s3_full_code_spark.functions.text import (
        normalized_text,
        tokens,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    rows.append((len(texts), " ".join(texts)))  # the concatenated bag
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tok = df.where(normalized_text("text") != "").select(
        "doc_id", F.explode(tokens(normalized_text("text"))).alias("tok")
    )
    out = {r["doc_id"]: (r["emb"], r["nrm"]) for r in _embed(tok, "doc_id").collect()}
    if len(texts) not in out:
        return  # everything normalized to empty
    whole, _ = out[len(texts)]
    parts = [out[i][0] for i in range(len(texts)) if i in out]
    for j in range(_DIM):
        assert whole[j] == sum(p[j] for p in parts)
    n_toks = sum(
        len(t.split()) for t in (normalize_py(x) for x in texts) if t
    )
    assert all(abs(whole[j]) <= n_toks for j in range(_DIM))


def normalize_py(s: str) -> str:
    import re

    return re.sub(r"[^a-z0-9]+", " ", s.lower()).strip()


counts_st = st.lists(
    st.tuples(st.sampled_from(["s0", "s1", "s2", "s3", "s4"]), st.integers(1, 500)),
    min_size=1,
    max_size=5,
    unique_by=lambda t: t[0],
)


def _model_largest_remainder(counts: dict[str, int], total: int) -> dict[str, int]:
    n_total = sum(counts.values())
    base = {s: (total * n) // n_total for s, n in counts.items()}
    rem = {s: total * n - base[s] * n_total for s, n in counts.items()}
    leftover = total - sum(base.values())
    for s in sorted(counts, key=lambda s: (-rem[s], s))[:leftover]:
        base[s] += 1
    return base


@given(counts=counts_st, total=st.integers(1, 200))
@settings(**_SETTINGS)
def test_largest_remainder_quotas_match_model(spark, counts, total):
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.llm_ops6 import (
        largest_remainder_quotas,
    )

    df = spark.createDataFrame(counts, "source string, n_s long")
    got = {r.source: r.quota for r in largest_remainder_quotas(df, total).collect()}
    want = _model_largest_remainder(dict(counts), total)
    assert got == want
    assert sum(got.values()) == total


def test_tokens_trim_all_whitespace(spark):
    """F.trim strips only ASCII spaces: raw text ending in a newline
    (almost all real text) previously split into a spurious trailing ''
    token, over-counting tokens in every packing/budget computation."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.functions import (
        token_count,
        tokens,
    )

    df = spark.createDataFrame(
        [("line1\nline2\n",), ("\t",), ("  a b  ",), ("",)], "text string"
    )
    got = df.select(
        token_count("text").alias("n"), tokens("text").alias("t")
    ).collect()
    assert [r.n for r in got] == [2, 0, 2, 0]
    assert got[1].t == [] and got[0].t == ["line1", "line2"]


asof_left_st = st.lists(
    st.tuples(
        st.integers(0, 40),  # left id
        st.sampled_from([1, 2]),  # key
        st.integers(0, 100),  # left ts (epoch sec)
    ),
    min_size=0,
    max_size=12,
    unique_by=lambda t: t[0],
)
asof_right_st = st.lists(
    st.tuples(
        st.sampled_from([1, 2]),  # key
        st.integers(0, 100),  # right ts — duplicates allowed (tie on ts)
        st.integers(0, 9),  # tie column
        st.integers(0, 999),  # value
    ),
    min_size=0,
    max_size=12,
    unique_by=lambda t: (t[0], t[1], t[2]),  # tie col unique per (key, ts)
)


def _model_asof(lefts, rights):
    out = {}
    for lid, k, lt in lefts:
        cands = [r for r in rights if r[0] == k and r[1] <= lt]
        if cands:
            best = max(cands, key=lambda r: (r[1], r[2]))  # latest ts, then tie
            out[lid] = best[3]
        else:
            out[lid] = None
    return out


@given(lefts=asof_left_st, rights=asof_right_st)
@settings(**_SETTINGS)
def test_asof_join_matches_bruteforce(spark, lefts, rights):
    """asof_join (union-merge construction) against the quadratic model:
    for every left row, the value of the right row with the greatest
    ts <= left ts, ties on ts broken by the greatest tie col; no prior
    right row -> NULL. Exercises equal-timestamp left/right rows (the
    at-or-BEFORE inclusivity), duplicate right timestamps, and keys with
    an empty right side — shapes the fixtures never produce."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.temporal import (
        asof_join,
    )

    if not lefts:
        return
    left = spark.createDataFrame(
        lefts, "lid long, user long, lsec long"
    ).select("lid", "user", F.col("lsec").cast("timestamp").alias("lts"))
    right = spark.createDataFrame(
        rights or [(0, -1, 0, 0)],  # sentinel: never matches (ts -1 < all)
        "user long, rsec long, tie long, val long",
    ).select(
        "user",
        F.col("rsec").cast("timestamp").alias("rts"),
        "tie",
        "val",
    )
    if not rights:
        right = right.where(F.lit(False))
    got = {
        r.lid: r.asof_val
        for r in asof_join(
            left,
            right,
            key="user",
            left_ts="lts",
            right_ts="rts",
            value_cols=["val"],
            tie_col="tie",
        ).collect()
    }
    assert got == _model_asof(lefts, rights)


@given(
    pw=st.text(
        alphabet="ABCFabcf019%/@!:+ ", min_size=3, max_size=14
    ).map(lambda s: "Q" + s)
)
@settings(max_examples=60, deadline=None)
def test_jdbc_redaction_scrubs_every_echo_form(pw):
    """Model check of the error-report credential scrub: for ANY
    password, every form a driver might echo — verbatim, URL-encoded
    (either hex case), plus-encoded, and the RFC-3986-normalized
    variant where %xx pairs inside the RAW password flip hex case —
    must be absent from the report. The 'Q' prefix keeps generated
    passwords from being substrings of the replacement marker. No
    SparkSession needed: the injected reader raises before any Spark
    work."""
    import re
    from urllib.parse import quote, quote_plus

    from glue_job_to_write_structured_data_on_s3_full_code_spark.sources.jdbc import (
        replicate_tables,
    )

    def hex_case(s: str, fn) -> str:
        # normalizers only touch the hex INSIDE %xx pairs, never the
        # password's ordinary letters
        return re.sub(r"%([0-9A-Fa-f]{2})", lambda m: "%" + fn(m.group(1)), s)

    enc = quote(pw, safe="")
    forms = {
        pw,
        enc,
        quote_plus(pw),
        hex_case(pw, str.swapcase),
        hex_case(enc, str.lower),
        hex_case(enc, str.upper),
        hex_case(quote_plus(pw), str.lower),
    }

    def echoing_reader(spark, dbtable, **kwargs):
        raise RuntimeError("connect failed: " + " | ".join(sorted(forms)))

    report = replicate_tables(
        None,
        [{"table": "t", "user": "svc", "password": pw}],
        dest_root="/nonexistent-never-written",
        snapshot_dt="20231122",
        reader=echoing_reader,
    )
    err = report[0]["error"]
    assert "***redacted***" in err
    for form in forms:
        assert form not in err, (pw, form, err)


# short alphabet + tight lengths force heavy length-band collisions,
# equal-length duplicates, and names exactly at the ±2 band edge
_names_st = st.lists(
    st.text(alphabet="abcx", min_size=0, max_size=6), min_size=1, max_size=24
)


@given(names=_names_st)
@settings(**_SETTINGS)
def test_length_banded_pairs_model(spark, names):
    """Property: length_banded_levenshtein_pairs over ANY vocabulary
    equals the brute-force model {unordered distinct pairs with
    levenshtein ≤ 2} — the recall contract behind
    entity_resolution_pipeline's vocabulary dial, checked on generated
    shapes (empty strings, duplicates, all-same-length clusters) the
    fixtures never produce."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.linkage import (
        length_banded_levenshtein_pairs,
    )

    distinct = sorted(set(names))
    df = spark.createDataFrame([(n,) for n in distinct], "nm string")
    got = {
        (r.name_a, r.name_b, r.lev_dist)
        for r in length_banded_levenshtein_pairs(df, "nm", 2).collect()
    }

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    want = {
        (a, b, lev(a, b))
        for i, a in enumerate(distinct)
        for b in distinct[i + 1 :]
        if lev(a, b) <= 2
    }
    assert got == want


# --- PNG round-trip: decode(encode(pixels)) == pixels on generated images ---

png_dims_st = st.tuples(st.integers(1, 12), st.integers(1, 12))


@given(
    dims=png_dims_st,
    color=st.sampled_from([(0, 1), (4, 2), (2, 3), (6, 4)]),
    seed=st.integers(0, 2**31 - 1),
    data=st.data(),
)
@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_png_roundtrip_matches_pixels(dims, color, seed, data):
    """The native PNG decoder is the exact inverse of the per-row-filter
    encoder on ARBITRARY images: any size, any supported color type, any
    per-row filter assignment — catches filter/edge shapes (1-pixel rows,
    bpp > width interactions, Paeth tie-breaks) the deterministic
    round-trip tests never draw."""
    import numpy as np

    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.multimodal import (
        decode_media,
    )
    from tests.test_sources_streaming import _make_png

    (h, w), (color_type, c) = dims, color
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    filters = data.draw(
        st.lists(st.integers(0, 4), min_size=h, max_size=h), label="filters"
    )
    out = decode_media(_make_png(pixels, color_type, filters))
    assert (out["height"], out["width"], out["n_channels"]) == (h, w, c)
    assert np.array_equal(out["pixels"], pixels)


@given(
    dims=png_dims_st,
    combo=st.sampled_from(
        # every legal (bit_depth, color_type) pair — spec §11.2.2
        [(d, 0) for d in (1, 2, 4, 8, 16)]
        + [(d, 3) for d in (1, 2, 4, 8)]
        + [(8, 2), (8, 4), (8, 6), (16, 2), (16, 4), (16, 6)]
    ),
    interlace=st.sampled_from([0, 1]),
    with_trns=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
    data=st.data(),
)
@settings(max_examples=100, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_png_full_ihdr_space_roundtrip(dims, combo, interlace, with_trns, seed, data):
    """EVERY legal IHDR combination round-trips: all 15 depth/type pairs
    × interlace × (palette: optional tRNS) × arbitrary per-row filters.
    The expected pixels are computed independently of the decoder (the
    test applies the left-bit-replication scaling and PLTE/tRNS lookup
    itself), so a decoder bug can't cancel out."""
    import numpy as np

    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.multimodal import (
        decode_media,
    )
    from tests.test_sources_streaming import _make_png

    (h, w), (depth, ctype) = dims, combo
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    rng = np.random.default_rng(seed)
    filters = data.draw(
        st.lists(st.integers(0, 4), min_size=1, max_size=5), label="filters"
    )
    plte = trns_b = None
    if depth == 16:
        pixels = rng.integers(0, 1 << 16, size=(h, w, nch), dtype=np.uint16)
        want = pixels
    elif ctype == 3:
        n_pal = 1 << depth
        pal = rng.integers(0, 256, size=(n_pal, 3), dtype=np.uint8)
        pixels = rng.integers(0, n_pal, size=(h, w, 1), dtype=np.uint8)
        plte = pal.tobytes()
        table = pal
        if with_trns:
            n_trns = int(rng.integers(1, n_pal + 1))
            trns = rng.integers(0, 256, size=n_trns, dtype=np.uint8)
            trns_b = trns.tobytes()
            alpha = np.full(n_pal, 255, np.uint8)
            alpha[:n_trns] = trns
            table = np.concatenate([pal, alpha[:, None]], axis=1)
        want = table[pixels[..., 0]]
    else:
        hi = 1 << depth
        pixels = rng.integers(0, hi, size=(h, w, nch), dtype=np.uint8)
        want = pixels if depth == 8 else pixels * (255 // (hi - 1))
    out = decode_media(
        _make_png(
            pixels, ctype, filters, bit_depth=depth, interlace=interlace,
            plte=plte, trns=trns_b,
        )
    )
    assert out["bit_depth"] == (16 if depth == 16 else 8)
    assert (out["height"], out["width"]) == (h, w)
    assert np.array_equal(out["pixels"], want)


def test_png_encoder_inverse_pins_the_operator_encoder():
    """encode_png_grey (the PRODUCT encoder image_pixel_stats rides) and
    the test-local encoder agree byte-for-byte on the grey cycling-filter
    shape — so the property test above covers the operator's encode path
    too, not just the test helper's."""
    import numpy as np

    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.multimodal import (
        encode_png_grey,
    )
    from tests.test_sources_streaming import _make_png

    rng = np.random.default_rng(41)
    raw = rng.integers(0, 256, size=200, dtype=np.uint8).tobytes()
    n = 16 * 16
    padded = np.frombuffer(raw[:n].ljust(n, b"\0"), dtype=np.uint8)
    pixels = padded.reshape(16, 16, 1)
    assert encode_png_grey(raw, 16, 16) == _make_png(
        pixels, 0, [0, 1, 2, 3, 4]
    )
