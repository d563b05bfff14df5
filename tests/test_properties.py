"""Property-based tests (hypothesis): randomized inputs, pure-Python
reference models. These catch the edge cases hand-picked fixtures
miss — ts collisions, empty groups, all-one-type streams, window
boundaries landing exactly on an event.

Example counts are kept small (each example is a Spark job); the
generators bias toward collisions (tiny key/time domains) so the
interesting cases appear within few examples.
"""

from __future__ import annotations

import os
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

EV_DDL = "event_id long, ts long, user_id long, event_type string, value double"

# tiny domains → dense collisions in user, time, and type
events_strategy = st.lists(
    st.tuples(
        st.integers(0, 3),                 # user_id
        st.integers(0, 20),                # ts (small → ties guaranteed)
        st.sampled_from(["click", "purchase", "view"]),
    ),
    min_size=0,
    max_size=25,
)

# PROP_EXAMPLES=100 runs a deep sweep (each example is a Spark job,
# so CI keeps the default small)
_settings = settings(
    max_examples=int(os.environ.get("PROP_EXAMPLES", "12")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _rows(raw):
    # unique, deterministic event ids; value derived from the id
    return [
        (eid, ts, user, etype, float(eid) / 4.0)
        for eid, (user, ts, etype) in enumerate(raw)
    ]


@pytest.fixture(scope="module")
def sparkm(spark):
    return spark


class TestAsofProperty:
    @_settings
    @given(raw=events_strategy)
    def test_matches_reference_model(self, sparkm, raw):
        from vector_indexer_spark.streaming.events import asof_join_prior

        rows = _rows(raw)
        df = sparkm.createDataFrame(
            [(e, t, u, y, v) for (e, t, u, y, v) in rows], EV_DDL
        ) if rows else sparkm.createDataFrame([], EV_DDL)
        got = {
            r.event_id: (r.prior_event_id, r.gap_ns)
            for r in asof_join_prior(
                df, left_type="purchase", right_type="click"
            ).collect()
        }
        # reference: per user, walk (ts, id)-sorted rows carrying the
        # latest click
        want = {}
        by_user: dict = {}
        for eid, ts, user, etype, _v in sorted(
            rows, key=lambda r: (r[2], r[1], r[0])
        ):
            carried = by_user.get(user)
            if etype == "purchase":
                want[eid] = (
                    (carried[0], ts - carried[1])
                    if carried
                    else (None, None)
                )
            if etype == "click":
                by_user[user] = (eid, ts)
        assert got == want


class TestIntervalJoinProperty:
    @_settings
    @given(raw=events_strategy, window=st.integers(1, 10))
    def test_matches_nested_loop_reference(self, sparkm, raw, window):
        from vector_indexer_spark.streaming.events import interval_join

        rows = _rows(raw)
        df = sparkm.createDataFrame(
            [(e, t, u, y, v) for (e, t, u, y, v) in rows], EV_DDL
        ) if rows else sparkm.createDataFrame([], EV_DDL)
        clicks = df.filter(F.col("event_type") == "click")
        buys = df.filter(F.col("event_type") == "purchase")
        got = {
            (r.left_id, r.right_id)
            for r in interval_join(clicks, buys, window_ns=window).collect()
        }
        want = {
            (lc[0], rb[0])
            for lc in rows
            if lc[3] == "click"
            for rb in rows
            if rb[3] == "purchase"
            and rb[2] == lc[2]
            and lc[1] < rb[1] <= lc[1] + window
        }
        assert got == want


class TestSaltedCountsProperty:
    @_settings
    @given(
        keys=st.lists(st.sampled_from("abc"), min_size=0, max_size=30),
        n_salts=st.integers(1, 8),
    )
    def test_matches_counter(self, sparkm, keys, n_salts):
        from vector_indexer_spark.operators.skew import salted_counts

        rows = [(i, k) for i, k in enumerate(keys)]
        df = sparkm.createDataFrame(
            rows, "row_id long, k string"
        ) if rows else sparkm.createDataFrame([], "row_id long, k string")
        got = {
            r.key: r.n_rows
            for r in salted_counts(
                df, "k", n_salts=n_salts, salt_source_col="row_id"
            ).collect()
        }
        assert got == dict(Counter(keys))


class TestCapPerGroupProperty:
    @_settings
    @given(
        rows=st.lists(
            st.tuples(st.sampled_from("xy"), st.integers(0, 5)),
            min_size=0,
            max_size=20,
        ),
        cap=st.integers(1, 4),
    )
    def test_matches_sorted_truncation(self, sparkm, rows, cap):
        from vector_indexer_spark.operators.splits import cap_per_group

        data = [(i, src, n) for i, (src, n) in enumerate(rows)]
        df = sparkm.createDataFrame(
            data, "doc_id long, source string, n_chars long"
        ) if data else sparkm.createDataFrame(
            [], "doc_id long, source string, n_chars long"
        )
        got = {
            (r.source, r.doc_id): r.group_rank
            for r in cap_per_group(df, cap, by_col="source").collect()
        }
        want = {}
        by_src: dict = {}
        for i, src, n in data:
            by_src.setdefault(src, []).append((-n, i))
        for src, members in by_src.items():
            for rank, (_negn, i) in enumerate(sorted(members)[:cap], 1):
                want[(src, i)] = rank
        assert got == want


class TestMediaCodecProperties:
    """Pure-local codec properties (no Spark job per example, so these
    can afford many examples): encode∘decode identity over arbitrary
    shapes/channels, and resample bounds."""

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 24),
        c=st.integers(1, 4),
        seed=st.integers(0, 2**31),
    )
    def test_png_roundtrip(self, w, h, c, seed):
        import numpy as np

        from vector_indexer_spark.operators.multimodal import (
            decode_png,
            encode_png,
        )

        x = np.random.default_rng(seed).integers(
            0, 256, (h, w, c), dtype=np.uint8
        )
        assert (decode_png(encode_png(x)) == x).all()

    @settings(max_examples=60, deadline=None)
    @given(
        n=st.integers(1, 200),
        ch=st.integers(1, 2),
        rate=st.sampled_from([8000, 16000, 44100]),
        seed=st.integers(0, 2**31),
    )
    def test_wav_roundtrip(self, n, ch, rate, seed):
        import numpy as np

        from vector_indexer_spark.operators.multimodal import (
            decode_wav,
            encode_wav,
        )

        x = (
            np.random.default_rng(seed)
            .integers(-32768, 32768, (n, ch))
            .astype(np.int16)
        )
        s, r = decode_wav(encode_wav(x, rate))
        assert r == rate and (s == x).all()

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 16),
        h=st.integers(1, 16),
        tw=st.integers(1, 16),
        th=st.integers(1, 16),
        method=st.sampled_from(["nearest", "bilinear"]),
        seed=st.integers(0, 2**31),
    )
    def test_resize_shape_and_range(self, w, h, tw, th, method, seed):
        import numpy as np

        from vector_indexer_spark.operators.multimodal import resize_array

        x = np.random.default_rng(seed).integers(
            0, 256, (h, w, 3), dtype=np.uint8
        )
        r = resize_array(x, tw, th, method=method)
        assert r.shape == (th, tw, 3)
        # resample output stays inside the input's value envelope
        assert r.min() >= x.min() and r.max() <= x.max()

    @settings(max_examples=30, deadline=None)
    @given(
        nf=st.integers(0, 6),
        usec=st.integers(1000, 100000),
        seed=st.integers(0, 2**31),
    )
    def test_avi_roundtrip(self, nf, usec, seed):
        import numpy as np

        from vector_indexer_spark.operators.multimodal import (
            encode_avi,
            parse_avi,
        )

        rng = np.random.default_rng(seed)
        frames = [
            bytes(rng.integers(0, 256, rng.integers(0, 40)).astype(np.uint8))
            for _ in range(nf)
        ]
        m = parse_avi(encode_avi(frames, usec, 3, 2))
        assert m["frames"] == frames
        assert m["n_frames"] == nf
        assert m["duration_ms"] == nf * usec // 1000


class TestBpeProperties:
    """Tokenizer induction properties — local (no Spark job per
    example): detokenization is exact for ANY corpus and merge count,
    and token counts never exceed character counts."""

    @settings(max_examples=50, deadline=None)
    @given(
        words=st.lists(
            st.text(
                alphabet=st.characters(
                    whitelist_categories=("Ll", "Lu", "Nd")
                ),
                min_size=1,
                max_size=8,
            ),
            min_size=0,
            max_size=30,
        ),
        n_merges=st.integers(1, 50),
    )
    def test_roundtrip_and_compression_bound(self, words, n_merges):
        from collections import Counter

        from vector_indexer_spark.operators.bpe import (
            bpe_decode_tokens,
            bpe_encode_word,
            bpe_train_local,
        )

        merges = bpe_train_local(Counter(words), n_merges)
        ranks = {tuple(p): i for i, p in enumerate(merges)}
        text = " ".join(words)
        toks = []
        for w in words:
            enc = bpe_encode_word(w, ranks)
            assert 1 <= len(enc) <= len(w)  # never longer than chars
            toks.extend(enc)
        assert bpe_decode_tokens(toks) == text.rstrip()


class TestSketchProperties:
    """The md5-derived sketch expressions vs pure-Python hashlib
    references — any value, any p, bit-for-bit."""

    @given(
        vals=st.lists(
            st.one_of(st.integers(-(2**40), 2**40), st.text(max_size=20)),
            min_size=1,
            max_size=30,
        ),
        p=st.integers(4, 16),
    )
    @_settings
    def test_hll_registers_match_hashlib_reference(self, spark, vals, p):
        import hashlib

        from vector_indexer_spark.operators.sketches import hll_registers

        df = spark.createDataFrame(
            [(str(v),) for v in vals], "v string"
        )
        got = {
            (r["register"], r["max_rho"])
            for r in hll_registers(df, "v", p=p).collect()
        }
        want = {}
        for v in vals:
            h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
            rest_bits = 60 - p
            reg, rest = h >> rest_bits, h & ((1 << rest_bits) - 1)
            rho = (
                rest_bits + 1
                if rest == 0
                else rest_bits - rest.bit_length() + 1
            )
            want[reg] = max(want.get(reg, 0), rho)
        assert got == set(want.items())

    @given(
        vals=st.lists(st.integers(0, 10**6), min_size=1, max_size=40),
        width=st.sampled_from([16, 64, 256]),
    )
    @_settings
    def test_cms_counts_match_hashlib_reference(self, spark, vals, width):
        import hashlib
        from collections import Counter

        from vector_indexer_spark.operators.sketches import cms_table

        df = spark.createDataFrame([(v,) for v in vals], "v long")
        got = {
            (r["d"], r["bucket"]): r["cnt"]
            for r in cms_table(df, "v", depth=2, width=width).collect()
        }
        want = Counter()
        for v in vals:
            for d in range(2):
                b = (
                    int(
                        hashlib.md5(f"{d}:{v}".encode()).hexdigest()[:15],
                        16,
                    )
                    % width
                )
                want[(d, b)] += 1
        assert got == dict(want)


class TestMortonProperties:
    @given(
        pts=st.lists(
            st.tuples(st.integers(0, 2**14 - 1), st.integers(0, 2**14 - 1)),
            min_size=1,
            max_size=30,
        )
    )
    @_settings
    def test_zorder_key_bijective_and_orderable(self, spark, pts):
        from vector_indexer_spark.operators.layout import zorder_key_expr

        df = spark.createDataFrame(list(set(pts)), "x long, y long")
        rows = df.select(
            "x", "y", zorder_key_expr(["x", "y"], bits=14).alias("z")
        ).collect()
        # bijective: distinct points → distinct keys; decodable back
        zs = [r["z"] for r in rows]
        assert len(set(zs)) == len(rows)
        for r in rows:
            x = sum(
                ((r["z"] >> (2 * b)) & 1) << b for b in range(14)
            )
            y = sum(
                ((r["z"] >> (2 * b + 1)) & 1) << b for b in range(14)
            )
            assert (x, y) == (r["x"], r["y"])


class TestTokenBudgetProperty:
    @_settings
    @given(
        rows=st.lists(
            st.tuples(st.integers(1, 20), st.integers(0, 5)),
            min_size=0, max_size=30,
        ),
        budget=st.integers(0, 120),
    )
    def test_matches_greedy_reference(self, sparkm, rows, budget):
        from vector_indexer_spark.operators.splits import (
            select_token_budget,
        )

        data = [
            (i, ntok, q / 5.0) for i, (ntok, q) in enumerate(rows)
        ]
        if not data:
            return
        df = sparkm.createDataFrame(
            data, "doc_id long, n_tokens long, quality double"
        )
        expected, cum = set(), 0
        for did, ntok, q in sorted(data, key=lambda r: (-r[2], r[0])):
            if cum + ntok > budget:
                break
            cum += ntok
            expected.add(did)
        got = {
            r.doc_id
            for r in select_token_budget(df, budget, bins=7).collect()
        }
        # tiny bins force multi-doc tie bins — the cut-bin window path
        assert got == expected


class TestContainmentProperty:
    @_settings
    @given(
        a=st.lists(st.integers(0, 6), min_size=3, max_size=12),
        b=st.lists(st.integers(0, 6), min_size=3, max_size=12),
    )
    def test_bounds_and_symmetry(self, sparkm, a, b):
        from vector_indexer_spark.operators.dedup import containment_pairs

        ta = " ".join(f"w{x}" for x in a)
        tb = " ".join(f"w{x}" for x in b)
        df = sparkm.createDataFrame(
            [(0, ta), (1, tb)], "doc_id long, text string"
        )
        pairs = sparkm.createDataFrame([(0, 1)], "id_a long, id_b long")
        r = containment_pairs(df, pairs).collect()[0]
        for v in (r.containment_a, r.containment_b, r.jaccard):
            assert -1e-12 <= v <= 1.0 + 1e-12
        # jaccard <= min(containments); identical docs -> all 1.0
        assert r.jaccard <= min(r.containment_a, r.containment_b) + 1e-12
        if ta == tb:
            assert r.jaccard == r.containment_a == r.containment_b == 1.0


class TestPagerankProperty:
    @_settings
    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 5), st.integers(0, 5)),
            min_size=1, max_size=15,
        ),
        iters=st.integers(0, 3),
    )
    def test_matches_reference_recurrence(self, sparkm, edges, iters):
        from collections import defaultdict

        from vector_indexer_spark.operators.graph import pagerank

        df = sparkm.createDataFrame(
            list(set(edges)), "src long, dst long"
        )
        got = {
            r.node: r.rank_micros
            for r in pagerank(df, iterations=iters).collect()
        }
        es = sorted(set(edges))
        nodes = sorted({s for s, _ in es} | {d for _, d in es})
        deg = Counter(s for s, _ in es)
        r = {n: 1_000_000 for n in nodes}
        for _ in range(iters):
            cin = defaultdict(int)
            for s, d in es:
                cin[d] += r[s] // deg[s]
            r = {n: 150_000 + (85 * cin[n]) // 100 for n in nodes}
        assert got == r
