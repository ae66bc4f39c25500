"""Independent-implementation cross-checks for the verbatim-oracle family
(r5 verdict #2): the DuckDB twins for CDC chunking, count-min cells, HLL
registers, and A-Res sampling are the operator transcribed into SQL, so a
shared semantic flaw passes the gate (exactly how the r5 BPE boundary bug
hid).  Each test here re-implements the operator in plain Python — second
implementation, same published algorithm — and requires the distributed
result to match it exactly on a corpus rich enough to exercise the edge
cases (skewed frequencies, merges, chunk boundaries, tied keys)."""

from __future__ import annotations

import hashlib
import math
import random

from ago_sisdb_spark.operators import dedup, prep, sketch


def py_hash60(s: str) -> int:
    """Plain-Python portable_hash60: first 15 md5 hex chars, base 16."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_portable_hash60_matches_python(spark):
    vals = ["", "a", "hello world", "héllo", "x" * 100, "tab\there"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    from pyspark.sql import functions as F

    got = {
        r.s: r.h
        for r in df.select("s", dedup.portable_hash60(F.col("s")).alias("h")).collect()
    }
    assert got == {v: py_hash60(v) for v in vals}


def test_cms_vs_reference_impl(spark):
    """Build + merge + estimate vs a naive dict sketch on a skewed term
    stream.  Cells must match EXACTLY (same hash family, same cell
    layout); estimates must match the dict sketch and never undercount."""
    depth, width = 4, 64  # narrow width to force collisions
    rnd = random.Random(5)
    terms_a = [f"t{int(rnd.expovariate(0.05))}" for _ in range(2000)]
    terms_b = [f"t{int(rnd.expovariate(0.08))}" for _ in range(1500)]

    def py_cells(stream):
        cells = {}
        for t in stream:
            for r in range(depth):
                pos = py_hash60(f"{t}#{r}") % width
                cells[(r, pos)] = cells.get((r, pos), 0) + 1
        return cells

    df_a = spark.createDataFrame([(t,) for t in terms_a], "term string")
    df_b = spark.createDataFrame([(t,) for t in terms_b], "term string")
    sk_a = sketch.cms_build(df_a, "term", depth, width)
    sk_b = sketch.cms_build(df_b, "term", depth, width)
    got_a = {(r.row, r.bucket): r.cnt for r in sk_a.collect()}
    assert got_a == py_cells(terms_a)

    merged = sketch.cms_merge(sk_a, sk_b)
    got_m = {(r.row, r.bucket): r.cnt for r in merged.collect()}
    want_m = py_cells(terms_a)
    for k, v in py_cells(terms_b).items():
        want_m[k] = want_m.get(k, 0) + v
    assert got_m == want_m

    probes = sorted(set(terms_a[:50])) + ["never-seen-term"]
    pdf = spark.createDataFrame([(t,) for t in probes], "term string")
    est = {
        r.term: r.est
        for r in sketch.cms_estimate(merged, pdf, "term", depth, width).collect()
    }
    true = {t: (terms_a + terms_b).count(t) for t in probes}
    for t in probes:
        want = min(
            want_m.get((r, py_hash60(f"{t}#{r}") % width), 0) for r in range(depth)
        )
        assert est[t] == want
        assert est[t] >= true[t]  # one-sided error


def test_hll_vs_reference_impl(spark):
    """Register cells, merge, and the bias-corrected estimate vs a naive
    Python HLL with the same p and hash."""
    p, wbits = sketch.HLL_P, 60 - sketch.HLL_P
    m = 1 << p
    rnd = random.Random(9)
    vals_a = [str(rnd.randrange(10_000)) for _ in range(5000)]
    vals_b = [str(rnd.randrange(10_000, 12_000)) for _ in range(3000)]

    def py_regs(stream):
        regs = {}
        for v in stream:
            h = py_hash60(v)
            bucket = h >> wbits
            w = h % (1 << wbits)
            rho = (wbits + 1) if w == 0 else (wbits + 1 - w.bit_length())
            regs[bucket] = max(regs.get(bucket, 0), rho)
        return regs

    df_a = spark.createDataFrame([(v,) for v in vals_a], "v string")
    df_b = spark.createDataFrame([(v,) for v in vals_b], "v string")
    cells_a = sketch.hll_cells(df_a, "v")
    got_a = {r.bucket: r.max_rho for r in cells_a.collect()}
    assert got_a == py_regs(vals_a)

    merged = sketch.hll_merge(cells_a, sketch.hll_cells(df_b, "v"))
    regs = py_regs(vals_a + vals_b)
    got_m = {r.bucket: r.max_rho for r in merged.collect()}
    assert got_m == regs

    est_row = sketch.hll_estimate(merged).collect()[0]
    alpha = 0.7213 / (1.0 + 1.079 / m)
    z = sum(2.0 ** -r for r in regs.values()) + (m - len(regs))
    raw = alpha * m * m / z
    v0 = m - len(regs)
    want = m * math.log(m / v0) if (raw <= 2.5 * m and v0 > 0) else raw
    assert est_row.n_set == len(regs)
    assert est_row.register_sum == sum(regs.values())
    assert abs(est_row.est_distinct - round(want, 2)) < 1e-9
    true_card = len(set(vals_a + vals_b))
    assert abs(est_row.est_distinct - true_card) / true_card < 0.1


def test_cdc_vs_reference_impl(spark):
    """Chunk boundaries and chunk text vs a naive per-position Python
    rolling-hash chunker, on texts with repeats, short docs, and an
    insertion that must shift boundaries only locally."""
    w, d = 8, 64

    def py_chunks(text):
        t = text.strip(" ").lower()
        n = len(t)
        if n == 0:
            return []
        ends = set()
        for i in range(w, n + 1):
            h = sum(ord(t[i - 1 - j]) * 31**j for j in range(w))
            if h % d == 0:
                ends.add(i)
        ends.add(n)
        out, prev = [], 0
        for e in sorted(ends):
            out.append(t[prev:e])
            prev = e
        return out

    rnd = random.Random(17)
    base = "".join(rnd.choice("abcdefgh ") for _ in range(400))
    texts = [
        base,
        base[:200] + "INSERTED" + base[200:],  # boundaries shift locally only
        "short",
        "",
        "x" * (w - 1),  # below window: single chunk
        "  padded text with leading spaces  ",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = dedup.cdc_chunk_docs(df, "doc_id", "text", w, d).collect()
    got = {}
    for r in rows:
        got.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk, r.chunk_len))
    for i, t in enumerate(texts):
        want = py_chunks(t)
        have = [c for _, c, _ in sorted(got.get(i, []))]
        assert have == want, f"doc {i}"
        if want:
            assert "".join(have) == t.strip(" ").lower()
            assert [ln for _, _, ln in sorted(got[i])] == [len(c) for c in want]


def test_ares_vs_reference_impl(spark):
    """Top-k weighted sample per group vs naive Python A-Res with the
    identical deterministic uniform source."""
    k = 4
    rnd = random.Random(23)
    rows = [
        (i, f"g{i % 5}", float(rnd.choice([0.5, 1.0, 2.0, 5.0])))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, grp string, w double")
    got = {}
    for r in prep.weighted_sample_per_group(df, "id", "grp", "w", k).collect():
        got.setdefault(r.grp, []).append((r.rank, r.id, r.skey))

    want = {}
    for i, g, w in rows:
        if w <= 0:
            continue
        u = ((i % 1000003) * 2654435761 % 1000003 + 1) / 1000004.0
        want.setdefault(g, []).append((math.log(u) / w, i))
    for g, scored in want.items():
        scored.sort(key=lambda t: (-t[0], t[1]))
        top = [
            (rank + 1, i, round(s, 6)) for rank, (s, i) in enumerate(scored[:k])
        ]
        assert sorted(got[g]) == top, g


def _py_perm_params(num_hashes, seed=7):
    import random

    rnd = random.Random(seed)
    p = (1 << 31) - 1
    return [(rnd.randrange(1, p), rnd.randrange(0, p)) for _ in range(num_hashes)]


def test_minhash_band_rows_vs_reference_impl(spark):
    """Portable MinHash band rows (shingle → hash → affine mins → band
    polynomial fold) vs a naive Python implementation — the layer every
    LSH near-dup entry (d3/d12/pipe_full_prep) sits on.  Exercises short
    docs (truncated shingle), repeated shingles (multiset min == set min),
    and multi-space/tab inputs NOT covered (both engines split \\s+)."""
    k, num_hashes, bands = 3, 16, 4
    rows_per = num_hashes // bands
    p = (1 << 31) - 1
    perms = _py_perm_params(num_hashes)

    def py_bands(text):
        import re

        words = re.split(r"\s+", text)
        if len(words) >= k:
            shingles = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
        else:
            shingles = [" ".join(words)]
        hs = [py_hash60(s) % p for s in shingles]
        mins = [min((a * h + b) % p for h in hs) for a, b in perms]
        out = {}
        for band in range(bands):
            acc = band
            for j in range(rows_per):
                acc = (acc * 31 + mins[band * rows_per + j]) % p
            out[band] = acc
        return out

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "short doc",
        "one",
        "tab\tseparated  and double  spaced words here",
        "repeat repeat repeat repeat repeat repeat",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {}
    for r in dedup.minhash_band_rows(
        df, "doc_id", "text", k, num_hashes, bands, portable=True
    ).collect():
        got.setdefault(r.doc, {})[r.band] = r.bucket
    for i, t in enumerate(texts):
        assert got[i] == py_bands(t), f"doc {i}"


def test_simhash_vs_reference_impl(spark):
    """Portable 60-bit SimHash fingerprints vs naive Python voting."""

    def py_simhash(text):
        import re

        votes = [0] * 60
        for tok in re.split(r"\s+", text):
            h = py_hash60(tok)
            for i in range(60):
                votes[i] += 1 if (h >> i) & 1 else -1
        fp = 0
        for i in range(60):
            if votes[i] > 0:
                fp |= 1 << i
        return fp

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "a b c d e f g",
        "single",
        "dup dup dup dup",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc: r.simhash
        for r in dedup.simhash64(df, "doc_id", "text", portable=True).collect()
    }
    assert got == {i: py_simhash(t) for i, t in enumerate(texts)}


def test_dsir_vs_reference_impl(spark):
    """DSIR importance scores vs a naive Python implementation: hashed
    unigram+bigram features, add-alpha smoothed bucket log-ratios, per-doc
    sums — on corpora with overlapping and disjoint vocabularies."""
    import re

    n_buckets, alpha = 64, 1.0  # narrow buckets force collisions
    rnd = random.Random(41)
    vocab = [f"w{i}" for i in range(30)]
    raw_rows = [
        (i, " ".join(rnd.choices(vocab, k=rnd.randint(1, 12))))
        for i in range(60)
    ]
    tgt_rows = [
        (100 + i, " ".join(rnd.choices(vocab[:10], k=rnd.randint(2, 8))))
        for i in range(25)
    ]

    def feats(text):
        words = [w for w in re.split(r"\s+", text.strip().lower()) if w]
        grams = words + [f"{a} {b}" for a, b in zip(words, words[1:])]
        return [py_hash60(f"f#{g}") % n_buckets for g in grams]

    tn, rn = {}, {}
    t_total = r_total = 0
    for _, t in tgt_rows:
        for f in feats(t):
            tn[f] = tn.get(f, 0) + 1
            t_total += 1
    for _, t in raw_rows:
        for f in feats(t):
            rn[f] = rn.get(f, 0) + 1
            r_total += 1
    want = {}
    for i, t in raw_rows:
        fs = feats(t)
        s = sum(
            math.log((tn.get(f, 0) + alpha) / (t_total + alpha * n_buckets))
            - math.log((rn[f] + alpha) / (r_total + alpha * n_buckets))
            for f in fs
        )
        want[i] = (len(fs), round(s, 6))

    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    tgt = spark.createDataFrame(tgt_rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_feats, r.logratio)
        for r in prep.dsir_importance(
            raw, tgt, "doc_id", "text", n_buckets=n_buckets, alpha=alpha
        ).collect()
    }
    assert set(got) == set(want)
    for i in got:
        assert got[i][0] == want[i][0], i
        assert abs(got[i][1] - want[i][1]) <= 1e-6, i


def test_hist_quantiles_vs_reference_impl(spark):
    """Fixed-bin histogram quantiles vs a naive Python binning +
    cumulative interpolation — includes a constant group and a two-value
    group exercising the last-bin clamp."""
    from ago_sisdb_spark.operators import sketch as sk

    n_bins, qs = 8, (0.5, 0.9, 0.99)
    rnd = random.Random(77)
    groups = {
        "uniform": [rnd.uniform(0, 100) for _ in range(500)],
        "skewed": [rnd.expovariate(0.1) for _ in range(300)],
        "const": [7.5] * 40,
        "twoval": [1.0] * 30 + [2.0] * 10,
    }

    def py_quantiles(vals):
        lo, hi, n = min(vals), max(vals), len(vals)
        counts = [0] * n_bins
        for v in vals:
            b = 0 if hi <= lo else min(
                int((v - lo) / (hi - lo) * n_bins), n_bins - 1
            )
            counts[b] += 1
        out = {}
        for q in qs:
            cum = 0
            for b, c in enumerate(counts):
                cum += c
                if cum >= q * n:
                    if hi > lo:
                        est = lo + ((b + (q * n - (cum - c)) / c) / n_bins) * (
                            hi - lo
                        )
                    else:
                        est = lo
                    out[q] = (n, round(est, 6))
                    break
        return out

    rows = [(g, v) for g, vals in groups.items() for v in vals]
    df = spark.createDataFrame(rows, "grp string, v double")
    got = {
        (r.grp, r.q): (r.n, r.est)
        for r in sk.hist_quantiles(df, "grp", "v", qs, n_bins).collect()
    }
    want = {
        (g, q): res
        for g, vals in groups.items()
        for q, res in py_quantiles(vals).items()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) <= 1e-6, k


def test_duplicated_spans_vs_reference_impl(spark):
    """Span windows, hashes, and distinct-doc frequencies vs a naive
    Python chunker — planted shared spans at different offsets plus
    stride-boundary and short-doc edges."""
    import re

    span, stride, min_docs = 6, 3, 2
    # the shared run must sit at stride-aligned offsets in each doc or no
    # window coincides (span windows are offset-relative — that blind spot
    # is inherent to strided spans, not a bug)
    shared = " ".join(f"s{i}" for i in range(7))
    texts = {
        1: f"a1 a2 a3 {shared} a4 a5",   # shared at offset 3 (≡ stride)
        2: f"{shared} b1 b2 b3 b4 b5 b6",  # shared at offset 0
        3: "c1 c2 c3 c4 c5 c6 c7 c8 c9",
        4: "short doc",
        5: f"{shared} d1",                # offset 0 again
    }

    spans = {}
    for doc, t in texts.items():
        words = re.split(r"\s+", t.strip())
        for s in range(0, len(words) - span + 1, stride):
            h = py_hash60(" ".join(words[s : s + span]))
            spans.setdefault(h, []).append((doc, s))
    want = set()
    for h, occ in spans.items():
        if len({d for d, _ in occ}) >= min_docs:
            for d, s in occ:
                want.add((d, s, h, len({x for x, _ in occ})))

    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        (r.doc, r.start_tok, r.span_hash, r.n_docs_sharing)
        for r in dedup.duplicated_spans(
            df, "doc_id", "text", span, stride, min_docs, portable=True
        ).collect()
    }
    assert got == want and len(got) > 0


def test_whitespace_convention_cross_engine(spark):
    """Tabs, doubled spaces, and newlines must tokenize/shingle the same
    in Spark and DuckDB now that every oracle uses string_split_regex
    (the d12-class latent break: the synthetic corpus is single-spaced,
    so only a messy corpus exercises the convention)."""
    import duckdb

    from pyspark.sql import functions as F

    texts = [
        "plain single spaced words here",
        "double  spaced\tand tabbed words",
        "line\nbreaks inside the text body",
        " leading space",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got_tokens = {
        (r.doc_id, r.pos): r.tok
        for r in df.select(
            "doc_id",
            F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "tok"),
        ).collect()
    }
    sh = dedup.shingle_rows(df, "doc_id", "text", 3).collect()
    got_sh = {}
    for r in sh:
        got_sh.setdefault(r.doc, []).append(r.shingle)

    con = duckdb.connect()
    con.register("documents", __import__("pandas").DataFrame(
        {"doc_id": range(len(texts)), "text": texts}
    ))
    want_tokens = {
        (d, p): t
        for d, p, t in con.sql(r"""
            SELECT doc_id, u.i - 1 AS pos,
                   string_split_regex(trim(text), '\s+')[u.i] AS tok
            FROM documents,
                 unnest(range(1, len(string_split_regex(trim(text), '\s+')) + 1))
                     AS u(i)
        """).fetchall()
    }
    assert got_tokens == want_tokens
    want_sh = {}
    for d, s in con.sql(r"""
        SELECT doc_id,
               unnest(list_transform(
                   range(1, greatest(len(string_split_regex(text, '\s+')) - 2, 1) + 1),
                   i -> string_split_regex(text, '\s+')[i] || ' ' ||
                        coalesce(string_split_regex(text, '\s+')[i+1], '') || ' ' ||
                        coalesce(string_split_regex(text, '\s+')[i+2], ''))) AS s
        FROM documents
    """).fetchall():
        want_sh.setdefault(d, []).append(s)
    for d in got_sh:
        if len(texts[d].split()) >= 3 and not texts[d].startswith(" "):
            assert sorted(got_sh[d]) == sorted(want_sh[d]), d


def test_minhash_oracle_on_messy_corpus(spark):
    """Run the WHOLE d3 oracle (DuckDB) against the real operator on an
    adversarial corpus — tabs, doubled spaces, newlines, near-dups with
    messy separators — something the single-spaced gate corpus never
    exercises.  Any residual tokenization-convention drift between the
    engines shows up as a pair-set mismatch here."""
    import duckdb
    import pandas as pd

    texts = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick  brown fox jumps\tover the lazy dog"),  # messy dup
        (3, "the quick brown fox jumps over the lazy cat"),
        (4, "completely unrelated text about spark engines here"),
        (5, "another\nmultiline near dup of nothing in\nparticular"),
        (6, "the quick brown fox jumps over the lazy dog extra"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = sorted(
        (r.id_a, r.id_b, r.n_shared_bands)
        for r in dedup.minhash_lsh_candidates(
            df, "doc_id", "text", shingle_k=3, num_hashes=32, bands=8,
            portable=True,
        ).collect()
    )
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": [t[0] for t in texts],
                                   "text": [t[1] for t in texts]})
    )
    sql = dedup.minhash_lsh_oracle_sql(
        "documents", "doc_id", "text", shingle_k=3, num_hashes=32, bands=8
    )
    want = sorted(tuple(r) for r in con.sql(sql).fetchall())
    assert got == want
    # the messy-separator doc MUST pair with its clean twin (the \s+
    # convention makes their shingle sets identical)
    assert any(a == 1 and b == 2 and n == 8 for a, b, n in got)


def test_minhash_screen_oracle_on_messy_corpus(spark):
    """Same adversarial check for the d12 incremental screen: index built
    from messy history, batch screened, vs the composed DuckDB twin."""
    import duckdb
    import pandas as pd

    texts = [
        (1, "alpha beta gamma delta epsilon zeta eta"),
        (2, "alpha  beta\tgamma delta epsilon zeta eta"),   # messy dup, hist
        (4, "one two three four five six seven eight"),
        (3, "alpha beta gamma delta epsilon zeta\ntheta"),  # batch near-dup
        (6, "totally new words appearing only here today"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    hist = df.where("doc_id % 3 != 0")
    batch = df.where("doc_id % 3 = 0")
    import tempfile

    idx = tempfile.mkdtemp() + "/idx"
    dedup.build_minhash_index(hist, "doc_id", "text", idx, portable=True)
    got = sorted(
        (r.batch_id, r.hist_id, r.n_shared_bands)
        for r in dedup.minhash_screen_batch(
            batch, dedup.load_minhash_index(spark, idx), "doc_id", "text",
            portable=True,
        ).collect()
    )
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": [t[0] for t in texts],
                                   "text": [t[1] for t in texts]})
    )
    sql = dedup.minhash_screen_oracle_sql(
        hist_where="t.doc_id % 3 != 0", batch_where="t.doc_id % 3 = 0"
    )
    want = sorted(tuple(r) for r in con.sql(sql).fetchall())
    assert got == want
    assert any(b == 3 for b, _h, _n in got)  # the near-dup is caught


def test_simhash_oracle_on_messy_corpus(spark):
    """Whole d4 oracle vs the real SimHash operator on messy separators:
    a tab/double-space variant of a doc must fingerprint IDENTICALLY
    (same token multiset), so the pair appears at hamming 0."""
    import duckdb
    import pandas as pd

    texts = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha  beta\tgamma delta\nepsilon zeta eta theta"),
        (3, "alpha beta gamma delta epsilon zeta eta iota"),
        (4, "utterly different content occupying this slot now"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.simhash_neardup_pairs(
            df, "doc_id", "text", max_hamming=16, bands=12, portable=True
        ).collect()
    )
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": [t[0] for t in texts],
                                   "text": [t[1] for t in texts]})
    )
    sql = dedup.simhash_pairs_oracle_sql(
        "documents", "doc_id", "text", max_hamming=16, bands=12
    )
    want = sorted(tuple(r) for r in con.sql(sql).fetchall())
    assert got == want
    assert (1, 2, 0) in got  # messy twin at hamming 0


def test_dup_spans_oracle_on_messy_corpus(spark):
    """Whole d10 oracle vs the real span detector with messy separators:
    the shared span flags at the same start offsets in both engines."""
    import duckdb
    import pandas as pd

    shared = " ".join(f"s{i}" for i in range(8))
    messy_shared = shared.replace(" ", "\t", 2).replace("s4 ", "s4  ")
    texts = [
        (1, f"{shared} a1 a2 a3 a4"),
        (2, f"{messy_shared} b1 b2 b3 b4"),  # same tokens, messy separators
        (3, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = sorted(
        (r.doc, r.start_tok, r.span_hash, r.n_docs_sharing)
        for r in dedup.duplicated_spans(
            df, "doc_id", "text", span_tokens=8, stride=4, min_docs=2,
            portable=True,
        ).collect()
    )
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": [t[0] for t in texts],
                                   "text": [t[1] for t in texts]})
    )
    sql = dedup.duplicated_spans_oracle_sql(
        "documents", "doc_id", "text", span_tokens=8, stride=4, min_docs=2
    )
    want = sorted(tuple(r) for r in con.sql(sql).fetchall())
    assert got == want
    assert any(d == 2 and s == 0 for d, s, _h, _n in got)  # messy span hits


def test_bpe_oracle_on_messy_corpus(spark):
    """The corrected BPE trainer's full unrolled oracle vs the real merge
    loop on a corpus with messy separators AND the r6 boundary/run
    hazards (a merged symbol colliding with a later pair; a 6-run) —
    every round's winning pair and count must hash-match."""
    import duckdb
    import pandas as pd

    from ago_sisdb_spark.operators import text as T
    from ago_sisdb_spark.queries.pipeline import _bpe_oracle

    texts = [
        (1, "ab  ab\tab abc"),
        (2, "bc bc\nbc"),
        (3, "bbbbbb  bbbb"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = sorted(
        (r.merge_rank, r.pair, r.merged, r.pair_count)
        for r in T.bpe_train(df, "text", n_merges=6).collect()
    )
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": [t[0] for t in texts],
                                   "text": [t[1] for t in texts]})
    )
    want = sorted(tuple(r) for r in con.sql(_bpe_oracle(6)).fetchall())
    assert got == want and len(got) >= 4


def test_bloom_vs_reference_impl(spark):
    """Plain-Python Bloom filter (positions = hash60(md5hex#i) mod m,
    32-bit words, mask |= 1<<(pos&31)) vs build_bloom/screen_batch on a
    messy corpus with a DELIBERATELY tiny bitmap, so real collisions and
    false positives occur — the bitmap must match word-for-word and every
    verdict (incl. FP resolution via history) must match the model."""
    from pyspark.sql import functions as F

    from ago_sisdb_spark.operators import incremental

    n_bits, k = 1 << 9, 3  # 512 bits: heavy load → guaranteed collisions
    hist_texts = [f"doc {i}  tab\there {i*7}" for i in range(60)]
    probe_texts = hist_texts[:10] + [f"unseen {j} body" for j in range(40)]

    def py_positions(text):
        d = hashlib.md5(text.encode()).hexdigest()
        return [py_hash60(f"{d}#{i}") % n_bits for i in range(k)]

    words: dict[int, int] = {}
    for t in hist_texts:
        for p in py_positions(t):
            words[p >> 5] = words.get(p >> 5, 0) | (1 << (p % 32))

    hist = spark.createDataFrame(
        list(enumerate(hist_texts)), "doc_id long, text string"
    )
    bloom = incremental.build_bloom(hist, "text", n_bits, k)
    assert {(r.word, r.mask) for r in bloom.collect()} == set(words.items())

    def py_status(text):
        return all(
            (words.get(p >> 5, 0) >> (p % 32)) & 1 for p in py_positions(text)
        )

    batch = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(probe_texts)],
        "doc_id long, text string",
    )
    out = {
        r.id: (r.status, r.is_dup)
        for r in incremental.screen_batch(
            batch, bloom, "doc_id", "text", n_bits, k, history=hist
        ).collect()
    }
    hist_set = set(hist_texts)
    want = {
        1000 + i: (
            "possible_dup" if py_status(t) else "definitely_new",
            (t in hist_set) if py_status(t) else False,
        )
        for i, t in enumerate(probe_texts)
    }
    assert out == want
    # the tiny bitmap must actually have produced at least one FP, or the
    # two-tier verify path wasn't exercised
    assert any(s == "possible_dup" and not d for s, d in want.values())


def test_hashed_classifier_vs_reference_impl(spark):
    """Plain-Python twin of t18's pseudo-weight scoring: feature =
    hash60('w#'+tok) mod F, score_e6 = integer-half-up millionths of
    mean((feature-half)/half) — exercised on a messy corpus with
    negative, positive and near-zero scores (the fixed-point form exists
    precisely because these land on rounding boundaries)."""
    import re

    from ago_sisdb_spark.operators import text as text_ops

    texts = [
        "plain words here",
        "  LEADING space  and\ttabs\tinside  ",
        "punct!!! heavy??? tokens,,, everywhere...",
        "x",
        "repeat repeat repeat repeat",
        "MiXeD Case Tokens AND unicode héllo",
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    nf = 2001
    ihalf = (nf - 1) // 2

    def py_score(t):
        toks = [w for w in re.split(r"\s+", t.strip().lower()) if w]
        feats = [py_hash60(f"w#{w}") % nf for w in toks]
        n = len(feats)
        num = (sum(feats) - n * ihalf) * 1_000_000
        den = ihalf * n
        # floor((num + den/2)/den) in exact integer arithmetic
        return len(feats), (2 * num + den) // (2 * den)

    got = {
        r.doc_id: (r.n_toks, r.score_e6, r.keep)
        for r in text_ops.hashed_linear_score(
            df, "doc_id", "text", n_features=nf
        ).collect()
    }
    want = {}
    for i, t in enumerate(texts):
        n, s = py_score(t)
        want[i] = (n, s, s > 0)
    assert got == want
    assert {v[2] for v in want.values()} == {True, False}  # both classes hit


def test_audio_windows_vs_reference_impl(spark):
    """Plain-Python twin of m4's windowing schedule (5 s windows, 2 s hop
    at 16 kHz, truncated tail) computed straight from the parquet's
    n_chars — checks the window arithmetic the oracle merely restates."""
    import pandas as pd

    from ago_sisdb_spark.queries.pipeline import m4_audio_windows

    sf_dir = "/root/testdata/sf0.001"
    meta = pd.read_parquet(
        sf_dir + "/documents.parquet", columns=["doc_id", "n_chars"]
    )
    want = set()
    for doc_id, n_chars in zip(meta["doc_id"], meta["n_chars"]):
        dur = (int(n_chars) % 30) * 16000
        if dur <= 0:
            continue
        for w in range((dur - 1) // 48000 + 1):
            want.add((int(doc_id), w, w * 48000, min(80000, dur - w * 48000)))
    got = {
        (r.media_id, r.win_idx, r.start_sample, r.n_samples)
        for r in m4_audio_windows(spark, sf_dir).collect()
    }
    assert got == want and len(want) > 100


def test_training_order_vs_reference_impl(spark):
    """Plain-Python twin of the training-order chain — global_shuffle's
    (shard, pos), epoch_mix's copy counts, and pack_sequences' bins in
    shuffle order — computed with independent arithmetic (no SQL, no
    Spark) on real sf0.001 ids.  The gate oracles RESTATE the formulas;
    this checks the formulas themselves produce the intended layout."""
    import pandas as pd

    from pyspark.sql import functions as F

    from ago_sisdb_spark.operators import prep

    sf_dir = "/root/testdata/sf0.001"
    ids = sorted(
        pd.read_parquet(sf_dir + "/documents.parquet", columns=["doc_id"])[
            "doc_id"
        ].tolist()
    )

    P, A, B = 1000003, 2654435761, 40503
    def h(i, seed):
        # seed in the MULTIPLIER (additive seed = rotation, not reshuffle)
        return (i % P) * (1 + (A + (seed % (P - 1)) * B) % (P - 1)) % P

    # --- global_shuffle: shard = h mod n, pos = rank of (h, id) in shard
    n_shards, seed = 8, 17
    by_shard: dict[int, list] = {}
    for i in ids:
        by_shard.setdefault(h(i, seed) % n_shards, []).append((h(i, seed), i))
    want_order = {}
    for s, members in by_shard.items():
        for pos, (_, i) in enumerate(sorted(members), start=1):
            want_order[i] = (s, pos)
    df = spark.read.parquet(sf_dir + "/documents.parquet").select("doc_id")
    got_order = {
        r.doc_id: (r.shard, r.pos)
        for r in prep.global_shuffle(df, "doc_id", n_shards, seed).collect()
    }
    assert got_order == want_order

    # --- epoch_mix: floor(e) copies + one more iff h(id, floor(e)+1) is
    # under the fractional threshold
    rates = {0: 2.5, 1: 2.0, 2: 1.0, 3: 0.5}
    want_epochs = {}
    for i in ids:
        e = rates[i % 4]
        n_full = int(e)
        thresh = int((e - n_full) * P)
        gate = ((i % P) * A + (n_full + 1) * B) % P
        want_epochs[i] = n_full + (1 if gate < thresh else 0)
    src = df.withColumn("src", (F.col("doc_id") % 4).cast("string"))
    mixed = prep.epoch_mix(
        src, "doc_id", "src", {str(k): v for k, v in rates.items()}, 0.0
    )
    got_epochs: dict[int, int] = {}
    for r in mixed.collect():
        got_epochs[r.doc_id] = max(got_epochs.get(r.doc_id, 0), r.epoch)
        assert r.epoch >= 1
    for i in ids:
        assert got_epochs.get(i, 0) == want_epochs[i], i

    # --- pack_sequences over the shuffle order: greedy running sum per
    # shard in pos order
    toks = {i: 37 + (i * 7) % 90 for i in ids}
    window = 512
    want_bins = {}
    for s, members in by_shard.items():
        cum = 0
        for _, i in sorted(members):
            want_bins[i] = cum // window
            cum += toks[i]
    tdf = spark.createDataFrame(
        [(i, t) for i, t in toks.items()], "doc_id long, tokens long"
    )
    packed = prep.pack_sequences(
        prep.global_shuffle(df, "doc_id", n_shards, seed).join(tdf, "doc_id"),
        "doc_id", "tokens", window_tokens=window,
        shard_col="shard", order_cols=["pos"],
    )
    got_bins = {r.doc_id: r.bin for r in packed.collect()}
    assert got_bins == want_bins


def test_remove_duplicated_spans_vs_reference_impl(spark):
    """Plain-Python twin of d13's full cut: flag windows with py_hash60,
    mark covered token indices, reassemble — including the fully-cut doc
    (must come back as '' with n_removed = len) and the untouched doc."""
    import re as _re

    from ago_sisdb_spark.operators import dedup

    shared = " ".join(f"boiler{i}" for i in range(16))
    rows = [
        (1, shared + " unique one two three four five six seven eight"),
        (2, "alpha beta " + shared + " gamma delta"),
        (3, shared),  # exactly one window, fully cut
        (4, "totally original text with no duplication at all here now"),
        (5, "   "),  # whitespace-only: trim -> '' -> [''] single token
        (6, None),  # NULL text reads as '' on BOTH sides (r7 review fix)
    ]
    W, STRIDE, MIN_DOCS = 16, 8, 2

    def py_clean(corpus):
        corpus = [(i, t if t is not None else "") for i, t in corpus]
        spans = {}
        toks = {i: _re.split(r"\s+", t.strip()) for i, t in corpus}
        for i, w in toks.items():
            for s in range(0, len(w) - W + 1, STRIDE):
                h = py_hash60(" ".join(w[s : s + W]))
                spans.setdefault(h, set()).add((i, s))
        flagged = {}
        for h, occ in spans.items():
            if len({d for d, _ in occ}) >= MIN_DOCS:
                for d, s in occ:
                    flagged.setdefault(d, set()).add(s)
        out = {}
        for i, w in toks.items():
            starts = flagged.get(i, set())
            kept = [
                t
                for j, t in enumerate(w)
                if not any(s <= j < s + W for s in starts)
            ]
            out[i] = (" ".join(kept), len(w) - len(kept))
        return out

    expected = py_clean(rows)
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in dedup.remove_duplicated_spans(
            df, "doc_id", "text", W, STRIDE, MIN_DOCS, portable=True
        ).collect()
    }
    assert got == expected
    assert got[3] == ("", 16)  # the fully-cut doc
    assert got[4][1] == 0  # untouched passes through verbatim
    assert got[5] == ("", 0)
    assert got[6] == ("", 0)


def test_dedup_paragraphs_vs_reference_impl(spark):
    """Plain-Python twin of d14's rewrite: first-corpus-occurrence keep per
    trimmed-unit digest (plain dict, (doc,pos) order), canonical '. '
    rejoin — including the doc whose every unit was first seen elsewhere
    (comes back '') and a unit duplicated WITHIN one doc."""
    import re as _re

    from ago_sisdb_spark.operators import text as text_ops

    rows = [
        (1, "alpha beta gamma. shared sentence here. tail one"),
        (2, "shared sentence here. second doc unique bit"),
        (3, "shared sentence here"),  # fully duplicate -> ''
        (4, "repeat me. repeat me. distinct end"),  # intra-doc dup
        (5, ""),
    ]

    def py_rewrite(corpus):
        seen = {}
        units = {}
        for d, t in corpus:
            ps = [p for p in _re.split(r"\.\s+", t)]
            us = [(i, p.strip()) for i, p in enumerate(ps) if p.strip()]
            units[d] = us
            for i, p in us:
                seen.setdefault(p, (d, i))
        out = {}
        for d, _t in corpus:
            us = units[d]
            kept = [p for i, p in us if seen[p] == (d, i)]
            out[d] = (". ".join(kept), len(us), len(kept))
        return out

    expected = py_rewrite(rows)
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_paras"], r["n_kept"])
        for r in text_ops.dedup_paragraphs(df, "doc_id", "text").collect()
    }
    assert got == expected
    assert got[3] == ("", 1, 0)
    assert got[4] == ("repeat me. distinct end", 3, 2)
    assert got[5] == ("", 0, 0)


def test_gopher_stats_vs_reference_impl(spark):
    """Plain-Python Gopher rule suite (Counter re-implementation, written
    independently of the operator's internals) vs text.gopher_stats on a
    corpus exercising the edges: empty doc, 1-word doc, heavy n-gram
    repetition, tie-broken modes, '#'/'...' symbols, unicode whitespace,
    and a clean passing doc."""
    import re
    from collections import Counter

    from ago_sisdb_spark.operators import text as text_ops

    # every word distinct -> every n-gram unique -> repetition rules pass
    passing = "the and " + " ".join(f"word{i:02d}x" for i in range(60))
    docs = [
        (0, ""),
        (1, "word"),
        (2, "spam spam spam spam spam spam ham"),
        (3, "b a b a b a b a"),  # 2-gram tie: 'a b' vs 'b a' counts tie
        (4, "### ... ...... #no words here"),
        (5, "the　ideographic　space stays inside one word"),
        (6, passing),
        (7, "one two three four five " * 12),  # dup 5/10-grams everywhere
    ]

    def expect(txt):
        words = [w for w in re.split("[ \t\n\r\f\v]+", txt) if w]
        nw, nc = len(words), len(txt)
        out = {"n_words": nw}
        out["mwl_e6"] = (10**6 * sum(map(len, words))) // nw if nw else 0
        cnt = {
            n: Counter(" ".join(words[i:i + n]) for i in range(nw - n + 1))
            for n in (2, 3, 4, 5, 10)
        }
        for n in (2, 3, 4):
            c = cnt[n]
            if not c or nc == 0:
                out[f"top{n}_e6"] = 0
            else:
                m = max(c.values())
                g = min(k for k, v in c.items() if v == m)
                out[f"top{n}_e6"] = (10**6 * m * len(g)) // nc
        for n in (5, 10):
            dup = sum(v * len(k) for k, v in cnt[n].items() if v >= 2)
            out[f"dup{n}_e6"] = (10**6 * dup) // nc if nc else 0
        out["symbol_e6"] = (
            (10**6 * (txt.count("#") + txt.count("..."))) // nw if nw else 0
        )
        out["alpha_e6"] = (
            (10**6 * sum(1 for w in words if re.search("[A-Za-z]", w))) // nw
            if nw
            else 0
        )
        out["stop_hits"] = len(
            {"the", "be", "to", "of", "and", "that", "have", "with"} & set(words)
        )
        out["gopher_keep"] = (
            50 <= nw <= 100000
            and 3_000_000 <= out["mwl_e6"] <= 10_000_000
            and out["symbol_e6"] <= 100_000
            and out["alpha_e6"] >= 800_000
            and out["stop_hits"] >= 2
            and out["top2_e6"] <= 200_000
            and out["top3_e6"] <= 180_000
            and out["top4_e6"] <= 160_000
            and out["dup5_e6"] <= 150_000
            and out["dup10_e6"] <= 100_000
        )
        return out

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in text_ops.gopher_stats(df, "doc_id", "text").collect()
    }
    assert set(got) == {d for d, _ in docs}
    for did, txt in docs:
        want = expect(txt)
        have = {k: got[did][k] for k in want}
        assert have == want, f"doc {did}: {have} != {want}"
    # sanity: the engineered docs land on both sides of the gate
    assert got[6]["gopher_keep"] is True
    assert got[7]["gopher_keep"] is False and got[7]["dup10_e6"] > 100_000


def test_gopher_stats_randomized_cross_model(spark):
    """Seeded randomized sweep (120 docs) of gopher_stats vs the
    independent Python model: random word soups with skewed repetition,
    unicode words, '#'/'...' runs, and tab/newline whitespace — every
    column must match on every doc (the deterministic-fuzz complement of
    the hand-planted edge-case test)."""
    import random
    import re
    from collections import Counter

    from ago_sisdb_spark.operators import text as text_ops

    rnd = random.Random(99)
    vocab = (
        ["the", "and", "of", "to", "##", "...", "a#b", "héllo", "wörd",
         "日本語", "x"] + [f"w{i}" for i in range(25)]
    )
    seps = [" ", "  ", "\t", "\n", " \t "]

    def random_doc():
        n = rnd.randint(0, 120)
        words = [rnd.choice(vocab) for _ in range(n)]
        if n and rnd.random() < 0.5:  # inject heavy repetition runs
            run = [rnd.choice(vocab)] * rnd.randint(5, 30)
            pos = rnd.randrange(len(words) + 1)
            words = words[:pos] + run + words[pos:]
        return rnd.choice(seps).join(words) + (rnd.choice(seps) if words else "")

    docs = [(i, random_doc()) for i in range(120)]

    def expect(txt):
        words = [w for w in re.split("[ \t\n\r\f\v]+", txt) if w]
        nw, nc = len(words), len(txt)
        cnt = {
            n: Counter(" ".join(words[i:i + n]) for i in range(nw - n + 1))
            for n in (2, 3, 4, 5, 10)
        }
        out = {
            "n_words": nw,
            "mwl_e6": (10**6 * sum(map(len, words))) // nw if nw else 0,
            "symbol_e6": (10**6 * (txt.count("#") + txt.count("..."))) // nw
            if nw else 0,
            "alpha_e6": (10**6 * sum(1 for w in words if re.search("[A-Za-z]", w)))
            // nw if nw else 0,
            "stop_hits": len(
                {"the", "be", "to", "of", "and", "that", "have", "with"}
                & set(words)
            ),
        }
        for n in (2, 3, 4):
            c = cnt[n]
            if not c or nc == 0:
                out[f"top{n}_e6"] = 0
            else:
                m = max(c.values())
                g = min(k for k, v in c.items() if v == m)
                out[f"top{n}_e6"] = (10**6 * m * len(g)) // nc
        for n in (5, 10):
            dup = sum(v * len(k) for k, v in cnt[n].items() if v >= 2)
            out[f"dup{n}_e6"] = (10**6 * dup) // nc if nc else 0
        return out

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in text_ops.gopher_stats(df, "doc_id", "text").collect()
    }
    assert len(got) == 120
    for did, txt in docs:
        want = expect(txt)
        have = {k: got[did][k] for k in want}
        assert have == want, f"doc {did} ({txt[:60]!r}): {have} != {want}"
