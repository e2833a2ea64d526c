#!/usr/bin/env python3
"""Third-opinion audit: recompute queries with CANONICAL semantics via a
third, independent implementation (pandas), and compare against the Spark
result dump. The DuckDB oracle gate cannot catch a bug mirrored in both
SQL formulations; pandas merge_asof / groupby implement as-of joins,
sessionization, and OHLCV from entirely different code.

Usage: third_opinion.py <sfDir> <verifyOutDir>
"""
import sys
import pandas as pd

TOKENS = [1, 7, 42, 99]


def load_events(sf_dir):
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    # ts is TIMESTAMP(NANOS) in the file; which datetime64 unit pandas
    # hands back depends on the pandas/pyarrow pairing (2.2 gives [us],
    # older gave [ns]). Normalizing through datetime64[us] instead of
    # assuming [ns] makes the epoch-micros derivation unit-proof —
    # the raw //1000 silently produced millis under a [us] read and
    # failed every ts_us comparison.
    e["ts_us"] = e["ts"].astype("datetime64[us]").astype("int64")
    return e


def spark(out_dir, name):
    return pd.read_parquet(f"{out_dir}/{name}")


def check_asof_join(e, out_dir):
    clicks = e[(e.event_type == "click") & (e.user_id.isin(TOKENS))][
        ["event_id", "user_id", "ts_us", "value"]].sort_values("ts_us")
    purch = (e[(e.event_type == "purchase") & (e.user_id.isin(TOKENS))]
             .groupby(["user_id", "ts_us"], as_index=False)["value"].max()
             .rename(columns={"value": "pvalue"}).sort_values("ts_us"))
    m = pd.merge_asof(clicks, purch, on="ts_us", by="user_id",
                      direction="backward", allow_exact_matches=True)
    m["asof_pvalue"] = m["pvalue"].round(4)
    mine = m[["event_id", "user_id", "ts_us", "value", "asof_pvalue"]] \
        .sort_values("event_id").reset_index(drop=True)
    got = spark(out_dir, "asof_join").sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[mine.columns].astype({"asof_pvalue": float}), mine.astype({"asof_pvalue": float}),
        check_dtype=False)
    return len(mine)


def check_session_stats(e, out_dir):
    gap = 4 * 3600 * 1000000
    rows = []
    f = e[e.user_id.isin(TOKENS)].sort_values(["user_id", "ts_us", "event_id"])
    for uid, g in f.groupby("user_id"):
        sid = 0
        prev = None
        for _, r in g.iterrows():
            if prev is None or r.ts_us - prev > gap:
                sid += 1
            rows.append((uid, sid, r.ts_us))
            prev = r.ts_us
    df = pd.DataFrame(rows, columns=["user_id", "session_id", "ts_us"])
    mine = df.groupby(["user_id", "session_id"], as_index=False).agg(
        n_events=("ts_us", "size"),
        session_start_us=("ts_us", "min"),
        duration_us=("ts_us", lambda s: s.max() - s.min()))
    mine = mine.sort_values(["user_id", "session_id"]).reset_index(drop=True)
    got = spark(out_dir, "session_stats") \
        .sort_values(["user_id", "session_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_session_window_agg(e, out_dir):
    # Engine session_window rule (pinned by the BarsSpec boundary
    # fixture): [ts, ts+gap] merges INCLUSIVELY -> only diff > gap
    # starts a NEW session; end = last ts + gap.
    gap = 4 * 3600 * 1000000
    rows = []
    f = e[e.user_id.isin(TOKENS)].sort_values(["user_id", "ts_us", "event_id"])
    for uid, g in f.groupby("user_id"):
        sid = 0
        prev = None
        for _, r in g.iterrows():
            if prev is None or r.ts_us - prev > gap:
                sid += 1
            rows.append((uid, sid, r.ts_us))
            prev = r.ts_us
    df = pd.DataFrame(rows, columns=["user_id", "session_id", "ts_us"])
    mine = df.groupby(["user_id", "session_id"], as_index=False).agg(
        n_events=("ts_us", "size"),
        session_start_us=("ts_us", "min"),
        session_end_us=("ts_us", "max"))
    mine["session_end_us"] = mine["session_end_us"] + gap
    mine = mine.drop(columns=["session_id"]) \
        .sort_values(["user_id", "session_start_us"]).reset_index(drop=True)
    got = spark(out_dir, "session_window_agg") \
        .sort_values(["user_id", "session_start_us"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_daily_ohlcv(e, out_dir):
    f = e[e.user_id == 7].copy()
    f["trade_date"] = f["ts"].dt.strftime("%Y-%m-%d")
    f = f.sort_values(["trade_date", "ts_us", "event_id"])
    mine = f.groupby("trade_date", as_index=False).agg(
        open_price=("value", "first"),
        high_price=("value", "max"),
        low_price=("value", "min"),
        close_price=("value", "last"),
        total_value=("value", lambda s: round(s.sum(), 3)),
        tick_count=("value", "size"))
    mine = mine.sort_values("trade_date", ascending=False).reset_index(drop=True)
    got = spark(out_dir, "daily_ohlcv") \
        .sort_values("trade_date", ascending=False).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_cum_volume(e, out_dir):
    f = e[e.user_id.isin(TOKENS)].sort_values(["user_id", "ts_us", "event_id"])
    f["cum_value"] = f.groupby("user_id")["value"].cumsum().round(4)
    mine = f[["event_id", "user_id", "cum_value"]] \
        .sort_values("event_id").reset_index(drop=True)
    got = spark(out_dir, "cum_volume").sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


# ---- round-10 training-pipeline families (documents table) ----------
# Independent reimplementations of chunking, leakage-free splits, and
# the composed training manifest: python strings/dicts/DSU, no SQL.

import hashlib
import math
import re


P31 = 2147483647
TWO60 = float(1 << 60)


def _md5long(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _words(text):
    return [w for w in re.split(r"\s+", text.lower()) if w != ""]


def load_docs(sf_dir):
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    return [(int(r.doc_id), r.text) for r in d.itertuples()]


def _chunks_of(ws, max_tokens=64, overlap=8):
    stride = max_tokens - overlap
    n = len(ws)
    n_chunks = max(1, math.ceil((n - overlap) / stride))
    return [ws[i * stride: i * stride + max_tokens] for i in range(n_chunks)]


def check_chunk_documents(sf_dir, out_dir):
    rows = []
    for doc_id, text in load_docs(sf_dir):
        for ci, cw in enumerate(_chunks_of(_words(text))):
            rows.append((doc_id, ci, " ".join(cw), len(cw)))
    mine = pd.DataFrame(rows, columns=["doc_id", "chunk_idx", "chunk_text", "n_tokens"]) \
        .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    got = spark(out_dir, "chunk_documents") \
        .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def _minhash_clusters(docs):
    """(doc_id -> cluster_rep) via the banded-MinHash near-dup graph:
    32 md5-seeded permutations, 8 bands of 4, band candidates verified
    by EXACT shingle-set Jaccard >= 0.2 (the lossless-PPJoin shape the
    oracle uses), components by union-find, rep = min id."""
    sigs, shset = {}, {}
    for doc_id, text in docs:
        ws = _words(text)
        sh = ws if len(ws) < 3 else [" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)]
        sh = sh if sh else [""]
        shset[doc_id] = set(sh)
        hms = [_md5long(s) % P31 for s in sh]
        sigs[doc_id] = [min(((2 * i + 1) * hm + i * i + 7) % P31 for hm in hms)
                        for i in range(32)]
    buckets = {}
    for doc_id, sig in sigs.items():
        for b in range(8):
            key = (b, ",".join(f"{j}:{sig[4 * b + j]}" for j in range(4)))
            buckets.setdefault(key, []).append(doc_id)
    parent = {d: d for d, _ in docs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    cands = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cands.add((ids[i], ids[j]))
    for a, b in cands:
        ni = len(shset[a] & shset[b])
        if ni and ni / (len(shset[a]) + len(shset[b]) - ni) >= 0.2:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    reps = {}
    for d, _ in docs:
        reps.setdefault(find(d), []).append(d)
    return {d: min(reps[find(d)]) for d, _ in docs}


def check_leakage_free_split(sf_dir, out_dir):
    docs = load_docs(sf_dir)
    cluster = _minhash_clusters(docs)
    rows = []
    for doc_id, _ in docs:
        rep = cluster[doc_id]
        draw = _md5long(f"split:{rep}") / TWO60
        split = "train" if draw < 0.75 else ("val" if draw < 0.875 else "test")
        rows.append((split, doc_id, rep))
    df = pd.DataFrame(rows, columns=["split", "doc_id", "cluster_rep"])
    mine = df.groupby("split", as_index=False).agg(
        n_docs=("doc_id", "size"),
        n_clusters=("cluster_rep", "nunique"),
        id_sum=("doc_id", "sum")).sort_values("split").reset_index(drop=True)
    got = spark(out_dir, "leakage_free_split") \
        .sort_values("split").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_training_manifest(sf_dir, out_dir):
    docs = load_docs(sf_dir)
    cluster = _minhash_clusters(docs)
    quality, n_words_of = {}, {}
    for doc_id, text in docs:
        ws = _words(text)
        n_words_of[doc_id] = len(ws)
        punct = round((len(text) - len(re.sub(r"[^a-z0-9 ]", "", text))) / len(text), 4)
        quality[doc_id] = round(min(1.0, len(ws) / 50.0) * (1.0 - punct), 4)
    # keep-best: one survivor per cluster by (quality desc, id asc),
    # then the quality/length/holdout gates
    best = {}
    for doc_id, _ in docs:
        rep = cluster[doc_id]
        cur = best.get(rep)
        if cur is None or (-quality[doc_id], doc_id) < (-quality[cur], cur):
            best[rep] = doc_id
    kept = [d for d in best.values()
            if quality[d] >= 0.3 and 20 <= n_words_of[d] <= 5000 and d % 20 != 0]
    # 13-gram decontamination vs the doc_id % 20 == 0 holdout
    grams = {}
    for doc_id, text in docs:
        ws = _words(text)
        if not ws:
            continue
        g = {" ".join(ws)} if len(ws) < 13 else \
            {" ".join(ws[i:i + 13]) for i in range(len(ws) - 12)}
        grams[doc_id] = g
    bench = set().union(*(grams[d] for d, _ in docs if d % 20 == 0 and d in grams)) \
        if any(d % 20 == 0 and d in grams for d, _ in docs) else set()
    text_of = dict(docs)
    rows = []
    for d in sorted(kept):
        if d in grams and grams[d] & bench:
            continue
        cw = _chunks_of(_words(text_of[d]))
        rows.append((d, quality[d], len(cw), sum(len(c) for c in cw)))
    mine = pd.DataFrame(rows, columns=["doc_id", "quality_score", "n_chunks", "n_tokens"]) \
        .sort_values("doc_id").reset_index(drop=True)
    got = spark(out_dir, "pipeline_training_manifest") \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[mine.columns].astype({"quality_score": float}),
        mine.astype({"quality_score": float}), check_dtype=False)
    return len(mine)


def _round6_half_up(x):
    """Spark's round(double, 6): HALF_UP on the shortest decimal repr
    (BigDecimal.valueOf goes through Double.toString; python repr() is
    the same shortest-roundtrip string)."""
    from decimal import Decimal, ROUND_HALF_UP
    return Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)


def check_dedup_substring(sf_dir, out_dir, n=10):
    docs = load_docs(sf_dir)
    # corpus-first occurrence per 10-gram, scanning in (doc_id, pos) order
    seen, spans = set(), {}
    for doc_id, text in sorted(docs):
        ws = _words(text)
        for i in range(len(ws) - n + 1):
            gk = hashlib.md5(" ".join(ws[i:i + n]).encode()).hexdigest()
            if gk in seen:
                spans.setdefault(doc_id, []).append((i + 1, i + n))
            else:
                seen.add(gk)
    rows = []
    for doc_id, text in sorted(docs):
        if doc_id not in spans:
            continue
        ws = _words(text)
        merged = []
        for s, e in sorted(spans[doc_id]):
            if merged and s <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        removed = sum(e - s + 1 for s, e in merged)
        kept = [ws[p - 1] for p in range(1, len(ws) + 1)
                if not any(s <= p <= e for s, e in merged)]
        rows.append((doc_id, len(merged), removed, len(ws),
                     hashlib.md5(" ".join(kept).encode()).hexdigest()))
    mine = pd.DataFrame(rows, columns=[
        "doc_id", "n_spans", "words_removed", "n_words", "clean_md5"]) \
        .sort_values("doc_id").reset_index(drop=True)
    got = spark(out_dir, "dedup_substring").sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_text_perplexity(sf_dir, out_dir):
    docs = load_docs(sf_dir)
    cnt = {}
    for _, text in docs:
        for w in _words(text):
            cnt[w] = cnt.get(w, 0) + 1
    n_tot, v = sum(cnt.values()), len(cnt)
    sur = {w: _round6_half_up(-math.log((c + 1.0) / float(n_tot + v)))
           for w, c in cnt.items()}
    rows = []
    for doc_id, text in sorted(docs):
        ws = _words(text)
        if not ws:
            continue
        nll = sum(sur[w] for w in ws)  # exact Decimal sum, order-free
        rows.append((doc_id, len(ws), float(nll), float(nll) / len(ws)))
    mine = pd.DataFrame(rows, columns=["doc_id", "n_words", "nll_sum", "nll_avg"]) \
        .sort_values("doc_id").reset_index(drop=True)
    got = spark(out_dir, "text_perplexity").sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_text_perplexity_bigram(sf_dir, out_dir, lam=0.75):
    docs = load_docs(sf_dir)
    cnt, big, ctx = {}, {}, {}
    for _, text in docs:
        ws = _words(text)
        for w in ws:
            cnt[w] = cnt.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
            ctx[a] = ctx.get(a, 0) + 1
    n_tot, v = sum(cnt.values()), len(cnt)
    def p_uni(w):
        return (cnt[w] + 1.0) / float(n_tot + v)
    rows = []
    for doc_id, text in sorted(docs):
        ws = _words(text)
        if not ws:
            continue
        nll = _round6_half_up(-math.log(p_uni(ws[0])))
        for a, b in zip(ws, ws[1:]):
            p = lam * (big[(a, b)] / float(ctx[a])) + (1.0 - lam) * p_uni(b)
            nll += _round6_half_up(-math.log(p))
        rows.append((doc_id, len(ws), float(nll), float(nll) / len(ws)))
    mine = pd.DataFrame(rows, columns=["doc_id", "n_words", "nll_sum", "nll_avg"]) \
        .sort_values("doc_id").reset_index(drop=True)
    got = spark(out_dir, "text_perplexity_bigram") \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_quality_rules(sf_dir, out_dir):
    docs = load_docs(sf_dir)
    stop = {'the', 'a', 'of', 'and', 'or', 'in', 'to'}
    rows = []
    for doc_id, text in sorted(docs):
        ws = _words(text)
        n = len(ws)
        awl = round(len(re.sub(r"\s", "", text)) / n, 4) if n else None
        pr = round((len(text) - len(re.sub(r"[^a-z0-9 ]", "", text))) / len(text), 4) \
            if len(text) else None
        nsw = len(set(w for w in ws if w in stop))
        bgs = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        tbf = round(max(bgs.count(b) for b in set(bgs)) / len(bgs), 4) if bgs else 0.0
        r_wc = 1 if 50 <= n <= 100000 else 0
        r_wl = 1 if awl is not None and 3.0 <= awl <= 10.0 else 0
        r_sym = 1 if pr is not None and pr <= 0.1 else 0
        r_sw = 1 if nsw >= 2 else 0
        r_rep = 1 if tbf <= 0.18 else 0
        rows.append((doc_id, n, r_wc, r_wl, r_sym, r_sw, r_rep,
                     r_wc * r_wl * r_sym * r_sw * r_rep))
    mine = pd.DataFrame(rows, columns=[
        "doc_id", "n_words", "r_word_count", "r_word_len", "r_symbol",
        "r_stopwords", "r_repetition", "pass"]) \
        .sort_values("doc_id").reset_index(drop=True)
    got = spark(out_dir, "quality_rules").sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_importance_sample(sf_dir, out_dir, buckets=4096, k=100):
    docs = load_docs(sf_dir)
    feats = {}
    for doc_id, text in docs:
        ws = _words(text)
        fs = ws + [" ".join(ws[i:i + 2]) for i in range(len(ws) - 1)]
        feats[doc_id] = [_md5long("f:" + f) % buckets for f in fs]
    ct, cr = {}, {}
    for doc_id, bs in feats.items():
        tgt = ct if doc_id % 7 == 0 else cr
        for b in bs:
            tgt[b] = tgt.get(b, 0) + 1
    tt, tr = sum(ct.values()), sum(cr.values())
    w = {b: _round6_half_up(math.log(
        (ct.get(b, 0) + 1.0) * (tr + float(buckets)) /
        ((cr.get(b, 0) + 1.0) * (tt + float(buckets)))))
        for b in set(ct) | set(cr)}
    rows = []
    for doc_id, bs in feats.items():
        if doc_id % 7 == 0 or not bs:
            continue
        rows.append((doc_id, len(bs), float(sum(w[b] for b in bs))))
    rows.sort(key=lambda r: (-r[2], r[0]))
    mine = pd.DataFrame(rows[:k], columns=["doc_id", "n_feats", "w_sum"]) \
        .reset_index(drop=True)
    got = spark(out_dir, "importance_sample").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_quality_classifier(sf_dir, out_dir, buckets=4096, rounds=3, lr=0.5):
    docs = load_docs(sf_dir)
    feats = {}
    for doc_id, text in docs:
        ws = _words(text)
        fs = ws + [" ".join(ws[i:i + 2]) for i in range(len(ws) - 1)]
        bs = {_md5long("f:" + f) % buckets for f in fs}
        if bs:
            feats[doc_id] = bs
    n = len(feats)
    w = {}
    for _ in range(rounds):
        err = {}
        for doc_id, bs in feats.items():
            z = float(sum((w[b] for b in bs if b in w),
                          __import__("decimal").Decimal(0)))
            y = 1.0 if doc_id % 7 == 0 else 0.0
            err[doc_id] = _round6_half_up(y - 1.0 / (1.0 + math.exp(-z)))
        grad = {}
        for doc_id, bs in feats.items():
            for b in bs:
                grad[b] = grad.get(b, __import__("decimal").Decimal(0)) + err[doc_id]
        w = {b: _round6_half_up(float(w.get(b, 0)) + lr * float(g) / n)
             for b, g in grad.items()}
    rows = []
    for doc_id, bs in sorted(feats.items()):
        z = float(sum((w[b] for b in bs), __import__("decimal").Decimal(0)))
        rows.append((doc_id, 1 if doc_id % 7 == 0 else 0, z))
    mine = pd.DataFrame(rows, columns=["doc_id", "is_target", "score"]) \
        .sort_values("doc_id").reset_index(drop=True)
    got = spark(out_dir, "quality_classifier").sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def _md5long(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def check_shuffle_shards(sf_dir, out_dir, n_shards=16, seed="graft"):
    P = 2147483647
    docs = load_docs(sf_dir)
    per = {}
    for doc_id, text in docs:
        k = _md5long(f"{seed}:{doc_id}")
        per.setdefault(k % n_shards, []).append((k, doc_id, len(_words(text))))
    rows = []
    for sid in sorted(per):
        members = sorted(per[sid])  # (key, doc_id) order
        chk = sum(((k % P) * ((i + 1) % P)) % P
                  for i, (k, _, _) in enumerate(members))
        rows.append((sid, len(members), sum(m[2] for m in members),
                     members[0][1], chk))
    mine = pd.DataFrame(rows, columns=[
        "shard_id", "n_docs", "n_words", "first_doc", "order_checksum"]) \
        .sort_values("shard_id").reset_index(drop=True)
    got = spark(out_dir, "shuffle_shards").sort_values("shard_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_corpus_drift_deciles(sf_dir, out_dir):
    import math
    from decimal import Decimal
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    mx = int(docs.doc_id.max())
    cw, gw = {}, {}
    for r in docs.itertuples():
        dec = (int(r.doc_id) * 10) // (mx + 1)
        for w in _words(r.text):
            cw[(dec, w)] = cw.get((dec, w), 0) + 1
            gw[w] = gw.get(w, 0) + 1
    v, n = len(gw), sum(gw.values())
    nd = {}
    for (dec, _), c in cw.items():
        nd[dec] = nd.get(dec, 0) + c
    rows = []
    for dec in sorted(nd):
        kl = Decimal(0)
        for w, c in gw.items():
            pd_ = (cw.get((dec, w), 0) + 1.0) / float(nd[dec] + v)
            pc = (c + 1.0) / float(n + v)
            kl += Decimal(repr(round(pd_ * math.log(pd_ / pc), 6))) \
                .quantize(Decimal("0.000001"))
        rows.append((dec, nd[dec], float(kl)))
    mine = pd.DataFrame(rows, columns=["dec", "n_tokens", "kl_to_corpus"])
    got = spark(out_dir, "corpus_drift_deciles").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine,
                                  check_dtype=False, atol=5e-6)
    return len(mine)


def check_memorization_risk(sf_dir, out_dir, n=3):
    import math
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    grams = {}
    for r in docs.itertuples():
        ws = _words(r.text)
        if not ws:
            continue
        g = {" ".join(ws)} if len(ws) < n else \
            {" ".join(ws[i:i + n]) for i in range(len(ws) - (n - 1))}
        grams[int(r.doc_id)] = g
    df = {}
    for g in grams.values():
        for gr in g:
            df[gr] = df.get(gr, 0) + 1
    rows = []
    for d, g in sorted(grams.items()):
        uniq = sum(1 for gr in g if df[gr] == 1)
        rows.append((d, len(g), uniq,
                     math.floor(uniq / len(g) * 1e6 + 0.5) / 1e6))
    mine = pd.DataFrame(rows, columns=[
        "doc_id", "n_grams", "n_unique", "unique_share6"])
    got = spark(out_dir, "memorization_risk").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_zorder_key(sf_dir, out_dir, k=50):
    ev = load_events(sf_dir)
    rows = []
    for r in ev.itertuples():
        x = int(r.user_id) & 65535
        y = (int(r.ts_us) // 60000000) & 65535
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        rows.append((z, int(r.event_id), x, y))
    rows.sort()
    mine = pd.DataFrame(
        [(e, x, y, z) for z, e, x, y in rows[:k]],
        columns=["event_id", "x", "y", "z"])
    got = spark(out_dir, "zorder_key").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_embedding_outliers(sf_dir, out_dir, n_sigma=3.0):
    import numpy as np
    from decimal import Decimal
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    by_label = {}
    for r in emb.itertuples():
        by_label.setdefault(int(r.label), []).append(
            (int(r.vec_id), np.asarray(list(r.embedding), dtype="float64")))
    rows = []
    for lab, vs in by_label.items():
        cent = np.mean([v for _, v in vs], axis=0)
        cn = np.linalg.norm(cent)
        c6 = {vid: Decimal(str(round(float(v @ cent) /
                                     (np.linalg.norm(v) * cn), 6)))
              for vid, v in vs}
        n = len(c6)
        mean = float(sum(c6.values())) / n
        ex2 = float(sum(d * d for d in c6.values())) / n
        sdev = (ex2 - mean * mean) ** 0.5
        for vid, d in c6.items():
            if float(d) < mean - n_sigma * sdev:
                rows.append((vid, lab, float(d),
                             round((mean - float(d)) / sdev, 4)))
    mine = pd.DataFrame(sorted(rows), columns=[
        "vec_id", "label", "cos_to_centroid", "z"])
    got = spark(out_dir, "embedding_outliers").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine,
                                  check_dtype=False, atol=3e-4)
    return len(mine)


def check_media_phash_dedup(sf_dir, out_dir, max_hamming=6):
    import hashlib
    import math
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    ph = {int(r.doc_id): int(hashlib.md5(r.text.encode()).hexdigest()[:15], 16)
          for r in docs.itertuples()}
    # planted 8x8 PNG near-duplicates: recompute the aHash from the
    # shared pixel formula (the Spark side recovers the same values
    # through a real encode -> decode path; hash equality is the proof)
    for g in range(4):
        for j in range(3):
            cells = []
            for cell in range(64):
                v = int(hashlib.md5(f"img:{g}:{cell}".encode())
                        .hexdigest()[:15], 16) % 256
                if j == 1 and cell == 0:
                    v = (v + 64) % 256
                cells.append(v)
            mean = sum(cells) / 64.0
            h = 0
            for cell in range(60):
                if cells[cell] > mean:
                    h |= 1 << cell
            ph[-1000000000 + g * 3 + j] = h
    # 7-band split (4x9 + 3x8 bits): lossless at hamming <= 6 by pigeonhole
    bands = [(i, i * 9, 511) for i in range(4)] + \
            [(4 + i, 36 + i * 8, 255) for i in range(3)]
    buckets = {}
    for d, h in ph.items():
        for i, sh, mk in bands:
            buckets.setdefault((i, (h >> sh) & mk), []).append(d)
    pairs = set()
    for ds in buckets.values():
        ds.sort()
        for i, a in enumerate(ds):
            for b in ds[i + 1:]:
                pairs.add((a, b))
    rows = [(a, b, bin(ph[a] ^ ph[b]).count("1"))
            for a, b in sorted(pairs)
            if bin(ph[a] ^ ph[b]).count("1") <= max_hamming]
    mine = pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"])
    got = spark(out_dir, "media_phash_dedup").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_media_phash_dedup_wide(sf_dir, out_dir, max_hamming=6):
    """numpy replay of the WIDE 240-bit phash face: corpus limbs derive
    DIGEST-ONCE (md5-60 over md5hex(text)+':k' — the payload is hashed
    one time, limbs expand the 32-char digest); planted 16x16 aHashes
    from the shared pixel formula (cell (r,c) -> pixel (r/2, c/2));
    limb-aligned 7-band (6x30 + 1x60) candidates; exact 4-limb hamming
    verify."""
    import hashlib
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    def md560(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    ph = {int(r.doc_id): tuple(
            md560(hashlib.md5(r.text.encode()).hexdigest() + f":{k}")
            for k in range(4))
          for r in docs.itertuples()}
    for g in range(4):
        for j in range(3):
            pix = [md560(f"img:{g}:{p}") % 256 for p in range(64)]
            if j == 1:
                pix[0] = (pix[0] + 64) % 256
            cells = [pix[(c // 16 // 2) * 8 + (c % 16) // 2] for c in range(256)]
            mean = sum(cells) / 256.0
            limbs = [0, 0, 0, 0]
            for i in range(240):
                if cells[i] > mean:
                    limbs[i // 60] |= 1 << (i % 60)
            ph[-1000000000 + g * 3 + j] = tuple(limbs)
    m30 = (1 << 30) - 1
    def bands(h):
        return [h[0] & m30, (h[0] >> 30) & m30, h[1] & m30, (h[1] >> 30) & m30,
                h[2] & m30, (h[2] >> 30) & m30, h[3]]
    buckets = {}
    for d, h in ph.items():
        for i, bb in enumerate(bands(h)):
            buckets.setdefault((i, bb), []).append(d)
    pairs = set()
    for ds in buckets.values():
        ds.sort()
        for i, a in enumerate(ds):
            for b in ds[i + 1:]:
                pairs.add((a, b))
    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(ph[a], ph[b]))
    rows = [(a, b, ham(a, b)) for a, b in sorted(pairs) if ham(a, b) <= max_hamming]
    mine = pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"])
    got = spark(out_dir, "media_phash_dedup_wide").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_media_curation_replay(sf_dir, out_dir, max_hamming=6):
    """Sequential numpy replay of the incremental media (phash) gate:
    3 batches by pmod(doc_id, 3); in-batch drop on any smaller-id doc
    within the radius, cross-batch drop on any prior-batch SURVIVOR
    within the radius. Direct hamming (banding is lossless at <= 6)."""
    import hashlib
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    ph = {int(r.doc_id): int(hashlib.md5(r.text.encode()).hexdigest()[:15], 16)
          for r in docs.itertuples()}
    for g in range(4):
        for j in range(3):
            cells = []
            for cell in range(64):
                v = int(hashlib.md5(f"img:{g}:{cell}".encode())
                        .hexdigest()[:15], 16) % 256
                if j == 1 and cell == 0:
                    v = (v + 64) % 256
                cells.append(v)
            mean = sum(cells) / 64.0
            h = 0
            for cell in range(60):
                if cells[cell] > mean:
                    h |= 1 << cell
            ph[-1000000000 + g * 3 + j] = h
    index = []   # (doc_id, phash) survivors of previous batches
    out = []
    for b in range(3):
        batch = sorted(d for d in ph if d % 3 in (b, b - 3))
        kept = []
        for d in batch:
            drop = any(bin(ph[d] ^ h).count("1") <= max_hamming
                       for (i, h) in index if i != d)
            drop = drop or any(bin(ph[d] ^ ph[y]).count("1") <= max_hamming
                               for y in batch if y < d)
            if not drop:
                kept.append(d)
        index.extend((d, ph[d]) for d in kept)
        out.extend((d, b) for d in kept)
    mine = pd.DataFrame(sorted(out), columns=["doc_id", "batch_id"])
    got = spark(out_dir, "media_curation_replay").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_rendezvous_shards(sf_dir, out_dir, k=16):
    import hashlib
    import math
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    def assign(doc_id, kk):
        # argmax of h, smallest shard on the (practically impossible) tie
        return max(range(kk),
                   key=lambda s: (h60(f"rdv:{s}:{doc_id}"), -s))
    agg = {}
    for r in docs.itertuples():
        d = int(r.doc_id)
        old, new = assign(d, k), assign(d, k + 1)
        n, m = agg.get(old, (0, 0))
        agg[old] = (n + 1, m + (1 if old != new else 0))
        # HRW: a moved doc can only land on the NEW shard
        assert old == new or new == k, (d, old, new)
    rows = [(s, n, m, math.floor(m / n * 1e6 + 0.5) / 1e6)
            for s, (n, m) in sorted(agg.items())]
    mine = pd.DataFrame(rows, columns=["shard", "n_docs", "n_moved", "moved_share6"])
    got = spark(out_dir, "rendezvous_shards").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_distinct_ngram_diversity(sf_dir, out_dir):
    import math
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    agg = {}
    for r in docs.itertuples():
        ws = _words(r.text)
        if not ws:
            continue
        for n in (1, 2, 3):
            grams = [" ".join(ws)] if len(ws) < n else \
                [" ".join(ws[i:i + n]) for i in range(len(ws) - (n - 1))]
            tot, dis = agg.setdefault((r.source, n), [0, set()])
            agg[(r.source, n)][0] += len(grams)
            dis.update(grams)
    rows = [(s, n, t, len(d), math.floor(len(d) / t * 1e6 + 0.5) / 1e6)
            for (s, n), (t, d) in sorted(agg.items())]
    mine = pd.DataFrame(rows, columns=[
        "source", "n", "n_total", "n_distinct", "distinct_share"])
    got = spark(out_dir, "distinct_ngram_diversity") \
        .sort_values(["source", "n"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_pmi_collocations(sf_dir, out_dir, k=20, min_count=5):
    import math
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    uni, bg = {}, {}
    for r in docs.itertuples():
        ws = _words(r.text)
        if not ws:
            continue
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bg[(a, b)] = bg.get((a, b), 0) + 1
    n, nb = sum(uni.values()), sum(bg.values())
    rows = []
    for (a, b), c in bg.items():
        if c < min_count:
            continue
        # the engines' exact expression order, then portable round-6
        pmi = math.floor(math.log((float(c) * n * n) /
                                  (float(nb) * uni[a] * uni[b]))
                         * 1e6 + 0.5) / 1e6
        rows.append((a, b, c, pmi))
    rows.sort(key=lambda t: (-t[3], t[0], t[1]))
    mine = pd.DataFrame(rows[:k],
                        columns=["word_a", "word_b", "n_pair", "pmi"])
    got = spark(out_dir, "pmi_collocations").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_triangle_stats(sf_dir, out_dir):
    # independent union-find + set-intersection triangle count over the
    # verified pair table (dedup_minhash's output)
    pairs = spark(out_dir, "dedup_minhash")[["doc_a", "doc_b"]]
    parent = {}
    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    adj = {}
    for r in pairs.itertuples():
        a, b = int(r.doc_a), int(r.doc_b)
        parent[find(a)] = find(b)
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    groups = {}
    for v in adj:
        groups.setdefault(find(v), []).append(v)
    stats = {}
    for members in groups.values():
        rep = min(members)
        n_nodes = len(members)
        n_edges = sum(len(adj[v]) for v in members) // 2
        n_tri = 0
        for r2 in pairs.itertuples():
            a, b = int(r2.doc_a), int(r2.doc_b)
            if find(a) == find(members[0]):
                n_tri += len([c for c in adj[a] & adj[b] if c > b])
        stats[rep] = (n_nodes, n_edges, n_tri)
    mine = pd.DataFrame(
        sorted((r, n, e, t) for r, (n, e, t) in stats.items()),
        columns=["cluster_rep", "n_nodes", "n_edges", "n_triangles"])
    got = spark(out_dir, "triangle_stats").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_cross_source_dups(sf_dir, out_dir):
    import math
    pairs = spark(out_dir, "dedup_minhash")[["doc_a", "doc_b"]]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    src = {int(r.doc_id): r.source for r in docs.itertuples()}
    cnt = {}
    for r in pairs.itertuples():
        a, b = src[int(r.doc_a)], src[int(r.doc_b)]
        key = (min(a, b), max(a, b))
        cnt[key] = cnt.get(key, 0) + 1
    total = len(pairs)
    rows = [(a, b, c, math.floor(c / total * 1e6 + 0.5) / 1e6)
            for (a, b), c in sorted(cnt.items())]
    mine = pd.DataFrame(rows, columns=["source_a", "source_b", "n_pairs", "share6"])
    got = spark(out_dir, "cross_source_dups").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_pagerank_neardup(sf_dir, out_dir, iters=5):
    # recompute the power iteration in exact Decimal from the VERIFIED
    # pair table (dedup_minhash's output, whose own oracle covers the
    # pair mining) — validates the pagerank math independently
    import math
    from decimal import Decimal
    pairs = spark(out_dir, "dedup_minhash")[["doc_a", "doc_b"]]
    adj, deg = {}, {}
    for r in pairs.itertuples():
        a, b = int(r.doc_a), int(r.doc_b)
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    n = len(deg)
    def r6(x):
        return Decimal(repr(math.floor(x * 1e6 + 0.5) / 1e6)) \
            .quantize(Decimal("0.000001"))
    base, d85 = r6(0.15 / n), Decimal("0.85")
    rank = {v: r6(1.0 / n) for v in deg}
    for _ in range(iters):
        contrib = {v: Decimal(0) for v in deg}
        for v, ns in adj.items():
            c = r6(float(rank[v]) / deg[v])
            for u in ns:
                contrib[u] += c
        rank = {v: (base + d85 * contrib[v])
                .quantize(Decimal("0.000001"), rounding="ROUND_HALF_UP")
                for v in deg}
    mine = pd.DataFrame(
        sorted((v, deg[v], float(rank[v])) for v in deg),
        columns=["doc_id", "deg", "pagerank"])
    got = spark(out_dir, "pagerank_neardup").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_dedup_exact_normalized(sf_dir, out_dir):
    import hashlib
    import re as _re
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    groups = {}
    for r in docs.itertuples():
        t = r.text.lower()
        # re.ASCII pins \s to the engines' ASCII class (Python's default
        # \s would also eat U+00A0 etc. and diverge on mojibake docs)
        norm = _re.sub(r"\s+", " ",
                       _re.sub(r"[^a-z0-9\s]", "", t, flags=_re.ASCII),
                       flags=_re.ASCII).strip()
        h = hashlib.md5(norm.encode()).hexdigest()
        raws, ids = groups.setdefault(h, (set(), []))
        raws.add(hashlib.md5(t.encode()).hexdigest())
        ids.append(int(r.doc_id))
    rows = [(min(ids), h, len(ids), len(raws))
            for h, (raws, ids) in groups.items()]
    mine = pd.DataFrame(rows, columns=[
        "keep_id", "content_hash", "n_dups", "n_raw_variants"]) \
        .sort_values("keep_id").reset_index(drop=True)
    got = spark(out_dir, "dedup_exact_normalized") \
        .sort_values("keep_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_cms_heavy_hitters(sf_dir, out_dir, d=4, w=256, k=20):
    import hashlib
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    cnt, cells = {}, {}
    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    for r in docs.itertuples():
        for word in _words(r.text):
            cnt[word] = cnt.get(word, 0) + 1
            for i in range(d):
                key = (i, h60(f"cm{i}:{word}") % w)
                cells[key] = cells.get(key, 0) + 1
    top = sorted(cnt.items(), key=lambda t: (-t[1], t[0]))[:k]
    rows = [(word, c,
             min(cells[(i, h60(f"cm{i}:{word}") % w)] for i in range(d)))
            for word, c in top]
    mine = pd.DataFrame(
        [(word, c, e, e - c) for word, c, e in rows],
        columns=["word", "exact_count", "cms_estimate", "overcount"])
    got = spark(out_dir, "cms_heavy_hitters").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_ewma_prices(sf_dir, out_dir, tokens=(1, 7, 42, 99)):
    ev = load_events(sf_dir)
    ev = ev[ev.user_id.isin(tokens)]
    rows = []
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        v = list(g.value)
        for i in range(15, len(v)):
            # the engines' exact IEEE term order (dyadic divisors)
            acc = v[i] / 2
            for j in range(1, 15):
                acc += v[i - j] / (1 << (j + 1))
            acc += v[i - 15] / 32768
            rows.append((int(g.event_id[i]), acc))
    mine = dict(rows)
    got = spark(out_dir, "ewma_prices")
    assert len(got) == len(mine)
    for r in got.itertuples():
        assert mine[int(r.event_id)] == r.ewma, \
            f"event {r.event_id}: {mine[int(r.event_id)]} != {r.ewma}"
    return len(mine)


def check_vwap_daily(sf_dir, out_dir):
    import json as _json
    import math
    from decimal import Decimal
    ev = load_events(sf_dir)
    agg = {}
    for r in ev.itertuples():
        k = int(_json.loads(r.props)["k"])
        p = Decimal(repr(r.value)).quantize(Decimal("0.01"))
        key = (int(r.user_id), str(pd.Timestamp(r.ts).date()))
        n, q, pv = agg.get(key, (0, 0, Decimal(0)))
        agg[key] = (n + 1, q + k, pv + p * k)
    rows = [(u, d, n, q, math.floor(float(pv) / q * 1e6 + 0.5) / 1e6)
            for (u, d), (n, q, pv) in agg.items() if q > 0]
    mine = pd.DataFrame(rows, columns=["user_id", "date", "n_trades", "qty", "vwap"]) \
        .sort_values(["user_id", "date"]).reset_index(drop=True)
    got = spark(out_dir, "vwap_daily") \
        .sort_values(["user_id", "date"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_tfidf_keywords(sf_dir, out_dir, k=3, emit_every=100):
    import math
    from decimal import Decimal
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    per_doc, dfreq = {}, {}
    for r in docs.itertuples():
        ws = _words(r.text)
        if not ws:
            continue
        seen = {}
        for w in ws:
            seen[w] = seen.get(w, 0) + 1
        per_doc[int(r.doc_id)] = seen
        for w in seen:
            dfreq[w] = dfreq.get(w, 0) + 1
    n = len(per_doc)
    rows = []
    for d in sorted(per_doc):
        if d % emit_every:
            continue
        cand = []
        for w, c in per_doc[d].items():
            # the engines' portable round-6 of ln(N/df), then EXACT
            # decimal tf x idf so ordering cannot drift
            idf6 = Decimal(repr(
                math.floor(math.log(n / dfreq[w]) * 1e6 + 0.5) / 1e6)) \
                .quantize(Decimal("0.000001"))
            s = c * idf6
            cand.append((-s, w, float(s)))
        cand.sort()
        rows.extend((d, i, w, s) for i, (_, w, s) in enumerate(cand[:k], 1))
    mine = pd.DataFrame(rows, columns=["doc_id", "rk", "word", "score"])
    got = spark(out_dir, "tfidf_keywords") \
        .sort_values(["doc_id", "rk"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns],
                                  mine.reset_index(drop=True),
                                  check_dtype=False)
    return len(mine)


def check_decontamination_bloom(sf_dir, out_dir, n=13):
    # independent exact 13-gram containment; the bloom stage must be
    # invisible in the rows
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    grams = {}
    for r in docs.itertuples():
        ws = _words(r.text)
        if not ws:
            continue
        g = {" ".join(ws)} if len(ws) < n else \
            {" ".join(ws[i:i + n]) for i in range(len(ws) - (n - 1))}
        grams[int(r.doc_id)] = g
    bench_of = {}  # gram -> bench ids containing it (inverted, tiny)
    for b, bg in grams.items():
        if b % 20 != 0:
            continue
        for g in bg:
            bench_of.setdefault(g, []).append(b)
    rows = []
    for d, g in grams.items():
        if d % 20 == 0:
            continue
        hits = {}
        for gr in g:
            for b in bench_of.get(gr, ()):
                hits[b] = hits.get(b, 0) + 1
        rows.extend((d, b, h) for b, h in hits.items())
    mine = pd.DataFrame(rows, columns=["doc_id", "bench_id", "n_hits"]) \
        .sort_values(["doc_id", "bench_id"]).reset_index(drop=True)
    got = spark(out_dir, "decontamination_bloom") \
        .sort_values(["doc_id", "bench_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_decontamination_semantic(sf_dir, out_dir, threshold=0.35, bench_cap=2000):
    import numpy as np
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {int(r.vec_id): np.asarray(list(r.embedding), dtype="float64")
            for r in emb.itertuples()}
    rows = []
    for v, va in vecs.items():
        if v % 20 == 0:
            continue
        for b, vb in vecs.items():
            if b % 20 != 0 or b >= bench_cap:
                continue
            c = round(float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))), 6)
            if c >= threshold:
                rows.append((v, b, c))
    mine = pd.DataFrame(rows, columns=["vec_id", "bench_id", "cos_sim"]) \
        .sort_values(["vec_id", "bench_id"]).reset_index(drop=True)
    got = spark(out_dir, "decontamination_semantic") \
        .sort_values(["vec_id", "bench_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine,
                                  check_dtype=False, atol=2e-6)
    return len(mine)


def check_bpe_encode(sf_dir, out_dir, num_merges=10, max_doc=8):
    docs = load_docs(sf_dir)
    vocab = {}
    for _, text in docs:
        for w in _words(text):
            vocab[w] = vocab.get(w, 0) + 1
    syms = {w: list(w) for w in vocab}
    for _ in range(num_merges):
        pairs = {}
        for w, ss in syms.items():
            for a, b in zip(ss, ss[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + vocab[w]
        if not pairs:
            break
        (l, r), _n = min(pairs.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        for w, ss in syms.items():
            out, i = [], 0
            while i < len(ss):
                if i + 1 < len(ss) and ss[i] == l and ss[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(ss[i])
                    i += 1
            syms[w] = out
    rows = []
    for doc_id, text in sorted(docs):
        if doc_id >= max_doc:
            continue
        pos = 0
        for w in _words(text):
            for t in syms[w]:
                rows.append((doc_id, pos, t))
                pos += 1
    mine = pd.DataFrame(rows, columns=["doc_id", "pos", "token"]) \
        .sort_values(["doc_id", "pos"]).reset_index(drop=True)
    got = spark(out_dir, "bpe_encode").sort_values(["doc_id", "pos"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def _auto_nbits(n, target=125, dim=64):
    # mirrors Similarity.autoNBits: integer doubling, floor 4, cap dim-1
    b = 0
    while b < dim - 1 and (target << b) < n:
        b += 1
    return max(4, b)


def check_knn_label_propagation(sf_dir, out_dir, k=5):
    import numpy as np
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    nbits = _auto_nbits(len(emb))
    rows = []
    vecs = {int(r.vec_id): (np.asarray(list(r.embedding), dtype="float64"),
                            int(r.label)) for r in emb.itertuples()}
    bkt = {v: sum(1 << i for i in range(nbits) if va[i] >= 0)
           for v, (va, _) in vecs.items()}
    for v, (va, true_label) in sorted(vecs.items()):
        if v % 5 != 0:
            continue
        cands = []
        for nid, (nv, nl) in vecs.items():
            if nid % 5 == 0 or bkt[nid] != bkt[v]:
                continue
            c = round(float(va @ nv / (np.linalg.norm(va) * np.linalg.norm(nv))), 6)
            cands.append((-c, nid, nl))
        cands.sort()
        top = cands[:k]
        if not top:
            continue
        votes = {}
        for _, _, nl in top:
            votes[nl] = votes.get(nl, 0) + 1
        pred, nv_ = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
        rows.append((v, pred, nv_, len(top), true_label))
    mine = pd.DataFrame(rows, columns=["vec_id", "pred_label", "votes",
                                       "k_used", "true_label"])
    got = spark(out_dir, "knn_label_propagation") \
        .sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_ngram_dup_profile(sf_dir, out_dir, n=3):
    df = {}
    for _doc_id, text in load_docs(sf_dir):
        ws = _words(text)
        if not ws:
            continue
        if len(ws) < n:
            grams = {" ".join(ws)}
        else:
            grams = {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}
        for g in grams:
            df[g] = df.get(g, 0) + 1
    buckets = {}
    for _g, d in df.items():
        b = ("1_unique" if d == 1 else "2_2-5" if d <= 5
             else "3_6-10" if d <= 10 else "4_11plus")
        ng, no = buckets.get(b, (0, 0))
        buckets[b] = (ng + 1, no + d)
    total = sum(ng for ng, _ in buckets.values())
    rows = [(b, ng, no, round(ng / total, 6))
            for b, (ng, no) in sorted(buckets.items())]
    mine = pd.DataFrame(rows, columns=["dup_bucket", "n_grams",
                                       "n_occurrences", "share"])
    got = spark(out_dir, "ngram_dup_profile") \
        .sort_values("dup_bucket").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_mmr_rerank(sf_dir, out_dir, k=5, shortlist=20, lam_pct=70):
    import numpy as np
    from decimal import Decimal
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {int(r.vec_id): np.asarray(list(r.embedding), dtype="float64")
            for r in emb.itertuples()}
    unit = {v: a / np.linalg.norm(a) for v, a in vecs.items()}
    lam, one_minus = Decimal(lam_pct) / 100, Decimal(100 - lam_pct) / 100
    rows = []
    for qid in (0, 1, 2):
        rel = {v: Decimal(str(round(float(unit[qid] @ a), 6)))
               for v, a in unit.items() if v != qid}
        sl = sorted(rel, key=lambda v: (-rel[v], v))[:shortlist]
        sim = {(a, b): Decimal(str(round(float(unit[a] @ unit[b]), 6)))
               for a in sl for b in sl if a != b}
        selected, remaining = [], list(sl)
        for rank in range(1, k + 1):
            if not remaining:
                break
            if not selected:
                scored = [(v, rel[v]) for v in remaining]
            else:
                scored = [(v, lam * rel[v] -
                           one_minus * max(sim[(v, s)] for s in selected))
                          for v in remaining]
            best = min(scored, key=lambda t: (-t[1], t[0]))
            rows.append((qid, rank, best[0], float(best[1])))
            selected.append(best[0])
            remaining.remove(best[0])
    mine = pd.DataFrame(rows, columns=["qid", "mmr_rank", "vec_id", "mmr_score"])
    got = spark(out_dir, "mmr_rerank") \
        .sort_values(["qid", "mmr_rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine,
                                  check_dtype=False, atol=2e-6)
    return len(mine)


def check_hll_gram_cardinality(sf_dir, out_dir, m=64, n=3):
    import hashlib
    regs, exact = {}, {}
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    for r in docs.itertuples():
        ws = _words(r.text)
        if not ws:
            continue
        grams = ([" ".join(ws)] if len(ws) < n
                 else [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)])
        for g in grams:
            exact.setdefault(r.source, set()).add(g)
            h = int(hashlib.md5(("hll:" + g).encode()).hexdigest()[:15], 16)
            reg, r2 = h % m, (h >> 6) % (1 << 32)
            rho = 33 - r2.bit_length()
            key = (r.source, reg)
            regs[key] = max(regs.get(key, 0), rho)
    rows = []
    for src in sorted(exact):
        mj = {reg: v for (s, reg), v in regs.items() if s == src}
        s_used = sum(1.0 / (1 << v) for v in mj.values())
        est = round(0.709 * m * m / (s_used + (m - len(mj))), 4)
        rows.append((src, len(mj), est, len(exact[src])))
    mine = pd.DataFrame(rows, columns=["source", "n_registers",
                                       "est_distinct", "exact_distinct"])
    got = spark(out_dir, "hll_gram_cardinality") \
        .sort_values("source").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_curriculum_assign(sf_dir, out_dir, n_shards=16):
    import hashlib
    import math
    from decimal import Decimal
    docs = load_docs(sf_dir)
    cnt = {}
    for _, text in docs:
        for w in _words(text):
            cnt[w] = cnt.get(w, 0) + 1
    n_tot, v = sum(cnt.values()), len(cnt)
    sur = {w: _round6_half_up(-math.log((c + 1.0) / float(n_tot + v)))
           for w, c in cnt.items()}
    d6 = {}
    for doc_id, text in docs:
        ws = _words(text)
        if not ws:
            continue
        nll = sum(sur[w] for w in ws)
        # the engines' PORTABLE round-6: floor(x*1e6 + 0.5)/1e6 in IEEE
        d6[doc_id] = Decimal(repr(
            math.floor(float(nll) / len(ws) * 1e6 + 0.5) / 1e6)) \
            .quantize(Decimal("0.000001"))
    n = len(d6)
    mean = float(sum(d6.values())) / n
    ex2 = float(sum(d * d for d in d6.values())) / n
    sdev = math.sqrt(ex2 - mean * mean)
    rows = []
    for doc_id in sorted(d6):
        d = float(d6[doc_id])
        phase = (1 if d < mean - sdev else 2 if d < mean
                 else 3 if d < mean + sdev else 4)
        shard = int(hashlib.md5(f"cur:{doc_id}".encode()).hexdigest()[:15],
                    16) % n_shards
        rows.append((doc_id, d, phase, shard))
    mine = pd.DataFrame(rows, columns=["doc_id", "difficulty", "phase", "shard"])
    got = spark(out_dir, "curriculum_assign") \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_token_entropy(sf_dir, out_dir):
    import math
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    cnt = {}
    for r in docs.itertuples():
        for w in _words(r.text):
            key = (r.source, w)
            cnt[key] = cnt.get(key, 0) + 1
    rows = []
    for src in sorted({s for s, _ in cnt}):
        cs = [c for (s, _), c in cnt.items() if s == src]
        n = sum(cs)
        ent = sum((_round6_half_up(-(c / n) * math.log(c / n)) for c in cs))
        rows.append((src, n, len(cs), float(ent),
                     _round6_half_up(max(cs) / n)))
    mine = pd.DataFrame(rows, columns=["source", "n_tokens", "vocab",
                                       "entropy_nats", "top_share"])
    mine["top_share"] = mine["top_share"].astype(float)
    got = spark(out_dir, "token_entropy") \
        .sort_values("source").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_price_jumps(sf_dir, out_dir):
    import math
    e = load_events(sf_dir)
    flagged = []
    for _uid, g in e.sort_values(["ts_us", "event_id"]).groupby("user_id"):
        vals = list(zip(g.event_id, g.value))
        rets = [(vals[i][0], _round6_half_up(vals[i][1] - vals[i - 1][1]))
                for i in range(1, len(vals))]
        if not rets:
            continue
        n = len(rets)
        mean = float(sum(r for _, r in rets)) / n
        ex2 = float(sum(r * r for _, r in rets)) / n
        sdev = math.sqrt(ex2 - mean * mean)
        flagged += [eid for eid, r in rets
                    if abs(float(r) - mean) > 3.0 * sdev]
    got = spark(out_dir, "price_jumps")
    assert set(got.event_id) == set(flagged), \
        f"flag sets differ: {len(set(got.event_id) ^ set(flagged))} ids"
    return len(flagged)


def check_bpe_fertility(sf_dir, out_dir, num_merges=10):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    vocab = {}
    for r in docs.itertuples():
        for w in _words(r.text):
            vocab[w] = vocab.get(w, 0) + 1
    syms = {w: list(w) for w in vocab}
    for _ in range(num_merges):
        pairs = {}
        for w, ss in syms.items():
            for a, b in zip(ss, ss[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + vocab[w]
        if not pairs:
            break
        (l, r), _n = min(pairs.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        for w, ss in syms.items():
            out, i = [], 0
            while i < len(ss):
                if i + 1 < len(ss) and ss[i] == l and ss[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(ss[i])
                    i += 1
            syms[w] = out
    agg = {}
    for r in docs.itertuples():
        for w in _words(r.text):
            nw, nt = agg.get(r.source, (0, 0))
            agg[r.source] = (nw + 1, nt + len(syms[w]))
    rows = [(s, nw, nt, float(_round6_half_up(nt / nw)))
            for s, (nw, nt) in sorted(agg.items())]
    mine = pd.DataFrame(rows, columns=["source", "n_words", "n_tokens", "fertility"])
    got = spark(out_dir, "bpe_fertility") \
        .sort_values("source").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_domain_reweight(sf_dir, out_dir, budget=1000):
    import math
    from decimal import Decimal
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    cnt = {}
    for r in docs.itertuples():
        for w in _words(r.text):
            cnt[w] = cnt.get(w, 0) + 1
    n_tot, v = sum(cnt.values()), len(cnt)
    sur = {w: _round6_half_up(-math.log((c + 1.0) / float(n_tot + v)))
           for w, c in cnt.items()}
    def _r6p(x):
        # the engines' portable round-6: floor(x*1e6 + 0.5)/1e6 in IEEE
        return Decimal(repr(math.floor(x * 1e6 + 0.5) / 1e6)) \
            .quantize(Decimal("0.000001"))
    per_src = {}
    for r in docs.itertuples():
        ws = _words(r.text)
        if not ws:
            continue
        d6 = _r6p(float(sum(sur[w] for w in ws)) / len(ws))
        nd, sd = per_src.get(r.source, (0, 0))
        per_src[r.source] = (nd + 1, sd + d6)
    mean6 = {s: _r6p(float(sd) / nd) for s, (nd, sd) in per_src.items()}
    t6 = float(sum(mean6.values()))
    rows = [(s, per_src[s][0], float(mean6[s]),
             float(_round6_half_up(float(mean6[s]) / t6)),
             int(math.floor(float(mean6[s]) / t6 * budget)))
            for s in sorted(mean6)]
    mine = pd.DataFrame(rows, columns=["source", "n_docs", "mean_difficulty",
                                       "weight", "quota"])
    got = spark(out_dir, "domain_reweight") \
        .sort_values("source").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_corpus_drift(sf_dir, out_dir):
    import math
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    cnt = {}
    for r in docs.itertuples():
        h = int(r.doc_id) % 2
        for w in _words(r.text):
            ca, cb = cnt.setdefault((r.source, w), [0, 0])
            cnt[(r.source, w)][h] += 1
    rows = []
    for src in sorted({s for s, _ in cnt}):
        pairs = [v for (s, _), v in cnt.items() if s == src]
        na, nb, v = sum(a for a, _ in pairs), sum(b for _, b in pairs), len(pairs)
        ka = kb = 0
        for ca, cb in pairs:
            pa = (ca + 1.0) / float(na + v)
            pb = (cb + 1.0) / float(nb + v)
            ka += _round6_half_up(pa * math.log(pa / pb))
            kb += _round6_half_up(pb * math.log(pb / pa))
        rows.append((src, v, float(ka), float(kb)))
    mine = pd.DataFrame(rows, columns=["source", "vocab", "kl_ab", "kl_ba"])
    got = spark(out_dir, "corpus_drift") \
        .sort_values("source").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_length_buckets(sf_dir, out_dir):
    buckets = {}
    for _doc_id, text in load_docs(sf_dir):
        n = len(_words(text))
        if n == 0:
            continue
        b = 1
        while b < n:
            b <<= 1
        nd, wm = buckets.get(b, (0, 0))
        buckets[b] = (nd + 1, wm + n)
    rows = [(b, nd, wm, b * nd, _round6_half_up((b * nd - wm) / (b * nd)))
            for b, (nd, wm) in sorted(buckets.items())]
    mine = pd.DataFrame(rows, columns=["bucket", "n_docs", "word_mass",
                                       "padded_mass", "waste_share"])
    mine["waste_share"] = mine["waste_share"].astype(float)
    got = spark(out_dir, "length_buckets") \
        .sort_values("bucket").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_charset_stats(sf_dir, out_dir):
    import re as _re
    from decimal import Decimal, ROUND_HALF_UP
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    agg = {}
    for r in docs.itertuples():
        t = r.text
        na = sum(1 for ch in t if ord(ch) > 0x7F)
        cc = len(_re.findall("[\x00-\x08\x0b\x0c\x0e-\x1f]", t))
        rc = t.count("�")
        s = agg.setdefault(r.source, [0, 0, 0, 0])
        s[0] += len(t); s[1] += na; s[2] += cc; s[3] += rc
    rows = [(src, n, na, cc, rc,
             float(Decimal(repr(na / n)).quantize(Decimal("0.0001"),
                                                  ROUND_HALF_UP)))
            for src, (n, na, cc, rc) in sorted(agg.items())]
    mine = pd.DataFrame(rows, columns=["source", "n_chars", "non_ascii",
                                       "control_chars", "replacement_chars",
                                       "non_ascii_share"])
    got = spark(out_dir, "charset_stats") \
        .sort_values("source").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_quantile_sketch(e, out_dir, b=256):
    import math
    rows = []
    for et, g in e.groupby("event_type"):
        vals = g["value"].sort_values().to_numpy()
        n = len(vals)
        lo, hi = float(vals.min()), float(vals.max())
        w0 = (hi - lo) / b
        width = 1.0 if w0 == 0 else w0
        cells = {}
        for v in vals:
            bk = min(b - 1, max(0, math.floor((v - lo) / width)))
            cells[bk] = cells.get(bk, 0) + 1
        out = [et, n]
        for q in (0.5, 0.9, 0.99):
            t = math.ceil(q * n)
            cum = 0
            for bk in sorted(cells):
                cum += cells[bk]
                if cum >= t:
                    est = lo + (bk + 1) * width
                    break
            out.append(math.floor(est * 1e6 + 0.5) / 1e6)
            # exact leg: linear-interpolated percentile (type 7)
            pos = q * (n - 1)
            lo_i = int(math.floor(pos))
            frac = pos - lo_i
            exact = vals[lo_i] if frac == 0 else \
                vals[lo_i] + frac * (vals[lo_i + 1] - vals[lo_i])
            out.append(round(exact, 4))
        rows.append(out)
    mine = pd.DataFrame(sorted(rows), columns=[
        "event_type", "tick_count", "p50_est", "p50_exact",
        "p90_est", "p90_exact", "p99_est", "p99_exact"])
    got = spark(out_dir, "quantile_sketch").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def check_quantile_sketch_adaptive(e, out_dir, m=16):
    """numpy mirror of the log-bucket (HDR-style) adaptive sketch: key
    from math.frexp (exact exponent extraction, the getExponent/scalb
    sibling), upper-edge readout, 1/16 relative contract."""
    import math
    def key(v):
        if v == 0.0:
            return 0
        neg = v < 0
        av = abs(v)
        mant, ex = math.frexp(av)       # av = mant * 2^ex, mant in [0.5, 1)
        e2 = ex - 1                     # floor(log2(av)) for normal av
        e2 = max(-64, min(64, e2))
        frac = av / (2.0 ** e2) if -1022 <= e2 <= 1023 else av * (2.0 ** -e2)
        sub = math.floor((frac - 1.0) * m)
        sub = max(0, min(m - 1, sub))
        k = (e2 + 65) * m + sub + 1
        return -k if neg else k
    def upper(k):
        i = k - 1
        e2 = i // m - 65
        sub = i % m
        return (2.0 ** e2) * (1.0 + (sub + 1) / m)
    rows = []
    for et, g in e.groupby("event_type"):
        vals = g["value"].sort_values().to_numpy()
        n = len(vals)
        cells = {}
        for v in vals:
            bk = key(float(v))
            cells[bk] = cells.get(bk, 0) + 1
        out = [et, n]
        for q in (0.5, 0.9, 0.99):
            t = math.ceil(q * n)
            cum = 0
            for bk in sorted(cells):
                cum += cells[bk]
                if cum >= t:
                    est = upper(bk)
                    break
            out.append(math.floor(est * 1e6 + 0.5) / 1e6)
            pos = q * (n - 1)
            lo_i = int(math.floor(pos))
            frac = pos - lo_i
            exact = vals[lo_i] if frac == 0 else \
                vals[lo_i] + frac * (vals[lo_i + 1] - vals[lo_i])
            out.append(round(exact, 4))
        rows.append(out)
    mine = pd.DataFrame(sorted(rows), columns=[
        "event_type", "tick_count", "p50_est", "p50_exact",
        "p90_est", "p90_exact", "p99_est", "p99_exact"])
    got = spark(out_dir, "quantile_sketch_adaptive").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[mine.columns], mine, check_dtype=False)
    return len(mine)


def main(sf_dir, out_dir):
    e = load_events(sf_dir)
    checks = [("asof_join", lambda: check_asof_join(e, out_dir)),
              ("quantile_sketch", lambda: check_quantile_sketch(e, out_dir)),
              ("quantile_sketch_adaptive",
               lambda: check_quantile_sketch_adaptive(e, out_dir)),
              ("session_stats", lambda: check_session_stats(e, out_dir)),
              ("session_window_agg", lambda: check_session_window_agg(e, out_dir)),
              ("daily_ohlcv", lambda: check_daily_ohlcv(e, out_dir)),
              ("cum_volume", lambda: check_cum_volume(e, out_dir)),
              ("chunk_documents", lambda: check_chunk_documents(sf_dir, out_dir)),
              ("leakage_free_split", lambda: check_leakage_free_split(sf_dir, out_dir)),
              ("pipeline_training_manifest", lambda: check_training_manifest(sf_dir, out_dir)),
              ("dedup_substring", lambda: check_dedup_substring(sf_dir, out_dir)),
              ("text_perplexity", lambda: check_text_perplexity(sf_dir, out_dir)),
              ("importance_sample", lambda: check_importance_sample(sf_dir, out_dir)),
              ("quality_classifier", lambda: check_quality_classifier(sf_dir, out_dir)),
              ("shuffle_shards", lambda: check_shuffle_shards(sf_dir, out_dir)),
              ("decontamination_semantic",
               lambda: check_decontamination_semantic(sf_dir, out_dir)),
              ("decontamination_bloom",
               lambda: check_decontamination_bloom(sf_dir, out_dir)),
              ("tfidf_keywords",
               lambda: check_tfidf_keywords(sf_dir, out_dir)),
              ("cms_heavy_hitters",
               lambda: check_cms_heavy_hitters(sf_dir, out_dir)),
              ("dedup_exact_normalized",
               lambda: check_dedup_exact_normalized(sf_dir, out_dir)),
              ("pagerank_neardup",
               lambda: check_pagerank_neardup(sf_dir, out_dir)),
              ("pmi_collocations",
               lambda: check_pmi_collocations(sf_dir, out_dir)),
              ("distinct_ngram_diversity",
               lambda: check_distinct_ngram_diversity(sf_dir, out_dir)),
              ("rendezvous_shards",
               lambda: check_rendezvous_shards(sf_dir, out_dir)),
              ("media_phash_dedup",
               lambda: check_media_phash_dedup(sf_dir, out_dir)),
              ("media_curation_replay",
               lambda: check_media_curation_replay(sf_dir, out_dir)),
              ("media_phash_dedup_wide",
               lambda: check_media_phash_dedup_wide(sf_dir, out_dir)),
              ("embedding_outliers",
               lambda: check_embedding_outliers(sf_dir, out_dir)),
              ("zorder_key", lambda: check_zorder_key(sf_dir, out_dir)),
              ("memorization_risk",
               lambda: check_memorization_risk(sf_dir, out_dir)),
              ("corpus_drift_deciles",
               lambda: check_corpus_drift_deciles(sf_dir, out_dir)),
              ("triangle_stats",
               lambda: check_triangle_stats(sf_dir, out_dir)),
              ("cross_source_dups",
               lambda: check_cross_source_dups(sf_dir, out_dir)),
              ("ewma_prices", lambda: check_ewma_prices(sf_dir, out_dir)),
              ("vwap_daily", lambda: check_vwap_daily(sf_dir, out_dir)),
              ("bpe_encode", lambda: check_bpe_encode(sf_dir, out_dir)),
              ("text_perplexity_bigram",
               lambda: check_text_perplexity_bigram(sf_dir, out_dir)),
              ("quality_rules", lambda: check_quality_rules(sf_dir, out_dir)),
              ("knn_label_propagation",
               lambda: check_knn_label_propagation(sf_dir, out_dir)),
              ("ngram_dup_profile",
               lambda: check_ngram_dup_profile(sf_dir, out_dir)),
              ("mmr_rerank", lambda: check_mmr_rerank(sf_dir, out_dir)),
              ("hll_gram_cardinality",
               lambda: check_hll_gram_cardinality(sf_dir, out_dir)),
              ("curriculum_assign",
               lambda: check_curriculum_assign(sf_dir, out_dir)),
              ("token_entropy",
               lambda: check_token_entropy(sf_dir, out_dir)),
              ("price_jumps", lambda: check_price_jumps(sf_dir, out_dir)),
              ("bpe_fertility",
               lambda: check_bpe_fertility(sf_dir, out_dir)),
              ("domain_reweight",
               lambda: check_domain_reweight(sf_dir, out_dir)),
              ("corpus_drift", lambda: check_corpus_drift(sf_dir, out_dir)),
              ("length_buckets",
               lambda: check_length_buckets(sf_dir, out_dir)),
              ("charset_stats",
               lambda: check_charset_stats(sf_dir, out_dir))]
    n_fail = 0
    for name, fn in checks:
        try:
            n = fn()
            print(f"PASS {name}: pandas reimplementation agrees ({n} rows)")
        except Exception as ex:
            print(f"FAIL {name}: {type(ex).__name__}: {str(ex)[:400]}")
            n_fail += 1
    print(f"== {len(checks) - n_fail} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
