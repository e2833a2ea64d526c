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


def main(sf_dir, out_dir):
    e = load_events(sf_dir)
    n_fail = 0
    for name, fn in [("asof_join", check_asof_join),
                     ("session_stats", check_session_stats),
                     ("daily_ohlcv", check_daily_ohlcv),
                     ("cum_volume", check_cum_volume)]:
        try:
            n = fn(e, out_dir)
            print(f"PASS {name}: pandas reimplementation agrees ({n} rows)")
        except Exception as ex:
            print(f"FAIL {name}: {type(ex).__name__}: {str(ex)[:400]}")
            n_fail += 1
    print(f"== {4 - n_fail} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
