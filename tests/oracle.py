"""Reference-semantics oracle — pure pandas/numpy, single node.

This module IS the executable reference (SURVEY.md §0/§5.2):
/root/reference was empty at survey time, so the geomatics semantics
documented in SURVEY.md §1-2 (per-time-step nan-stats over masked
cells, ddof=0, linear-interp percentiles, fill-value masking —
geomatics/timeseries.py, UNVERIFIED) are pinned here as executable
math. Every Spark result must match this bit-for-bit (rel tol 1e-12).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from tokens_ts import config as C  # noqa: E402


# ---- fixture synthesis (FIXTURES.md §1) ------------------------------------

def synth_sequences(k_total: int, n_sources: int = C.DEFAULT_SOURCES,
                    with_gaps: bool = True) -> pd.DataFrame:
    rows = []
    for s in range(n_sources):
        a, b, c = C.src_params(s)
        budget = C.source_budget(k_total, s)
        ks = np.arange(budget, dtype=np.int64)
        if with_gaps:
            ks = ks[(ks * C.GAP_MULT) % 1000 >= C.GAP_CUT]
        step = C.step_seconds(s)
        for k in ks:
            n_tok = int(C.NTOK_BASE + (k * C.NTOK_MULT) % C.NTOK_MOD)
            i = np.arange(n_tok, dtype=np.int64)
            rec = (a * k + b * i + c) % C.V
            toks = np.where(rec < C.PAD_THRESHOLD, C.PAD_ID, rec).astype(np.int32)
            rows.append(
                {
                    "doc_id": f"src{s:02d}-{k:012d}",
                    "tokens": toks,
                    "n_tok": n_tok,
                    "source": f"src{s:02d}",
                    "k": int(k),
                    "event_ts": pd.Timestamp(C.T0_EPOCH + int(k) * step, unit="s"),
                }
            )
    return pd.DataFrame(rows)


# ---- masking + within-row stats (P1-P4 / A1/A4/A5) -------------------------

def masked(tokens: np.ndarray, pad_id: int = C.PAD_ID) -> np.ndarray:
    v = tokens.astype(np.float64)
    v[tokens == pad_id] = np.nan
    return v


def _nan_or(fn, v):
    if v.size == 0 or np.all(np.isnan(v)):
        return np.nan
    return fn(v)


def stat(v: np.ndarray, name: str) -> float:
    """nan-stats with numpy defaults (ddof=0, linear percentiles).

    cnt is the count of non-nan values (0 for empty/all-nan — a count,
    not a statistic, so it never degrades to nan)."""
    if name == "cnt":
        return float(np.count_nonzero(~np.isnan(v)))
    if name.endswith("%"):
        return _nan_or(lambda x: np.nanpercentile(x, float(name[:-1]), method="linear"), v)
    fns = {
        "mean": np.nanmean,
        "median": np.nanmedian,
        "min": np.nanmin,
        "max": np.nanmax,
        "sum": np.nansum,
        "std": lambda x: np.nanstd(x, ddof=0),
        "cnt": lambda x: float(np.count_nonzero(~np.isnan(x))),
    }
    return _nan_or(fns[name], v)


def sel_point(v: np.ndarray, p: int) -> float:
    return v[p] if p < v.size else np.nan


def sel_box(v: np.ndarray, lo: int, hi: int) -> np.ndarray:
    return v[lo:hi]


def sel_mask(v: np.ndarray, positions) -> np.ndarray:
    idx = np.array(sorted({p for p in positions if p < v.size}), dtype=np.int64)
    return v[idx] if idx.size else v[:0]


# ---- tier rollups (A2-A5) ---------------------------------------------------

_FREQ = {"1m": "min", "1h": "h", "1d": "D"}


def rollup(raw: pd.DataFrame, tier: str) -> pd.DataFrame:
    """raw(source, series_id, event_ts, value) → partial-state tier frame.

    Tumbling windows = floor-truncated UTC timestamps (left-closed,
    left-labeled) — same as Spark date_trunc and DuckDB date_trunc.
    nan values are excluded (np.nan* semantics).
    """
    df = raw.copy()
    df["window_start"] = df["event_ts"].dt.floor(_FREQ[tier])
    g = df.dropna(subset=["value"]).groupby(
        ["source", "series_id", "window_start"], as_index=False
    )["value"]
    out = g.agg(
        cnt="count",
        sum="sum",
        min="min",
        max="max",
        sum_sq=lambda s: float(np.sum(np.square(s.to_numpy(dtype=np.float64)))),
    )
    # windows where every value is nan still appear in Spark's count(value)=0?
    # Spark's count("value") skips nulls but the group exists if any row does.
    allnan = df[df["value"].isna()]
    if len(allnan):
        extra = (
            allnan.groupby(["source", "series_id", "window_start"], as_index=False)
            .size()
            .drop(columns="size")
        )
        merged = extra.merge(
            out[["source", "series_id", "window_start"]],
            on=["source", "series_id", "window_start"],
            how="left",
            indicator=True,
        )
        missing = merged[merged["_merge"] == "left_only"].drop(columns="_merge")
        if len(missing):
            missing = missing.assign(cnt=0, sum=np.nan, min=np.nan, max=np.nan, sum_sq=np.nan)
            out = pd.concat([out, missing], ignore_index=True)
    return out.sort_values(["source", "series_id", "window_start"]).reset_index(drop=True)


def cascade(tier_df: pd.DataFrame, tier: str) -> pd.DataFrame:
    df = tier_df.copy()
    df["window_start"] = df["window_start"].dt.floor(_FREQ[tier])
    out = df.groupby(["source", "series_id", "window_start"], as_index=False).agg(
        cnt=("cnt", "sum"),
        # min_count=1: all-nan partials merge to nan, matching Spark's
        # null-skipping F.sum over all-null inputs (empty window ≠ 0)
        sum=("sum", lambda s: s.sum(min_count=1)),
        min=("min", "min"),
        max=("max", "max"),
        sum_sq=("sum_sq", lambda s: s.sum(min_count=1)),
    )
    return out.sort_values(["source", "series_id", "window_start"]).reset_index(drop=True)


def finish(tier_df: pd.DataFrame) -> pd.DataFrame:
    out = tier_df.copy()
    out["mean"] = out["sum"] / out["cnt"]
    out["std"] = np.sqrt(np.maximum(out["sum_sq"] / out["cnt"] - out["mean"] ** 2, 0.0))
    return out


def exact_quantiles(raw: pd.DataFrame, tier: str, percentiles=(0.5,)) -> pd.DataFrame:
    df = raw.dropna(subset=["value"]).copy()
    df["window_start"] = df["event_ts"].dt.floor(_FREQ[tier])
    g = df.groupby(["source", "series_id", "window_start"])["value"]
    out = g.median().rename("median").reset_index()
    for p in percentiles:
        if p == 0.5:
            continue
        q = g.quantile(p, interpolation="linear").rename(
            f"p{int(round(p * 100)):02d}"
        ).reset_index()
        out = out.merge(q, on=["source", "series_id", "window_start"])
    return out.sort_values(["source", "series_id", "window_start"]).reset_index(drop=True)


# ---- gap-fill (G1-G4) --------------------------------------------------------

def full_grid(k_total: int, n_sources: int = C.DEFAULT_SOURCES) -> pd.DataFrame:
    rows = []
    for s in range(n_sources):
        budget = C.source_budget(k_total, s)
        step = C.step_seconds(s)
        ks = np.arange(budget, dtype=np.int64)
        rows.append(
            pd.DataFrame(
                {
                    "source": f"src{s:02d}",
                    "k": ks,
                    "event_ts": pd.to_datetime(C.T0_EPOCH + ks * step, unit="s"),
                }
            )
        )
    return pd.concat(rows, ignore_index=True)


def gapfill(grid: pd.DataFrame, raw: pd.DataFrame) -> pd.DataFrame:
    """Align raw onto the full grid; add ffill + interior linear interp.

    ffill  = pandas Series.ffill()
    interp = Series.interpolate('linear', limit_area='inside') on the
             event-time axis (values at grid slots; interpolation is in
             *time*, which equals index-space only for uniform grids —
             we interpolate in time to match the engine, SURVEY.md G4).
    """
    out = []
    for (src, sid), g in raw.groupby(["source", "series_id"]):
        gg = grid[grid["source"] == src][["source", "event_ts"]].copy()
        gg["series_id"] = sid
        m = gg.merge(g[["event_ts", "value"]], on="event_ts", how="left")
        m = m.sort_values("event_ts").reset_index(drop=True)
        m["ffill"] = m["value"].ffill()
        s = pd.Series(m["value"].to_numpy(), index=pd.DatetimeIndex(m["event_ts"]))
        m["interp"] = s.interpolate(method="time", limit_area="inside").to_numpy()
        out.append(m)
    res = pd.concat(out, ignore_index=True)
    return res[["source", "series_id", "event_ts", "value", "ffill", "interp"]].sort_values(
        ["source", "series_id", "event_ts"]
    ).reset_index(drop=True)


# ---- codecs (C1-C3): normative bit-level spec -------------------------------
# Delta-of-delta timestamp encoding + Gorilla XOR (Pelkonen et al., VLDB'15).
# Layout (bit-packed, big-endian within fields):
#   DoD ts:  64b t0 | 64b zigzag(first delta) | per point: bucket-coded dod
#            buckets: '0'; '10'+7b; '110'+9b; '1110'+12b; '1111'+64b (zigzag)
#   XOR val v2 (columnar): [1B version=2][2-bit controls, byte-padded]
#            [11-bit windows: 5b lead + 6b (meaning-1), byte-padded]
#            [payloads: xor>>tz, meaning bits each]
#            controls: 00 repeat / 01 reuse window / 10 new window / 11 null;
#            a new window opens exactly when (lead=min(lz,31), tz) differs
#            from the previous NON-ZERO xor's (run-bounded reuse); point 0
#            xors against 0 (no separate v0 field); nulls carry no payload
#            and leave the value chain untouched.
# nan VALUES are carried via the IEEE bit pattern (xor works on raw bits);
# SQL nulls are carried in the control stream.

def _zigzag(d: np.ndarray) -> np.ndarray:
    return ((d << 1) ^ (d >> 63)).astype(np.uint64)


def _unzigzag(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64)
    return ((u >> np.uint64(1)) ^ (-(u & np.uint64(1))).astype(np.uint64)).astype(np.int64)


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, nbits: int):
        v = int(value) & ((1 << nbits) - 1)
        for b in range(nbits - 1, -1, -1):
            self.bits.append((v >> b) & 1)

    def bytes(self) -> bytes:
        arr = np.array(self.bits, dtype=np.uint8)
        return np.packbits(arr).tobytes()


class _BitReader:
    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | int(self.bits[self.pos])
            self.pos += 1
        return v


_DOD_BUCKETS = [  # (ctrl, ctrl_bits, payload_bits, lo, hi)
    ("10", 2, 7, -63, 64),
    ("110", 3, 9, -255, 256),
    ("1110", 4, 12, -2047, 2048),
]


def encode_ts_dod(ts_seconds: np.ndarray) -> bytes:
    t = np.asarray(ts_seconds, dtype=np.int64)
    w = _BitWriter()
    w.write(64, 8)  # header: version/width marker
    w.write(int(t[0]) & ((1 << 64) - 1), 64)
    if t.size == 1:
        return w.bytes()
    d0 = int(t[1] - t[0])
    w.write(int(_zigzag(np.array([d0], dtype=np.int64))[0]), 64)
    deltas = np.diff(t)
    dod = np.diff(deltas)
    for x in dod:
        x = int(x)
        if x == 0:
            w.write(0, 1)
            continue
        for ctrl, cb, pb, lo, hi in _DOD_BUCKETS:
            if lo <= x <= hi:
                w.write(int(ctrl, 2), cb)
                w.write(x - lo, pb)  # offset encoding within bucket
                break
        else:
            w.write(0b1111, 4)
            w.write(int(_zigzag(np.array([x], dtype=np.int64))[0]), 64)
    return w.bytes()


def decode_ts_dod(data: bytes, n: int) -> np.ndarray:
    r = _BitReader(data)
    assert r.read(8) == 64
    t0 = r.read(64)
    if t0 >= (1 << 63):
        t0 -= 1 << 64
    out = [t0]
    if n == 1:
        return np.array(out, dtype=np.int64)
    d = int(_unzigzag(np.array([r.read(64)], dtype=np.uint64))[0])
    out.append(t0 + d)
    for _ in range(n - 2):
        if r.read(1) == 0:
            dod = 0
        else:
            if r.read(1) == 0:
                dod = r.read(7) - 63
            elif r.read(1) == 0:
                dod = r.read(9) - 255
            elif r.read(1) == 0:
                dod = r.read(12) - 2047
            else:
                dod = int(_unzigzag(np.array([r.read(64)], dtype=np.uint64))[0])
        d += dod
        out.append(out[-1] + d)
    return np.array(out, dtype=np.int64)


def encode_val_xor(values: np.ndarray, nulls: np.ndarray | None = None) -> bytes:
    """Per-bit normative implementation of the v2 columnar layout —
    independent construction (sequential BitWriter state machine) that
    must be byte-identical to the vectorized tokens_ts.codec version."""
    v = np.asarray(values, dtype=np.float64)
    bits = v.view(np.uint64)
    null = (
        np.zeros(v.size, dtype=bool)
        if nulls is None
        else np.asarray(nulls, dtype=bool)
    )
    codes: list[int] = []
    wins: list[tuple[int, int]] = []
    pays: list[tuple[int, int]] = []  # (value, nbits)
    prev = 0
    cur_lead, cur_tz = -1, -1
    for i in range(v.size):
        if null[i]:
            codes.append(0b11)
            continue
        cur = int(bits[i])
        x = prev ^ cur
        prev = cur
        if x == 0:
            codes.append(0b00)
            continue  # note: a zero xor does NOT end the reuse run
        lz = min(64 - x.bit_length(), 31)
        tz = (x & -x).bit_length() - 1
        meaning = 64 - lz - tz
        if lz == cur_lead and tz == cur_tz:
            codes.append(0b01)
        else:
            codes.append(0b10)
            wins.append((lz, meaning))
            cur_lead, cur_tz = lz, tz
        pays.append((x >> tz, meaning))
    out = bytes([2])
    cw = _BitWriter()
    for c in codes:
        cw.write(c, 2)
    out += cw.bytes()
    ww = _BitWriter()
    for lz, meaning in wins:
        ww.write(lz, 5)
        ww.write(meaning - 1, 6)
    out += ww.bytes()
    pw = _BitWriter()
    for val, nb in pays:
        pw.write(val, nb)
    return out + pw.bytes()


def decode_val_xor(data: bytes, n: int) -> tuple[np.ndarray, np.ndarray]:
    assert data[0] == 2
    ctrl_nbytes = (2 * n + 7) // 8
    cr = _BitReader(data[1 : 1 + ctrl_nbytes])
    codes = [cr.read(2) for _ in range(n)]
    n_win = sum(1 for c in codes if c == 0b10)
    win_nbytes = (11 * n_win + 7) // 8
    wr = _BitReader(data[1 + ctrl_nbytes : 1 + ctrl_nbytes + win_nbytes])
    wins = [(wr.read(5), wr.read(6) + 1) for _ in range(n_win)]
    pr = _BitReader(data[1 + ctrl_nbytes + win_nbytes :])
    vbits = np.zeros(n, dtype=np.uint64)
    null = np.zeros(n, dtype=bool)
    cur = 0
    wi = -1
    for i, c in enumerate(codes):
        if c == 0b11:
            null[i] = True
            continue
        if c != 0b00:
            if c == 0b10:
                wi += 1
            lead, meaning = wins[wi]
            m = pr.read(meaning)
            cur ^= m << (64 - lead - meaning)
        vbits[i] = cur & ((1 << 64) - 1)
    out = vbits.view(np.float64).copy()
    out[null] = np.nan
    return out, null
