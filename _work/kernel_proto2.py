import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, pandas as pd
import pyarrow.parquet as pq
import re

K, W, B, P = 8, 4, 31, (1 << 31) - 1
coeff = np.array([B**j for j in range(K)], dtype=np.int64)

t = pq.read_table("/root/testdata/sf0.1/documents.parquet", columns=["text"])
texts = pd.Series([re.sub(r"\s+", " ", x.strip().lower()) for x in t.column("text").to_pylist()])

_SCRATCH = {}
def _buffers(total):
    cap = _SCRATCH.get("cap", 0)
    if cap < total:
        cap = max(total, cap * 2, 1 << 16)
        _SCRATCH["cap"] = cap
        for name in ("c", "g", "t", "p"):
            _SCRATCH[name] = np.empty(cap, dtype=np.int64)
    return _SCRATCH["c"], _SCRATCH["g"], _SCRATCH["t"], _SCRATCH["p"]

def flat_scratch(texts):
    enc = [s.encode("utf-32-le") if s is not None else b"" for s in texts]
    lens = np.array([len(b) >> 2 for b in enc], dtype=np.int64)
    total = int(lens.sum())
    empty = np.empty(0, dtype=np.int64)
    if total == 0:
        return [empty] * len(enc)
    c, g, tb, p = _buffers(total)
    raw = np.frombuffer(b"".join(enc), dtype=np.uint32)
    cv = c[:total]; np.copyto(cv, raw)
    n_total = max(total - (K - 1), 0)
    gv = g[:n_total]; gv[:] = 0
    for j in range(K):
        np.multiply(cv[j:j+n_total], coeff[j], out=tb[:n_total]); gv += tb[:n_total]
    gv %= P
    m_total = max(n_total - (W - 1), 0)
    pv = p[:m_total]; np.copyto(pv, gv[:m_total])
    for j in range(1, W):
        np.minimum(pv, gv[j:j+m_total], out=pv)
    starts = np.zeros(len(enc) + 1, dtype=np.int64); np.cumsum(lens, out=starts[1:])
    out = []
    for i in range(len(enc)):
        m = lens[i] - (K - 1) - (W - 1)
        if m <= 0: out.append(empty); continue
        st = starts[i]
        out.append(np.unique(pv[st:st+m]))
    return out

# reference
def cur(texts):
    empty = np.empty(0, dtype=np.int64)
    out = []
    for s in texts:
        if s is None: out.append(empty); continue
        cps = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
        n = cps.size - (K - 1)
        if n <= 0: out.append(empty); continue
        g = np.zeros(n, dtype=np.int64)
        for j in range(K):
            g += cps[j:j+n] * coeff[j]
        g %= P
        m = n - (W - 1)
        if m <= 0: out.append(empty); continue
        prints = g[:m]
        for j in range(1, W):
            prints = np.minimum(prints, g[j:j+m])
        out.append(np.unique(prints))
    return out

r0 = cur(texts)
r = flat_scratch(texts)
print("parity fixture:", all(np.array_equal(a, b) for a, b in zip(r0, r)))
# edge cases: None, empty, len<K, len=K, len=K+W-2 (m=0), len=K+W-1 (m=1), unicode
edge = pd.Series([None, "", "ab", "abcdefgh", "abcdefghij", "abcdefghijk", "héllo wörld ünïcode", "a" * 7, "a" * 8, "x" * 100])
print("parity edges:", all(np.array_equal(a, b) for a, b in zip(cur(edge), flat_scratch(edge))))
for fn in (cur, flat_scratch, cur, flat_scratch):
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); fn(texts); ts.append(time.perf_counter() - t0)
    print(f"{fn.__name__:12s} min={min(ts)*1e3:.1f} ms")
# batch-split parity (Spark slices series into arbitrary batches)
half = len(texts) // 2
ra = flat_scratch(texts[:half]); rb = flat_scratch(texts[half:].reset_index(drop=True))
print("split parity:", all(np.array_equal(a, b) for a, b in zip(r0, ra + rb)))

print("--- batch-size sweep ---")
for bs in (5000, 1250, 312, 156, 78):
    chunks = [texts[i:i+bs].reset_index(drop=True) for i in range(0, len(texts), bs)]
    for fn in (cur, flat_scratch):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for ch in chunks: fn(ch)
            ts.append(time.perf_counter() - t0)
        print(f"bs={bs:5d} {fn.__name__:12s} min={min(ts)*1e3:.1f} ms")
