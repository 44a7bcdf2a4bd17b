import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, pandas as pd
import pyarrow.parquet as pq

K, W, B, P = 8, 4, 31, (1 << 31) - 1
coeff = np.array([B**j for j in range(K)], dtype=np.int64)

t = pq.read_table("/root/testdata/sf0.1/documents.parquet", columns=["text"])
import re
texts = pd.Series([re.sub(r"\s+", " ", x.strip().lower()) for x in t.column("text").to_pylist()])
print("docs:", len(texts), "total chars:", sum(map(len, texts)))

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

def scratch(texts):
    empty = np.empty(0, dtype=np.int64)
    cap = 1 << 12
    c64 = np.empty(cap, dtype=np.int64)
    g = np.empty(cap, dtype=np.int64)
    tbuf = np.empty(cap, dtype=np.int64)
    p = np.empty(cap, dtype=np.int64)
    out = []
    for s in texts:
        if s is None: out.append(empty); continue
        raw = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
        L = raw.size
        n = L - (K - 1)
        if n <= 0: out.append(empty); continue
        if L > cap:
            cap = max(L, cap * 2)
            c64 = np.empty(cap, dtype=np.int64); g = np.empty(cap, dtype=np.int64)
            tbuf = np.empty(cap, dtype=np.int64); p = np.empty(cap, dtype=np.int64)
        c = c64[:L]; np.copyto(c, raw)
        gv = g[:n]; gv[:] = 0
        for j in range(K):
            np.multiply(c[j:j+n], coeff[j], out=tbuf[:n]); gv += tbuf[:n]
        gv %= P
        m = n - (W - 1)
        if m <= 0: out.append(empty); continue
        pv = p[:m]; np.copyto(pv, gv[:m])
        for j in range(1, W):
            np.minimum(pv, gv[j:j+m], out=pv)
        out.append(np.unique(pv))
    return out

def flat(texts):
    # one concatenated codepoint array + per-doc offsets
    enc = [s.encode("utf-32-le") if s is not None else b"" for s in texts]
    lens = np.array([len(b) // 4 for b in enc], dtype=np.int64)
    total = int(lens.sum())
    cps = np.frombuffer(b"".join(enc), dtype=np.uint32).astype(np.int64)
    starts = np.zeros(len(enc) + 1, dtype=np.int64); np.cumsum(lens, out=starts[1:])
    g = np.zeros(max(total - K + 1, 0), dtype=np.int64)
    n_total = g.size
    for j in range(K):
        g += cps[j:j+n_total] * coeff[j]
    g %= P
    m_total = n_total - (W - 1)
    p = g[:m_total].copy()
    for j in range(1, W):
        np.minimum(p, g[j:j+m_total], out=p)
    out = []
    empty = np.empty(0, dtype=np.int64)
    for i in range(len(enc)):
        L = lens[i]; n = L - (K - 1); m = n - (W - 1)
        if m <= 0: out.append(empty); continue
        st = starts[i]
        out.append(np.unique(p[st:st+m]))
    return out

r0 = cur(texts)
for fn in (scratch, flat):
    r = fn(texts)
    ok = len(r) == len(r0) and all(np.array_equal(a, b) for a, b in zip(r0, r))
    print(fn.__name__, "parity:", ok)

for fn in (cur, scratch, flat, cur, scratch, flat):
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); fn(texts); ts.append(time.perf_counter() - t0)
    print(f"{fn.__name__:8s} min={min(ts)*1e3:.1f} ms")
