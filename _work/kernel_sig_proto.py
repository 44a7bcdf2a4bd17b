"""Offline micro-A/B of the md5 sig-key kernel inner loop.

Current form (dedup.py md5_sig_key_kernel):
  per gram: " ".join(t[i:i+n]) -> encode -> md5 -> hexdigest()[:15] -> int(,16) -> % p
Candidate:
  per doc: encode tokens once; per gram: b" ".join(enc[i:i+n]) -> md5 -> digest
           -> int.from_bytes(d8)>>4 -> % p
Parity: hexdigest()[:15] is the first 60 bits of the digest; digest()[:8] big-endian
        >> 4 is the same 60 bits.
"""
import hashlib, time, random, string
import numpy as np

_MERSENNE_31 = (1 << 31) - 1
SHINGLE_N = 3
N1 = SHINGLE_N - 1

random.seed(7)
WORDS = ["".join(random.choices(string.ascii_lowercase, k=random.randint(2, 9)))
         for _ in range(5000)]
DOCS = [[random.choice(WORDS) for _ in range(random.randint(3, 220))]
        for _ in range(4000)]
# include unicode tokens
for d in DOCS[::37]:
    d[0] = "café中文"


def old_doc(t):
    m = len(t) - N1
    hs = np.empty(m, dtype=np.int64)
    for i in range(m):
        g = " ".join(t[i : i + SHINGLE_N])
        hs[i] = (
            int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16) % _MERSENNE_31
        )
    return hs


def new_doc(t):
    md5 = hashlib.md5
    fb = int.from_bytes
    enc = [w.encode("utf-8") for w in t]
    m = len(t) - N1
    hs = np.empty(m, dtype=np.int64)
    for i in range(m):
        hs[i] = (fb(md5(b" ".join(enc[i : i + SHINGLE_N])).digest()[:8], "big") >> 4) % _MERSENNE_31
    return hs


# parity
for t in DOCS[:400]:
    a, b = old_doc(t), new_doc(t)
    assert np.array_equal(a, b), t
print("parity OK on 400 docs")

for name, fn in [("old", old_doc), ("new", new_doc)] * 3:
    t0 = time.perf_counter()
    for t in DOCS:
        fn(t)
    print(f"{name}: {time.perf_counter()-t0:.3f}s")
