"""Reconstruct Go's math/rand rngCooked seeding table from the public
algorithm definition (no Go toolchain needed).

Go's rand.Source is an additive lagged-Fibonacci generator
x_n = x_{n-273} + x_{n-607} (mod 2^64) over a 607-slot ring buffer
(go/src/math/rand/rng.go, BSD-licensed public source).  Its Seed()
XORs each freshly Lehmer-seeded word with rngCooked[i], a constant
table defined (go/src/math/rand/gen_cooked.go) as the generator state
after seeding the raw generator with 1 and advancing 7.8e12 steps
("the state of the rng after 780e10 iterations" per the historical
rng.go comment).

7.8e12 sequential steps are infeasible, but the recurrence is linear
over Z_2^64, so we jump ahead by computing t^N mod (t^607 - t^334 - 1)
with coefficients mod 2^64 (binary exponentiation over numpy uint64,
whose wrapping arithmetic IS mod-2^64).  The script self-validates the
jump against direct simulation at small N, then emits the table and
verifies the resulting rand.New(rand.NewSource(seed)) streams against
values pinned by the VictoriaMetrics reference tests
(app/vmselect/promql/exec_test.go rand(0)/rand_normal(0)/
rand_exponential(0) subtests).

Output: victoriametrics_spark/engine/_gorand_cooked.py
"""

from __future__ import annotations

import numpy as np

LEN = 607
TAP = 273
FEED0 = LEN - TAP  # 334
M31 = (1 << 31) - 1
A, Q, R = 48271, 44488, 3399
MASK63 = (1 << 63) - 1
N_COOKED = 7_800_000_000_000  # 780e10 iterations


def seedrand(x: int) -> int:
    """Lehmer step x = 48271*x mod (2^31-1) via Schrage (rng.go seedrand)."""
    hi, lo = divmod(x, Q)
    x = A * lo - R * hi
    if x < 0:
        x += M31
    return x


def srand_raw(seed: int, shifts=(20, 10, 0)) -> np.ndarray:
    """gen_cooked.go srand: fill the 607-slot vec from the Lehmer stream
    (three words per slot, XOR-packed at the given shifts), WITHOUT the
    cooked XOR.  Returns slot-ordered uint64 vec."""
    seed %= M31
    if seed < 0:
        seed += M31
    if seed == 0:
        seed = 89482311
    x = seed
    vec = np.zeros(LEN, dtype=np.uint64)
    for i in range(-20, LEN):
        x = seedrand(x)
        if i >= 0:
            u = x << shifts[0]
            x = seedrand(x)
            u ^= x << shifts[1]
            x = seedrand(x)
            u ^= x << shifts[2]
            vec[i] = np.uint64(u & ((1 << 64) - 1))
    return vec


def simulate(vec: np.ndarray, n: int):
    """Direct slot-level simulation of n vrand() calls (rng.go Uint64)."""
    vec = vec.copy()
    tap, feed = 0, FEED0
    for _ in range(n):
        tap -= 1
        if tap < 0:
            tap += LEN
        feed -= 1
        if feed < 0:
            feed += LEN
        vec[feed] = vec[feed] + vec[tap]  # uint64 wraps = mod 2^64
    return vec, tap, feed


# ---- polynomial jump-ahead over Z_2^64[t] / (t^607 - t^334 - 1) ----

def polymul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    out = np.zeros(len(a) + len(b) - 1, dtype=np.uint64)
    for i in range(len(a)):
        if a[i]:
            out[i : i + len(b)] += a[i] * b
    return polyreduce(out)


def polyreduce(c: np.ndarray) -> np.ndarray:
    c = c.copy()
    while len(c) > LEN and c[LEN:].any():
        high = c[LEN:].copy()
        c[LEN:] = 0
        # t^d = t^(d-273) + t^(d-607) for d >= 607
        c[LEN - TAP : LEN - TAP + len(high)] += high
        c[0 : len(high)] += high
    return c[:LEN] if len(c) > LEN else np.pad(c, (0, LEN - len(c)))


def poly_pow_t(n: int) -> np.ndarray:
    """t^n mod (t^607 - t^334 - 1), coefficients mod 2^64."""
    result = np.zeros(LEN, dtype=np.uint64)
    result[0] = 1
    base = np.zeros(LEN, dtype=np.uint64)
    base[1] = 1
    while n:
        if n & 1:
            result = polymul(result, base)
        base = polymul(base, base)
        n >>= 1
    return result


def slot_to_seq(vec: np.ndarray) -> np.ndarray:
    """Initial slot vec → sequence order y_0..y_606.
    y_i was 'written' at virtual call k=i-606 into slot (334-k) mod 607
    = (333 - i) mod 607."""
    return np.array([vec[(333 - i) % LEN] for i in range(LEN)], dtype=np.uint64)


def jump(vec: np.ndarray, n: int):
    """State after n vrand() calls, via polynomial jump.  Returns the
    slot-ordered vec (tap/feed after n calls are (-n)%607, (334-n)%607)."""
    y = slot_to_seq(vec)
    c = poly_pow_t(n)
    # rows: coefficient vectors of t^(n+j) mod p for j = 0..606
    mat = np.zeros((LEN, LEN), dtype=np.uint64)
    mat[0] = c
    for j in range(1, LEN):
        nxt = np.zeros(LEN, dtype=np.uint64)
        nxt[1:] = mat[j - 1][:-1]
        hi = mat[j - 1][LEN - 1]
        if hi:
            nxt[LEN - TAP] += hi
            nxt[0] += hi
        mat[j] = nxt
    newy = (mat * y[None, :]).sum(axis=1, dtype=np.uint64)  # wraps mod 2^64
    out = np.zeros(LEN, dtype=np.uint64)
    for j in range(LEN):
        out[(333 - n - j) % LEN] = newy[j]
    return out


def main() -> None:
    # --- self-validate the jump against direct simulation ---
    v0 = srand_raw(1)
    for n in (1, 606, 607, 608, 12345, 100_000):
        sim, _, _ = simulate(v0, n)
        jmp = jump(v0, n)
        assert (sim == jmp).all(), f"jump mismatch at n={n}"
    print("jump-ahead validated against direct simulation")

    cooked = jump(v0, N_COOKED) & np.uint64(MASK63)
    print("cooked[0..3] =", [hex(int(c)) for c in cooked[:4]])

    # --- verify against the reference-pinned rand streams ---
    from _gorand_check import verify  # noqa: lazy sibling import

    verify(cooked.tolist())

    lines = ["# Generated by scripts/gen_gorand_cooked.py -- do not edit.",
             "# Go math/rand rngCooked reconstruction (see that script's",
             "# docstring for provenance + the jump-ahead derivation).",
             "", "RNG_COOKED = ("]
    for i in range(0, LEN, 4):
        chunk = ", ".join(str(int(c)) for c in cooked[i : i + 4])
        lines.append(f"    {chunk},")
    lines.append(")")
    out = "/root/repo/victoriametrics_spark/engine/_gorand_cooked.py"
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
