"""Probe: pairwise-equality mode vs the sort-based mode on the bench
config (4-band 4096^2 int32, 4x4 windows).

mode = min over {x_i : count(x_i) == max count} — ties to the smallest
value, matching the host histogram scan and the sort-based run-length
formulation.  Pairwise needs no sort: counts[i] = sum_j (x_i == x_j),
16x16 comparisons per window, all fused elementwise+reduce on the VPU.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from xcube_resampling_tpu.ops import coarsen_ops


def mode_pairwise(block, axis):
    ndim = block.ndim
    keep = [d for d in range(ndim) if d not in axis]
    perm = keep + list(axis)
    moved = jnp.transpose(block, perm)
    lead_shape = moved.shape[: len(keep)]
    w = int(np.prod(moved.shape[len(keep) :]))
    flat = moved.reshape((-1, w))
    # accumulate counts tap-by-tap: keeps the working set at (N, w)
    # instead of the (N, w, w) equality tensor (which OOMs at 4096^2)
    counts = jnp.zeros(flat.shape, dtype=jnp.int32)
    for j in range(w):
        counts = counts + (flat == flat[:, j : j + 1]).astype(jnp.int32)
    maxc = jnp.max(counts, axis=1, keepdims=True)
    big = jnp.asarray(np.inf, dtype=jnp.float32)
    cand = jnp.where(
        counts == maxc, flat.astype(jnp.float32), big
    )
    modes = jnp.min(cand, axis=1).astype(flat.dtype)
    return modes.reshape(lead_shape)


def bench(fn, data, tag):
    f = jax.jit(fn)
    r = f(data)
    float(jnp.asarray(r).ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    n = 5
    acc = jnp.float32(0)
    probe = jax.jit(lambda a, x: a + x.ravel()[0].astype(jnp.float32))
    for _ in range(n):
        acc = probe(acc, f(data))
    float(acc)
    dt = (time.perf_counter() - t0) / n
    px = data.size
    print(f"{tag}: {px/dt/1e6:.1f} Mpix/s ({dt*1e3:.2f} ms)")
    return r


def main():
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, 16, (4, 4096, 4096), dtype=np.int32))

    def sort_mode(x):
        return coarsen_ops.coarsen_jax(x, 4, 4, "mode")

    def pair_mode(x):
        h, w = x.shape[-2] // 4, x.shape[-1] // 4
        blocked = x.reshape(x.shape[:-2] + (h, 4, w, 4))
        return mode_pairwise(blocked, (x.ndim - 1, x.ndim + 1))

    def pair_mode_blocked(x):
        # running-best over taps in the blocked layout: no (N, 16)
        # transpose materialization, no argmax pass
        h, w = x.shape[-2] // 4, x.shape[-1] // 4
        blocked = x.reshape(x.shape[:-2] + (h, 4, w, 4))
        taps = [
            blocked[..., :, a, :, b] for a in range(4) for b in range(4)
        ]
        best_c = None
        best_v = None
        for t, vt in enumerate(taps):
            ct = None
            for vu in taps:
                e = (vu == vt).astype(jnp.int32)
                ct = e if ct is None else ct + e
            if best_c is None:
                best_c, best_v = ct, vt
            else:
                better = (ct > best_c) | ((ct == best_c) & (vt < best_v))
                best_c = jnp.where(better, ct, best_c)
                best_v = jnp.where(better, vt, best_v)
        return best_v

    r1 = bench(sort_mode, data, "sort-based mode")
    r2 = bench(pair_mode, data, "pairwise mode")
    r3 = bench(pair_mode_blocked, data, "pairwise blocked mode")
    same = bool(jnp.all(jnp.asarray(r1) == jnp.asarray(r2)))
    same3 = bool(jnp.all(jnp.asarray(r1) == jnp.asarray(r3)))
    print("equal:", same, same3)


if __name__ == "__main__":
    main()
