"""Ablation profile of the packed-search hop body on the real TPU.

Times CUMULATIVE stage configurations of one hop (gather -> score ->
dedup-sort -> in_list -> merge) chained inside a fori_loop in ONE jit
(per CLAUDE.md timing methodology), so the per-hop cost of each stage is
the delta between consecutive configs.

Run: PYTHONPATH=/root/repo python scripts/profile_hop.py
Env: PH_N (default 1_000_000), PH_B (4096), PH_ITERS (24)
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/diskann_tpu_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

LOG = lambda *a: print(*a, file=sys.stderr, flush=True)

N = int(os.environ.get("PH_N", 1_000_000))
B = int(os.environ.get("PH_B", 4096))
ITERS = int(os.environ.get("PH_ITERS", 24))
D, DP, R, W, L = 128, 64, 83, 4, 40
SENT = jnp.int32(2**31 - 1)


def make_loop(stage: str, w: int = W, dp: int = DP, l: int = L):
    c = w * R

    def hop(carry, data):
        best_d, best_i, best_exp, beam = carry
        adjacency, nbr_codes, nbr_aux, qi, qscale, qsq = data
        b = best_d.shape[0]
        safe = jnp.clip(beam, 0, N - 1)
        nbrs = adjacency[safe]                          # [B, W, R]
        codes = nbr_codes[safe].reshape(b, c, dp)       # one row gather/node
        aux = nbr_aux[safe].reshape(b, c)
        cand = nbrs.reshape(b, c)
        if stage == "gather":
            s = codes.astype(jnp.int32).sum(axis=(1, 2)) + cand.sum(axis=1)
            return (best_d + s[:, None].astype(jnp.float32) * 1e-30,
                    best_i, best_exp, (beam + 1) % N), None
        dots_i = jax.lax.dot_general(
            qi, codes, (((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )
        dots = dots_i.astype(jnp.float32) * qscale[:, None]
        cd = jnp.maximum(qsq[:, None] + aux - 2.0 * dots, 0.0)
        cd = jnp.where(cand >= 0, cd, jnp.inf)
        if stage == "score":
            s = cd.min(axis=1)
            return (best_d + s[:, None] * 1e-30, best_i, best_exp,
                    (beam + 1) % N), None
        if stage != "merge_only":
            cand_s = jnp.where(cand >= 0, cand, SENT)
            cand_s, cd = jax.lax.sort((cand_s, cd), dimension=-1, num_keys=1)
            left = jnp.concatenate(
                [jnp.full((b, 1), -2, jnp.int32), cand_s[:, :-1]], axis=-1
            )
            dup = cand_s == left
            fresh = (cand_s != SENT) & ~dup
            cand = cand_s
            if stage == "dedup":
                s = fresh.astype(jnp.float32).sum(axis=1)
                return (best_d + s[:, None] * 1e-30, best_i, best_exp,
                        (beam + 1) % N), None
            in_list = jnp.any(cand[:, :, None] == best_i[:, None, :], axis=-1)
            fresh = fresh & ~in_list
            if stage == "inlist":
                s = fresh.astype(jnp.float32).sum(axis=1)
                return (best_d + s[:, None] * 1e-30, best_i, best_exp,
                        (beam + 1) % N), None
        else:
            fresh = cand >= 0
        cd = jnp.where(fresh, cd, jnp.inf)
        ci = jnp.where(fresh, cand, -1)

        if stage in ("full_sortmerge", "merge_only"):
            md = jnp.concatenate([best_d, cd], axis=1)
            mi = jnp.concatenate([best_i, ci], axis=1)
            me = jnp.concatenate(
                [best_exp, jnp.where(ci >= 0, 0, 1).astype(jnp.int32)], axis=1
            )
            md, mi, me = jax.lax.sort((md, mi, me), dimension=-1, num_keys=1)
            best_d, best_i, best_exp = md[:, :l], mi[:, :l], me[:, :l]
        elif stage == "full_rankmerge":
            from diskann_tpu.ops.topk import merge_into_sorted

            ce = jnp.where(ci >= 0, 0, 1).astype(jnp.int32)
            best_d, best_i, best_exp = merge_into_sorted(
                best_d, best_i, best_exp, cd, ci, ce
            )
        # frontier select (cheap cumsum path, both merge variants share it)
        unexp = (best_exp == 0) & (best_i >= 0)
        rank = jnp.cumsum(unexp.astype(jnp.int32), axis=1) - 1
        sel = unexp & (rank < w)
        pos_iota = jax.lax.broadcasted_iota(jnp.int32, (b, l), 1)
        sel_pos = jax.lax.sort(jnp.where(sel, pos_iota, l), dimension=-1)[:, :w]
        bv = sel_pos < l
        beam = jnp.where(
            bv, jnp.take_along_axis(best_i, jnp.minimum(sel_pos, l - 1), axis=1), 0
        )
        best_exp = jnp.where(sel, 1, best_exp)
        return (best_d, best_i, best_exp, beam), None

    def run(adjacency, nbr_codes, nbr_aux, qi, qscale, qsq, beam0):
        b = qi.shape[0]
        best_d = jnp.full((b, l), jnp.inf, jnp.float32)
        best_i = jnp.full((b, l), -1, jnp.int32)
        best_exp = jnp.ones((b, l), jnp.int32)
        data = (adjacency, nbr_codes, nbr_aux, qi, qscale, qsq)
        carry = (best_d, best_i, best_exp, beam0)
        carry, _ = jax.lax.scan(
            lambda cr, _: hop(cr, data), carry, None, length=ITERS
        )
        return carry[0]

    return jax.jit(run)


def main():
    LOG(f"[profile] backend={jax.default_backend()} N={N} B={B} iters={ITERS}")
    key = jax.random.key(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    adjacency = jax.random.randint(k1, (N, R), 0, N, dtype=jnp.int32)
    # chunked generation: randint materializes uint32 bits, so one shot
    # would need 4x the int8 table (21GB) and OOM the 15.75GB HBM
    gen = jax.jit(
        lambda k: jax.random.randint(
            k, (N // 8, R * DP), -127, 128, dtype=jnp.int8
        )
    )
    nbr_codes = jnp.concatenate(
        [gen(jax.random.fold_in(k2, i)) for i in range(8)], axis=0
    )
    nbr_aux = jax.random.uniform(k3, (N, R), jnp.float32, 0.0, 100.0)
    qi = jax.random.randint(k4, (B, DP), -127, 128, dtype=jnp.int8)
    qscale = jnp.full((B,), 1e-3, jnp.float32)
    qsq = jax.random.uniform(k5, (B,), jnp.float32, 0.0, 100.0)
    beam0 = jax.random.randint(key, (B, W), 0, N, dtype=jnp.int32)
    np.asarray(nbr_codes[:1, :1])  # materialize before timing

    stages = [
        "gather", "score", "dedup", "inlist",
        "full_sortmerge", "full_rankmerge", "merge_only",
    ]
    results = {}
    for st in stages:
        fn = make_loop(st)
        t0 = time.time()
        out = fn(adjacency, nbr_codes, nbr_aux, qi, qscale, qsq, beam0)
        np.asarray(out[:1, :1])
        compile_and_run = time.time() - t0
        t0 = time.time()
        out = fn(adjacency, nbr_codes, nbr_aux, qi, qscale, qsq, beam0)
        np.asarray(out[:1, :1])
        dt = time.time() - t0
        per_hop = dt / ITERS * 1e3
        results[st] = per_hop
        LOG(f"[profile] {st:16s} {per_hop:8.3f} ms/hop  "
            f"(total {dt:.3f}s, first-call {compile_and_run:.1f}s)")

    LOG("[profile] stage deltas:")
    prev = 0.0
    for st in ["gather", "score", "dedup", "inlist", "full_sortmerge"]:
        LOG(f"[profile]   +{st:14s} {results[st]-prev:8.3f} ms")
        prev = results[st]
    LOG(f"[profile] rank-merge vs sort-merge: "
        f"{results['full_rankmerge']:.3f} vs {results['full_sortmerge']:.3f}")
    print("DONE", results)


if __name__ == "__main__":
    main()
